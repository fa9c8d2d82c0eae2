"""Multi-chip scaling: shard the sample wavefront over a device mesh.

This is the distributed backend the reference never had (SURVEY par.2.5 P7:
no MPI/NCCL anywhere — single-node nanothread + one CUDA device).  The
TPU-native design per BASELINE.json's north star:

  * mesh axis "dp": the pixelxspp wavefront is sharded by *sample index* —
    each device renders spp/n_dev samples of every pixel with its own
    counter-based RNG streams (deterministic, device-count-invariant:
    sample i is identical no matter which device draws it),
  * scene/BVH/parameter tensors are replicated (broadcast once),
  * each device splats into a local film accumulator; one psum over "dp"
    merges films (the only collective in the forward pass),
  * under jax.grad, the transpose of that psum delivers the adjoint image to
    every device and parameter gradients are psum-reduced automatically —
    the "psum grads overlapped with the adjoint sweep" of the plan.

Works identically on a virtual CPU mesh (tests) and a real TPU slice over
ICI; multi-host needs only jax.distributed.initialize upstream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import film as film_mod
from ..integrators.common import render_pass
from ..scene.ir import Scene
from ..util import apply_params

AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def _local_pass(scene: Scene, seed, spp_local: int, mode: str):
    """Per-device body: render this device's sample-index slab."""
    dev = jax.lax.axis_index(AXIS)
    offset = dev * spp_local
    acc = render_pass(scene, seed, spp_local, offset, mode)
    return jax.lax.psum(acc, AXIS)


def render_sharded(scene: Scene, mesh: Mesh, spp: int | None = None,
                   seed: int = 0, mode: str = "primal"):
    """Distributed render: image identical (up to summation order) to the
    single-device render with the same total spp."""
    spp = spp or scene.spp
    n_dev = mesh.devices.size
    assert spp % n_dev == 0, f"spp {spp} must divide over {n_dev} devices"
    spp_local = spp // n_dev

    fn = jax.shard_map(
        partial(_local_pass, spp_local=spp_local, mode=mode),
        mesh=mesh,
        in_specs=(P(), P()),     # scene + seed replicated
        out_specs=P(),           # film fully replicated after psum
        check_vma=False,         # scan carries flip varying-ness mid-loop
    )

    @partial(jax.jit)
    def run(sc, sd):
        return film_mod.develop(fn(sc, sd))

    return run(scene, jnp.asarray(seed, jnp.uint32))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bring-up (the jax.distributed runtime over ICI/DCN).

    On single-host slices this is a no-op; on multi-host pods call it once
    per process before building meshes (SURVEY §2.5 P7 TPU-native
    replacement for the absent MPI/NCCL backend)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def render_tiled(scene: Scene, mesh: Mesh, spp: int | None = None,
                 seed: int = 0, mode: str = "primal",
                 interleave: bool | None = None):
    """Pixel-sharded distributed render: each device renders a horizontal
    film slab at FULL spp and keeps its shard — no collective in the
    forward pass at all; the gather happens implicitly when the sharded
    film is assembled (film shard-gather at develop, SURVEY §2.5).
    Complements `render_sharded` (sample-sharded, psum-merged): tile
    sharding scales film memory, sample sharding scales spp.

    Load balance: with ``interleave`` (default whenever the filter
    footprint is one pixel), device d owns rows d, d+N, d+2N, ... instead
    of one contiguous slab — an expensive image region (e.g. the liver
    filling the lower half of the frame) is spread across all devices
    instead of stalling the slab that contains it.  Wider filters need
    contiguous slabs (their splat crosses row boundaries) and fall back
    to the static split."""
    spp = spp or scene.spp
    n_dev = mesh.devices.size
    h, w = scene.film_h, scene.film_w
    assert h % n_dev == 0, f"film height {h} must divide over {n_dev}"
    rows = h // n_dev
    if interleave is None:
        interleave = film_mod.filter_radius(scene.rfilter) == 0
    assert not (interleave and film_mod.filter_radius(scene.rfilter) > 0), \
        "interleaved tiling needs a 1px filter footprint (box)"

    def local(scene, seed):
        dev = jax.lax.axis_index(AXIS)
        # render the full frame's rays whose pixel row lands in our slab:
        # crop by rebasing the sensor row window [dev*rows, (dev+1)*rows)
        n_pix = w * rows
        n = n_pix * spp
        import jax.numpy as jnp
        from ..core.rng import make_sampler
        from ..sensor.perspective import sample_ray
        from ..integrators.common import _integrator_sample
        lane = jnp.arange(n, dtype=jnp.uint32)
        pix_local = lane // spp
        row_local = (pix_local // w).astype(jnp.uint32)
        if interleave:
            py = row_local * jnp.uint32(n_dev) + dev.astype(jnp.uint32)
        else:
            py = row_local + dev.astype(jnp.uint32) * rows
        px = (pix_local % w).astype(jnp.uint32)
        pix_global = py * w + px
        samp = lane % spp
        sampler = make_sampler(pix_global, samp, seed,
                               kind=scene.sampler_kind, spp=spp)
        uf, sampler = sampler.next_2d()
        pos = jnp.stack([px.astype(jnp.float32),
                         py.astype(jnp.float32)], -1) + uf
        ray = sample_ray(scene, pos)
        L, valid, _ = _integrator_sample(scene, sampler, ray, mode=mode)
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        # local splat into the slab: pos rebased to this device's rows
        pos_local = jnp.stack(
            [pos[:, 0], row_local.astype(jnp.float32) + (pos[:, 1] % 1.0)],
            -1)
        acc = film_mod.splat(w, rows, scene.rfilter, pos_local, L)
        return acc

    fn = jax.shard_map(local, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(AXIS), check_vma=False)

    @jax.jit
    def run(sc, sd):
        acc = fn(sc, sd)
        if interleave:
            # gathered order is dev-major (dev, local); image row
            # local * n_dev + dev -> transpose back to scanline order
            c = acc.shape[-1]
            acc = acc.reshape(n_dev, rows, w, c).transpose(1, 0, 2, 3) \
                     .reshape(h, w, c)
        return film_mod.develop(acc)

    return run(scene, jnp.asarray(seed, jnp.uint32))


def measure_scaling(scene: Scene, n_devices: int | None = None,
                    spp: int = 16, seed: int = 0, reps: int = 3) -> dict:
    """Wall-clock scaling proxy on whatever devices exist (virtual CPU
    mesh or a real slice): render a FIXED total workload on a 1-device
    mesh and on the full mesh; efficiency = t1 / (tN * N) on real chips.

    On the virtual CPU mesh all "devices" share one host, so the ideal
    is equal wall-clock (the same total flops) and the reported
    ``efficiency_proxy`` = t1 / tN measures pure sharding/collective
    overhead (1.0 = the mesh partitioning costs nothing).  BASELINE.md
    target: >= 0.8 at >= 2 hosts."""
    import time

    n = n_devices or len(jax.devices())
    mesh1 = make_mesh(1)
    meshN = make_mesh(n)

    def timed(mesh):
        render_sharded(scene, mesh, spp=spp, seed=seed).block_until_ready()
        t0 = time.perf_counter()
        for i in range(reps):
            render_sharded(scene, mesh, spp=spp,
                           seed=seed + 1 + i).block_until_ready()
        return (time.perf_counter() - t0) / reps

    t1, tn = timed(mesh1), timed(meshN)
    same_host = len({d.process_index for d in jax.devices()[:n]}) == 1 and \
        jax.devices()[0].platform == "cpu"
    eff = t1 / tn if same_host else t1 / (tn * n)
    return {"n_devices": n, "t_1dev_s": round(t1, 4),
            "t_ndev_s": round(tn, 4),
            "efficiency_proxy" if same_host else "efficiency":
                round(eff, 4)}


_DTYPE_BYTES = {"f32": 4, "f64": 8, "f16": 2, "bf16": 2, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def collective_stats(jitted_fn, *args) -> dict:
    """Per-step collective accounting from the COMPILED program: lower
    the jitted function, parse its optimized HLO, and total the bytes
    moved by each collective kind (all-reduce / all-gather /
    reduce-scatter / collective-permute / all-to-all).

    This is the evidence BASELINE.md's >=80%-at->=2-hosts target rests
    on: the forward film psum + the adjoint's gradient psum should be the
    ONLY collectives, and their volume per step is what must ride
    ICI/DCN."""
    import re

    txt = jitted_fn.lower(*args).compile().as_text()
    out: dict = {}
    kinds = ("all-reduce", "all-gather", "reduce-scatter",
             "collective-permute", "all-to-all")
    shape_pat = re.compile(r"(\w+)\[([\d,]*)\](?:\{[\d,]*\})?")
    for line in txt.splitlines():
        if "=" not in line:
            continue
        rhs = line.split("=", 1)[1]
        kind = next((k for k in kinds
                     if re.search(rf"\b{k}(?:-start)?\(", rhs)), None)
        if kind is None:
            continue
        # result shapes sit between '=' and the op name
        head = rhs.split(kind)[0]
        nbytes = 0
        for dt, dims in shape_pat.findall(head):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
        e = out.setdefault(kind, {"ops": 0, "bytes": 0})
        e["ops"] += 1
        e["bytes"] += nbytes
    return out


def make_train_step(scene: Scene, mesh: Mesh, loss_fn, optimizer,
                    spp: int, mode: str = "ad"):
    """Build a jitted distributed inverse-rendering step:
    (params, opt_state, target, seed) -> (params, opt_state, loss).

    The full PRB-style step — forward render, adjoint sweep, parameter
    psum, Adam update — compiles to ONE XLA program on the mesh.
    """
    n_dev = mesh.devices.size
    assert spp % n_dev == 0
    spp_local = spp // n_dev

    local = jax.shard_map(
        partial(_local_pass, spp_local=spp_local, mode=mode),
        mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False)

    def loss_of(params, target, seed):
        sc = apply_params(scene, params)
        img = film_mod.develop(local(sc, seed))
        return loss_fn(img, target)

    @jax.jit
    def step(params, opt_state, target, seed):
        loss, grads = jax.value_and_grad(loss_of)(params, target, seed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
