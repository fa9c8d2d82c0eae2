"""Benchmark: paths/s/chip on the reference's own headline scene.

Primary metric (BASELINE.json): rays/s/chip forward+backward on
Liver-SingleMesh.  The reference renders this scene at 1920x1080 @ 256 spp
(12 bounces, biovolpath) in 2.6806 min on the author's workstation
(scenes/Liver-SingleMesh/mitsuba3/time.txt) = 3.30 M primary paths/s.
vs_baseline = our primal paths/s over that number.

The fwd+bwd number renders the same scene differentiably (gradients w.r.t.
the liver medium coefficients) through the PRB-style adjoint.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SCENE = "/root/reference/scenes/Liver-SingleMesh/mitsuba3/scene.xml"
W, H, SPP = 428, 240, 64          # same aspect/content as 1920x1080
BASELINE_PATHS_PER_S = 1920 * 1080 * 256 / (2.6806 * 60)


def _tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Probe TPU initialization in a subprocess — with the axon tunnel
    down, jax.devices() hangs for many minutes in-process and would turn
    the whole bench into a timeout instead of a result."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    platform = "tpu"
    global W, H, SPP
    if not _tpu_reachable():
        # CPU fallback: tiny config, honestly flagged.  vs_baseline is NOT
        # comparable (1 CPU core vs the reference workstation); the
        # fwdbwd/primal cost ratio is the meaningful number here.
        platform = "cpu-fallback"
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        # per-host cache dir: XLA:CPU AOT entries embed the compile
        # host's features and this image migrates (see tests/conftest.py)
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                fp = next((hashlib.sha1(ln.encode()).hexdigest()[:12]
                           for ln in f if ln.startswith("flags")), "generic")
        except OSError:
            fp = "generic"
        _jax.config.update("jax_compilation_cache_dir",
                           f"/tmp/lr_cpu_jax_cache_{fp}")
        W, H, SPP = 160, 90, 8

    import liverrenderer_tpu as lr

    scene = lr.load_file(SCENE, res_width=W, res_height=H, spp=SPP)
    n_paths = W * H * SPP

    # ---- primal ----
    # TPU wall clock varies +-20% across processes AND drifts within one
    # (tunnel/thermal, CLAUDE.md); report the BEST of several reps — the
    # repeatable hardware capability — and keep the mean in extra
    img = lr.render(scene, spp=SPP, seed=0)
    np.asarray(img)                       # force through the device fence
    reps = 5
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        img = lr.render(scene, spp=SPP, seed=i + 1)
        np.asarray(img)
        times.append(time.perf_counter() - t0)
    dt_primal = min(times)
    dt_primal_avg = sum(times) / len(times)
    primal_rate = n_paths / dt_primal

    # ---- forward+backward (gradient w.r.t. medium coefficients) ----
    spp_b = 16
    params = {"media.params": scene.media.params}

    def loss_fn(im):
        return jnp.mean(im)

    loss, grads, _ = lr.render_grad(scene, params, loss_fn, spp=spp_b,
                                    seed=0)
    np.asarray(grads["media.params"])
    gtimes = []
    for i in range(reps):
        t0 = time.perf_counter()
        loss, grads, _ = lr.render_grad(scene, params, loss_fn, spp=spp_b,
                                        seed=i + 1)
        np.asarray(grads["media.params"])
        gtimes.append(time.perf_counter() - t0)
    dt_fwdbwd = min(gtimes)
    fwdbwd_rate = W * H * spp_b / dt_fwdbwd

    extra = {
        "config": f"{W}x{H}@{SPP}spp biovolpath d12",
        "platform": platform,
        "primal_s": round(dt_primal, 3),
        "primal_s_mean": round(dt_primal_avg, 3),
        "fwdbwd_paths_per_s": round(fwdbwd_rate),
        "fwdbwd_s": round(dt_fwdbwd, 3),
        "fwdbwd_over_primal_cost":
            round(dt_fwdbwd / max(dt_primal, 1e-9)
                  * (SPP / spp_b), 3),
        "grad_finite": bool(np.isfinite(
            np.asarray(grads["media.params"])).all()),
        "baseline_paths_per_s": round(BASELINE_PATHS_PER_S),
    }

    # ---- BASELINE config: cornell_box 256^2 @ 64 spp through the surface-
    # path regen wavefront (round 4: path.cpp:194-345 now takes the fast
    # path), plus the sharded code-path check: render_regen_sharded on a
    # 1-device mesh runs the IDENTICAL tile program + a trivial psum, so
    # mesh sharding costs nothing on one chip ----
    if platform == "tpu":
        d = lr.cornell_box()
        d["integrator"] = {"type": "path", "max_depth": 8}
        d["sensor"]["film"] = {"type": "hdrfilm", "width": 256,
                               "height": 256, "rfilter": {"type": "box"}}
        cb = lr.load_dict(d)
        from liverrenderer_tpu.integrators.regen import regen_applicable
        assert regen_applicable(cb, "primal")
        img = lr.render(cb, spp=64, seed=0)
        np.asarray(img)
        t0 = time.perf_counter()
        for i in range(reps):
            np.asarray(lr.render(cb, spp=64, seed=i + 1))
        dt_cb = (time.perf_counter() - t0) / reps
        extra["cornell_256_64spp_path_regen"] = {
            "wall_s": round(dt_cb, 3),
            "paths_per_s": round(256 * 256 * 64 / dt_cb),
        }

        from liverrenderer_tpu.parallel.mesh import (make_mesh,
                                                     render_regen_sharded)
        mesh1 = make_mesh(1)
        acc = render_regen_sharded(scene, mesh1, spp=SPP, seed=0)
        np.asarray(acc)
        t0 = time.perf_counter()
        for i in range(reps):
            np.asarray(render_regen_sharded(scene, mesh1, spp=SPP,
                                            seed=i + 1))
        dt_mesh = (time.perf_counter() - t0) / reps
        extra["mesh1_regen_sharded"] = {
            "wall_s": round(dt_mesh, 3),
            "paths_per_s": round(n_paths / dt_mesh),
            "overhead_vs_single": round(dt_mesh / dt_primal - 1.0, 4),
        }

    # ---- the literal reference config: 1920x1080 @ 256 spp primal, and
    # fwd+bwd at 1080p through the tiled replay adjoint (VERDICT r2 #1/#7;
    # reference wall time 2.6806 min, time.txt) ----
    if platform == "tpu":
        sc_hd = lr.load_file(SCENE, res_width=1920, res_height=1080,
                             spp=256)
        img = lr.render(sc_hd, spp=256, seed=0)      # compile
        np.asarray(img)
        hd_times = []
        for i in (1, 2):
            t0 = time.perf_counter()
            np.asarray(lr.render(sc_hd, spp=256, seed=i))
            hd_times.append(time.perf_counter() - t0)
        dt_hd = min(hd_times)
        extra["hd_1080p_256spp"] = {
            "wall_s": round(dt_hd, 2),
            "paths_per_s": round(1920 * 1080 * 256 / dt_hd),
            "reference_wall_s": round(2.6806 * 60, 2),
            "speedup_vs_reference": round(2.6806 * 60 / dt_hd, 3),
        }
        hd_params = {"media.params": sc_hd.media.params}
        # same-process 16-spp primal for the cost ratio: TPU wall clock
        # varies +-20% ACROSS processes (CLAUDE.md), so dividing by the
        # 256-spp wall measured under different thermal/tunnel conditions
        # overstated the adjoint ratio by up to ~0.6x in round 3
        np.asarray(lr.render(sc_hd, spp=16, seed=0))
        lhd, ghd, _ = lr.render_grad(sc_hd, hd_params, loss_fn, spp=16,
                                     seed=0)
        np.asarray(ghd["media.params"])
        # best-of-2 for BOTH numerator and denominator: a single rep of
        # each swings the ratio +-10% with tunnel/thermal drift
        t16, tg = [], []
        for i in (1, 2):
            t0 = time.perf_counter()
            np.asarray(lr.render(sc_hd, spp=16, seed=i))
            t16.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            lhd, ghd, _ = lr.render_grad(sc_hd, hd_params, loss_fn, spp=16,
                                         seed=i)
            np.asarray(ghd["media.params"])
            tg.append(time.perf_counter() - t0)
        dt_hd16 = min(t16)
        dt_hdg = min(tg)
        extra["hd_1080p_fwdbwd_16spp"] = {
            "wall_s": round(dt_hdg, 2),
            "fwdbwd_paths_per_s": round(1920 * 1080 * 16 / dt_hdg),
            "primal_16spp_wall_s": round(dt_hd16, 2),
            "fwdbwd_over_primal_cost": round(dt_hdg / dt_hd16, 3),
            "grad_finite": bool(np.isfinite(
                np.asarray(ghd["media.params"])).all()),
        }
    if platform != "tpu":
        extra["note"] = ("TPU tunnel unreachable; CPU fallback at tiny "
                         "size — vs_baseline NOT comparable, the "
                         "fwdbwd/primal cost ratio is the usable number")
        # the axon tunnel drops for hours at a time; if a hardware
        # measurement of the CURRENT code exists, carry it so the round
        # artifact still records the chip numbers
        import os
        snap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "bench_r5_tpu.json")
        if os.path.exists(snap):
            with open(snap) as f:
                extra["last_tpu_measurement"] = json.load(f)
    print(json.dumps({
        "metric": "Liver-SingleMesh paths/s/chip (primal; fwd+bwd in extra)",
        "value": round(primal_rate),
        "unit": "paths/s",
        "vs_baseline": round(primal_rate / BASELINE_PATHS_PER_S, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
