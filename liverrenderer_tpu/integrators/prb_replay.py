"""PRB replay adjoint: gradient rendering at ~2-3x primal cost.

TPU-native equivalent of the reference's radiative-backprop two-pass replay
(python/ad/integrators/common.py:625-783 RBIntegrator render_backward +
prb.py/prbvolpath.py sample(mode=backward)): instead of differentiating a
fixed-width `lax.scan` (3 forward-equivalents per pass and zero lane
compaction — round-1's 6x fwd+bwd gap), the gradient is a `jax.custom_vjp`
around the *regenerating* wavefront render:

  forward  — the stock regen render (integrators/regen.py), additionally
             storing every finished path's radiance `L_total` into a pool
             indexed by sample id (the counter-based RNG makes the walk
             exactly replayable, core/rng.py).
  backward — ONE more regen walk with the same seed.  Each bounce is
             recomputed inside a local `jax.vjp` whose input state is
             detached, so the VJP captures exactly the bounce-local
             parameter dependence; the chain-rule factor for everything
             downstream of the bounce is supplied analytically as the
             cotangent on the outgoing throughput:

                 suffix_{k+1} = (L_total - L_{k+1} - env_w_{k+1} * E)
                                / throughput_{k+1}

             (the radiative-backprop identity: d/dtheta of the remaining
             path contribution = suffix * d(throughput)/dtheta, because
             sampling densities are detached).  Cotangents:
                 L_out          <- delta (the path's filter-weighted dL/dI)
                 throughput_out <- delta * suffix
                 env_weight_out <- delta * E(ray_d)   (detached E)

Wavefront utilization in the adjoint therefore matches the primal's ~97%
instead of the scan's ~1/max_depth, and only ONE forward + ONE replay run
per gradient (the scan path pays primal + per-pass fwd + remat bwd).

Coverage (round-3): the adjoint runs at ANY film size, box or tent filter,
and any spp — matching RBIntegrator's "works at every config" contract
(common.py:625-783).  Films past one regen tile, or sample budgets past
the path-pool cap, switch to the TILED schedule: one extra primal render
produces the loss image, then each (pixel-tile, spp-chunk) pair replays
independently (forward-with-storage + backward walk), the counter RNG
guaranteeing every partition walks the identical paths.  Per-path filter
cotangents (box: one tap, tent: the 2x2 filter-weighted neighborhood of
the splat, regen.py) are precomputed into a pool so the walk pays one
gather per lane rebirth regardless of filter support.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import film as film_mod
from ..scene.ir import FILTER_TENT, Scene
from ..util import apply_params
from . import regen as regen_mod
from .regen import (REGEN_WAVEFRONT, _make_lanes, _select_state,
                    eval_environment, lane_pos, _render_regen_tile,
                    regen_applicable, render_regen)

Array = jax.Array

# per-walk path-pool cap.  Chosen so the packed pool (regen._POOL_PACK
# samples/row) stays <= 2^18 rows — the XLA scatter kernel is ~3x slower
# into larger tables (measured v5e, prof round-3), so the tiled schedule
# spp-chunks budgets past this instead of growing the pool.
MAX_STORE_PATHS = 8 * (1 << 18)

# parameter keys whose leaves can reach eval_environment: when none is
# being differentiated the backward walk evaluates env radiance DETACHED
# outside the per-bounce VJP, keeping the (expensive) envmap quad gather
# out of the differentiated trace
_ENV_KEYS = ("emitters.params", "textures.data", "textures.bitmaps")


def replay_applicable(scene: Scene, params: Dict[str, Array], spp: int) \
        -> bool:
    """The replay adjoint covers every regen-able configuration (volpath
    AND surface-path families, box/tent filter, any film size / spp —
    large films and sample budgets run the tiled schedule; round 5:
    SPECTRAL scenes too — the pool stores the wavelength-packet radiance
    and the walk converts the RGB loss cotangent to packet space via the
    linear CIE-estimate weights).  Sensor-parameter gradients are not
    propagated, and SSS scenes keep the scan adjoint (the VAE event's
    sampling geometry is not validated under the per-bounce VJP yet) —
    both fall back."""
    return (regen_applicable(scene, "primal")
            and not (scene.ssub.enabled
                     and scene.integrator in regen_mod._SURFACE)
            and not any(k.startswith("sensor") for k in params))


def _zero_cotangent(x):
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _detach(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def _delta_from_pos(scene: Scene, g_rgb: Array, pos: Array) -> Array:
    """Per-path loss cotangent from its film position: the adjoint of the
    regen splat (regen.py _render_regen_tile).  g_rgb is d loss / d
    accumulated-rgb per pixel, (film_w*film_h, 3).  Lanes of a padded
    last tile (pos_y >= film_h, mirroring the splat's in_range mask) get
    zero."""
    w, h = scene.film_w, scene.film_h
    in_range = pos[:, 1] < h
    if scene.rfilter == FILTER_TENT:
        cx, cy = pos[:, 0], pos[:, 1]
        ix0 = jnp.floor(cx - 0.5).astype(jnp.int32)
        iy0 = jnp.floor(cy - 0.5).astype(jnp.int32)
        d = jnp.zeros(pos.shape[:-1] + (3,))
        for dy in (0, 1):
            for dx in (0, 1):
                ix = ix0 + dx
                iy = iy0 + dy
                fw = jnp.maximum(1.0 - jnp.abs(cx - (ix + 0.5)), 0.0) \
                    * jnp.maximum(1.0 - jnp.abs(cy - (iy + 0.5)), 0.0)
                ok = in_range & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
                d = d + jnp.where(ok[:, None], g_rgb[idx] * fw[:, None], 0.0)
        return d
    px = jnp.clip(pos[:, 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(pos[:, 1].astype(jnp.int32), 0, h - 1)
    return jnp.where(in_range[:, None], g_rgb[py * w + px], 0.0)


def _aux_pool(scene: Scene, g_rgb, pool_L, seed, spp_total: int, pix0,
              tile_pix, samp0, budget: int) -> Array:
    """Per-sample [delta_rgb (filter-adjoint loss cotangent) | L_total]
    rows, (budget, 3 + C) where C = pool channels (3 RGB, N_SPEC
    spectral), precomputed in one batched sweep.  Merging both tables
    means the backward walk's lane-rebirth path costs ONE pool gather —
    gathers are ~16 ns/lane on v5e, one per iteration adds ~20% to the
    walk."""
    C = regen_mod.pool_channels(scene)
    CH = min(1 << 20, budget)
    n_chunks = (budget + CH - 1) // CH

    def body(i, pool):
        ids = (i * CH + jnp.arange(CH, dtype=jnp.uint32)).astype(jnp.uint32)
        pos = lane_pos(scene, ids, seed, spp_total, pix0, tile_pix, samp0)
        d = _delta_from_pos(scene, g_rgb, pos)
        d = jnp.where((ids < budget)[:, None], d, 0.0)
        row = jnp.concatenate(
            [d, jax.lax.dynamic_slice(pool_L, (i * CH, 0), (CH, C))], -1)
        return jax.lax.dynamic_update_slice(pool, row, (i * CH, 0))

    if budget % CH:                      # pad so the L slice stays in step
        pool_L = jnp.concatenate(
            [pool_L, jnp.zeros((n_chunks * CH - budget, C))], 0)
    pool = jnp.zeros((n_chunks * CH, 3 + C))
    pool = jax.lax.fori_loop(0, n_chunks, body, pool)
    return pool[:budget]


# ---------------------------------------------------------------------------
# single-walk schedule (film fits one regen tile, budget fits the pool):
# custom_vjp whose forward IS the loss-primal render, storing the path pool
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _render_acc(scene: Scene, params: Dict[str, Array], seed, spp: int):
    sc = apply_params(scene, params)
    film = _render_regen_tile(sc, seed, spp, 0,
                              sc.film_w * sc.film_h)
    return film


def _render_acc_fwd(scene, params, seed, spp):
    sc = apply_params(scene, params)
    film, pool_L = _render_regen_tile(sc, seed, spp, 0,
                                      sc.film_w * sc.film_h,
                                      store_paths=True)
    return film, (scene, params, seed, pool_L)


def _render_acc_bwd(spp, res, g_film):
    scene, params, seed, pool_L = res
    n_pix = scene.film_w * scene.film_h
    g_rgb = g_film.reshape(n_pix, 4)[:, 0:3]
    aux = _aux_pool(scene, g_rgb, pool_L, seed, spp, 0, n_pix, 0,
                    n_pix * spp)
    grads = _replay_walk(scene, params, seed, spp, aux, 0, n_pix, 0, spp)
    scene_ct = jax.tree_util.tree_map(_zero_cotangent, scene)
    seed_ct = _zero_cotangent(seed)
    return scene_ct, grads, seed_ct


def _replay_walk(scene: Scene, params, seed, spp_total: int, aux_pool,
                 pix0, tile_pix: int, samp0, spp_chunk: int):
    """The backward regen walk over one (pixel-tile, spp-chunk): replays
    the forward trajectories (same counter RNG) and accumulates parameter
    VJPs bounce by bounce."""
    sc_det = _detach(apply_params(scene, _detach(params)))
    budget = tile_pix * spp_chunk
    W = min(REGEN_WAVEFRONT, budget)
    fam = regen_mod._family(scene)
    C = regen_mod.pool_channels(scene)
    # the surface family folds env radiance into L inside the bounce (its
    # state has no env_weight), so env-parameter gradients arrive through
    # the L cotangent and no deferred-env machinery applies
    has_envw = scene.integrator not in regen_mod._SURFACE
    diff_env = has_envw and any(k in _ENV_KEYS for k in params)

    def seed_aux(ids):
        rows = aux_pool[ids]             # ONE gather: [delta_rgb | Ltot]
        return rows[:, 0:3], rows[:, 3:3 + C]

    def to_packet_ct(delta_rgb, lam):
        """RGB loss cotangent -> wavelength-packet cotangent through the
        linear lane-death CIE conversion (spectral variant); identity in
        RGB.  Computed once per lane life (the packet depends only on
        the lane's hero wavelengths)."""
        if not scene.spectral:
            return delta_rgb
        from ..core import spectrum as spec
        Wk = spec.rgb_estimate_weights(lam)             # (N, C, 3)
        return jnp.einsum("nkj,nj->nk", Wk, delta_rgb)

    def lift_env(E, lam):
        if not scene.spectral:
            return E
        from ..core import spectrum as spec
        return spec.smits_upsample_illum(E, lam)

    st, pos = _make_lanes(sc_det, jnp.arange(W, dtype=jnp.uint32), seed,
                          spp_total, pix0, tile_pix, samp0)
    delta_rgb0, Ltot = seed_aux(jnp.arange(W, dtype=jnp.uint32))
    delta = to_packet_ct(delta_rgb0, st.lam if scene.spectral else None)
    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    refills = (budget + W - 1) // W
    lane_cap = regen_mod._lane_cap(scene)
    max_iters = lane_cap * (refills + 2)

    def cond(c):
        st, delta, Ltot, age, next_s, it, g = c
        return jnp.any(st.active) & (it < max_iters)

    def body(c):
        st, delta, Ltot, age, next_s, it, g = c
        was_active = st.active
        st_det = _detach(st)

        if not has_envw:
            # surface family: env contribution lands in L inside bounce,
            # so the L cotangent already carries env-parameter gradients
            def local(p):
                sc = apply_params(scene, p)
                st2 = fam.bounce(sc, st_det, True)
                return (st2.L, st2.throughput), st2
            (L2, tp2), vjp_fn, st2 = jax.vjp(local, params, has_aux=True)
            ew2d = E_det = jnp.zeros((W, C))
        elif diff_env:
            def local(p):
                sc = apply_params(scene, p)
                st2 = fam.bounce(sc, st_det, True)
                # env radiance along the post-bounce ray: for a lane
                # escaping at THIS bounce ray_d is the escaping direction
                # (bounce leaves it unchanged), so E both closes the
                # suffix identity and — via its own cotangent at lane
                # death — carries the deferred env-parameter gradient the
                # primal loop's post-loop env evaluation would otherwise
                # hide from the per-bounce VJP
                E = lift_env(eval_environment(sc, st2.ray_d), st2.lam)
                return (st2.L, st2.throughput, st2.env_weight, E), st2
            (L2, tp2, ew2, E), vjp_fn, st2 = jax.vjp(local, params,
                                                     has_aux=True)
            E_det = jax.lax.stop_gradient(E)
            ew2d = jax.lax.stop_gradient(ew2)
        else:
            def local(p):
                sc = apply_params(scene, p)
                st2 = fam.bounce(sc, st_det, True)
                return (st2.L, st2.throughput, st2.env_weight), st2
            (L2, tp2, ew2), vjp_fn, st2 = jax.vjp(local, params,
                                                  has_aux=True)
            # no env parameter is differentiated: evaluate the (envmap
            # quad gather) radiance OUTSIDE the VJP, detached
            E_det = lift_env(eval_environment(sc_det, st2.ray_d),
                             st2.lam if scene.spectral else None)
            ew2d = jax.lax.stop_gradient(ew2)

        L2d = jax.lax.stop_gradient(L2)
        tp2d = jax.lax.stop_gradient(tp2)
        R2 = L2d + ew2d * E_det
        suffix = jnp.where(jnp.abs(tp2d) > 1e-12,
                           (Ltot - R2) / jnp.where(jnp.abs(tp2d) > 1e-12,
                                                   tp2d, 1.0), 0.0)
        # suffix radiance is non-negative; clamp fp cancellation noise
        suffix = jnp.clip(suffix, 0.0, 1e6)

        age2 = age + 1
        still = st2.active & (age2 < lane_cap)
        died = was_active & ~still

        msk = was_active[:, None]
        cts = (jnp.where(msk, delta, 0.0),
               jnp.where(msk, delta * suffix, 0.0))
        if has_envw:
            cts = cts + (jnp.where(msk, delta * E_det, 0.0),)
        if diff_env:
            cts = cts + (jnp.where(died[:, None], delta * ew2d, 0.0),)
        (g_p,) = vjp_fn(cts)
        g = jax.tree_util.tree_map(jnp.add, g, g_p)

        st = st2.replace(active=still)
        age = age2

        ranks = jnp.cumsum(died.astype(jnp.uint32)) - 1
        new_ids = next_s + ranks
        take = died & (new_ids < budget)
        safe_ids = jnp.where(take, new_ids, 0)
        new_st, _ = _make_lanes(sc_det, safe_ids, seed, spp_total, pix0,
                                tile_pix, samp0)
        st = _select_state(take, new_st, st)
        nd, nL = seed_aux(safe_ids)
        ndc = to_packet_ct(nd, new_st.lam if scene.spectral else None)
        delta = jnp.where(take[:, None], ndc, delta)
        Ltot = jnp.where(take[:, None], nL, Ltot)
        age = jnp.where(take, 0, age)
        next_s = jnp.minimum(next_s + jnp.sum(died.astype(jnp.uint32)),
                             jnp.uint32(budget))
        return st, delta, Ltot, age, next_s, it + 1, g

    init = (st, delta, Ltot, jnp.zeros((W,), jnp.int32), jnp.uint32(W),
            jnp.int32(0), g0)
    out = jax.lax.while_loop(cond, body, init)
    return out[-1]


_render_acc.defvjp(_render_acc_fwd, _render_acc_bwd)


@partial(jax.jit, static_argnames=("spp", "loss_fn"))
def _grad_replay_jit(scene: Scene, params, seed, spp: int, loss_fn):
    def f(p):
        acc = _render_acc(scene, p, seed, spp)
        image = film_mod.develop(acc.reshape(scene.film_h, scene.film_w, 4))
        return loss_fn(image), image

    (loss, image), grads = jax.value_and_grad(f, has_aux=True)(params)
    return loss, grads, image


# ---------------------------------------------------------------------------
# tiled schedule (1080p-class films / huge sample budgets): one primal
# render for the loss image, then independent (tile, spp-chunk) replays
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("loss_fn",))
def _loss_from_acc_jit(acc, loss_fn):
    """loss + d loss / d accumulated-rgb from a developed accumulator."""
    image = film_mod.develop(acc)
    loss, dL_dI = jax.value_and_grad(loss_fn)(image)
    wch = acc[..., 3:4]
    g_rgb = jnp.where(wch > 0, dL_dI / jnp.maximum(wch, 1e-12), 0.0)
    return loss, image, g_rgb.reshape(-1, 3)


def _tiled_loss(scene: Scene, params, seed, spp: int, loss_fn):
    """Primal image (host-scheduled tiled regen — one watchdog-safe device
    execution per partition), loss, and d loss / d accumulated-rgb."""
    sc = apply_params(scene, _detach(params))
    acc = regen_mod.render_regen_host(sc, seed, spp)         # (h, w, 4)
    return _loss_from_acc_jit(acc, loss_fn)


@partial(jax.jit, static_argnames=("spp_total", "spp_chunk", "tile_pix"))
def _tile_fwd_jit(scene_det: Scene, seed, pix0, samp0,
                  spp_total: int, spp_chunk: int, tile_pix: int):
    """One (pixel-tile, spp-chunk) stored forward: the tile's film
    accumulator (feeds the loss image) + its path-radiance pool (feeds the
    walk).  pix0/samp0 are traced so every partition reuses one program."""
    return _render_regen_tile(scene_det, seed, spp_total, pix0, tile_pix,
                              store_paths=True, samp0=samp0,
                              spp_chunk=spp_chunk)


@partial(jax.jit, static_argnames=("spp_total", "spp_chunk", "tile_pix"))
def _tile_walk_jit(scene: Scene, params, seed, g_rgb, pool_L, pix0, samp0,
                   spp_total: int, spp_chunk: int, tile_pix: int):
    """One (pixel-tile, spp-chunk) backward walk over a stored pool."""
    aux = _aux_pool(scene, g_rgb, pool_L, seed, spp_total, pix0, tile_pix,
                    samp0, tile_pix * spp_chunk)
    return _replay_walk(scene, params, seed, spp_total, aux,
                        pix0, tile_pix, samp0, spp_chunk)


@partial(jax.jit, static_argnames=("spp_total", "spp_chunk", "tile_pix"))
def _tile_grad_jit(scene: Scene, params, seed, g_rgb, pix0, samp0,
                   spp_total: int, spp_chunk: int, tile_pix: int):
    """Re-forward + walk in one program — the low-memory schedule for
    budgets whose pools don't all fit on device at once."""
    sc_det = _detach(apply_params(scene, _detach(params)))
    _, pool_L = _render_regen_tile(sc_det, seed, spp_total, pix0, tile_pix,
                                   store_paths=True, samp0=samp0,
                                   spp_chunk=spp_chunk)
    aux = _aux_pool(scene, g_rgb, pool_L, seed, spp_total, pix0, tile_pix,
                    samp0, tile_pix * spp_chunk)
    return _replay_walk(scene, params, seed, spp_total, aux,
                        pix0, tile_pix, samp0, spp_chunk)


# total bytes of retained path pools for the keep-pools tiled schedule
# (1 stored forward + 1 walk, no separate primal).  Past this, fall back
# to primal + per-partition re-forward (2 forwards + 1 walk) — v5e HBM is
# 16 GB and the wavefront working set needs its share.
POOL_BYTES_CAP = 2 << 30


def _pool_spp_cap(scene: Scene, tile_pix: int) -> int:
    """Per-partition spp cap for the stored-path pool.  The packed pool
    (tent filter) is budget-row-limited (MAX_STORE_PATHS keeps the XLA
    scatter in its fast <=2^18-row regime); the FUSED film+pool layout
    (box filter, regen.py) scatters into tile_pix rows regardless of the
    chunk, so only its 16-strata column cap binds — larger chunks mean
    fewer partitions and a proportionally smaller wavefront drain tail
    (measured v5e 1080p@16spp: fwd+bwd 2.95x -> ~2.2x primal)."""
    from ..scene.ir import FILTER_TENT
    if scene.rfilter != FILTER_TENT:
        return 16
    return max(1, MAX_STORE_PATHS // tile_pix)


def _grad_replay_tiled(scene: Scene, params, loss_fn, spp: int, seed):
    w, h = scene.film_w, scene.film_h
    n_pix = w * h
    tile_pix = min(regen_mod.TILE_PIX, n_pix)
    spp_chunk = max(1, min(spp, _pool_spp_cap(scene, tile_pix)))
    while spp % spp_chunk != 0:
        spp_chunk -= 1
    n_tiles = (n_pix + tile_pix - 1) // tile_pix
    n_chunks = spp // spp_chunk
    parts = [(t, c) for t in range(n_tiles) for c in range(n_chunks)]

    keep_pools = n_tiles * tile_pix * spp * 12 <= POOL_BYTES_CAP
    if keep_pools:
        # ---- pooled schedule: the stored forwards ARE the loss primal ----
        # films accumulate ON DEVICE per tile (a host transfer + sync per
        # partition serialized the pipeline — JAX dispatch is async, so
        # keeping everything device-side lets partition k+1 enqueue while
        # k executes); one assembly at the loss
        sc_det = _detach(apply_params(scene, _detach(params)))
        tile_films = [None] * n_tiles
        pools = {}
        for t, c in parts:
            film, pool_L = _tile_fwd_jit(sc_det, seed,
                                         jnp.uint32(t * tile_pix),
                                         jnp.uint32(c * spp_chunk),
                                         spp, spp_chunk, tile_pix)
            tile_films[t] = film if tile_films[t] is None \
                else tile_films[t] + film
            pools[(t, c)] = pool_L
        acc = np.concatenate([np.asarray(f) for f in tile_films])
        loss, image, g_rgb = _loss_from_acc_jit(
            jnp.asarray(acc[:n_pix].reshape(h, w, 4)), loss_fn)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for t, c in parts:
            g = _tile_walk_jit(scene, params, seed, g_rgb,
                               pools.pop((t, c)),
                               jnp.uint32(t * tile_pix),
                               jnp.uint32(c * spp_chunk),
                               spp, spp_chunk, tile_pix)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
        return loss, grads, image

    # ---- low-memory schedule: primal once, re-forward per partition ----
    loss, image, g_rgb = _tiled_loss(scene, params, seed, spp, loss_fn)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    for t, c in parts:
        g = _tile_grad_jit(scene, params, seed, g_rgb,
                           jnp.uint32(t * tile_pix),
                           jnp.uint32(c * spp_chunk),
                           spp, spp_chunk, tile_pix)
        grads = jax.tree_util.tree_map(jnp.add, grads, g)
    return loss, grads, image


def render_grad_replay(scene: Scene, params, loss_fn, spp: int = 16,
                       seed: int = 0):
    """(loss, grads, image) through the replay adjoint.

    Single-walk schedule (custom_vjp, 1 forward + 1 replay) when the film
    fits one regen tile and the budget fits the path pool; tiled schedule
    (1 primal + per-(tile,chunk) forward+replay) otherwise — the replay
    analog of render_regen's tile loop (regen.py:184-200)."""
    n_pix = scene.film_w * scene.film_h
    if n_pix <= regen_mod.TILE_PIX and n_pix * spp <= MAX_STORE_PATHS:
        return _grad_replay_jit(scene, params, seed, spp, loss_fn)
    return _grad_replay_tiled(scene, params, loss_fn, spp, seed)
