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
                 L_out          <- dL/dI[pixel]
                 throughput_out <- dL/dI[pixel] * suffix
                 env_weight_out <- dL/dI[pixel] * E(ray_d)   (detached E)

Wavefront utilization in the adjoint therefore matches the primal's ~97%
instead of the scan's ~1/max_depth, and only ONE forward + ONE replay run
per gradient (the scan path pays primal + per-pass fwd + remat bwd).
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import film as film_mod
from ..scene.ir import FILTER_BOX, Scene
from ..util import apply_params
from . import volpath as vp
from .regen import (REGEN_WAVEFRONT, TILE_PIX, _make_lanes, _select_state,
                    eval_environment, _render_regen_tile, regen_applicable)

Array = jax.Array

# pool residual cap: paths * 12 bytes; 32M paths = 384 MB HBM
MAX_STORE_PATHS = 32 * (1 << 20)


def replay_applicable(scene: Scene, params: Dict[str, Array], spp: int) \
        -> bool:
    """The replay adjoint covers the regen-able configurations with a box
    filter and single-tile films; sensor-parameter gradients are not
    propagated (fall back to the scan adjoint for those)."""
    n_pix = scene.film_w * scene.film_h
    return (regen_applicable(scene, "primal")
            and scene.rfilter == FILTER_BOX
            and n_pix <= TILE_PIX
            and n_pix * spp <= MAX_STORE_PATHS
            and not any(k.startswith("sensor") for k in params))


def _zero_cotangent(x):
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _detach(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


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
    grads = _replay_walk(scene, params, seed, spp, g_film, pool_L)
    scene_ct = jax.tree_util.tree_map(_zero_cotangent, scene)
    seed_ct = _zero_cotangent(seed)
    return scene_ct, grads, seed_ct


def _replay_walk(scene: Scene, params, seed, spp: int, g_film, pool_L):
    """The backward regen walk: replays the forward trajectories (same
    counter RNG) and accumulates parameter VJPs bounce by bounce."""
    sc_det = _detach(apply_params(scene, _detach(params)))
    w, h = scene.film_w, scene.film_h
    n_pix = w * h
    budget = n_pix * spp
    W = min(REGEN_WAVEFRONT, budget)

    # per-lane adjoint sources, fetched at lane birth
    g_rgb = g_film.reshape(n_pix, 4)[:, 0:3]

    def seed_aux(ids):
        pix = (ids % jnp.uint32(n_pix)).astype(jnp.int32)
        return g_rgb[pix], pool_L[ids]

    st, pos = _make_lanes(sc_det, jnp.arange(W, dtype=jnp.uint32), seed,
                          spp, 0, n_pix)
    delta, Ltot = seed_aux(jnp.arange(W, dtype=jnp.uint32))
    g0 = jax.tree_util.tree_map(jnp.zeros_like, params)

    refills = (budget + W - 1) // W
    lane_cap = scene.max_depth * 4
    max_iters = lane_cap * (refills + 2)

    def cond(c):
        st, delta, Ltot, age, next_s, it, g = c
        return jnp.any(st.active) & (it < max_iters)

    def body(c):
        st, delta, Ltot, age, next_s, it, g = c
        was_active = st.active
        st_det = _detach(st)

        def local(p):
            sc = apply_params(scene, p)
            st2 = vp.bounce(sc, st_det, True)
            # env radiance along the post-bounce ray: for a lane escaping
            # at THIS bounce ray_d is the escaping direction (bounce leaves
            # it unchanged), so E both closes the suffix identity and —
            # via its own cotangent at lane death — carries the deferred
            # env-parameter gradient the primal loop's post-loop env
            # evaluation would otherwise hide from the per-bounce VJP
            E = eval_environment(sc, st2.ray_d)
            return (st2.L, st2.throughput, st2.env_weight, E), st2

        (L2, tp2, ew2, E), vjp_fn, st2 = jax.vjp(local, params, has_aux=True)

        L2d = jax.lax.stop_gradient(L2)
        tp2d = jax.lax.stop_gradient(tp2)
        ew2d = jax.lax.stop_gradient(ew2)
        E_det = jax.lax.stop_gradient(E)
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
        (g_p,) = vjp_fn((jnp.where(msk, delta, 0.0),
                         jnp.where(msk, delta * suffix, 0.0),
                         jnp.where(msk, delta * E_det, 0.0),
                         jnp.where(died[:, None], delta * ew2d, 0.0)))
        g = jax.tree_util.tree_map(jnp.add, g, g_p)

        st = st2.replace(active=still)
        age = age2

        ranks = jnp.cumsum(died.astype(jnp.uint32)) - 1
        new_ids = next_s + ranks
        take = died & (new_ids < budget)
        safe_ids = jnp.where(take, new_ids, 0)
        new_st, _ = _make_lanes(sc_det, safe_ids, seed, spp, 0, n_pix)
        st = _select_state(take, new_st, st)
        nd, nL = seed_aux(safe_ids)
        delta = jnp.where(take[:, None], nd, delta)
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


def render_grad_replay(scene: Scene, params, loss_fn, spp: int = 16,
                       seed: int = 0):
    """(loss, grads, image) through the replay adjoint."""
    return _grad_replay_jit(scene, params, seed, spp, loss_fn)
