"""Pallas TPU kernel for the ray-triangle hot path.

Replaces the reference's Embree/OptiX intersection backends
(scene_embree.inl / scene_optix.inl) for the common case: every benchmark
scene's geometry (cornell ~36 tris, liver meshes 2.4-4.8k tris) fits in
VMEM, so the speed-of-light strategy on a TPU is a *dense* sweep: one
program per ray tile, `fori_loop` over triangle chunks, Moeller-Trumbore
evaluated on (TILE_T, TILE_R) VPU tiles with a running closest-hit
reduction — no divergent traversal, no gathers, all operands in VMEM.

Measured on v5e vs the XLA scan brute force (1M rays x 2.4k tris):
scan 753 ms -> this kernel ~50 ms (see bench notes in accel/intersect.py).

Layout contract:
  rays   (8, N)  f32 rows: ox oy oz dx dy dz maxt (row 7 unused), N padded
                 to TILE_R; padded lanes have maxt = -1 (never hit).
  tris   (Tpad, 12) f32 cols: p0 xyz, e1 xyz, e2 xyz (3 pad); padded rows
                 are fully zero => det == 0 => rejected.
  out    (8, N)  f32 rows: t, prim (exact float int; -1 = miss), u, v.

Gradients: intersection ids/distances are sampling geometry, detached under
PRB just like sampled medium distances (media/dispatch.py) — the wrapper is
a custom_vjp with zero cotangents into (rays, tris).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 512       # rays per program (lane-major, 4 x 128)
TILE_T = 128       # triangles per inner chunk (sublane-major)
MAX_VMEM_TRIS = 65536  # 64k tris x 12 x 4B = 3 MB triangle buffer

_INF = float("inf")


def _intersect_kernel(rays_ref, tris_ref, out_ref):
    n_chunks = tris_ref.shape[0] // TILE_T

    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    maxt = rays_ref[6:7, :]

    def chunk_body(c, carry):
        best_t, best_prim, best_u, best_v = carry
        base = c * TILE_T
        p0x = tris_ref[pl.ds(base, TILE_T), 0:1]
        p0y = tris_ref[pl.ds(base, TILE_T), 1:2]
        p0z = tris_ref[pl.ds(base, TILE_T), 2:3]
        e1x = tris_ref[pl.ds(base, TILE_T), 3:4]
        e1y = tris_ref[pl.ds(base, TILE_T), 4:5]
        e1z = tris_ref[pl.ds(base, TILE_T), 5:6]
        e2x = tris_ref[pl.ds(base, TILE_T), 6:7]
        e2y = tris_ref[pl.ds(base, TILE_T), 7:8]
        e2z = tris_ref[pl.ds(base, TILE_T), 8:9]

        # Moeller-Trumbore on the (TILE_T, TILE_R) outer block:
        # pvec = d x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12,
                            1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
        # tvec = o - p0
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (t > 0.0) & (t < best_t) & (t < maxt)
        t_m = jnp.where(hit, t, _INF)
        t_min = jnp.min(t_m, axis=0, keepdims=True)           # (1, R)
        sel = t_m == t_min                                     # ties ok
        tri_ids = (base + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_T, TILE_R), 0)).astype(jnp.float32)
        got = t_min < best_t
        prim_min = jnp.max(jnp.where(sel, tri_ids, -1.0), axis=0,
                           keepdims=True)
        u_min = jnp.max(jnp.where(sel, u, -_INF), axis=0, keepdims=True)
        v_min = jnp.max(jnp.where(sel, v, -_INF), axis=0, keepdims=True)
        best_prim = jnp.where(got, prim_min, best_prim)
        best_u = jnp.where(got, u_min, best_u)
        best_v = jnp.where(got, v_min, best_v)
        best_t = jnp.where(got, t_min, best_t)
        return best_t, best_prim, best_u, best_v

    init = (jnp.full((1, TILE_R), _INF),
            jnp.full((1, TILE_R), -1.0),
            jnp.zeros((1, TILE_R)),
            jnp.zeros((1, TILE_R)))
    best_t, best_prim, best_u, best_v = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)

    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = best_prim
    out_ref[2:3, :] = best_u
    out_ref[3:4, :] = best_v
    out_ref[4:8, :] = jnp.zeros((4, TILE_R))


@partial(jax.jit, static_argnames=("n_tiles",))
def _call_kernel(rays, tris, n_tiles):
    return pl.pallas_call(
        _intersect_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full tri buffer
        ],
        out_specs=pl.BlockSpec((8, TILE_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(rays.shape, jnp.float32),
    )(rays, tris)


@jax.custom_vjp
def _intersect_nograd(rays, tris):
    n_tiles = rays.shape[1] // TILE_R
    return _call_kernel(rays, tris, n_tiles)


def _intersect_fwd(rays, tris):
    return _intersect_nograd(rays, tris), None


def _intersect_bwd(_, g):
    # Sampled intersection geometry is detached (PRB detached sampling);
    # parameter gradients flow through BSDF/emitter/medium evals instead.
    return None, None


_intersect_nograd.defvjp(_intersect_fwd, _intersect_bwd)


def pack_tris(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray) -> np.ndarray:
    """Host-side packing of the (Tpad, 12) VMEM triangle buffer."""
    T = len(v0)
    tpad = max(((T + TILE_T - 1) // TILE_T) * TILE_T, TILE_T)
    buf = np.zeros((tpad, 12), np.float32)
    buf[:T, 0:3] = v0
    buf[:T, 3:6] = v1 - v0
    buf[:T, 6:9] = v2 - v0
    return buf


def intersect_tris(tri_buf: jax.Array, o: jax.Array, d: jax.Array,
                   maxt: jax.Array, t_best: jax.Array):
    """Closest-hit over the packed triangle buffer.

    Returns (t, prim, u, v) with prim == -1 for misses; hits farther than
    `t_best` are rejected (for combining with other geometry)."""
    n = o.shape[0]
    npad = max(((n + TILE_R - 1) // TILE_R) * TILE_R, TILE_R)
    lim = jnp.minimum(jnp.where(jnp.isfinite(maxt), maxt, _INF), t_best)
    mat = jnp.concatenate([o.T, d.T, lim[None], jnp.zeros((1, n))], 0)
    rays = jnp.pad(mat, ((0, 0), (0, npad - n)))

    out = _intersect_nograd(rays, tri_buf)
    t = out[0, :n]
    prim = out[1, :n].astype(jnp.int32)
    u = out[2, :n]
    v = out[3, :n]
    miss = prim < 0
    return jnp.where(miss, _INF, t), prim, \
        jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v)
