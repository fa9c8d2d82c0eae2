"""Counter-based per-lane RNG + independent sampler.

TPU-native replacement for the reference's stateful PCG32 sampler
(reference include/mitsuba/core/random.h, src/samplers/independent.cpp):
a *stateless* counter-based hash (pcg4d family, Jarzynski & Olano 2020) keyed
on (lane, seed, dimension).  Statelessness is the point — the PRB adjoint
pass (integrators/prb.py) replays identical random numbers simply by reusing
the same counters, replacing Dr.Jit's sampler clone/replay machinery
(reference python/ad/integrators/common.py:752-775).

All ops are uint32 VPU arithmetic; no 64-bit state is needed (TPUs lack
native u64).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

_U32 = jnp.uint32


def _pcg4d(v: Array) -> Array:
    """pcg4d hash: (..., 4) uint32 -> (..., 4) uint32."""
    v = v.astype(_U32)
    v = v * _U32(1664525) + _U32(1013904223)
    x, y, z, w = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return jnp.stack([x, y, z, w], -1)


def _to_unit_float(bits: Array) -> Array:
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


@struct.dataclass
class Sampler:
    """Independent sampler state: per-lane (seed, dim-counter).

    seed encodes (pixel/lane id, sample index, global seed); dim is the
    dimension counter advanced by every next_1d/next_2d call so that both
    both the primal and replay passes consume the identical sequence.
    """
    seed: Array   # (N,) uint32
    dim: Array    # (N,) uint32

    def next_1d(self):
        h = _pcg4d(jnp.stack([
            self.seed, self.dim,
            jnp.zeros_like(self.seed), jnp.full_like(self.seed, 0x9E3779B9),
        ], -1))
        u = _to_unit_float(h[..., 0])
        return u, self.replace(dim=self.dim + _U32(1))

    def next_nd(self, k: int):
        """k uniforms per lane in ceil(k/4) hashes -> ((N, k), sampler).
        Separate key stream (z=2) from next_1d (z=0) / next_2d (z=1)."""
        m = (k + 3) // 4
        cols = []
        for j in range(m):
            h = _pcg4d(jnp.stack([
                self.seed, self.dim + _U32(j),
                jnp.full_like(self.seed, 2),
                jnp.full_like(self.seed, 0x9E3779B9),
            ], -1))
            for c in range(4):
                cols.append(_to_unit_float(h[..., c]))
        u = jnp.stack(cols[:k], -1)
        return u, self.replace(dim=self.dim + _U32(k))

    def next_2d(self):
        h = _pcg4d(jnp.stack([
            self.seed, self.dim,
            jnp.ones_like(self.seed), jnp.full_like(self.seed, 0x9E3779B9),
        ], -1))
        u = jnp.stack([_to_unit_float(h[..., 0]), _to_unit_float(h[..., 1])], -1)
        return u, self.replace(dim=self.dim + _U32(2))


def make_sampler(lane_id: Array, sample_idx, seed=0) -> Sampler:
    """Seed a wavefront sampler. lane_id: (N,) int; sample_idx: int or (N,).

    Mirrors Sampler::seed's wavefront seeding (reference sampler.cpp) —
    every (pixel, spp-index, seed) triple gets a decorrelated stream.
    """
    lane = jnp.asarray(lane_id).astype(_U32)
    samp = (jnp.broadcast_to(jnp.asarray(sample_idx), lane.shape)).astype(_U32)
    base = jnp.broadcast_to(jnp.asarray(seed), lane.shape).astype(_U32)
    h = _pcg4d(jnp.stack([lane, samp, base,
                          jnp.full_like(lane, 0x85EBCA6B)], -1))
    return Sampler(seed=h[..., 0], dim=jnp.zeros_like(lane))


def hash_u32(*parts) -> Array:
    """General-purpose uint32 hash of up-to-4 integer arrays (broadcast)."""
    arrs = [jnp.asarray(p).astype(_U32) for p in parts]
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    arrs = [jnp.broadcast_to(a, shape) for a in arrs]
    while len(arrs) < 4:
        arrs.append(jnp.full(shape, 0x27D4EB2F, _U32))
    return _pcg4d(jnp.stack(arrs[:4], -1))[..., 0]
