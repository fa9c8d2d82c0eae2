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

from .types import static_field

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


def _bit_reverse(v: Array) -> Array:
    v = ((v >> 16) | (v << 16)).astype(_U32)
    v = (((v & _U32(0x00ff00ff)) << 8) | ((v & _U32(0xff00ff00)) >> 8))
    v = (((v & _U32(0x0f0f0f0f)) << 4) | ((v & _U32(0xf0f0f0f0)) >> 4))
    v = (((v & _U32(0x33333333)) << 2) | ((v & _U32(0xcccccccc)) >> 2))
    v = (((v & _U32(0x55555555)) << 1) | ((v & _U32(0xaaaaaaaa)) >> 1))
    return v


def _sobol2(i: Array, scramble: Array) -> Array:
    """Second dimension of the (0,2)-sequence (ldsampler.cpp /
    qmc sampleTEA-style scrambling)."""
    v = jnp.full_like(i, 1 << 31)
    r = scramble
    for bit in range(32):
        mask = (i >> bit) & _U32(1)
        r = r ^ (mask * v)
        v = v ^ (v >> 1)
    return r


@struct.dataclass
class Sampler:
    """Per-lane sampler state: (seed, dim-counter, sample index).

    seed encodes (pixel/lane id, global seed); dim is the dimension counter
    advanced by every next_1d/next_2d call so that the primal and replay
    passes consume the identical sequence.  `kind` selects the sample
    pattern (reference src/samplers/{independent,stratified,multijitter,
    orthogonal,ldsampler}.cpp):
      independent          — pcg4d hash stream
      stratified           — per-dimension strata with decorrelating cyclic
                             shifts + jitter
      multijitter /
      orthogonal           — stratified with sub-stratified jitter
      ldsampler            — scrambled (0,2)-sequence (van der Corput +
                             Sobol') per dimension pair
    All kinds are counter-based (stateless), which is what makes the PRB
    adjoint replay exact.
    """
    seed: Array   # (N,) uint32, hash of (pixel, global seed)
    dim: Array    # (N,) uint32
    samp: Array = None   # (N,) uint32 sample index within the pixel
    kind: str = static_field(default="independent")
    spp: int = static_field(default=1)

    # -- pattern helpers ----------------------------------------------------
    def _strat_1d(self, h, extra_rot):
        """Stratified value from hash bits h: (shifted stratum + jitter)/spp."""
        spp = max(self.spp, 1)
        shift = (extra_rot % _U32(spp)).astype(_U32)
        stratum = (self.samp + shift) % _U32(spp)
        jitter = _to_unit_float(h)
        return (stratum.astype(jnp.float32) + jitter) / spp

    def _ld_pair(self, scr1, scr2):
        i = self.samp
        x = _to_unit_float(_bit_reverse(i) ^ scr1)
        y = _to_unit_float(_sobol2(i, scr2))
        return x, y

    def next_1d(self):
        h = _pcg4d(jnp.stack([
            self.seed, self.dim,
            jnp.zeros_like(self.seed), jnp.full_like(self.seed, 0x9E3779B9),
        ], -1))
        if self.kind in ("stratified", "multijitter", "orthogonal"):
            u = self._strat_1d(h[..., 0], h[..., 1])
        elif self.kind == "ldsampler":
            u = _to_unit_float(_bit_reverse(self.samp) ^ h[..., 0])
        else:
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
        if self.kind in ("stratified", "multijitter", "orthogonal"):
            u = jnp.stack([self._strat_1d(h[..., 0], h[..., 2]),
                           self._strat_1d(h[..., 1], h[..., 3])], -1)
        elif self.kind == "ldsampler":
            x, y = self._ld_pair(h[..., 0], h[..., 1])
            u = jnp.stack([x, y], -1)
        else:
            u = jnp.stack([_to_unit_float(h[..., 0]),
                           _to_unit_float(h[..., 1])], -1)
        return u, self.replace(dim=self.dim + _U32(2))


def make_sampler(lane_id: Array, sample_idx, seed=0,
                 kind: str = "independent", spp: int = 1) -> Sampler:
    """Seed a wavefront sampler. lane_id: (N,) int; sample_idx: int or (N,).

    Mirrors Sampler::seed's wavefront seeding (reference sampler.cpp) —
    every (pixel, spp-index, seed) triple gets a decorrelated stream.  For
    the stratified/ld kinds the per-pixel stream is keyed on the pixel only
    so the spp samples of one pixel share a pattern.
    """
    lane = jnp.asarray(lane_id).astype(_U32)
    samp = (jnp.broadcast_to(jnp.asarray(sample_idx), lane.shape)).astype(_U32)
    base = jnp.broadcast_to(jnp.asarray(seed), lane.shape).astype(_U32)
    if kind == "independent":
        h = _pcg4d(jnp.stack([lane, samp, base,
                              jnp.full_like(lane, 0x85EBCA6B)], -1))
    else:  # pattern kinds: stream keyed per pixel, sample index separate
        h = _pcg4d(jnp.stack([lane, jnp.zeros_like(lane), base,
                              jnp.full_like(lane, 0x85EBCA6B)], -1))
    return Sampler(seed=h[..., 0], dim=jnp.zeros_like(lane), samp=samp,
                   kind=kind, spp=spp)


def hash_u32(*parts) -> Array:
    """General-purpose uint32 hash of up-to-4 integer arrays (broadcast)."""
    arrs = [jnp.asarray(p).astype(_U32) for p in parts]
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    arrs = [jnp.broadcast_to(a, shape) for a in arrs]
    while len(arrs) < 4:
        arrs.append(jnp.full(shape, 0x27D4EB2F, _U32))
    return _pcg4d(jnp.stack(arrs[:4], -1))[..., 0]
