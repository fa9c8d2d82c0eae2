"""Ground-truth subsurface random walk (the reference's Volpath3D particle
tracer, sss_particle_tracer.h:74-505): the brute-force sampler the VAE was
trained against, kept as the validation oracle and training-data machinery.

TPU design: N walkers advance in lockstep in a bounded `lax.while_loop`
(free flight -> surface test against the implicit degree-3 polynomial via
sphere-trace-style marching -> HG scatter or absorb), all branchless masked
selects.  The reference's per-path recursion (samplePathsBatch
:242-335) becomes one wavefront.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..phase.dispatch import phase_sample
from ..scene.ir import PHASE_HG
from .poly import eval_poly

Array = jax.Array

_MARCH_STEPS = 24


@struct.dataclass
class WalkResult:
    """ScatterSamplingRecord analog (sss_particle_tracer.h:9-16)."""
    out_p: Array       # (N, 3) exit position (on the poly surface)
    out_d: Array       # (N, 3) exit direction
    absorbed: Array    # (N,) bool
    exited: Array      # (N,) bool
    n_bounces: Array   # (N,) int32


def _poly_crossing(coeffs, p0, d, t_max):
    """First t in (0, t_max] with f(p0 + t d) >= 0 (inside is f < 0),
    found by fixed-count marching + one secant refinement — the analog of
    the reference's polynomial sphere trace (intersectPolynomial :382)."""
    n = p0.shape[0]
    dt = t_max / _MARCH_STEPS

    def body(i, carry):
        t_hit, f_prev, found = carry
        t = (i + 1).astype(jnp.float32) * dt
        f = eval_poly(coeffs, p0 + t[:, None] * d)
        cross = (f >= 0.0) & ~found
        # secant step between the bracketing samples
        denom = jnp.where(jnp.abs(f - f_prev) > 1e-12, f - f_prev, 1.0)
        t_ref = t - dt + dt * jnp.clip(-f_prev / denom, 0.0, 1.0)
        t_hit = jnp.where(cross, t_ref, t_hit)
        return t_hit, f, cross | found

    f0 = eval_poly(coeffs, p0)
    t_hit, _, found = jax.lax.fori_loop(
        0, _MARCH_STEPS, body,
        (jnp.full((n,), jnp.inf), f0, jnp.zeros((n,), bool)))
    return t_hit, found


def sample_paths(coeffs, entry_p, entry_d, sigma_t, albedo, g, sampler,
                 max_bounces: int = 256):
    """Random-walk N packets through the homogeneous medium bounded by the
    implicit surface f(x) = 0 (inside f < 0).

    coeffs: (20,) or (N, 20) degree-3 polynomial; entry_p/entry_d: (N, 3)
    world-frame entry points/directions (entry_d pointing inside);
    sigma_t/albedo/g scalars.  Returns (WalkResult, sampler).
    """
    n = entry_p.shape[0]
    if coeffs.ndim == 1:
        coeffs = jnp.broadcast_to(coeffs, (n,) + coeffs.shape)
    sigma_t = jnp.asarray(sigma_t, jnp.float32)
    march_span = 12.0 / sigma_t        # covers ~12 mean free paths

    st = dict(
        p=entry_p, d=entry_d,
        alive=jnp.ones((n,), bool),
        absorbed=jnp.zeros((n,), bool),
        exited=jnp.zeros((n,), bool),
        out_p=entry_p, out_d=entry_d,
        bounces=jnp.zeros((n,), jnp.int32),
        sampler=sampler,
        it=jnp.int32(0),
    )

    def cond(st):
        return jnp.any(st["alive"]) & (st["it"] < max_bounces)

    def body(st):
        sampler = st["sampler"]
        u1, sampler = sampler.next_1d()
        u2, sampler = sampler.next_2d()
        ua, sampler = sampler.next_1d()

        # free flight
        t_free = -jnp.log(jnp.maximum(1.0 - u1, 1e-9)) / sigma_t
        # surface crossing before the collision?
        t_surf, found = _poly_crossing(coeffs, st["p"], st["d"],
                                       jnp.minimum(t_free, march_span))
        exits = st["alive"] & found & (t_surf <= t_free)
        out_p = jnp.where(exits[:, None],
                          st["p"] + t_surf[:, None] * st["d"], st["out_p"])
        out_d = jnp.where(exits[:, None], st["d"], st["out_d"])

        # collision: absorb or scatter (HG)
        collides = st["alive"] & ~exits
        absorb = collides & (ua >= albedo)
        p_new = st["p"] + jnp.minimum(t_free, march_span)[:, None] * st["d"]
        ptype = jnp.full((n,), PHASE_HG, jnp.int32)
        gl = jnp.full((n,), g, jnp.float32)
        d_new, _, _ = phase_sample(ptype, gl, st["d"], u2)

        alive = collides & ~absorb
        return dict(
            p=jnp.where(collides[:, None], p_new, st["p"]),
            d=jnp.where(alive[:, None], d_new, st["d"]),
            alive=alive,
            absorbed=st["absorbed"] | absorb,
            exited=st["exited"] | exits,
            out_p=out_p, out_d=out_d,
            bounces=st["bounces"] + collides.astype(jnp.int32),
            sampler=sampler,
            it=st["it"] + 1,
        )

    st = jax.lax.while_loop(cond, body, st)
    # walkers still alive at the bounce cap count as absorbed (reference
    # caps path length the same way)
    res = WalkResult(out_p=st["out_p"], out_d=st["out_d"],
                     absorbed=st["absorbed"] | st["alive"],
                     exited=st["exited"], n_bounces=st["bounces"])
    return res, st["sampler"]


def flat_halfspace_coeffs():
    """f(x) = z: the z<0 half space (canonical training geometry)."""
    c = jnp.zeros(20, jnp.float32)
    return c.at[3].set(1.0)     # the z-linear term (poly.py monomial order)
