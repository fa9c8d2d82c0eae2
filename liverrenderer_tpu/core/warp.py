"""Sampling warps: [0,1)^2 -> distributions on disk/hemisphere/sphere/cone.

Functional re-derivation of the reference's warp library
(include/mitsuba/core/warp.h, 831 LoC) — the same mathematical warps, written
as branchless batched jnp ops.  Each warp ships with its pdf so the chi2
tests (tests/test_chi2.py, mirroring reference src/python/python/chi2.py)
can validate sample/pdf consistency.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m

PI = jnp.pi
INV_PI = 1.0 / jnp.pi
INV_TWOPI = 1.0 / (2.0 * jnp.pi)
INV_FOURPI = 1.0 / (4.0 * jnp.pi)


def square_to_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk mapping (warp.h square_to_uniform_disk_concentric)."""
    x = 2.0 * u[..., 0] - 1.0
    y = 2.0 * u[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quad_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quad_x, x, y)
    ratio = jnp.where(quad_x,
                      y / jnp.where(x == 0, 1.0, x),
                      x / jnp.where(y == 0, 1.0, y))
    phi = jnp.where(quad_x, ratio * (PI / 4.0),
                    (PI / 2.0) - ratio * (PI / 4.0))
    phi = jnp.where(is_zero, 0.0, phi)
    r = jnp.where(is_zero, 0.0, r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], -1)


def square_to_cosine_hemisphere(u):
    p = square_to_uniform_disk_concentric(u)
    z = m.safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    # Guard z==0 to keep pdf>0 on the equator, as the reference does.
    z = jnp.maximum(z, 1e-7)
    return jnp.stack([p[..., 0], p[..., 1], z], -1)


def square_to_cosine_hemisphere_pdf(v):
    return jnp.maximum(v[..., 2], 0.0) * INV_PI


def square_to_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def square_to_uniform_sphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_FOURPI)


def square_to_uniform_hemisphere(u):
    z = u[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * PI * u[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def square_to_uniform_hemisphere_pdf(v):
    return jnp.full(v.shape[:-1], INV_TWOPI)


def square_to_uniform_cone(u, cos_cutoff):
    """Uniform direction in a cone around +z (warp.h square_to_uniform_cone)."""
    ct = (1.0 - u[..., 1]) + u[..., 1] * cos_cutoff
    st = m.safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * PI * u[..., 0]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], -1)


def square_to_uniform_cone_pdf(v, cos_cutoff):
    return INV_TWOPI / jnp.maximum(1.0 - cos_cutoff, 1e-20) \
        * jnp.ones(v.shape[:-1])


def square_to_uniform_triangle(u):
    """Barycentric warp (warp.h square_to_uniform_triangle): returns (b1,b2)."""
    t = m.safe_sqrt(1.0 - u[..., 0])
    return jnp.stack([1.0 - t, t * u[..., 1]], -1)


def square_to_hg(u, g):
    """Henyey-Greenstein direction around +z (reference src/phase/hg.cpp sample
    semantics; exact inverse-CDF)."""
    g = jnp.broadcast_to(jnp.asarray(g), u.shape[:-1])
    tiny = jnp.abs(g) < 1e-3
    g_safe = jnp.where(tiny, 0.5, g)
    sqr_term = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe * u[..., 1])
    ct_hg = (1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe)
    # iso limit with first-order correction
    ct_iso = 1.0 - 2.0 * u[..., 1] + 2 * g * u[..., 1] * (1.0 - u[..., 1]) * 2
    cos_theta = jnp.where(tiny, jnp.clip(ct_iso, -1.0, 1.0),
                          jnp.clip(ct_hg, -1.0, 1.0))
    st = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * PI * u[..., 0]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), cos_theta], -1)


def hg_pdf(cos_theta, g):
    """HG phase density wrt solid angle; theta measured from the outgoing
    (forward) axis, so g>0 peaks at cos_theta=+1."""
    temp = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.maximum(
        temp * m.safe_sqrt(temp), 1e-20)


def interval_to_nonuniform_tent(a, b, c, u):
    """Inverse-CDF of a tent over [a, c] peaking at b (warp.h)."""
    lhs = u <= (b - a) / (c - a)
    f = jnp.where(lhs, (b - a) * (c - a), -(c - b) * (c - a))
    u2 = jnp.where(lhs, u, 1.0 - u)
    x = m.safe_sqrt(u2 * f / jnp.where(lhs, 1.0, 1.0))
    return jnp.where(lhs, a + m.safe_sqrt(u * (b - a) * (c - a)),
                     c - m.safe_sqrt((1.0 - u) * (c - b) * (c - a)))


def square_to_tent(u, radius=1.0):
    """2D tent-filter importance sample in [-r, r]^2."""
    def tent1(x):
        x = 2.0 * x - 1.0
        neg = x < 0
        ax = jnp.abs(x)
        return jnp.where(x == 0.0, 0.0,
                         jnp.where(neg, m.safe_sqrt(ax) - 1.0,
                                   1.0 - m.safe_sqrt(1.0 - jnp.minimum(ax, 1.0)))) \
            * 0 + jnp.sign(x) * (1.0 - m.safe_sqrt(1.0 - jnp.minimum(ax, 1.0)))
    return jnp.stack([tent1(u[..., 0]), tent1(u[..., 1])], -1) * radius
