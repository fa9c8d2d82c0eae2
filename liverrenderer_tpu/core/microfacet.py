"""GGX microfacet distribution (anisotropic, Smith shadowing, VNDF sampling).

Functional analog of reference include/mitsuba/render/microfacet.h (572 LoC),
GGX branch only (the liver scenes never use Beckmann).  Sampling follows the
visible-normal (Heitz 2018) construction, matching the reference's
`sample_visible=true` default.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def ggx_d(h, ax, ay):
    """Anisotropic GGX NDF; h in local frame."""
    hx, hy, hz = h[..., 0], h[..., 1], h[..., 2]
    val = hx * hx / (ax * ax) + hy * hy / (ay * ay) + hz * hz
    d = 1.0 / jnp.maximum(jnp.pi * ax * ay * val * val, 1e-20)
    return jnp.where(hz > 0, d, 0.0)


def ggx_smith_g1(v, h, ax, ay):
    xy_alpha2 = (ax * v[..., 0]) ** 2 + (ay * v[..., 1]) ** 2
    tan2 = xy_alpha2 / jnp.maximum(v[..., 2] ** 2, 1e-20)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
    # orientation check: v and h must lie in the same hemisphere wrt n
    same = (jnp.sum(v * h, -1) * v[..., 2]) > 0
    return jnp.where(same, g, 0.0)


def ggx_sample_vndf(wi, u, ax, ay):
    """Sample a visible normal around wi (must have wi.z > 0)."""
    # stretch
    v = m.normalize(jnp.stack([ax * wi[..., 0], ay * wi[..., 1],
                               wi[..., 2]], -1))
    # orthonormal basis around v
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(lensq)], -1)
        / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape))
    t2 = jnp.cross(v, t1)
    # parameterize the projected area
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = (p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v)
    # unstretch
    h = m.normalize(jnp.stack([ax * nh[..., 0], ay * nh[..., 1],
                               jnp.maximum(nh[..., 2], 1e-6)], -1))
    return h


def ggx_pdf_visible(wi, h, ax, ay):
    """PDF of ggx_sample_vndf (density over half-vectors)."""
    g1 = ggx_smith_g1(wi, h, ax, ay)
    d = ggx_d(h, ax, ay)
    return g1 * jnp.abs(jnp.sum(wi * h, -1)) * d \
        / jnp.maximum(jnp.abs(wi[..., 2]), 1e-8)
