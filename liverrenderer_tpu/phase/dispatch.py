"""Phase function sampling/eval (reference src/phase/{isotropic,hg,
rayleigh}.cpp), dispatched per-lane by the medium's phase type code.

Directions follow the propagation convention: the sampled direction is
measured around the *forward* axis (continuation of the ray), so HG with
g > 0 is forward-scattering.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..scene.ir import PHASE_HG, PHASE_ISOTROPIC, PHASE_RAYLEIGH


def phase_sample(ptype, g, fwd, u2):
    """Sample an outgoing direction.

    ptype, g: (N,) lane arrays; fwd: (N,3) propagation direction (world).
    Returns (wo_world, weight, pdf).  weight = value/pdf (1 for iso & HG,
    which importance-sample exactly).
    """
    d_iso = warp.square_to_uniform_sphere(u2)
    d_hg_local = warp.square_to_hg(u2, g)
    frame = m.make_frame(fwd)
    d_hg = frame.to_world(d_hg_local)
    # rayleigh: sample iso, weight by value/pdf (round-1 approximation of
    # the exact inverse-CDF in rayleigh.cpp)
    is_hg = ptype == PHASE_HG
    wo = jnp.where(is_hg[..., None], d_hg, d_iso)
    cos_t = m.dot(fwd, wo)
    pdf = phase_eval(ptype, g, cos_t)
    w_iso = jnp.ones_like(cos_t)
    val = phase_eval(ptype, g, cos_t)
    weight = jnp.where(is_hg | (ptype == PHASE_ISOTROPIC), 1.0,
                       val / warp.INV_FOURPI)
    pdf = jnp.where(is_hg, pdf,
                    jnp.full_like(pdf, warp.INV_FOURPI))
    return wo, weight, pdf


def phase_eval(ptype, g, cos_theta):
    """Phase value == pdf (solid-angle density) for iso/HG; rayleigh value."""
    iso = jnp.full_like(cos_theta, warp.INV_FOURPI)
    hg = warp.hg_pdf(cos_theta, g)
    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)
    out = iso
    out = jnp.where(ptype == PHASE_HG, hg, out)
    out = jnp.where(ptype == PHASE_RAYLEIGH, ray, out)
    return out
