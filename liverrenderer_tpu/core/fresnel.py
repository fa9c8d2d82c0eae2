"""Fresnel equations (functional analog of reference include/mitsuba/render/
fresnel.h:357 LoC) for smooth dielectrics and conductors."""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance at a dielectric interface.

    Returns (F, cos_theta_t, eta_it, eta_ti) exactly mirroring the contract of
    reference fresnel.h `fresnel()`:
      - eta is the relative IOR (interior/exterior),
      - cos_theta_t carries the sign convention of the transmitted ray
        (negative of incident hemisphere).
    """
    eta = jnp.broadcast_to(jnp.asarray(eta, jnp.float32), jnp.shape(cos_theta_i))
    outside = cos_theta_i >= 0.0
    # relative IOR along the ray
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)

    cti = jnp.abs(cos_theta_i)
    # Snell: sin^2(theta_t) = sin^2(theta_i) * eta_ti^2
    ctt2 = 1.0 - (1.0 - cti * cti) * eta_ti * eta_ti
    tir = ctt2 <= 0.0
    ctt = m.safe_sqrt(ctt2)

    rs = (cti - eta_it * ctt) / jnp.maximum(cti + eta_it * ctt, 1e-20)
    rp = (eta_it * cti - ctt) / jnp.maximum(eta_it * cti + ctt, 1e-20)
    F = 0.5 * (rs * rs + rp * rp)
    F = jnp.where(tir, 1.0, F)
    F = jnp.where(eta == 1.0, 0.0, F)

    cos_theta_t = jnp.where(tir, 0.0, ctt) * jnp.where(cos_theta_i >= 0, -1.0, 1.0)
    return F, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta_re, eta_im):
    """Fresnel reflectance of a conductor with complex IOR eta_re + i*eta_im
    (reference fresnel.h fresnel_conductor); per-channel if eta is (..,3)."""
    ct2 = cos_theta_i * cos_theta_i
    st2 = jnp.maximum(1.0 - ct2, 0.0)
    if jnp.ndim(eta_re) > jnp.ndim(cos_theta_i):
        ct2 = ct2[..., None]
        st2 = st2[..., None]
        cti = jnp.abs(cos_theta_i)[..., None]
    else:
        cti = jnp.abs(cos_theta_i)
    e2 = eta_re * eta_re - eta_im * eta_im - st2
    a2b2 = m.safe_sqrt(e2 * e2 + 4.0 * eta_re * eta_re * eta_im * eta_im)
    t1 = a2b2 + ct2
    a = m.safe_sqrt(0.5 * (a2b2 + e2))
    t2 = 2.0 * a * cti
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = ct2 * a2b2 + st2 * st2
    t4 = t2 * st2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def fresnel_diffuse_reflectance(eta):
    """Fast polynomial fit of the diffuse Fresnel reflectance F_dr(eta)
    (reference fresnel.h fresnel_diffuse_reverse, used by plastic/dipole)."""
    eta = jnp.asarray(eta, jnp.float32)
    inv_eta = 1.0 / eta
    approx_lo = (0.0636 * inv_eta
                 + (eta * (eta * -1.4399 + 0.7099) + 0.6681))
    ie2 = inv_eta * inv_eta
    ie3 = ie2 * inv_eta
    ie4 = ie3 * inv_eta
    ie5 = ie4 * inv_eta
    approx_hi = (-1.4399 * ie2 + 0.7099 * inv_eta + 0.6681 + 0.0636 * eta)
    return jnp.where(eta < 1.0,
                     -0.4399 + 0.7099 * inv_eta - 0.3319 * ie2 + 0.0636 * ie3,
                     approx_hi)
