"""Phase function sampling/eval (reference src/phase/{isotropic,hg,
rayleigh,blendphase,tabphase,sggx}.cpp), dispatched per-lane by the
medium's phase type code.

Directions follow the propagation convention: the sampled direction is
measured around the *forward* axis (continuation of the ray), so HG with
g > 0 is forward-scattering.

Extended phases read their parameters from the medium parameter row
(scene/ir.py Media docstring): blendphase packs (weight, child types,
child g's) at [11:16]; tabphase packs a 32-bin piecewise-constant density
over cos_theta at [16:48] (the reference interpolates linearly and
integrates exactly, tabphase.cpp — the constant-bin variant here keeps
sample/pdf consistency by construction); sggx packs the 6 S-matrix
entries at [16:22] (specular microflake, microflake.h sggx_sample
visible-normal algorithm).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..scene.ir import (PHASE_BLEND, PHASE_HG, PHASE_ISOTROPIC,
                        PHASE_RAYLEIGH, PHASE_SGGX, PHASE_TAB)

_TAB_BINS = 32


# ---------------------------------------------------------------------------
# SGGX microflake helpers (microflake.h)
# ---------------------------------------------------------------------------

def _sggx_det(s):
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    return jnp.abs(xx * yy * zz - xx * yz * yz - yy * xz * xz
                   - zz * xy * xy + 2.0 * xy * xz * yz)


def _sggx_ndf(wm, s):
    """D(wm) of the SGGX ellipsoid distribution."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    x, y, z = wm[..., 0], wm[..., 1], wm[..., 2]
    den = x * x * (yy * zz - yz * yz) + y * y * (xx * zz - xz * xz) \
        + z * z * (xx * yy - xy * xy) \
        + 2.0 * (x * y * (xz * yz - zz * xy) + x * z * (xy * yz - yy * xz)
                 + y * z * (xy * xz - xx * yz))
    det = _sggx_det(s)
    return det * jnp.sqrt(jnp.maximum(det, 0.0)) \
        / jnp.maximum(jnp.pi * den * den, 1e-20)


def _sggx_sigma(w, s):
    """Projected area sigma(w) = sqrt(w^T S w)."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    q = x * x * xx + y * y * yy + z * z * zz \
        + 2.0 * (x * y * xy + x * z * xz + y * z * yz)
    return jnp.sqrt(jnp.maximum(q, 1e-20))


def _sggx_sample_normal(wi, u2, s):
    """Sample a visible microflake normal around wi (world)."""
    frame = m.make_frame(wi)
    # S expressed in the (s, t, n=wi) frame
    def sq(a, b):
        xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
        return (a[..., 0] * b[..., 0] * xx + a[..., 1] * b[..., 1] * yy
                + a[..., 2] * b[..., 2] * zz
                + (a[..., 0] * b[..., 1] + a[..., 1] * b[..., 0]) * xy
                + (a[..., 0] * b[..., 2] + a[..., 2] * b[..., 0]) * xz
                + (a[..., 1] * b[..., 2] + a[..., 2] * b[..., 1]) * yz)

    skk = sq(frame.s, frame.s)
    sjj = sq(frame.t, frame.t)
    sii = sq(frame.n, frame.n)
    skj = sq(frame.s, frame.t)
    ski = sq(frame.s, frame.n)
    sji = sq(frame.t, frame.n)

    det = jnp.abs(skk * sjj * sii - skk * sji * sji - sjj * ski * ski
                  - sii * skj * skj + 2.0 * skj * ski * sji)
    inv_sqrt_sii = 1.0 / jnp.sqrt(jnp.maximum(sii, 1e-20))
    tmp = jnp.sqrt(jnp.maximum(sjj * sii - sji * sji, 1e-20))
    mk_x = jnp.sqrt(jnp.maximum(det, 0.0)) / tmp
    mj_x = -inv_sqrt_sii * (ski * sji - skj * sii) / tmp
    mj_y = inv_sqrt_sii * tmp

    uvw = warp.square_to_cosine_hemisphere(u2)
    nx = uvw[..., 0] * mk_x + uvw[..., 1] * mj_x \
        + uvw[..., 2] * inv_sqrt_sii * ski
    ny = uvw[..., 1] * mj_y + uvw[..., 2] * inv_sqrt_sii * sji
    nz = uvw[..., 2] * inv_sqrt_sii * sii
    n_local = m.normalize(jnp.stack([nx, ny, nz], -1))
    return frame.to_world(n_local)


# ---------------------------------------------------------------------------
# Tabulated phase helpers
# ---------------------------------------------------------------------------

def _tab_table(prm):
    return jnp.maximum(prm[..., 16:16 + _TAB_BINS], 0.0)


def _tab_eval(prm, cos_theta):
    """Piecewise-constant density over cos_theta, normalized to a
    solid-angle pdf."""
    tab = _tab_table(prm)
    total = jnp.sum(tab, -1)
    b = jnp.clip(((cos_theta + 1.0) * 0.5 * _TAB_BINS).astype(jnp.int32),
                 0, _TAB_BINS - 1)
    val = jnp.take_along_axis(tab, b[..., None], -1)[..., 0]
    # bin mass -> density: / (2pi * dcos) with dcos = 2/BINS
    return val / jnp.maximum(total, 1e-20) * _TAB_BINS \
        / (4.0 * jnp.pi)


def _tab_sample_cos(prm, u):
    """Inverse-CDF over the 32 bins (5-step bisect) + uniform-in-bin."""
    tab = _tab_table(prm)
    cdf = jnp.cumsum(tab, -1)
    total = cdf[..., -1:]
    target = u[..., None] * total
    idx = jnp.sum((cdf < target).astype(jnp.int32), -1)
    idx = jnp.clip(idx, 0, _TAB_BINS - 1)
    lo = jnp.where(idx > 0,
                   jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None],
                                       -1)[..., 0], 0.0)
    mass = jnp.take_along_axis(tab, idx[..., None], -1)[..., 0]
    frac = jnp.clip((target[..., 0] - lo) / jnp.maximum(mass, 1e-20),
                    0.0, 1.0)
    return -1.0 + (idx.astype(jnp.float32) + frac) * (2.0 / _TAB_BINS)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def _blend_children(prm):
    t1 = prm[..., 12].astype(jnp.int32)
    g1 = prm[..., 13]
    t2 = prm[..., 14].astype(jnp.int32)
    g2 = prm[..., 15]
    w = jnp.clip(prm[..., 11], 0.0, 1.0)
    return w, t1, g1, t2, g2


def _basic_eval(ptype, g, cos_theta):
    iso = jnp.full_like(cos_theta, warp.INV_FOURPI)
    hg = warp.hg_pdf(cos_theta, g)
    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)
    out = iso
    out = jnp.where(ptype == PHASE_HG, hg, out)
    out = jnp.where(ptype == PHASE_RAYLEIGH, ray, out)
    return out


def _safe_s(prm, ptype):
    """SGGX S entries, identity-sanitized on non-sggx lanes: the medium
    row slots alias bio-media data there, and a poisoned (NaN/inf)
    untaken branch would leak through jnp.where in reverse mode."""
    sel = (ptype == PHASE_SGGX)[..., None]
    ident = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
    return jnp.where(sel, prm[..., 16:22], ident)


def phase_eval(ptype, g, cos_theta, prm=None, fwd=None, wo=None,
               present=None):
    """Phase value (== pdf for the perfectly importance-sampled types).

    prm: (N, MEDIUM_P) medium rows for the extended phases; fwd/wo world
    directions (needed by sggx, which is not a function of cos_theta
    alone); `present` = scene.media.phase_types (statically elides the
    extended branches)."""
    out = _basic_eval(ptype, g, cos_theta)
    if prm is None:
        return out
    present = set(present) if present is not None \
        else {PHASE_BLEND, PHASE_TAB, PHASE_SGGX}
    if PHASE_BLEND in present:
        w, t1, g1, t2, g2 = _blend_children(prm)
        blend = w * _basic_eval(t1, g1, cos_theta) \
            + (1.0 - w) * _basic_eval(t2, g2, cos_theta)
        out = jnp.where(ptype == PHASE_BLEND, blend, out)
    if PHASE_TAB in present:
        out = jnp.where(ptype == PHASE_TAB, _tab_eval(prm, cos_theta), out)
    if PHASE_SGGX in present and fwd is not None and wo is not None:
        s = _safe_s(prm, ptype)
        wi_m = -fwd
        h = m.normalize(wi_m + wo)
        sggx = 0.25 * _sggx_ndf(h, s) / _sggx_sigma(wi_m, s)
        out = jnp.where(ptype == PHASE_SGGX, sggx, out)
    return out


def phase_sample(ptype, g, fwd, u2, prm=None, present=None):
    """Sample an outgoing direction.

    ptype, g: (N,) lane arrays; fwd: (N,3) propagation direction (world).
    Returns (wo_world, weight, pdf).  weight = value/pdf.
    """
    d_iso = warp.square_to_uniform_sphere(u2)
    d_hg_local = warp.square_to_hg(u2, g)
    frame = m.make_frame(fwd)
    d_hg = frame.to_world(d_hg_local)
    is_hg = ptype == PHASE_HG
    wo = jnp.where(is_hg[..., None], d_hg, d_iso)
    exact = is_hg | (ptype == PHASE_ISOTROPIC)

    present_s = set(present) if present is not None \
        else {PHASE_BLEND, PHASE_TAB, PHASE_SGGX}
    if prm is not None and PHASE_BLEND in present_s:
        # blendphase: pick a child with u2[:,0], rescale, sample it
        w, t1, g1, t2, g2 = _blend_children(prm)
        pick1 = u2[..., 0] < w
        u0r = jnp.where(pick1, u2[..., 0] / jnp.maximum(w, 1e-9),
                        (u2[..., 0] - w) / jnp.maximum(1.0 - w, 1e-9))
        u2b = jnp.stack([jnp.clip(u0r, 0.0, 1.0 - 1e-7), u2[..., 1]], -1)
        tb = jnp.where(pick1, t1, t2)
        gb = jnp.where(pick1, g1, g2)
        d_hgb = frame.to_world(warp.square_to_hg(u2b, gb))
        d_isob = warp.square_to_uniform_sphere(u2b)
        d_blend = jnp.where((tb == PHASE_HG)[..., None], d_hgb, d_isob)
        wo = jnp.where((ptype == PHASE_BLEND)[..., None], d_blend, wo)

    if prm is not None and PHASE_TAB in present_s:
        # tabphase: inverse-CDF cos_theta + uniform azimuth
        ct = _tab_sample_cos(prm, u2[..., 0])
        st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
        phi = 2.0 * jnp.pi * u2[..., 1]
        d_tab = frame.to_world(jnp.stack(
            [st * jnp.cos(phi), st * jnp.sin(phi), ct], -1))
        wo = jnp.where((ptype == PHASE_TAB)[..., None], d_tab, wo)
        exact = exact | (ptype == PHASE_TAB)

    if prm is not None and PHASE_SGGX in present_s:
        # sggx specular: reflect off a sampled visible microflake normal
        s = _safe_s(prm, ptype)
        wi_m = -fwd
        nrm = _sggx_sample_normal(wi_m, u2, s)
        d_sggx = m.normalize(2.0 * jnp.sum(wi_m * nrm, -1)[..., None] * nrm
                             - wi_m)
        wo = jnp.where((ptype == PHASE_SGGX)[..., None], d_sggx, wo)
        exact = exact | (ptype == PHASE_SGGX)

    cos_t = m.dot(fwd, wo)
    val = phase_eval(ptype, g, cos_t, prm, fwd, wo, present)
    pdf = val
    if prm is not None:
        # blendphase samples the mixture exactly in direction space only
        # when children share a sampler; in general pdf = mixture pdf
        pass
    pdf = jnp.where(exact | (ptype == PHASE_BLEND), pdf,
                    jnp.full_like(pdf, warp.INV_FOURPI))
    weight = jnp.where(exact | (ptype == PHASE_BLEND),
                       jnp.ones_like(val), val / warp.INV_FOURPI)
    return wo, weight, pdf
