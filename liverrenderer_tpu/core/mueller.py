"""Mueller calculus for polarized transport (reference
include/mitsuba/render/mueller.h).

Stokes vectors are expressed w.r.t. a basis vector perpendicular to the
propagation direction; `stokes_basis` fixes the canonical basis and
`rotate_mueller_basis` adapts matrices between frames.  All operations are
batched (..., 4, 4) and fuse into the polarized bounce kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def depolarizer(v=1.0):
    """Depolarizing Mueller matrix with transmittance v (mueller.h
    depolarizer): kills S1..S3."""
    v = jnp.asarray(v)
    z = jnp.zeros_like(v)
    row0 = jnp.stack([v, z, z, z], -1)
    rows = jnp.stack([row0] + [jnp.zeros_like(row0)] * 3, -2)
    return rows


def rotator(theta):
    """Stokes rotation by theta (mueller.h rotator): frame rotation of the
    basis by theta rotates (S1, S2) by 2*theta."""
    c = jnp.cos(2.0 * theta)
    s = jnp.sin(2.0 * theta)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([o, z, z, z], -1),
        jnp.stack([z, c, s, z], -1),
        jnp.stack([z, -s, c, z], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)


def linear_polarizer(v=1.0):
    """Ideal linear polarizer with transmission axis at 0deg
    (mueller.h linear_polarizer); v = transmittance."""
    v = jnp.asarray(v)
    h = 0.5 * v
    z = jnp.zeros_like(h)
    return jnp.stack([
        jnp.stack([h, h, z, z], -1),
        jnp.stack([h, h, z, z], -1),
        jnp.stack([z, z, z, z], -1),
        jnp.stack([z, z, z, z], -1),
    ], -2)


def linear_retarder(phase):
    """Linear retarder with fast axis at 0deg and phase delay `phase`
    (mueller.h linear_retarder); phase=pi -> half-wave, pi/2 quarter-wave."""
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    o = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([o, z, z, z], -1),
        jnp.stack([z, o, z, z], -1),
        jnp.stack([z, z, c, -s], -1),
        jnp.stack([z, z, s, c], -1),
    ], -2)


def circular_polarizer(left=False):
    """Ideal circular polarizer (mueller.h right/left_circular_polarizer)."""
    sgn = -1.0 if left else 1.0
    h = 0.5
    M = jnp.array([
        [h, 0, 0, sgn * h],
        [0, 0, 0, 0],
        [0, 0, 0, 0],
        [sgn * h, 0, 0, h],
    ], jnp.float32)
    return M


def specular_reflection_fresnel(cos_theta_i, eta_re, eta_im=None):
    """Mueller matrix of specular reflection in the s/p basis
    (mueller.h specular_reflection).  Real eta => dielectric; complex
    (eta_re, eta_im) => conductor.  cos_theta_i >= 0.

    Returns (..., 4, 4) normalized by nothing: M[0,0] = unpolarized F.
    """
    ci = jnp.clip(jnp.abs(cos_theta_i), 1e-6, 1.0)
    si2 = 1.0 - ci * ci
    if eta_im is None:
        eta_im = jnp.zeros_like(eta_re)
    # complex arithmetic on (re, im) pairs
    e2_re = eta_re * eta_re - eta_im * eta_im
    e2_im = 2.0 * eta_re * eta_im
    # ct_t = sqrt(eta^2 - sin^2) (complex)
    a_re = e2_re - si2
    a_im = e2_im
    r = jnp.sqrt(a_re * a_re + a_im * a_im)
    ct_re = jnp.sqrt(jnp.maximum((r + a_re) * 0.5, 0.0))
    ct_im = jnp.sign(a_im + 1e-30) * jnp.sqrt(jnp.maximum((r - a_re) * 0.5,
                                                          0.0))
    # rs = (ci - ct) / (ci + ct)
    def cdiv(nre, nim, dre, dim):
        d = jnp.maximum(dre * dre + dim * dim, 1e-20)
        return ((nre * dre + nim * dim) / d, (nim * dre - nre * dim) / d)

    rs_re, rs_im = cdiv(ci - ct_re, -ct_im, ci + ct_re, ct_im)
    # rp = (eta^2 ci - ct) / (eta^2 ci + ct)
    rp_re, rp_im = cdiv(e2_re * ci - ct_re, e2_im * ci - ct_im,
                        e2_re * ci + ct_re, e2_im * ci + ct_im)
    Rs = rs_re * rs_re + rs_im * rs_im
    Rp = rp_re * rp_re + rp_im * rp_im
    # relative phase: rs * conj(rp)
    cr_re = rs_re * rp_re + rs_im * rp_im
    cr_im = rs_im * rp_re - rs_re * rp_im
    amp = jnp.sqrt(jnp.maximum(Rs * Rp, 0.0))
    nrm = jnp.maximum(jnp.sqrt(cr_re * cr_re + cr_im * cr_im), 1e-20)
    cosd = cr_re / nrm
    sind = cr_im / nrm

    A = 0.5 * (Rs + Rp)
    B = 0.5 * (Rs - Rp)
    C = amp * cosd
    S = amp * sind
    z = jnp.zeros_like(A)
    return jnp.stack([
        jnp.stack([A, B, z, z], -1),
        jnp.stack([B, A, z, z], -1),
        jnp.stack([z, z, C, S], -1),
        jnp.stack([z, z, -S, C], -1),
    ], -2)


def stokes_basis(d):
    """Canonical Stokes basis vector for propagation direction d
    (mueller.h stokes_basis): first axis of the Duff ONB."""
    s, _ = m.coordinate_system(d)
    return s


def rotation_angle(d, b_from, b_to):
    """Signed angle rotating basis b_from onto b_to about direction d."""
    s = jnp.sum(jnp.cross(b_from, b_to) * d, -1)
    c = jnp.sum(b_from * b_to, -1)
    return jnp.arctan2(s, c)


def rotate_mueller_basis(M, in_d, in_basis_cur, in_basis_tgt,
                         out_d, out_basis_cur, out_basis_tgt):
    """Express M (defined for input basis in_basis_tgt / output basis
    out_basis_tgt) as acting on Stokes vectors in in_basis_cur /
    out_basis_cur (mueller.h rotate_mueller_basis)."""
    R_in = rotator(rotation_angle(in_d, in_basis_cur, in_basis_tgt))
    R_out = rotator(rotation_angle(out_d, out_basis_tgt, out_basis_cur))
    return R_out @ M @ R_in
