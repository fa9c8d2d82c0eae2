"""Build-time subsurface preprocessing: per-vertex polynomial fitting.

Replaces the reference's Scene::preprocess -> VaeScatter::preprocess ->
VaeHelper::prepare -> precomputePolynomials chain (vaehelper.h:149-235):
constraint surface samples (position + normal, area-uniform) take the place
of the ConstraintKdTree (polynomials.h:85), and the per-vertex fits run as
one batched least-squares solve instead of a per-vertex Eigen loop.
"""
from __future__ import annotations

import numpy as np

from .poly import fit_polynomials, kernel_eps

N_CONSTRAINT_SAMPLES = 4096
K_NEAREST = 24


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   seed: int = 7):
    """Area-uniform surface samples -> (pos (n,3), normal (n,3)).

    The poly fit's gradient constraints need OUTWARD normals (training
    convention: inside f < 0, polynomials.h fitPolynomialsImpl); an
    inward-wound mesh would silently invert every fitted poly, so the
    winding is checked globally via the divergence-theorem signed volume
    and flipped if negative."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    signed_vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    if signed_vol < 0:
        v1, v2 = v2, v1
    fn = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(fn, axis=-1)
    fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    cdf = np.cumsum(area)
    cdf /= cdf[-1]
    tri = np.searchsorted(cdf, rng.random(n))
    u1 = rng.random(n)
    u2 = rng.random(n)
    su1 = np.sqrt(u1)
    b0 = 1.0 - su1
    b1 = u2 * su1
    pos = (v0[tri] * b0[:, None] + v1[tri] * b1[:, None]
           + v2[tri] * (1.0 - b0 - b1)[:, None])
    return pos.astype(np.float32), fn[tri].astype(np.float32)


def fit_shape_polys(verts: np.ndarray, faces: np.ndarray,
                    sigma_t: np.ndarray, albedo: np.ndarray, g: float,
                    kernel_eps_scale: float = 1.0) -> np.ndarray:
    """Per-vertex degree-3 polynomial fits for one subsurface shape.

    Returns (V, 3, 20) float32 — world-space coefficients per RGB channel
    (channel-dependent kernel epsilon, vaescatter.cpp:700-705)."""
    import jax
    import jax.numpy as jnp

    cons_p, cons_n = sample_surface(verts, faces, N_CONSTRAINT_SAMPLES)
    V = len(verts)
    # K nearest constraint samples per vertex (host; V x S distances chunked)
    idx = np.empty((V, K_NEAREST), np.int64)
    chunk = max(1, (1 << 24) // max(len(cons_p), 1))
    for s in range(0, V, chunk):
        e = min(s + chunk, V)
        d2 = np.sum((verts[s:e, None, :] - cons_p[None, :, :]) ** 2, -1)
        idx[s:e] = np.argpartition(d2, K_NEAREST, axis=1)[:, :K_NEAREST]
    cp = cons_p[idx]                                   # (V, K, 3)
    cn = cons_n[idx]

    out = np.zeros((V, 3, 20), np.float32)
    fit = jax.jit(fit_polynomials)
    for c in range(3):
        k_eps = kernel_eps(float(sigma_t[c]), float(albedo[c]), float(g),
                           kernel_eps_scale)
        k = jnp.full((V,), jnp.asarray(k_eps, jnp.float32))
        coeffs = fit(jnp.asarray(verts), jnp.asarray(cp), jnp.asarray(cn),
                     k)
        out[:, c, :] = np.asarray(coeffs)
    return out
