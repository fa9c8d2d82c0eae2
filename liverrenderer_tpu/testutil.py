"""Chi-square sample/pdf consistency harness.

Analog of the reference's `ChiSquareTest` (src/python/python/chi2.py:5,
76-330): draw many samples from a sampling routine, histogram them over a
spherical (or planar) domain, integrate the claimed pdf over the same cells,
and run a chi-square goodness-of-fit test.  Used by the test-suite to
validate warps, BSDF sampling, and phase functions the same way the
reference validates its plugins.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sphere_cell_index(d, res_theta, res_phi):
    """Direction -> histogram cell on the (cos_theta, phi) grid."""
    ct = np.clip(d[..., 2], -1.0, 1.0)
    phi = np.arctan2(d[..., 1], d[..., 0])
    it = np.minimum(((ct + 1.0) * 0.5 * res_theta).astype(int),
                    res_theta - 1)
    ip = np.minimum(((phi + np.pi) / (2 * np.pi) * res_phi).astype(int),
                    res_phi - 1)
    return it * res_phi + ip


def _gammaincc_q(k_half, x_half):
    """Upper regularized incomplete gamma Q(k/2, x/2) == chi2 sf."""
    from jax.scipy.special import gammaincc
    return float(gammaincc(k_half, x_half))


def chi2_test_sphere(sample_fn, pdf_fn, n_samples: int = 200_000,
                     res_theta: int = 16, res_phi: int = 32,
                     seed: int = 0, significance: float = 0.01,
                     pdf_subdiv: int = 4):
    """Chi-square test of a spherical sampling routine.

    sample_fn(u2 (N,2), u1 (N,)) -> (N,3) unit directions, or a tuple
    ((N,3) directions, (N,) valid mask) — invalid samples (rejected lobes,
    zero-pdf events) are dropped like the reference's zero-bucket handling.
    pdf_fn(d (N,3)) -> (N,) solid-angle density
    Returns (passed, p_value, stat, dof)."""
    rng = np.random.default_rng(seed)
    u2 = jnp.asarray(rng.random((n_samples, 2)), jnp.float32)
    u1 = jnp.asarray(rng.random(n_samples), jnp.float32)
    out = sample_fn(u2, u1)
    if isinstance(out, tuple):
        d, valid = np.asarray(out[0]), np.asarray(out[1])
        d = d[valid]
    else:
        d = np.asarray(out)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-3)

    n_cells = res_theta * res_phi
    idx = _sphere_cell_index(d, res_theta, res_phi)
    counts = np.bincount(idx, minlength=n_cells).astype(np.float64)

    # expected counts: integrate the pdf over each cell (midpoint rule on a
    # subdivided grid; the reference uses adaptive quadrature, chi2.py:176)
    st = res_theta * pdf_subdiv
    sp = res_phi * pdf_subdiv
    ct = (np.arange(st) + 0.5) / st * 2.0 - 1.0
    phi = (np.arange(sp) + 0.5) / sp * 2.0 * np.pi - np.pi
    CT, PHI = np.meshgrid(ct, phi, indexing="ij")
    stheta = np.sqrt(np.maximum(1.0 - CT ** 2, 0.0))
    dirs = np.stack([stheta * np.cos(PHI), stheta * np.sin(PHI), CT],
                    -1).reshape(-1, 3).astype(np.float32)
    pdf = np.asarray(pdf_fn(jnp.asarray(dirs))).reshape(st, sp)
    sub_area = (2.0 / st) * (2.0 * np.pi / sp)      # d(cos) * d(phi)
    integral = pdf.reshape(res_theta, pdf_subdiv, res_phi,
                           pdf_subdiv).sum((1, 3)) * sub_area
    expected = integral.ravel() * n_samples

    # pool low-expectation cells (chi2.py:262 merges cells < 5 expected)
    order = np.argsort(expected)
    counts = counts[order]
    expected = expected[order]
    pooled_c, pooled_e = [], []
    acc_c = acc_e = 0.0
    for c, e in zip(counts, expected):
        acc_c += c
        acc_e += e
        if acc_e >= 5.0:
            pooled_c.append(acc_c)
            pooled_e.append(acc_e)
            acc_c = acc_e = 0.0
    if acc_e > 0:
        if pooled_e:
            pooled_c[-1] += acc_c
            pooled_e[-1] += acc_e
        else:
            pooled_c, pooled_e = [acc_c], [acc_e]
    pooled_c = np.asarray(pooled_c)
    pooled_e = np.asarray(pooled_e)

    # normalization: scale expected to the actual sample count (weights)
    pooled_e = pooled_e * (pooled_c.sum() / max(pooled_e.sum(), 1e-12))
    stat = float((((pooled_c - pooled_e) ** 2) / np.maximum(pooled_e,
                                                            1e-12)).sum())
    dof = max(len(pooled_c) - 1, 1)
    p = _gammaincc_q(dof / 2.0, stat / 2.0)
    return p > significance, p, stat, dof
