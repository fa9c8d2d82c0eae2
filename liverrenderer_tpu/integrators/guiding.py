"""Guiding distributions for projective (boundary) sampling.

TPU-native redesign of the reference's path-space guiding module
(python/ad/guiding.py:1-569): guiding distributions place boundary
samples proportionally to an estimated boundary-integrand mass instead
of uniformly.

Two shapes are provided:

* ``GridDistr`` — the reference's regular-grid distribution
  (guiding.py:22-138): a categorical over flattened cells + uniform
  jitter inside the chosen cell, sampled in U^3 with its reciprocal
  density.  Mass clamping (``clamp_mass_thres``) and the power
  transform (``scale_mass``) match the reference's knobs.  Unlike the
  Dr.Jit version (set_mass -> dr.cumsum kernel per update), the whole
  distribution is one flax pytree whose build/sample are jittable.

* ``edge_guided_weights`` — the projective use-case specialized to the
  silhouette-edge domain: a pilot round's per-sample |contribution| is
  scatter-added onto its edge, blended defensively with the uniform
  length-measure (guiding.py UniformDistr fallback), and returned as a
  new categorical weight vector for the main round.  This replaces the
  reference's OcSpaceDistr octree (guiding.py:141-568) whose
  variable-depth construction is host-side pointer chasing — a flat
  per-edge table is the same measure restricted to the (1D) silhouette
  domain that our projective integrator actually samples.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class GridDistr:
    """Regular-grid guiding distribution over U^3."""
    cdf: Array          # (num_cells,) inclusive cumsum of cell masses
    pmf: Array          # (num_cells,) normalized cell masses
    res: tuple = struct.field(pytree_node=False)  # (nx, ny, nz)


def grid_from_mass(mass: Array, res: tuple, clamp_mass_thres: float = 0.0,
                   scale_mass: float = 0.0) -> GridDistr:
    """Build a GridDistr from per-cell mass (guiding.py:74-101 set_mass).

    ``clamp_mass_thres`` zeroes cells below the threshold; ``scale_mass``
    applies the reference's power transform mass**scale (0 = off)."""
    m = jnp.abs(jnp.asarray(mass, jnp.float32).reshape(-1))
    if clamp_mass_thres > 0.0:
        m = jnp.where(m < clamp_mass_thres, 0.0, m)
    if scale_mass > 0.0:
        m = jnp.power(jnp.maximum(m, 0.0), scale_mass)
    total = jnp.sum(m)
    # degenerate (all-zero) mass falls back to uniform
    pmf = jnp.where(total > 0.0, m / jnp.maximum(total, 1e-30),
                    1.0 / m.shape[0])
    return GridDistr(cdf=jnp.cumsum(pmf), pmf=pmf, res=tuple(res))


@partial(jax.jit, static_argnames=())
def grid_sample(distr: GridDistr, u: Array):
    """Sample points in U^3 (guiding.py:103-121): u is (N, 4) uniforms —
    u[:,0] picks the cell, u[:,1:4] jitters inside it.  Returns
    (points (N,3), rcp_density (N,))."""
    nx, ny, nz = distr.res
    n_cells = nx * ny * nz
    idx = jnp.searchsorted(distr.cdf, u[:, 0], side="right")
    idx = jnp.clip(idx, 0, n_cells - 1)
    iz = idx % nz
    iy = (idx // nz) % ny
    ix = idx // (ny * nz)
    cell = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
    delta = jnp.array([1.0 / nx, 1.0 / ny, 1.0 / nz], jnp.float32)
    p = (cell + u[:, 1:4]) * delta
    dens = distr.pmf[idx] * n_cells            # pmf / cell volume
    rcp = jnp.where(dens > 0.0, 1.0 / jnp.maximum(dens, 1e-30), 0.0)
    return p, rcp


def grid_cell_of(distr: GridDistr, p: Array) -> Array:
    """U^3 point -> flat cell index (guiding.py:130-136)."""
    nx, ny, nz = distr.res
    ix = jnp.clip((p[..., 0] * nx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip((p[..., 1] * ny).astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip((p[..., 2] * nz).astype(jnp.int32), 0, nz - 1)
    return (ix * ny + iy) * nz + iz


def edge_guided_weights(abs_contrib: Array, e_idx: Array, base_wgt: Array,
                        uniform_frac: float = 0.25) -> Array:
    """Per-edge categorical weights from a pilot round.

    abs_contrib: (P,) |boundary contribution| of each pilot sample;
    e_idx: (P,) the edge each sample landed on; base_wgt: (E,) the
    uniform length-measure weights (0 on non-silhouette edges).

    Returns (E,) weights: (1-uniform_frac) * mass + uniform_frac *
    uniform, both restricted to the silhouette set — the defensive
    mixture keeps every silhouette edge reachable (unbiasedness) even
    when the pilot saw zero mass there."""
    mass = jnp.zeros_like(base_wgt).at[e_idx].add(abs_contrib)
    mass = jnp.where(base_wgt > 0.0, mass, 0.0)
    m_tot = jnp.sum(mass)
    b_tot = jnp.sum(base_wgt)
    # pilot saw nothing anywhere -> pure uniform
    f = jnp.where(m_tot > 0.0, uniform_frac, 1.0)
    return (1.0 - f) * mass / jnp.maximum(m_tot, 1e-30) \
        + f * base_wgt / jnp.maximum(b_tot, 1e-30)


# ---------------------------------------------------------------------------
# Octree guiding over U^3 (the reference OcSpaceDistr, ad/guiding.py:141-568)
# ---------------------------------------------------------------------------

@struct.dataclass
class OcSpaceDistr:
    """Adaptive octree distribution over the unit cube.

    TPU-native redesign of the reference's OcSpace octree: the
    variable-depth tree is built HOST-side from pilot samples (numpy
    recursion — construction is inherently sequential) and flattened to a
    leaf-box table, so device-side sampling is one categorical draw plus
    a uniform jitter inside the chosen box — no pointer chasing in the
    compiled program.  A defensive uniform mixture keeps the density
    positive everywhere (unbiasedness; guiding.py:240 extra_spc)."""
    leaf_lo: Array      # (L, 3)
    leaf_hi: Array      # (L, 3)
    pmf: Array          # (L,)
    cdf: Array          # (L,)

    def sample(self, u_sel: Array, u3: Array):
        """u_sel (N,), u3 (N,3) -> (points (N,3), density (N,)) with
        density relative to the uniform measure on U^3."""
        i = jnp.clip(jnp.searchsorted(self.cdf, u_sel, side="right"),
                     0, self.pmf.shape[0] - 1)
        lo, hi = self.leaf_lo[i], self.leaf_hi[i]
        p = lo + u3 * (hi - lo)
        vol = jnp.prod(hi - lo, -1)
        dens = self.pmf[i] / jnp.maximum(vol, 1e-12)
        return p, dens


def octree_from_samples(points, weights, max_depth: int = 6,
                        min_frac: float = 0.01, min_count: int = 64,
                        uniform_mix: float = 0.25) -> OcSpaceDistr:
    """Build an OcSpaceDistr from pilot (points (P,3) in U^3, |weights|).

    A cell splits while it holds more than `min_frac` of the total mass,
    at least `min_count` points, and depth < max_depth (the reference's
    max_leaf_count/extra_spc knobs by intent).  Leaf pmf = (1-mix) *
    mass/total + mix * volume."""
    import numpy as np

    pts = np.clip(np.asarray(points, np.float64), 0.0, 1.0 - 1e-9)
    wts = np.abs(np.asarray(weights, np.float64)).reshape(-1)
    total = max(wts.sum(), 1e-30)
    leaves = []

    def rec(lo, hi, idx, depth):
        mass = wts[idx].sum()
        if (depth >= max_depth or mass < min_frac * total
                or idx.size < min_count):
            leaves.append((lo, hi, mass))
            return
        mid = 0.5 * (lo + hi)
        code = ((pts[idx] >= mid) * np.array([1, 2, 4])).sum(-1)
        for c in range(8):
            bits = np.array([c & 1, (c >> 1) & 1, (c >> 2) & 1], bool)
            clo = np.where(bits, mid, lo)
            chi = np.where(bits, hi, mid)
            rec(clo, chi, idx[code == c], depth + 1)

    rec(np.zeros(3), np.ones(3), np.arange(len(pts)), 0)
    lo = np.asarray([l for l, _, _ in leaves], np.float32)
    hi = np.asarray([h for _, h, _ in leaves], np.float32)
    mass = np.asarray([m for _, _, m in leaves], np.float64)
    vol = np.prod(hi - lo, -1).astype(np.float64)
    pmf = (1.0 - uniform_mix) * mass / total + uniform_mix * vol
    pmf = pmf / pmf.sum()
    return OcSpaceDistr(
        leaf_lo=jnp.asarray(lo), leaf_hi=jnp.asarray(hi),
        pmf=jnp.asarray(pmf, jnp.float32),
        cdf=jnp.asarray(np.cumsum(pmf), jnp.float32))
