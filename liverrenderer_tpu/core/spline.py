"""1D Catmull-Rom spline evaluation/integration/sampling (reference
include/mitsuba/core/spline.h eval_1d / integrate_1d / sample_1d).

Uniform-grid variant, vectorized over query points: used for tabulated
spectra and smooth parameter curves.  The reference's non-uniform and 2D
variants reduce to the same Hermite kernel; this module keeps the uniform
case that the plugins exercise.
"""
from __future__ import annotations

import jax.numpy as jnp


def _hermite_weights(t):
    t2 = t * t
    t3 = t2 * t
    w0 = 2 * t3 - 3 * t2 + 1
    w1 = t3 - 2 * t2 + t
    w2 = -2 * t3 + 3 * t2
    w3 = t3 - t2
    return w0, w1, w2, w3


def eval_1d(x, values, x_min: float = 0.0, x_max: float = 1.0):
    """Catmull-Rom interpolation of `values` (K,) sampled uniformly on
    [x_min, x_max], evaluated at x (...,). Clamped outside the domain."""
    values = jnp.asarray(values)
    K = values.shape[0]
    u = jnp.clip((x - x_min) / (x_max - x_min), 0.0, 1.0) * (K - 1)
    i = jnp.clip(u.astype(jnp.int32), 0, K - 2)
    t = u - i
    f0 = values[i]
    f1 = values[i + 1]
    # one-sided derivative estimates at the segment ends (spline.h:273-285)
    d0 = jnp.where(i > 0, 0.5 * (f1 - values[jnp.maximum(i - 1, 0)]),
                   f1 - f0)
    d1 = jnp.where(i + 2 < K,
                   0.5 * (values[jnp.minimum(i + 2, K - 1)] - f0),
                   f1 - f0)
    w0, w1, w2, w3 = _hermite_weights(t)
    return w0 * f0 + w1 * d0 + w2 * f1 + w3 * d1


def integrate_1d(values, x_min: float = 0.0, x_max: float = 1.0):
    """Cumulative integral of the spline at each node (K,) — spline.h
    integrate_1d: each segment's Hermite integral has closed form."""
    values = jnp.asarray(values)
    K = values.shape[0]
    h = (x_max - x_min) / (K - 1)
    f0 = values[:-1]
    f1 = values[1:]
    prev = jnp.concatenate([values[0:1], values[:-2]])
    nxt = jnp.concatenate([values[2:], values[-1:]])
    d0 = jnp.where(jnp.arange(K - 1) > 0, 0.5 * (f1 - prev), f1 - f0)
    d1 = jnp.where(jnp.arange(K - 1) + 2 < K, 0.5 * (nxt - f0), f1 - f0)
    seg = h * ((f0 + f1) * 0.5 + (d0 - d1) * (1.0 / 12.0))
    return jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])


def sample_1d(u, values, x_min: float = 0.0, x_max: float = 1.0,
              newton_iters: int = 8):
    """Sample x proportional to the (non-negative) spline density — the
    inverse-CDF with per-segment Newton refinement (spline.h sample_1d)."""
    values = jnp.asarray(values)
    K = values.shape[0]
    cdf = integrate_1d(values, x_min, x_max)
    total = cdf[-1]
    target = u * total
    i = jnp.clip(jnp.searchsorted(cdf, target, side="right") - 1, 0, K - 2)
    h = (x_max - x_min) / (K - 1)

    t = jnp.full_like(u, 0.5)
    for _ in range(newton_iters):
        x = x_min + (i + t) * h
        # segment-local integral via trapezoid-of-spline (good to O(h^4))
        f_mid = eval_1d(x, values, x_min, x_max)
        f_lo = values[i]
        c_here = cdf[i] + 0.5 * (f_lo + f_mid) * t * h
        err = c_here - target
        t = jnp.clip(t - err / jnp.maximum(f_mid * h, 1e-12), 0.0, 1.0)
    return x_min + (i + t) * h
