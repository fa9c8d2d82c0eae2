"""Film accumulation: filtered sample splatting + develop.

TPU-native replacement of the reference ImageBlock/Film pipeline
(src/render/imageblock.cpp:119-126 atomic `dr::scatter_reduce` splats;
film.cpp develop with weight division): samples are splatted with
`Array.at[].add` scatter-adds (XLA lowers these to efficient sorted
segment-sums on TPU), with a weight channel accumulated alongside.

Reconstruction filters (src/rfilters/{box,gaussian,tent}.cpp): the footprint
loop is static (unrolled), radius depends on the filter type.
"""
from __future__ import annotations

import jax.numpy as jnp

from .scene.ir import FILTER_BOX, FILTER_GAUSSIAN, FILTER_TENT


def filter_radius(rfilter: int) -> int:
    return {FILTER_BOX: 0, FILTER_GAUSSIAN: 2, FILTER_TENT: 1}[rfilter]


def _filter_weight(rfilter: int, dx, dy):
    if rfilter == FILTER_BOX:
        return jnp.ones_like(dx)
    if rfilter == FILTER_GAUSSIAN:
        # reference gaussian.cpp: std = 0.5, truncated at 4*std = 2px
        std = 0.5
        alpha = -1.0 / (2.0 * std * std)
        r2 = 2.0 * 2.0
        wx = jnp.maximum(jnp.exp(alpha * dx * dx) - jnp.exp(alpha * r2), 0.0)
        wy = jnp.maximum(jnp.exp(alpha * dy * dy) - jnp.exp(alpha * r2), 0.0)
        return wx * wy
    if rfilter == FILTER_TENT:
        return jnp.maximum(1.0 - jnp.abs(dx), 0.0) \
            * jnp.maximum(1.0 - jnp.abs(dy), 0.0)
    raise ValueError(rfilter)


def splat(w: int, h: int, rfilter: int, pos, value):
    """Splat per-sample radiance into an (h, w, 4) RGB+weight accumulator.

    pos: (N,2) continuous film coords; value: (N,3).
    """
    img = jnp.zeros((h * w, 4), jnp.float32)
    r = filter_radius(rfilter)
    if r == 0:
        px = jnp.clip(pos[..., 0].astype(jnp.int32), 0, w - 1)
        py = jnp.clip(pos[..., 1].astype(jnp.int32), 0, h - 1)
        idx = py * w + px
        data = jnp.concatenate([value, jnp.ones(value.shape[:-1] + (1,))], -1)
        img = img.at[idx].add(data)
        return img.reshape(h, w, 4)

    # discretized sample position relative to pixel centers
    cx = pos[..., 0] - 0.5
    cy = pos[..., 1] - 0.5
    bx = jnp.floor(cx).astype(jnp.int32)
    by = jnp.floor(cy).astype(jnp.int32)
    for oy in range(-r + 1, r + 1):
        for ox in range(-r + 1, r + 1):
            px = bx + ox
            py = by + oy
            wgt = _filter_weight(rfilter, px.astype(jnp.float32) - cx,
                                 py.astype(jnp.float32) - cy)
            inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            wgt = jnp.where(inside, wgt, 0.0)
            idx = jnp.clip(py, 0, h - 1) * w + jnp.clip(px, 0, w - 1)
            data = jnp.concatenate([value * wgt[..., None], wgt[..., None]], -1)
            img = img.at[idx].add(data)
    return img.reshape(h, w, 4)


def develop(acc):
    """Weight-divide the accumulator (reference film->develop())."""
    wch = acc[..., 3:4]
    return jnp.where(wch > 0, acc[..., 0:3] / jnp.maximum(wch, 1e-12), 0.0)
