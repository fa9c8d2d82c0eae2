"""RGB spectrum helpers: sRGB transfer curves and luminance.

The framework renders in linear RGB (the reference's `*_rgb` variants,
README.md:79-93); spectral upsampling (rgb2spec) is out of scope for the
liver scenes which are all RGB.  Mirrors reference src/core/spectrum.cpp +
bitmap.cpp srgb conversion semantics.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def srgb_to_linear(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.04045, c / 12.92,
                     ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c):
    c = jnp.asarray(c)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.maximum(c, 1e-8) ** (1.0 / 2.4) - 0.055)


def linear_to_srgb_np(c):
    c = np.asarray(c)
    return np.where(c <= 0.0031308, c * 12.92,
                    1.055 * np.maximum(c, 1e-8) ** (1.0 / 2.4) - 0.055)


def luminance(c):
    return (0.212671 * c[..., 0] + 0.715160 * c[..., 1]
            + 0.072169 * c[..., 2])
