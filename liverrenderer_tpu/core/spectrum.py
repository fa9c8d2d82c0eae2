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


# ---------------------------------------------------------------------------
# Spectral -> RGB conversion for scene loading (host side, numpy).
# Replaces reference src/core/spectrum.cpp CIE integration for the
# `regular` / `irregular` / `blackbody` / `d65` spectrum plugins; RGB
# rendering then proceeds with the converted linear-sRGB values.
# ---------------------------------------------------------------------------

def cie1931_xyz_bar(lam):
    """CIE 1931 color matching functions via the multi-lobe Gaussian fit of
    Wyman, Sloan & Shirley 2013 (max error < 1%). lam in nm."""
    lam = np.asarray(lam, np.float64)

    def g(x, alpha, mu, s1, s2):
        t = (x - mu) * np.where(x < mu, 1.0 / s1, 1.0 / s2)
        return alpha * np.exp(-0.5 * t * t)

    x = (g(lam, 1.056, 599.8, 37.9, 31.0)
         + g(lam, 0.362, 442.0, 16.0, 26.7)
         + g(lam, -0.065, 501.1, 20.4, 26.2))
    y = (g(lam, 0.821, 568.8, 46.9, 40.5)
         + g(lam, 0.286, 530.9, 16.3, 31.1))
    z = (g(lam, 1.217, 437.0, 11.8, 36.0)
         + g(lam, 0.681, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], -1)


_XYZ_TO_SRGB = np.array([[3.240479, -1.537150, -0.498535],
                         [-0.969256, 1.875991, 0.041556],
                         [0.055648, -0.204043, 1.057311]])


def d65_spd(lam):
    """Approximate D65 illuminant SPD (blackbody 6504 K with the CIE
    normalization at 560 nm) — adequate for RGB rendering."""
    return planck(lam, 6504.0) / planck(np.asarray(560.0), 6504.0)


def planck(lam_nm, t_kelvin):
    """Planck blackbody spectral radiance (unnormalized), lam in nm."""
    lam = np.asarray(lam_nm, np.float64) * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    return (2 * h * c * c) / (lam ** 5) / \
        (np.exp(h * c / (lam * kb * t_kelvin)) - 1.0)


def spd_to_rgb(lam, vals, illuminant_normalized=False):
    """Integrate an SPD against CIE curves -> linear sRGB (numpy).

    Reflectance-style spectra are normalized by the D65 white point so a
    flat spectrum maps to (1,1,1) (reference spectrum.cpp semantics for
    reflectance vs radiance handled by the caller's scaling)."""
    lam = np.asarray(lam, np.float64)
    vals = np.asarray(vals, np.float64)
    grid = np.linspace(lam.min(), lam.max(), 256)
    v = np.interp(grid, lam, vals)
    xyzbar = cie1931_xyz_bar(grid)
    xyz = np.trapezoid(v[:, None] * xyzbar, grid, axis=0)
    norm = np.trapezoid(cie1931_xyz_bar(grid)[:, 1], grid)
    xyz = xyz / max(norm, 1e-12)
    rgb = _XYZ_TO_SRGB @ xyz
    return np.maximum(rgb, 0.0).astype(np.float32)


def blackbody_rgb(temperature, scale=1.0):
    """`blackbody` spectrum plugin -> linear RGB radiance (normalized so
    luminance matches the Planck curve's relative scale)."""
    grid = np.linspace(360.0, 830.0, 256)
    spd = planck(grid, float(temperature))
    return (spd_to_rgb(grid, spd) * scale).astype(np.float32)
