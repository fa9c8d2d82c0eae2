"""Perspective sensor: film-position -> primary ray generation.

Analog of reference src/sensors/perspective.cpp:424 sample_ray(): pinhole
camera, x-FOV in degrees, camera-to-world transform with +z forward / +x left
per Mitsuba's look_at convention (scene/transform.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.types import Ray
from ..scene.ir import Scene


def sample_ray(scene: Scene, pos_film):
    """pos_film: (N,2) continuous pixel coordinates in [0,W)x[0,H).
    Returns camera rays (world space)."""
    sensor = scene.sensor
    w, h = scene.film_w, scene.film_h
    aspect = w / h
    # image-plane half extents at z=1 from the x-FOV
    tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
    # NDC in [0,1]
    nx = pos_film[..., 0] / w
    ny = pos_film[..., 1] / h
    # camera-space direction (Mitsuba: film x to the *left* => negate)
    dx = (1.0 - 2.0 * nx) * tan_half
    dy = (1.0 - 2.0 * ny) * tan_half / aspect
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)
    d_cam = m.normalize(d_cam)
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]
    d_w = d_cam @ R.T
    o_w = jnp.broadcast_to(t, d_w.shape)
    near = sensor.near_clip
    inv_z = 1.0 / jnp.maximum(d_cam[..., 2], 1e-6)
    o_w = o_w + d_w * (near * inv_z)[..., None]
    maxt = jnp.full(d_w.shape[:-1], (sensor.far_clip - near) * 1.0)
    maxt = jnp.where(jnp.isfinite(maxt), maxt * inv_z, maxt)
    return Ray(o=o_w.astype(jnp.float32), d=d_w.astype(jnp.float32),
               maxt=jnp.full(d_w.shape[:-1], jnp.inf, jnp.float32))
