"""Sensors: film-position -> primary ray generation.

Analog of reference src/sensors/{perspective.cpp:424, thinlens.cpp,
orthographic.cpp} sample_ray(): x-FOV in degrees, camera-to-world transform
with +z forward / +x left per Mitsuba's look_at convention
(scene/transform.py).  Dispatch on the static sensor type.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.types import Ray
from ..scene.ir import SENSOR_ORTHOGRAPHIC, SENSOR_THINLENS, Scene


def sample_ray(scene: Scene, pos_film, aperture_u=None):
    """pos_film: (N,2) continuous pixel coordinates in [0,W)x[0,H);
    aperture_u: (N,2) lens samples (thinlens only).
    Returns camera rays (world space)."""
    sensor = scene.sensor
    w, h = scene.film_w, scene.film_h
    aspect = w / h
    # NDC in [0,1]
    nx = pos_film[..., 0] / w
    ny = pos_film[..., 1] / h
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]

    if sensor.stype == SENSOR_ORTHOGRAPHIC:
        # film plane maps to a unit sensor rectangle scaled by to_world
        ox = (1.0 - 2.0 * nx)
        oy = (1.0 - 2.0 * ny) / aspect
        o_cam = jnp.stack([ox, oy, jnp.zeros_like(ox)], -1)
        d_w = jnp.broadcast_to(R[:, 2], o_cam.shape)
        o_w = o_cam @ R.T + t
        return Ray(o=o_w.astype(jnp.float32),
                   d=m.normalize(d_w).astype(jnp.float32),
                   maxt=jnp.full(o_cam.shape[:-1], jnp.inf, jnp.float32))

    # image-plane half extents at z=1 from the x-FOV
    tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
    dx = (1.0 - 2.0 * nx) * tan_half
    dy = (1.0 - 2.0 * ny) * tan_half / aspect
    d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)

    if sensor.stype == SENSOR_THINLENS and aperture_u is not None:
        # thinlens.cpp: focus-plane target, jittered lens origin
        focus = d_cam * (sensor.focus_distance /
                         jnp.maximum(d_cam[..., 2:3], 1e-6))
        disk = warp.square_to_uniform_disk_concentric(aperture_u)
        o_cam = jnp.concatenate(
            [disk * sensor.aperture_radius,
             jnp.zeros(disk.shape[:-1] + (1,))], -1)
        d_cam = m.normalize(focus - o_cam)
        o_w = o_cam @ R.T + t
        return Ray(o=o_w.astype(jnp.float32),
                   d=(d_cam @ R.T).astype(jnp.float32),
                   maxt=jnp.full(d_cam.shape[:-1], jnp.inf, jnp.float32))

    d_cam = m.normalize(d_cam)
    d_w = d_cam @ R.T
    o_w = jnp.broadcast_to(t, d_w.shape)
    return Ray(o=o_w.astype(jnp.float32), d=d_w.astype(jnp.float32),
               maxt=jnp.full(d_w.shape[:-1], jnp.inf, jnp.float32))
