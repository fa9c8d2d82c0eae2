"""Sensors: film-position -> primary ray generation.

Analog of reference src/sensors/{perspective.cpp:424, thinlens.cpp,
orthographic.cpp, distant.cpp, radiancemeter.cpp, irradiancemeter.cpp,
batch.cpp} sample_ray(): x-FOV in degrees, camera-to-world transform
with +z forward / +x left per Mitsuba's look_at convention
(scene/transform.py).  Dispatch on the static sensor type.
"""
from __future__ import annotations

import math as pymath

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.types import Ray
from ..scene.ir import (SENSOR_BATCH, SENSOR_DISTANT, SENSOR_IRRADIANCEMETER,
                        SENSOR_ORTHOGRAPHIC, SENSOR_RADIANCEMETER,
                        SENSOR_THINLENS, Scene)


def ray_weight(scene: Scene) -> float:
    """Static importance weight of a camera ray.  The irradiancemeter's
    cosine-weighted hemisphere sampling has pdf cos/pi, so the E estimator
    carries pi (irradiancemeter.cpp sample_ray)."""
    if scene.sensor.stype == SENSOR_IRRADIANCEMETER:
        return pymath.pi
    return 1.0


def sample_ray(scene: Scene, pos_film, aperture_u=None):
    """pos_film: (N,2) continuous pixel coordinates in [0,W)x[0,H);
    aperture_u: (N,2) lens samples (thinlens) / direction samples
    (irradiancemeter).  Returns camera rays (world space)."""
    sensor = scene.sensor
    w, h = scene.film_w, scene.film_h
    aspect = w / h
    # NDC in [0,1]
    nx = pos_film[..., 0] / w
    ny = pos_film[..., 1] / h
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]

    if sensor.stype == SENSOR_RADIANCEMETER:
        # radiancemeter.cpp: every sample measures L(o, d) for the fixed
        # origin/direction of to_world
        d_w = jnp.broadcast_to(m.normalize(R[:, 2]), nx.shape + (3,))
        o_w = jnp.broadcast_to(t, d_w.shape)
        return Ray(o=o_w.astype(jnp.float32), d=d_w.astype(jnp.float32),
                   maxt=jnp.full(nx.shape, jnp.inf, jnp.float32))

    if sensor.stype == SENSOR_DISTANT:
        # distant.cpp: incident radiance from direction to_world@[0,0,1].
        # Origins cover the scene bounding sphere cross-section (film maps
        # over the disk), or hover above an explicit target point.
        d = m.normalize(R[:, 2])
        c, r = sensor.bsphere[:3], sensor.bsphere[3]
        if sensor.has_target:
            o = sensor.target - d * (2.0 * r)
            o_w = jnp.broadcast_to(o, nx.shape + (3,))
        else:
            u, v = m.coordinate_system(d)
            disk = warp.square_to_uniform_disk_concentric(
                jnp.stack([nx, ny], -1)) * r
            o_w = (c - d * r) + disk[..., 0:1] * u + disk[..., 1:2] * v
        d_w = jnp.broadcast_to(d, o_w.shape)
        return Ray(o=o_w.astype(jnp.float32), d=d_w.astype(jnp.float32),
                   maxt=jnp.full(nx.shape, jnp.inf, jnp.float32))

    if sensor.stype == SENSOR_IRRADIANCEMETER:
        # irradiancemeter.cpp: uniform-area position on the parent shape,
        # cosine-weighted outgoing direction; film parameterizes the
        # position sample
        from ..emitter.dispatch import _sample_shape_position
        shape_idx = jnp.full(nx.shape, scene.sensor.target_shape, jnp.int32)
        u2 = jnp.stack([nx, ny], -1)
        u_reuse = jnp.mod((nx + ny) * 7919.0 + 0.5, 1.0)
        p, n, _ = _sample_shape_position(scene, shape_idx, u2, u_reuse)
        if aperture_u is None:       # AOV/aux paths pass no lens sample
            aperture_u = jnp.stack(
                [jnp.mod(nx * 6151.0, 1.0), jnp.mod(ny * 6151.0, 1.0)], -1)
        d_local = warp.square_to_cosine_hemisphere(aperture_u)
        fu, fv = m.coordinate_system(n)
        d_w = d_local[..., 0:1] * fu + d_local[..., 1:2] * fv \
            + d_local[..., 2:3] * n
        o_w = p + n * 1e-4
        return Ray(o=o_w.astype(jnp.float32),
                   d=m.normalize(d_w).astype(jnp.float32),
                   maxt=jnp.full(nx.shape, jnp.inf, jnp.float32))

    if sensor.stype == SENSOR_BATCH:
        # batch.cpp: film width split evenly across the child cameras
        S = sensor.batch_count
        sf = nx * S
        idx = jnp.clip(sf.astype(jnp.int32), 0, S - 1)
        nx_l = sf - idx
        Rb = sensor.batch_to_world[idx][..., :3, :3]
        tb = sensor.batch_to_world[idx][..., :3, 3]
        sub_aspect = (w / S) / h
        tan_half = jnp.tan(jnp.deg2rad(sensor.batch_fov_x[idx]) * 0.5)
        dx = (1.0 - 2.0 * nx_l) * tan_half
        dy = (1.0 - 2.0 * ny) * tan_half / sub_aspect
        d_cam = jnp.stack([dx, dy, jnp.ones_like(dx)], -1)
        d_w = m.normalize(jnp.einsum("...ij,...j->...i", Rb, d_cam))
        return Ray(o=tb.astype(jnp.float32), d=d_w.astype(jnp.float32),
                   maxt=jnp.full(nx.shape, jnp.inf, jnp.float32))

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
