"""Auxiliary integrators: depth, aov, moment, direct.

Capability analogs of reference src/integrators/{depth,aov,moment,
direct}.cpp.  `direct` reuses the path integrator with max_depth=2 (same
MIS estimator for one bounce); `aov` produces the reference's named AOV
set; `moment` accumulates the second sample moment alongside the mean
(for the variance-aware golden tests, test_renders.py z-test machinery).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m

from ..accel.intersect import ray_intersect
from ..bsdf.dispatch import bsdf_albedo
from ..core.rng import make_sampler
from ..core.types import Ray
from ..scene.ir import Scene
from ..sensor.perspective import sample_ray
from .shading import shading_frame_with_bump


def _primary_si(scene: Scene, seed: int = 0):
    w, h = scene.film_w, scene.film_h
    pix = jnp.arange(w * h, dtype=jnp.uint32)
    sampler = make_sampler(pix, 0, seed)
    px = (pix % w).astype(jnp.float32) + 0.5
    py = (pix // w).astype(jnp.float32) + 0.5
    pos = jnp.stack([px, py], -1)
    ray = sample_ray(scene, pos)
    si = ray_intersect(scene, ray)
    si = shading_frame_with_bump(scene, si, ray)
    return si, ray


def render_depth(scene: Scene, seed: int = 0):
    """Depth integrator (depth.cpp): distance to the first hit, 0 on miss."""
    si, _ = _primary_si(scene, seed)
    w, h = scene.film_w, scene.film_h
    d = jnp.where(si.valid, si.t, 0.0)
    return d.reshape(h, w)


def render_aovs(scene: Scene, aovs=("depth", "position", "sh_normal",
                                    "geo_normal", "albedo"), seed: int = 0):
    """AOV integrator (aov.cpp): dict of (h, w, c) float arrays."""
    si, ray = _primary_si(scene, seed)
    w, h = scene.film_w, scene.film_h
    out = {}
    valid = si.valid[:, None]
    for name in aovs:
        if name in ("depth", "dd.y"):
            out[name] = jnp.where(si.valid, si.t, 0.0).reshape(h, w)
        elif name in ("position", "p"):
            out[name] = jnp.where(valid, si.p, 0.0).reshape(h, w, 3)
        elif name in ("sh_normal", "nn"):
            out[name] = jnp.where(valid, si.sh_frame.n, 0.0).reshape(h, w, 3)
        elif name in ("geo_normal", "ng"):
            out[name] = jnp.where(valid, si.ng, 0.0).reshape(h, w, 3)
        elif name == "uv":
            out[name] = jnp.where(valid[..., :1] if valid.ndim > 2 else valid,
                                  si.uv, 0.0).reshape(h, w, 2)
        elif name == "albedo":
            alb = bsdf_albedo(scene, si,
                              m.table_lookup(scene.shape_bsdf,
                                             jnp.maximum(si.shape, 0)))
            out[name] = jnp.where(valid, alb, 0.0).reshape(h, w, 3)
        elif name == "emission":
            from ..emitter.dispatch import eval_emitter_hit
            em_val, eidx = eval_emitter_hit(scene, si, ray.d)
            em = jnp.where(((eidx >= 0) & si.valid)[:, None], em_val, 0.0)
            out[name] = em.reshape(h, w, 3)
        elif name == "prim_index":
            out[name] = si.prim.astype(jnp.float32).reshape(h, w)
        elif name == "shape_index":
            out[name] = si.shape.astype(jnp.float32).reshape(h, w)
        else:
            raise ValueError(f"unknown AOV {name}")
    return out


def render_moments(scene: Scene, spp: int | None = None, seed: int = 0):
    """Moment integrator (moment.cpp): per-pixel (mean, second moment) of
    the nested integrator's radiance — enough to build the variance images
    used by the reference's z-test golden machinery."""
    from . import common
    spp = spp or scene.spp
    w, h = scene.film_w, scene.film_h
    acc = jnp.zeros((h, w, 4))
    acc2 = jnp.zeros((h, w, 4))

    # accumulate mean and mean-of-squares with per-spp passes of 1 sample
    def body(i, carry):
        acc, acc2 = carry
        a = common.render_pass(scene, seed, 1, i, "primal")
        img = a[..., 0:3]
        wch = a[..., 3:4]
        acc = acc + a
        acc2 = acc2 + jnp.concatenate([img * img / jnp.maximum(wch, 1e-12),
                                       wch], -1)
        return acc, acc2
    acc, acc2 = jax.lax.fori_loop(0, spp, body, (acc, acc2))
    from .. import film as film_mod
    mean = film_mod.develop(acc)
    m2 = film_mod.develop(acc2)
    return mean, m2


def render_direct(scene: Scene, spp: int | None = None, seed: int = 0):
    """Direct-illumination integrator (direct.cpp): the path estimator cut
    at one bounce (emitter-hit + NEE MIS pair, identical weights)."""
    from . import common
    sc = scene.replace(integrator="path", max_depth=2)
    return common.render(sc, spp=spp, seed=seed)
