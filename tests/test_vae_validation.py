"""Quantitative VAE-BSSRDF validation vs the volpath3d ground truth
(VERDICT r3 #3): the reference's own training methodology
(sss_particle_tracer.h:242,335) — the learned model must reproduce the
brute-force walk's absorption probability and exit-position distribution
on spheres across medium grid points.  Runs the FULL production plumbing
(per-vertex poly fit -> feature normalization -> light-space rotation ->
decoder -> projection, ssub/event.py), so a regression anywhere in that
chain fails this test.  Thresholds calibrated on 8k-walker runs
(tools/vae_validate.py); the g/eta extremes are excluded because the
ground-truth walk omits internal Fresnel re-entry (a GT simplification,
not a model defect).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from liverrenderer_tpu.ssub import vae  # noqa: E402


@pytest.mark.skipif(not vae.model_available(),
                    reason="reference VAE weights not present")
@pytest.mark.parametrize("sigma_t,albedo", [(50.0, 0.95), (50.0, 0.90)])
def test_vae_matches_ground_truth_walk(sigma_t, albedo):
    from vae_validate import run_point

    row = run_point(sigma_t, albedo, g=0.0, eta=1.0, n=2048)
    v, g = row["vae"], row["gt"]

    # absorption head vs conditioned walk absorption rate
    assert abs(v["absorb_p"] - g["absorb_rate"]) < 0.12, row
    # exit-distance distribution: mean + median within calibrated bands
    assert 0.6 < v["exit_mean"] / g["exit_mean"] < 1.6, row
    assert 0.55 < v["exit_q"][1] / g["exit_q"][1] < 1.9, row
    # enough lanes actually completed the VAE path (projection succeeded):
    # the expected survivor count is n * (1 - absorb_p)
    assert v["n_exits"] > 0.8 * 2048 * (1.0 - v["absorb_p"]), row


@pytest.mark.skipif(not vae.model_available(),
                    reason="reference VAE weights not present")
def test_vae_exits_project_onto_surface():
    """Every VAE exit must land on the geometry (|p| = 1 on the unit
    sphere) — the projectPointsToSurface contract."""
    import jax.numpy as jnp

    import liverrenderer_tpu as lr
    from liverrenderer_tpu.accel.intersect import ray_intersect
    from liverrenderer_tpu.core.rng import make_sampler
    from liverrenderer_tpu.core.types import Ray
    from liverrenderer_tpu.ssub.event import subsurface_event
    from vae_validate import uv_sphere

    n = 1024
    verts, faces = uv_sphere()
    d = {"type": "scene",
         "integrator": {"type": "path", "max_depth": 4},
         "sensor": {"type": "perspective", "fov": 30.0,
                    "to_world": lr.Transform().look_at([0, 0, 4], [0, 0, 0],
                                                       [0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 8, "height": 8,
                             "rfilter": {"type": "box"}}},
         "blob": {"type": "mesh", "vertices": verts, "faces": faces,
                  "subsurface": {"type": "vaescatter",
                                 "sigmaT": {"type": "rgb",
                                            "value": [50.0] * 3},
                                 "albedo": {"type": "rgb",
                                            "value": [0.95] * 3},
                                 "g": 0.0, "eta": 1.0}},
         "lamp": {"type": "point", "position": [3, 3, 3],
                  "intensity": {"type": "rgb", "value": [10.0] * 3}}}
    scene = lr.load_dict(d)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 4.0]]), (n, 1))
    dd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    si = ray_intersect(scene, Ray(o=o, d=dd, maxt=jnp.full((n,), jnp.inf)))
    sampler = make_sampler(jnp.arange(n, dtype=jnp.uint32),
                           jnp.zeros((n,), jnp.uint32), jnp.uint32(3),
                           kind=scene.sampler_kind, spp=1)
    ev, _ = subsurface_event(scene, si, dd, sampler, jnp.ones((n,), bool))
    exits = np.asarray(ev.alive & ~ev.passthrough)
    r = np.linalg.norm(np.asarray(ev.out_p), axis=-1)[exits]
    absorb = float(np.asarray(ev.absorb_p)[0])
    assert exits.sum() > 0.7 * n * (1.0 - absorb)
    # triangulated unit sphere: radius within the facet sagitta (~0.01)
    np.testing.assert_array_less(np.abs(r - 1.0), 0.02)


@pytest.mark.skipif(not vae.model_available(),
                    reason="reference VAE weights not present")
def test_vae_uses_training_feature_stats():
    """The shipped model was trained with light-space poly stats
    (training-metadata.json shape_features_name=mlsPolyLS3); loading must
    honor that (round-4 fix: world-space stats under the LS rotation made
    the model mispredict absorption 6x)."""
    w = vae.load_model()
    import json
    stats = json.load(open(vae.DEFAULT_STATS))
    np.testing.assert_allclose(np.asarray(w.feat_mean),
                               np.asarray(stats["mlsPolyLS3_mean"],
                                          np.float32))
