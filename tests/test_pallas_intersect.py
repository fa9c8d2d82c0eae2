"""Pallas intersect kernel vs the XLA brute-force reference.

Runs in interpreter mode on CPU (the kernel itself is exercised compiled on
real TPU by the benchmarks); contract: identical hits, t/u/v to fp32
tolerance (intersect.py `brute` and `pallas` strategies must agree ~1e-6,
see .claude verify notes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import liverrenderer_tpu as lr
from liverrenderer_tpu.accel.intersect import ray_intersect_preliminary
from liverrenderer_tpu.core.types import Ray


def _rand_scene_and_rays(np_rng, n_rays=512):
    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    scene = lr.load_dict(d)
    o = jnp.asarray(np_rng.uniform(-0.8, 0.8, (n_rays, 3)), jnp.float32)
    dirs = np_rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ray = Ray(o=o, d=jnp.asarray(dirs), maxt=jnp.full((n_rays,), jnp.inf))
    return scene, ray


def test_pallas_matches_brute(np_rng):
    scene, ray = _rand_scene_and_rays(np_rng)
    tb, pb, ub, vb, _ = ray_intersect_preliminary(
        scene.replace(intersector="brute"), ray)
    with pltpu.force_tpu_interpret_mode():
        tp, pp, up, vp, _ = ray_intersect_preliminary(
            scene.replace(intersector="pallas"), ray)
    tb, pb, ub, vb = map(np.asarray, (tb, pb, ub, vb))
    tp, pp, up, vp = map(np.asarray, (tp, pp, up, vp))
    hit_b = pb >= 0
    hit_p = pp >= 0
    np.testing.assert_array_equal(hit_b, hit_p)
    assert hit_b.sum() > 100  # rays inside the box: nearly all hit
    np.testing.assert_allclose(tp[hit_b], tb[hit_b], rtol=1e-5, atol=1e-6)
    # ties on shared edges can pick either triangle; t must still agree
    same = pb == pp
    assert same[hit_b].mean() > 0.99
    # the kernel carries only (t, prim); barycentrics are re-derived in
    # compute_si — compare hit positions through the full interaction
    from liverrenderer_tpu.accel.intersect import ray_intersect
    si_b = ray_intersect(scene.replace(intersector="brute"), ray)
    with pltpu.force_tpu_interpret_mode():
        si_p = ray_intersect(scene.replace(intersector="pallas"), ray)
    pb3 = np.asarray(si_b.p)[same & hit_b]
    pp3 = np.asarray(si_p.p)[same & hit_b]
    np.testing.assert_allclose(pp3, pb3, rtol=1e-4, atol=1e-5)


def test_pallas_respects_maxt(np_rng):
    scene, ray = _rand_scene_and_rays(np_rng, n_rays=256)
    with pltpu.force_tpu_interpret_mode():
        t_far, p_far, _, _, _ = ray_intersect_preliminary(
            scene.replace(intersector="pallas"), ray)
        near = Ray(o=ray.o, d=ray.d,
                   maxt=jnp.where(jnp.isfinite(t_far), t_far * 0.5, 1e-3))
        t_near, p_near, _, _, _ = ray_intersect_preliminary(
            scene.replace(intersector="pallas"), near)
    assert (np.asarray(p_near) < 0).all()
