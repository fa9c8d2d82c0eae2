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


def test_pallas_far_from_origin_matches_brute(np_rng):
    """Scene translated ~1e4 units from the world origin: Baldwin-Weber's
    dn - n.o / r.p + d terms cancel catastrophically in fp32 without the
    local-frame re-centering (pack_tris `center`); Moeller-Trumbore (the
    brute path) subtracts o - p0 first and is the precision reference."""
    OFF = np.array([1.0e4, -7.0e3, 5.0e3], np.float32)
    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = 8
    d["sensor"]["film"]["height"] = 8
    scene = lr.load_dict(d)
    from liverrenderer_tpu.util import refresh_vertex_geometry
    # move the whole scene far away; the refit must adopt a fresh local
    # frame (this also covers the re-centering in the refit path itself)
    scene = refresh_vertex_geometry(scene, scene.vertices + OFF[None])

    n_rays = 512
    o = jnp.asarray(np_rng.uniform(-0.8, 0.8, (n_rays, 3)) + OFF,
                    jnp.float32)
    dirs = np_rng.normal(size=(n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ray = Ray(o=o, d=jnp.asarray(dirs), maxt=jnp.full((n_rays,), jnp.inf))

    tb, pb, _, _, _ = ray_intersect_preliminary(
        scene.replace(intersector="brute"), ray)
    with pltpu.force_tpu_interpret_mode():
        tp, pp, _, _, _ = ray_intersect_preliminary(
            scene.replace(intersector="pallas"), ray)
    tb, pb, tp, pp = map(np.asarray, (tb, pb, tp, pp))
    hit_b = pb >= 0
    assert hit_b.sum() > 100
    # identical hit sets (the failure mode is silent misses) and t within
    # a loose fp32 bound — without re-centering ~half the rays miss
    assert (hit_b == (pp >= 0)).mean() > 0.995
    both = hit_b & (pp >= 0)
    np.testing.assert_allclose(tp[both], tb[both], rtol=1e-3, atol=1e-3)


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


def test_streaming_kernel_matches_numpy(np_rng, monkeypatch):
    """Triangle sets past the VMEM-resident cap route through the
    streaming kernel (SUPER_T blocks pipelined from HBM, closest hit
    accumulated in the output across grid steps).  Block sizes are
    shrunk so interpret mode exercises >1 superblock; results must match
    a numpy Moeller-Trumbore sweep exactly."""
    import liverrenderer_tpu.accel.pallas_intersect as pk
    monkeypatch.setattr(pk, "MAX_VMEM_TRIS", 512)
    monkeypatch.setattr(pk, "SUPER_T", 512)

    T, R = 1500, 256
    v0 = np_rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    v1 = v0 + np_rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    v2 = v0 + np_rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    buf, boxes, kperm, center = pk.pack_tris(v0, v1, v2)
    assert buf.shape[0] == 1536 and buf.shape[0] % pk.SUPER_T == 0

    o = np_rng.uniform(-2, 2, (R, 3)).astype(np.float32)
    aim = np_rng.uniform(-0.6, 0.6, (R, 3)).astype(np.float32)
    d = aim - o                          # aim into the triangle cloud
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    with pltpu.force_tpu_interpret_mode():
        t, prim, _, _ = pk.intersect_tris(
            jnp.asarray(buf), jnp.asarray(boxes), jnp.asarray(kperm),
            jnp.asarray(o), jnp.asarray(d), jnp.full((R,), np.inf),
            jnp.full((R,), np.inf), center=jnp.asarray(center))
    t, prim = np.asarray(t), np.asarray(prim)

    # numpy closest-hit reference
    e1, e2 = v1 - v0, v2 - v0
    pv = np.cross(d[:, None], e2[None])              # (R, T, 3)
    det = np.einsum("tj,rtj->rt", e1, pv)
    inv = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0)
    tv = o[:, None] - v0[None]
    u = np.einsum("rtj,rtj->rt", tv, pv) * inv
    qv = np.cross(tv, e1[None])
    v = np.einsum("rj,rtj->rt", d, qv) * inv
    tt = np.einsum("tj,rtj->rt", e2, qv) * inv
    hit = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (tt > 0)
    tt = np.where(hit, tt, np.inf)
    t_ref = tt.min(1)
    p_ref = np.where(np.isfinite(t_ref), tt.argmin(1), -1)

    has = p_ref >= 0
    assert has.sum() > 50
    np.testing.assert_array_equal(prim >= 0, has)
    np.testing.assert_allclose(t[has], t_ref[has], rtol=2e-5, atol=1e-6)
    same = prim[has] == p_ref[has]
    assert same.mean() > 0.99          # ties on shared edges may differ
