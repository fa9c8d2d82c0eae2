"""Multi-chip sharding (parallel/mesh.py): sample-sharded and pixel-tiled
renders must match single-device output on the virtual 8-device mesh."""
import jax
import numpy as np
import pytest

import liverrenderer_tpu as lr
from liverrenderer_tpu.parallel.mesh import (make_mesh, render_sharded,
                                             render_tiled)


@pytest.fixture(scope="module")
def scene():
    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = 32
    d["sensor"]["film"]["height"] = 32
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    return lr.load_dict(d)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sample_sharded_matches_single(scene):
    mesh = make_mesh(8)
    img = np.asarray(render_sharded(scene, mesh, spp=16, seed=0))
    ref = np.asarray(lr.render(scene, spp=16, seed=0, mode="ad"))
    np.testing.assert_allclose(img, ref, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pixel_tiled_matches_single(scene):
    mesh = make_mesh(8)
    img = np.asarray(render_tiled(scene, mesh, spp=16, seed=0))
    ref = np.asarray(lr.render(scene, spp=16, seed=0, mode="ad"))
    np.testing.assert_allclose(img, ref, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_pixel_tiled_interleaved_matches_contiguous(scene):
    """Round-robin row assignment (load-balanced) must produce the same
    image as the static slab split — only the device->row mapping moves."""
    mesh = make_mesh(8)
    a = np.asarray(render_tiled(scene, mesh, spp=8, seed=0,
                                interleave=True))
    b = np.asarray(render_tiled(scene, mesh, spp=8, seed=0,
                                interleave=False))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_measure_scaling_smoke(scene):
    from liverrenderer_tpu.parallel.mesh import measure_scaling
    stats = measure_scaling(scene, 8, spp=8, reps=1)
    assert stats["n_devices"] == 8
    key = ("efficiency_proxy" if "efficiency_proxy" in stats
           else "efficiency")
    assert stats[key] > 0.0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    from liverrenderer_tpu.checkpoint import OptimizationCheckpointer
    params = {"a": jnp.arange(4.0), "b": jnp.ones((2, 3)) * 2}
    opt = optax.adam(0.1)
    st = opt.init(params)
    ck = OptimizationCheckpointer(str(tmp_path / "ck"))
    assert ck.latest_step() is None
    ck.save(3, params, st)
    ck.save(7, params, st)
    assert ck.latest_step() == 7
    step, p2, s2 = ck.restore(params, st)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(p2["a"]), np.arange(4.0))
    ck.close()
