"""Viewer / denoiser tests (realtime.hpp + Denoise.py capability analogs)."""
import numpy as np

import liverrenderer_tpu as lr
from liverrenderer_tpu.viewer import denoise, run_viewer


def _scene(w=48):
    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = w
    d["sensor"]["film"]["height"] = w
    return lr.load_dict(d)


def test_viewer_ema_converges():
    scene = _scene()
    frames = []
    run_viewer(scene, n_frames=6, spp=2, mode="ema", ema_alpha=0.3,
               frame_callback=lambda i, img: frames.append(img.copy()))
    ref = np.asarray(lr.render(scene, spp=64, seed=99))
    err_first = np.abs(frames[0] - ref).mean()
    err_last = np.abs(frames[-1] - ref).mean()
    assert err_last < err_first
    assert np.isfinite(frames[-1]).all()


def test_viewer_orbit_moves_camera():
    scene = _scene(w=32)
    frames = []
    run_viewer(scene, n_frames=2, spp=2, mode="accum",
               camera_orbit_deg=40.0,
               frame_callback=lambda i, img: frames.append(img.copy()))
    assert np.abs(frames[0] - frames[1]).max() > 0.05


def test_denoiser_smooths_flat_regions():
    scene = _scene()
    noisy = np.asarray(lr.render(scene, spp=2, seed=0))
    aovs = lr.render_aovs(scene, ("albedo", "sh_normal"))
    dn = denoise(noisy, np.asarray(aovs["albedo"]),
                 np.asarray(aovs["sh_normal"]))
    # variance within the flat back-wall region must drop
    region = (slice(18, 30), slice(18, 30))
    assert dn[region].var() < noisy[region].var()
    assert np.isfinite(dn).all()


def test_atrous_denoiser_beats_bilateral():
    """The SVGF-style a-trous denoiser must cut low-spp noise
    substantially more than the single-pass joint-bilateral stand-in
    (both guided by the same albedo/normal AOVs)."""
    import numpy as np

    import liverrenderer_tpu as lr
    from liverrenderer_tpu.denoise import atrous_denoise
    from liverrenderer_tpu.viewer import denoise as bilateral

    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = 48
    d["sensor"]["film"]["height"] = 48
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    scene = lr.load_dict(d).replace(max_depth=4)

    from liverrenderer_tpu.denoise import estimator_variance
    noisy, var = estimator_variance(scene, 4, seed=0)
    noisy = np.asarray(noisy)
    ref = np.asarray(lr.render(scene, spp=256, seed=7))
    aovs = lr.render_aovs(scene, ("albedo", "sh_normal", "emission"),
                          seed=0)
    alb = np.asarray(aovs["albedo"])
    nrm = np.asarray(aovs["sh_normal"])

    den_at = np.asarray(atrous_denoise(noisy, alb, nrm, variance=var,
                                       emission=aovs["emission"],
                                       iterations=2))
    den_bi = bilateral(noisy, alb, nrm)

    def rmse(a):
        return float(np.sqrt(np.mean((np.clip(a, 0, 4)
                                      - np.clip(ref, 0, 4)) ** 2)))
    e_noisy, e_bi, e_at = rmse(noisy), rmse(den_bi), rmse(den_at)
    assert e_at < 0.75 * e_noisy, (e_noisy, e_at)
    assert e_at < e_bi, (e_bi, e_at)
    # energy preservation: the filter must not destroy firefly energy
    assert abs(den_at.mean() - ref.mean()) / ref.mean() < 0.02
