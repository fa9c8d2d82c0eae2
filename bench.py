"""Benchmark: forward+backward rays/s/chip on the flagship configuration.

Metric per BASELINE.json: rays/s/chip fwd+bwd — here measured on the Cornell
box (the canonical config the reference can also run) as primary paths per
second through a differentiable render (forward + adjoint sweep), plus the
primal render rate.  Prints ONE JSON line.

Reference baseline to compare against: the fork renders Liver-SingleMesh
1920x1080 @ 256 spp / 12 bounces in 2.68 min on the author's box
(BASELINE.md) ~= 3.3 Mpaths/s primal. vs_baseline reports our primal
paths/s over that number.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    import liverrenderer_tpu as lr

    d = lr.cornell_box()
    d["sensor"]["film"]["width"] = 512
    d["sensor"]["film"]["height"] = 512
    d["integrator"]["max_depth"] = 8
    scene = lr.load_dict(d)
    spp = 64
    n_paths = 512 * 512 * spp

    # ---- primal ----
    img = lr.render(scene, spp=spp, seed=0)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        img = lr.render(scene, spp=spp, seed=i + 1)
        jax.block_until_ready(img)
    dt_primal = (time.perf_counter() - t0) / reps
    primal_rays = n_paths / dt_primal

    # ---- forward+backward (differentiable render, adjoint sweep) ----
    spp_b = 16
    n_paths_b = 512 * 512 * spp_b
    params = {"textures.data": scene.textures.data}

    def loss_fn(im):
        return jnp.mean(im)

    loss, grads, _ = lr.render_grad(scene, params, loss_fn, spp=spp_b, seed=0)
    jax.block_until_ready(grads)
    t0 = time.perf_counter()
    for i in range(reps):
        loss, grads, _ = lr.render_grad(scene, params, loss_fn, spp=spp_b,
                                        seed=i + 1)
        jax.block_until_ready(grads)
    dt_fwdbwd = (time.perf_counter() - t0) / reps
    fwdbwd_rays = n_paths_b / dt_fwdbwd

    baseline_paths_per_s = 1920 * 1080 * 256 / (2.6806 * 60)  # BASELINE.md
    print(json.dumps({
        "metric": "fwd+bwd paths/s/chip (cornell 512^2, d8; primal in extra)",
        "value": round(fwdbwd_rays),
        "unit": "paths/s",
        "vs_baseline": round(primal_rays / baseline_paths_per_s, 3),
        "extra": {
            "primal_paths_per_s": round(primal_rays),
            "primal_s_per_frame_512_64spp": round(dt_primal, 3),
            "fwdbwd_s": round(dt_fwdbwd, 3),
            "baseline_paths_per_s": round(baseline_paths_per_s),
        },
    }))


if __name__ == "__main__":
    main()
