"""Round-5 A/B: diagnose the r4 primal regression in ONE process.

Compares on the bench config (Liver-SingleMesh 428x240@64spp):
  A. render_regen (single device execution)
  B. render_regen_host (probe-chunked: 2x32spp for this budget)
  C. matmul precision: "highest" (current default) vs "default" for A
  D. wavefront size sweep for A

All measurements in one process, best-of-N, so the cross-process +-20%
drift cannot confound the comparison.
"""
import sys

sys.path.insert(0, "/root/repo")

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402

import liverrenderer_tpu as lr  # noqa: E402
from liverrenderer_tpu.integrators import regen  # noqa: E402

SCENE = "/root/reference/scenes/Liver-SingleMesh/mitsuba3/scene.xml"
W, H, SPP = 428, 240, 64
N_PATHS = W * H * SPP
REPS = 5


def best_of(fn, reps=REPS):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main():
    scene = lr.load_file(SCENE, res_width=W, res_height=H, spp=SPP)
    out = {}

    # A: single execution
    def run_single():
        np.asarray(regen.render_regen(scene, 1, SPP))
    t, tm = best_of(run_single)
    out["A_single_exec"] = {"best_s": round(t, 3), "mean_s": round(tm, 3),
                            "paths_per_s": round(N_PATHS / t)}

    # B: host probe-chunked (what lr.render does today)
    def run_host():
        np.asarray(regen.render_regen_host(scene, 1, SPP))
    t, tm = best_of(run_host)
    out["B_host_chunked"] = {"best_s": round(t, 3), "mean_s": round(tm, 3),
                             "paths_per_s": round(N_PATHS / t)}

    # C: matmul precision default (bf16 MXU) for the single exec
    with jax.default_matmul_precision("default"):
        def run_bf16():
            np.asarray(regen.render_regen(scene, 2, SPP))
        t, tm = best_of(run_bf16)
    out["C_single_bf16mm"] = {"best_s": round(t, 3), "mean_s": round(tm, 3),
                              "paths_per_s": round(N_PATHS / t)}

    # D: wavefront sizes (A is 64k default).  REGEN_WAVEFRONT is read at
    # trace time and is NOT in the jit cache key — clear the cache so the
    # new size actually compiles (persistent cache keeps this cheap).
    for wshift in (15, 17):
        regen_W = 1 << wshift
        old = regen.REGEN_WAVEFRONT
        regen.REGEN_WAVEFRONT = regen_W
        regen.render_regen.clear_cache()
        try:
            def run_w():
                np.asarray(regen.render_regen(scene, 3, SPP))
            t, tm = best_of(run_w, reps=3)
            out[f"D_single_W{regen_W >> 10}k"] = {
                "best_s": round(t, 3), "paths_per_s": round(N_PATHS / t)}
        finally:
            regen.REGEN_WAVEFRONT = old
            regen.render_regen.clear_cache()

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
