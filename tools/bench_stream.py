"""Streaming-intersect benchmark: rays/s on a large (>=500k tri) mesh.

VERDICT round-1 weak #8 / next #9: characterize the intersect path past
the 64k VMEM-resident cap.  Generates a subdivided icosphere (~524k
tris), fires a camera-like wavefront at it, and times:
  * the streaming Pallas kernel (SUPER_T blocks pipelined from HBM),
  * the lockstep-BVH fallback (same rays, same mesh),
and a liver-sized mesh through the resident kernel for reference.

Run on TPU:  python tools/bench_stream.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/lr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def icosphere(subdiv: int):
    """Subdivided icosahedron: 20 * 4^subdiv triangles."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int64)
    for _ in range(subdiv):
        verts = v[f]                                     # (F, 3, 3)
        m01 = verts[:, 0] + verts[:, 1]
        m12 = verts[:, 1] + verts[:, 2]
        m20 = verts[:, 2] + verts[:, 0]
        mids = np.stack([m01, m12, m20], 1)
        mids /= np.linalg.norm(mids, axis=-1, keepdims=True)
        nv = np.concatenate([verts, mids], 1)            # (F, 6, 3)
        base = len(v) * 0  # rebuild flat (dedup not needed for benching)
        allv = nv.reshape(-1, 3)
        idx = np.arange(len(allv)).reshape(-1, 6)
        f = np.concatenate([
            np.stack([idx[:, 0], idx[:, 3], idx[:, 5]], 1),
            np.stack([idx[:, 3], idx[:, 1], idx[:, 4]], 1),
            np.stack([idx[:, 5], idx[:, 4], idx[:, 2]], 1),
            np.stack([idx[:, 3], idx[:, 4], idx[:, 5]], 1)], 0) + base
        v = allv
    return v.astype(np.float32), f.astype(np.int32)


def make_rays(n, rng):
    o = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    tgt = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def time_kernel(fn, reps=5):
    fn()                                  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import liverrenderer_tpu.accel.pallas_intersect as pk

    rng = np.random.default_rng(0)
    v, f = icosphere(7)                   # 20 * 4^7 = 327,680... subdiv 7
    # subdiv such that tris >= 500k: 20*4^7 = 327,680; use 8 -> 1.31M
    v8, f8 = icosphere(8)
    print(f"# mesh A: {len(f)} tris, mesh B: {len(f8)} tris")

    N_RAYS = 1 << 18                      # 262k rays
    o, d = make_rays(N_RAYS, rng)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    inf = jnp.full((N_RAYS,), jnp.inf)

    results = {}
    for name, (vv, ff) in (("327k", (v, f)), ("1.3M", (v8, f8))):
        # pack in BVH-leaf order (the production path, builder.py): the
        # chunk/superblock AABB culling depends on spatial locality
        from liverrenderer_tpu.accel.bvh import build_bvh
        perm = build_bvh(vv[ff[:, 0]], vv[ff[:, 1]], vv[ff[:, 2]]).perm
        buf, boxes, kperm, center = pk.pack_tris(
            vv[ff[:, 0]], vv[ff[:, 1]], vv[ff[:, 2]], perm)
        bufj = jnp.asarray(buf)
        boxesj = jnp.asarray(boxes)
        kpj = jnp.asarray(kperm)
        cj = jnp.asarray(center)

        for sort in (False, True):
            def run():
                t, prim, _, _ = pk.intersect_tris(bufj, boxesj, kpj, oj, dj,
                                                  inf, inf, sort=sort,
                                                  center=cj)
                t.block_until_ready()
                return t, prim
            dt = time_kernel(run)
            t, prim = run()
            hit_rate = float((np.asarray(prim) >= 0).mean())
            results[name + ("_sorted" if sort else "")] = {
                "tris": int(len(ff)),
                "rays_per_s": round(N_RAYS / dt),
                "ray_tri_tests_per_s": round(N_RAYS * len(ff) / dt),
                "ms": round(dt * 1e3, 2),
                "hit_rate": round(hit_rate, 3),
            }

    # BVH fallback comparison on the 327k mesh, in a SUBPROCESS: a device
    # fault or watchdog kill inside the lockstep traversal must not poison
    # this process's TPU client (observed: "TPU device error" leaking into
    # subsequent launches)
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, __file__, "--bvh-child"],
        timeout=1800, capture_output=True, text=True)
    try:
        results["bvh_327k"] = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:                          # noqa: BLE001
        results["bvh_327k"] = {"error": (r.stderr or r.stdout)[-300:]}

    print(json.dumps({"metric": "streaming intersect rays/s",
                      "value": results["1.3M"]["rays_per_s"],
                      "unit": "rays/s", "extra": results}))


def bvh_child():
    """Time the lockstep-BVH strategy on the 327k icosphere (subprocess
    entry; prints one JSON line)."""
    import liverrenderer_tpu as lr
    from liverrenderer_tpu.accel.intersect import ray_intersect_preliminary
    from liverrenderer_tpu.core.types import Ray

    rng = np.random.default_rng(0)
    v, f = icosphere(7)
    o, d = make_rays(N_RAYS := 1 << 18, rng)
    scene = lr.load_dict({
        "type": "scene",
        "integrator": {"type": "path"},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": lr.Transform().look_at([0, 0, 3], [0, 0, 0],
                                                      [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8}},
        "mesh": {"type": "mesh", "vertices": v, "faces": f},
    })
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
              maxt=jnp.full((N_RAYS,), jnp.inf))
    sc = scene.replace(intersector="bvh")

    @jax.jit
    def go(sc, ray):
        return ray_intersect_preliminary(sc, ray)

    out = go(sc, ray)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = go(sc, ray)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    hit = float((np.asarray(out[1]) >= 0).mean())
    print(json.dumps({"rays_per_s": round(N_RAYS / dt),
                      "ms": round(dt * 1e3, 2), "hit_rate": round(hit, 3)}))


if __name__ == "__main__":
    import sys as _sys
    if "--bvh-child" in _sys.argv:
        bvh_child()
    else:
        main()
