import sys, os; sys.path.insert(0, "/root/repo")
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/lr_tpu_jax_cache")
import numpy as np
import liverrenderer_tpu as lr

mode = sys.argv[1]
d = lr.cornell_box()
d["sensor"]["film"]["width"] = 64; d["sensor"]["film"]["height"] = 64
if mode == "cornell":
    pass
elif mode == "cornell_sphere":
    d["ball"] = {"type": "sphere", "to_world": lr.Transform().translate([0.2,-0.5,0.2]).scale(0.3),
                 "bsdf": {"type": "diffuse"}}
elif mode == "cornell_sphere_medium":
    d["ball"] = {"type": "sphere", "to_world": lr.Transform().translate([0.2,-0.5,0.2]).scale(0.3),
                 "bsdf": {"type": "dielectric"},
                 "interior": {"type": "homogeneous",
                              "sigma_t": {"type": "rgb", "value": [2.0]*3},
                              "albedo": {"type": "rgb", "value": [0.8]*3}}}
    d["integrator"] = {"type": "volpath", "max_depth": 65}
elif mode == "cornell_sphere_medium_tent":
    d["ball"] = {"type": "sphere", "to_world": lr.Transform().translate([0.2,-0.5,0.2]).scale(0.3),
                 "bsdf": {"type": "dielectric"},
                 "interior": {"type": "homogeneous",
                              "sigma_t": {"type": "rgb", "value": [2.0]*3},
                              "albedo": {"type": "rgb", "value": [0.8]*3}}}
    d["integrator"] = {"type": "volpath", "max_depth": 65}
    d["sensor"]["film"]["rfilter"] = {"type": "tent"}
elif mode == "cornell_tent":
    d["sensor"]["film"]["rfilter"] = {"type": "tent"}
if mode.startswith("slce"):
    from liverrenderer_tpu.scene.xml import parse_xml
    from liverrenderer_tpu.scene.builder import load_dict
    import os
    xml = "/root/reference/scenes/SphereLiverConstEnv/mitsuba3/scene.xml"
    ov = {"res_width": 64, "res_height": 36, "spp": 16}
    if "big" in mode:
        ov = {"res_width": 128, "res_height": 72, "spp": 8}
    if "path" in mode:
        ov["integrator"] = "path"
    d = parse_xml(xml, ov)
    for k, v in list(d.items()):
        if not isinstance(v, dict):
            continue
        if "box" in mode and v.get("type") == "hdrfilm":
            pass
        if "homog" in mode and v.get("type") == "liver":
            d[k] = {"type": "homogeneous",
                    "sigma_t": {"type": "rgb", "value": [1.0]*3},
                    "albedo": {"type": "rgb", "value": [0.75]*3}}
        if "nochecker" in mode and v.get("type") == "diffuse":
            for pk, pv in list(v.items()):
                if isinstance(pv, dict) and pv.get("type") == "checkerboard":
                    v[pk] = {"type": "rgb", "value": [0.5]*3}
    if "box" in mode:
        # replace the film rfilter
        def fix(dd):
            for k, v in dd.items():
                if isinstance(v, dict):
                    if v.get("type") == "tent":
                        dd[k] = {"type": "box"}
                    else:
                        fix(v)
        fix(d)
    scene = load_dict(d, base_dir=os.path.dirname(xml))
else:
    scene = lr.load_dict(d)
import os
SPP = int(os.environ.get("PROBE_SPP", "16"))
t0 = time.time()
img = np.asarray(lr.render(scene, spp=SPP, seed=0))
print(f"{mode}: ok {time.time()-t0:.1f}s mean {img.mean():.4f} finite {np.isfinite(img).all()}", flush=True)

# scene-based modes appended by the round-3 crash bisection
