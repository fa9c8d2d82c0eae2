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
elif mode == "cornell_tent":
    d["sensor"]["film"]["rfilter"] = {"type": "tent"}
scene = lr.load_dict(d)
t0 = time.time()
img = np.asarray(lr.render(scene, spp=16, seed=0))
print(f"{mode}: ok {time.time()-t0:.1f}s mean {img.mean():.4f} finite {np.isfinite(img).all()}", flush=True)
