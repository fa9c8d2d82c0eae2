"""Projective (visibility / discontinuity) gradients.

TPU-native redesign of the reference's projective-sampling machinery for
*primarily visible* silhouettes (python/ad/projective.py:28-190
init/sample_primarily_visible_silhouette + sensor_jacobian +
eval_primary_silhouette_radiance_difference, used by
direct_projective.py): interior gradients (shading/transport terms) flow
through the differentiable hit recompute; the MISSING piece round 1 was
the boundary term — the film-space line integral over silhouette edges

    dI_pix/dtheta = oint_{silhouettes}  dL * (dx_film/dtheta . n_hat)  dl

where dL is the radiance difference across the edge and n_hat the
film-space edge normal pointing into the background.

Design differences from the reference (Dr.Jit vcall/dr.switch machinery):
  * edge adjacency is ONE flat SoA table built once per mesh set (numpy,
    outside jit) instead of per-shape precomputed silhouette lists;
  * the silhouette test, categorical edge sampling, visibility test,
    radiance-difference estimation and the final VJP assembly are a
    single jit program — no per-shape dr.switch;
  * instead of Dr.Jit forward-AD through the projection (sensor_jacobian),
    the film-space velocity of the boundary enters as the analytically
    assembled scalar  S = sum delta[pix] * dL * (proj(x(V)) . n_hat) / p
    differentiated by jax.grad — only x(V) carries gradient.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.intersect import ray_intersect_preliminary, ray_test
from ..core.rng import hash_u32, make_sampler
from ..core.types import Ray
from ..scene.ir import SENSOR_ORTHOGRAPHIC, SENSOR_PERSPECTIVE, Scene
from ..util import apply_params

Array = jax.Array

_EDGE_CACHE: dict = {}


def edge_table(faces: np.ndarray, n_tris: int):
    """Unique-edge adjacency: (edge_v (E,2) int32, edge_f (E,2) int32,
    f1 = -1 for boundary edges).  Cached per faces buffer."""
    key = (faces.shape[0], n_tris, int(faces[:1].sum()) if n_tris else 0,
           int(faces[n_tris - 1:n_tris].sum()) if n_tris else 0)
    hit = _EDGE_CACHE.get(key)
    if hit is not None and np.array_equal(hit[2], faces[:n_tris]):
        return hit[0], hit[1]
    F = np.asarray(faces[:n_tris], np.int64)
    e = np.concatenate([F[:, [0, 1]], F[:, [1, 2]], F[:, [2, 0]]])
    fid = np.tile(np.arange(len(F)), 3)
    key_e = np.minimum(e[:, 0], e[:, 1]) << 32 \
        | np.maximum(e[:, 0], e[:, 1])
    order = np.argsort(key_e, kind="stable")
    key_s, e_s, f_s = key_e[order], e[order], fid[order]
    first = np.ones(len(key_s), bool)
    first[1:] = key_s[1:] != key_s[:-1]
    idx_first = np.nonzero(first)[0]
    ev = e_s[idx_first].astype(np.int32)
    ef = np.full((len(idx_first), 2), -1, np.int32)
    ef[:, 0] = f_s[idx_first]
    nxt = idx_first + 1
    has2 = nxt < len(key_s)
    has2[has2] &= key_s[nxt[has2]] == key_s[idx_first[has2]]
    ef[has2, 1] = f_s[nxt[has2]]
    out = (jnp.asarray(ev), jnp.asarray(ef))
    _EDGE_CACHE.clear()
    _EDGE_CACHE[key] = (out[0], out[1], F.astype(np.int32).copy())
    return out


def project_to_film(scene: Scene, p: Array) -> Array:
    """World point -> continuous pixel coordinates (the inverse of
    sensor/perspective.py sample_ray's film->direction map)."""
    sensor = scene.sensor
    w, h = scene.film_w, scene.film_h
    aspect = w / h
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]
    p_cam = (p - t) @ R            # R^T (p - t)
    if sensor.stype == SENSOR_ORTHOGRAPHIC:
        nx = (1.0 - p_cam[..., 0]) * 0.5
        ny = (1.0 - p_cam[..., 1] * aspect) * 0.5
    else:
        tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
        z = jnp.maximum(p_cam[..., 2], 1e-6)
        nx = (1.0 - p_cam[..., 0] / (z * tan_half)) * 0.5
        ny = (1.0 - p_cam[..., 1] * aspect / (z * tan_half)) * 0.5
    return jnp.stack([nx * w, ny * h], -1)


def silhouette_weights(scene: Scene, Vd: Array, edge_v: Array,
                       edge_f: Array):
    """Length-measure categorical weights over the silhouette edge set
    (the projective.py silhouette test): weight = edge length on
    silhouette edges, 0 elsewhere."""
    F = scene.faces
    cam = scene.sensor.to_world[:3, 3]
    p0, p1 = Vd[edge_v[:, 0]], Vd[edge_v[:, 1]]
    mid = 0.5 * (p0 + p1)

    def face_front(fi):
        f = F[jnp.maximum(fi, 0)]
        a, b, c = Vd[f[:, 0]], Vd[f[:, 1]], Vd[f[:, 2]]
        n = jnp.cross(b - a, c - a)
        return jnp.sum(n * (mid - cam), -1) < 0.0

    front0 = face_front(edge_f[:, 0])
    front1 = face_front(edge_f[:, 1])
    boundary = edge_f[:, 1] < 0
    sil = jnp.where(boundary, True, front0 != front1)
    length = jnp.linalg.norm(p1 - p0, axis=-1)
    return jnp.where(sil, length, 0.0), length


@partial(jax.jit, static_argnames=("n_samples", "sil_depth"))
def _boundary_grad_jit(scene: Scene, V: Array, edge_v: Array, edge_f: Array,
                       delta: Array, wgt: Array, seed, n_samples: int,
                       sil_depth: int):
    """Vertex-position cotangent of the primary-visibility boundary term.

    delta: (h, w, 3) dLoss/dImage; wgt: (E,) categorical edge weights
    (any measure supported on the silhouette set — uniform length or
    pilot-guided).  Returns (dLoss/dV (V,3), per-sample |contribution|
    (P,), sampled edge ids (P,)) — the latter two feed guiding.
    """
    w, h = scene.film_w, scene.film_h
    Vd = jax.lax.stop_gradient(V)
    cam = scene.sensor.to_world[:3, 3]
    _, length = silhouette_weights(scene, Vd, edge_v, edge_f)
    total_w = jnp.sum(wgt)

    # ---- sample n_samples points on the silhouette set ----
    u = make_sampler(jnp.arange(n_samples, dtype=jnp.uint32),
                     0, seed, kind="independent")
    u_pick, u = u.next_1d()
    u_t, u = u.next_1d()
    cdf = jnp.cumsum(wgt)
    e_idx = jnp.searchsorted(cdf, u_pick * total_w, side="right")
    e_idx = jnp.clip(e_idx, 0, edge_v.shape[0] - 1)
    i0 = edge_v[e_idx, 0]
    i1 = edge_v[e_idx, 1]
    tpar = u_t
    x = (1.0 - tpar[:, None]) * Vd[i0] + tpar[:, None] * Vd[i1]
    len_e = length[e_idx]
    valid = total_w > 0.0

    # the shape owning the (first adjacent) face, for fore/background
    # disambiguation
    own_shape = scene.tri_shape[jnp.maximum(edge_f[e_idx, 0], 0)]

    # ---- visibility from the camera ----
    to_x = x - cam
    dist = jnp.linalg.norm(to_x, axis=-1)
    d_cam = to_x / jnp.maximum(dist, 1e-9)[:, None]
    occ = ray_test(scene, Ray(o=jnp.broadcast_to(cam, x.shape), d=d_cam,
                              maxt=dist * (1.0 - 1e-3)))
    visible = ~occ & valid

    # ---- film position, local film velocity along the edge ----
    e_unit = (Vd[i1] - Vd[i0]) / jnp.maximum(len_e, 1e-9)[:, None]
    xf, dxf = jax.jvp(lambda q: project_to_film(scene, q), (x,), (e_unit,))
    speed = jnp.linalg.norm(dxf, axis=-1)            # px per scene unit
    ef_unit = dxf / jnp.maximum(speed, 1e-9)[:, None]
    n_hat = jnp.stack([-ef_unit[:, 1], ef_unit[:, 0]], -1)
    in_film = (xf[:, 0] >= 0.5) & (xf[:, 0] < w - 0.5) \
        & (xf[:, 1] >= 0.5) & (xf[:, 1] < h - 0.5)
    visible &= in_film & (speed > 1e-6)

    # ---- classify the two sides (foreground hits the owning shape at
    # ~the silhouette depth) and estimate the radiance difference ----
    eps_px = 0.1

    def side_ray(sgn):
        from ..sensor.perspective import sample_ray
        return sample_ray(scene, xf + sgn * eps_px * n_hat)

    ray_p = side_ray(+1.0)
    ray_m = side_ray(-1.0)

    def probe(ray):
        t, prim, _, _, sph = ray_intersect_preliminary(scene, ray)
        shp = jnp.where(prim >= 0, scene.tri_shape[jnp.maximum(prim, 0)], -1)
        near = jnp.abs(t - dist) < 0.05 * dist + 1e-3
        return (shp == own_shape) & near

    fg_p = probe(ray_p)
    fg_m = probe(ray_m)
    one_side = fg_p ^ fg_m
    visible &= one_side

    from .common import _integrator_sample
    smp = make_sampler(hash_u32(jnp.arange(n_samples, dtype=jnp.uint32),
                                jnp.uint32(0x9D7F3A21)),
                       0, seed, kind="independent")
    sc_sil = scene.replace(max_depth=min(scene.max_depth, sil_depth))
    L_p, _, smp = _integrator_sample(sc_sil, smp, ray_p, mode="primal")
    L_m, _, smp = _integrator_sample(sc_sil, smp, ray_m, mode="primal")
    L_p = jnp.where(jnp.isfinite(L_p), L_p, 0.0)
    L_m = jnp.where(jnp.isfinite(L_m), L_m, 0.0)
    # dL = L_foreground - L_background; n_hat oriented into the background
    dL = jnp.where(fg_p[:, None], L_p - L_m, L_m - L_p)
    n_bg = jnp.where(fg_p[:, None], -n_hat, n_hat)

    # ---- assemble the boundary VJP ----
    # film-space line density of the sampler with categorical edge
    # weights w_e:  p_film = (w_e / total_w) * 1/len_e * 1/speed  per
    # unit film length (uniform-by-length reduces to total_w * speed)
    inv_p = total_w * speed * len_e / jnp.maximum(wgt[e_idx], 1e-30)
    pix = jnp.clip(xf[:, 1].astype(jnp.int32), 0, h - 1) * w \
        + jnp.clip(xf[:, 0].astype(jnp.int32), 0, w - 1)
    d_pix = delta.reshape(-1, 3)[pix]
    coeff = jnp.sum(d_pix * dL, -1) * inv_p / n_samples
    coeff = jnp.where(visible, coeff, 0.0)
    coeff = jax.lax.stop_gradient(coeff)
    n_bg = jax.lax.stop_gradient(n_bg)

    def S(Vp):
        xv = (1.0 - tpar[:, None]) * Vp[i0] + tpar[:, None] * Vp[i1]
        xfv = project_to_film(scene, xv)
        return jnp.sum(coeff * jnp.sum(xfv * n_bg, -1))

    return jax.grad(S)(V), jnp.abs(coeff) * n_samples, e_idx


@partial(jax.jit, static_argnames=())
def _sil_weights_jit(scene: Scene, Vd: Array, edge_v: Array, edge_f: Array):
    return silhouette_weights(scene, Vd, edge_v, edge_f)[0]


def boundary_gradient(scene: Scene, params, delta_image, seed: int = 0,
                      n_samples: int = 1 << 16, sil_depth: int = 6,
                      guiding: str = "edges", pilot_frac: float = 0.25):
    """dLoss/d(vertices) boundary term.  `delta_image`: (h, w, 3) dL/dI.

    guiding="edges" runs the reference's two-stage projective sampling
    (ad/guiding.py distributions; PSIntegrator proj_mesh spec): a pilot
    round samples the silhouette uniformly by length, its per-sample
    |contribution| builds a guided per-edge distribution
    (guiding.edge_guided_weights), and the main round samples from it.
    The rounds are count-weighted together (both unbiased).
    guiding="none" is single-round uniform-by-length.

    Only triangle meshes contribute silhouettes (the reference's
    sphere/curve/SDF silhouette support is per-shape-type specialized,
    projective.py:765-833; meshes cover the shipped scene corpus)."""
    if scene.n_tris == 0 or "vertices" not in params:
        return jnp.zeros_like(scene.vertices)
    sc = apply_params(scene, {k: jax.lax.stop_gradient(v)
                              for k, v in params.items()})
    ev, ef = edge_table(np.asarray(sc.faces), sc.n_tris)
    V = params["vertices"]
    delta = jnp.asarray(delta_image)
    wgt0 = _sil_weights_jit(sc, jax.lax.stop_gradient(V), ev, ef)
    if guiding == "none":
        g, _, _ = _boundary_grad_jit(sc, V, ev, ef, delta, wgt0, seed,
                                     n_samples, sil_depth)
        return g
    n_pilot = max(256, int(n_samples * pilot_frac))
    n_main = max(256, n_samples - n_pilot)
    g1, mass, e_idx = _boundary_grad_jit(sc, V, ev, ef, delta, wgt0, seed,
                                         n_pilot, sil_depth)
    from .guiding import edge_guided_weights
    wgt1 = edge_guided_weights(mass, e_idx, wgt0)
    g2, _, _ = _boundary_grad_jit(sc, V, ev, ef, delta, wgt1, seed + 1,
                                  n_main, sil_depth)
    return (n_pilot * g1 + n_main * g2) / (n_pilot + n_main)
