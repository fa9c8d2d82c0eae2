"""Emitter sampling & evaluation over the wavefront.

Functional contract mirrors reference Scene::sample_emitter_direction /
pdf_emitter_direction (src/render/scene.cpp + endpoint.cpp) and the emitter
plugins (src/emitters/{area,point,constant,envmap,directional,spot}.cpp),
with dense-table dispatch like the BSDF layer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from ..core.types import DirectionSample
from ..scene.ir import (EMITTER_AREA, EMITTER_CONSTANT, EMITTER_DIRECTIONAL,
                        EMITTER_ENVMAP, EMITTER_POINT, EMITTER_PROJECTOR,
                        EMITTER_SPOT, Scene, SHAPE_SPHERE)
from ..texture.eval import eval_texture

WORLD_RADIUS = 1e4  # distance placed on env/directional samples


def _sample_shape_position(scene: Scene, shape_idx, u2, u_reuse):
    """Uniform-area sample on an area emitter's shape (mesh triangles or an
    analytic sphere).  Returns (p, n, pdf_area)."""
    stype = m.table_lookup(scene.shape_type, shape_idx)
    off = m.table_lookup(scene.shape_prim_offset, shape_idx)
    cnt = m.table_lookup(scene.shape_prim_count, shape_idx)
    area = m.table_lookup(scene.shape_area, shape_idx)

    # --- mesh: pick a triangle via the global area cdf segment ---
    base = jnp.where(off > 0, scene.tri_area_cdf[jnp.maximum(off - 1, 0)], 0.0)
    x = base + u_reuse * area
    tri = jnp.clip(jnp.searchsorted(scene.tri_area_cdf, x, side="left"),
                   off, off + jnp.maximum(cnt - 1, 0)).astype(jnp.int32)
    f = scene.faces[jnp.clip(tri, 0, scene.faces.shape[0] - 1)]
    p0 = scene.vertices[f[:, 0]]
    p1 = scene.vertices[f[:, 1]]
    p2 = scene.vertices[f[:, 2]]
    b = warp.square_to_uniform_triangle(u2)
    w = 1.0 - b[..., 0] - b[..., 1]
    p_mesh = p0 * w[:, None] + p1 * b[..., 0:1] + p2 * b[..., 1:2]
    n_mesh = m.normalize(jnp.cross(p1 - p0, p2 - p0))

    # --- sphere: uniform area ---
    sp = jnp.clip(off, 0, jnp.maximum(scene.n_spheres - 1, 0))
    c = m.table_lookup(scene.sph_center, sp) if scene.n_spheres > 0 \
        else jnp.zeros_like(p_mesh)
    r = m.table_lookup(scene.sph_radius, sp) if scene.n_spheres > 0 \
        else jnp.ones(p_mesh.shape[:-1])
    d_sph = warp.square_to_uniform_sphere(u2)
    p_sph = c + d_sph * r[..., None]

    is_sph = stype == SHAPE_SPHERE
    p = jnp.where(is_sph[:, None], p_sph, p_mesh)
    n = jnp.where(is_sph[:, None], d_sph, n_mesh)
    pdf_area = 1.0 / jnp.maximum(area, 1e-20)
    return p, n, pdf_area


def sample_emitter_direction(scene: Scene, ref_p, u2, u1) -> tuple:
    """Next-event estimation: pick an emitter (discrete distr) then sample a
    direction toward it.  Returns (DirectionSample, emitted/pdf weight).
    Occlusion is NOT tested here (integrators trace their own shadow rays,
    matching sample_emitter_direction(test_visibility=false) in the fork's
    biovolpath.cpp:390)."""
    em = scene.emitters
    if em.count == 0:
        n = ref_p.shape[0]
        ds = DirectionSample(
            p=jnp.zeros((n, 3)), n=jnp.zeros((n, 3)), d=jnp.zeros((n, 3)),
            dist=jnp.zeros((n,)), pdf=jnp.zeros((n,)),
            delta=jnp.zeros((n,), bool), emitter=jnp.full((n,), -1, jnp.int32))
        return ds, jnp.zeros((n, 3))

    eidx, u_sel, sel_pdf = em.distr.sample_reuse(u1)
    etype = m.table_lookup(em.etype, eidx)
    prm = m.table_lookup(em.params, eidx)
    n_l = ref_p.shape[0]

    p = jnp.zeros((n_l, 3))
    nrm = jnp.zeros((n_l, 3))
    d = jnp.zeros((n_l, 3))
    dist = jnp.full((n_l,), WORLD_RADIUS)
    pdf = jnp.zeros((n_l,))
    delta = jnp.zeros((n_l,), bool)
    value = jnp.zeros((n_l, 3))

    tp = em.types_present
    if EMITTER_AREA in tp:
        sp, sn, pdf_area = _sample_shape_position(
            scene, m.table_lookup(em.shape, eidx), u2, u_sel)
        dvec = sp - ref_p
        dist2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
        dist_a = jnp.sqrt(dist2)
        dd = dvec / dist_a[:, None]
        cos_e = -jnp.sum(dd * sn, -1)
        # area pdf -> solid angle
        pdf_a = pdf_area * dist2 / jnp.maximum(cos_e, 1e-20)
        pdf_a = jnp.where(cos_e > 0, pdf_a, 0.0)
        rad = eval_texture(scene.textures, m.table_lookup(em.tex0, eidx),
                           jnp.zeros((n_l, 2)))
        rad = rad * prm[..., 0:3]
        sel = etype == EMITTER_AREA
        p = jnp.where(sel[:, None], sp, p)
        nrm = jnp.where(sel[:, None], sn, nrm)
        d = jnp.where(sel[:, None], dd, d)
        dist = jnp.where(sel, dist_a, dist)
        pdf = jnp.where(sel, pdf_a, pdf)
        value = jnp.where(sel[:, None], jnp.where((cos_e > 0)[:, None], rad, 0.0), value)

    if EMITTER_POINT in tp:
        pos = prm[..., 0:3]
        inten = prm[..., 3:6]
        dvec = pos - ref_p
        dist2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
        dist_p = jnp.sqrt(dist2)
        dd = dvec / dist_p[:, None]
        sel = etype == EMITTER_POINT
        p = jnp.where(sel[:, None], pos, p)
        d = jnp.where(sel[:, None], dd, d)
        dist = jnp.where(sel, dist_p, dist)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        value = jnp.where(sel[:, None], inten / dist2[:, None], value)

    if EMITTER_CONSTANT in tp:
        dd = warp.square_to_uniform_sphere(u2)
        sel = etype == EMITTER_CONSTANT
        p = jnp.where(sel[:, None], ref_p + dd * WORLD_RADIUS, p)
        d = jnp.where(sel[:, None], dd, d)
        pdf = jnp.where(sel, warp.INV_FOURPI, pdf)
        value = jnp.where(sel[:, None],
                          prm[..., 0:3] / warp.INV_FOURPI**0 * (4 * jnp.pi), value)
        # value = radiance / pdf folded below; keep radiance here
        value = jnp.where(sel[:, None], prm[..., 0:3], value)

    if EMITTER_ENVMAP in tp:
        # importance sample the latitude-longitude map
        pos_lm, cell_pdf = em.env_distr.sample(u2)
        h, w = em.env_distr.data.shape
        phi = pos_lm[..., 0] / w * (2 * jnp.pi)
        theta = pos_lm[..., 1] / h * jnp.pi
        st = jnp.sin(theta)
        # local dir in envmap frame (mitsuba convention: v=theta, u=phi)
        d_loc = jnp.stack([st * jnp.sin(phi), jnp.cos(theta),
                           -st * jnp.cos(phi)], -1)
        tw = m.table_lookup(em.to_world, eidx)
        dd = jnp.einsum("nij,nj->ni", tw[:, :3, :3], d_loc)
        pdf_e = cell_pdf * (h * w) / (2.0 * jnp.pi * jnp.pi * jnp.maximum(st, 1e-6))
        rad = _env_radiance(scene, eidx, dd)
        sel = etype == EMITTER_ENVMAP
        p = jnp.where(sel[:, None], ref_p + dd * WORLD_RADIUS, p)
        d = jnp.where(sel[:, None], dd, d)
        pdf = jnp.where(sel, pdf_e, pdf)
        value = jnp.where(sel[:, None], rad, value)

    if EMITTER_DIRECTIONAL in tp:
        dd = -prm[..., 0:3]
        sel = etype == EMITTER_DIRECTIONAL
        d = jnp.where(sel[:, None], dd, d)
        p = jnp.where(sel[:, None], ref_p + dd * WORLD_RADIUS, p)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        value = jnp.where(sel[:, None], prm[..., 3:6], value)

    if EMITTER_SPOT in tp:
        pos = prm[..., 0:3]
        inten = prm[..., 3:6]
        cos_cut = prm[..., 6]
        cos_beam = prm[..., 7]
        sdir = prm[..., 8:11]
        dvec = pos - ref_p
        dist2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
        dist_p = jnp.sqrt(dist2)
        dd = dvec / dist_p[:, None]
        cos_a = -jnp.sum(dd * sdir, -1)
        fall = jnp.clip((cos_a - cos_cut) /
                        jnp.maximum(cos_beam - cos_cut, 1e-6), 0.0, 1.0)
        sel = etype == EMITTER_SPOT
        p = jnp.where(sel[:, None], pos, p)
        d = jnp.where(sel[:, None], dd, d)
        dist = jnp.where(sel, dist_p, dist)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        value = jnp.where(sel[:, None], inten * fall[:, None] / dist2[:, None],
                          value)

    if EMITTER_PROJECTOR in tp:
        pos = prm[..., 0:3]
        scale_rgb = prm[..., 3:6]
        sdir = prm[..., 8:11]
        tan_half = jnp.maximum(prm[..., 11], 1e-4)
        dvec = pos - ref_p
        dist2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
        dist_p = jnp.sqrt(dist2)
        dd = dvec / dist_p[:, None]
        # direction projector -> point in the projector frame
        tw = m.table_lookup(em.to_world, eidx)
        l = jnp.einsum("nji,nj->ni", tw[:, :3, :3], -dd)
        lz = jnp.maximum(l[..., 2], 1e-6)
        u = 0.5 * (1.0 + l[..., 0] / (lz * tan_half))
        v = 0.5 * (1.0 + l[..., 1] / (lz * tan_half))
        inside = (l[..., 2] > 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        tex = eval_texture(scene.textures, m.table_lookup(em.tex0, eidx),
                           jnp.stack([u, v], -1))
        sel = etype == EMITTER_PROJECTOR
        p = jnp.where(sel[:, None], pos, p)
        d = jnp.where(sel[:, None], dd, d)
        dist = jnp.where(sel, dist_p, dist)
        pdf = jnp.where(sel, 1.0, pdf)
        delta = delta | sel
        val_proj = jnp.where(inside[:, None],
                             scale_rgb * tex / dist2[:, None], 0.0)
        value = jnp.where(sel[:, None], val_proj, value)

    pdf_total = pdf * sel_pdf
    # detached sampling: the density is not differentiated, the radiance is
    pdf_det = jax.lax.stop_gradient(jnp.maximum(pdf_total, 1e-30))
    weight = jnp.where((pdf_total > 0)[:, None],
                       value / pdf_det[:, None], 0.0)
    ds = DirectionSample(p=p, n=nrm, d=d, dist=dist, pdf=pdf_total,
                         delta=delta, emitter=eidx.astype(jnp.int32))
    return ds, weight


def pdf_emitter_direction(scene: Scene, ref_p, si_emitter, si_p, si_n, d):
    """Solid-angle pdf of NEE having sampled direction d that hit emitter
    `si_emitter` at position si_p with normal si_n (scene.h:575 contract)."""
    em = scene.emitters
    if em.count == 0:
        return jnp.zeros(ref_p.shape[:-1])
    eidx = jnp.maximum(si_emitter, 0)
    etype = m.table_lookup(em.etype, eidx)
    sel_pdf = em.distr.eval_pdf(eidx)

    pdf = jnp.zeros(ref_p.shape[:-1])
    tp = em.types_present
    if EMITTER_AREA in tp:
        area = m.table_lookup(scene.shape_area,
                              jnp.maximum(m.table_lookup(em.shape, eidx), 0))
        dvec = si_p - ref_p
        dist2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
        cos_e = jnp.abs(jnp.sum(d * si_n, -1))
        pdf_a = dist2 / jnp.maximum(cos_e * area, 1e-20)
        pdf = jnp.where(etype == EMITTER_AREA, pdf_a, pdf)
    if EMITTER_CONSTANT in tp:
        pdf = jnp.where(etype == EMITTER_CONSTANT, warp.INV_FOURPI, pdf)
    if EMITTER_ENVMAP in tp:
        pdf = jnp.where(etype == EMITTER_ENVMAP,
                        _env_pdf(scene, eidx, d), pdf)
    return pdf * sel_pdf


def _env_uv(scene: Scene, eidx, d):
    em = scene.emitters
    tw = m.table_lookup(em.to_world, eidx)
    d_loc = jnp.einsum("nji,nj->ni", tw[:, :3, :3], d)  # inverse rotation
    theta = m.safe_acos(d_loc[..., 1])
    phi = jnp.arctan2(d_loc[..., 0], -d_loc[..., 2])
    u = phi / (2 * jnp.pi)
    u = u - jnp.floor(u)
    v = theta / jnp.pi
    return jnp.stack([u, v], -1), theta


def _env_radiance(scene: Scene, eidx, d):
    em = scene.emitters
    uv, _ = _env_uv(scene, eidx, d)
    rad = eval_texture(scene.textures, em.tex0[eidx], uv)
    return rad * m.table_lookup(em.params, eidx)[..., 6:7]


def _env_pdf(scene: Scene, eidx, d):
    em = scene.emitters
    uv, theta = _env_uv(scene, eidx, d)
    h, w = em.env_distr.data.shape
    col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    cell_pdf = em.env_distr.eval_pdf(col, row)
    st = jnp.maximum(jnp.sin(theta), 1e-6)
    return cell_pdf * (h * w) / (2.0 * jnp.pi * jnp.pi * st)


def eval_emitter_hit(scene: Scene, si, d):
    """Radiance of the emitter attached to the hit shape, seen from -d
    (analog of si.emitter(scene)->eval(si)). Returns (radiance, emitter_idx)."""
    em = scene.emitters
    n_l = si.t.shape[0]
    # only area emitters attach to shapes (builder.py _push_emitter shape=);
    # eliding the whole evaluation for env/point-only scenes drops a
    # full-width per-bounce bitmap gather (~7% of the liver wavefront)
    if em.count == 0 or EMITTER_AREA not in em.types_present:
        return jnp.zeros((n_l, 3)), jnp.full((n_l,), -1, jnp.int32)
    shape = jnp.maximum(si.shape, 0)
    eidx = jnp.where(si.valid,
                     m.table_lookup(scene.shape_emitter, shape), -1)
    has = eidx >= 0
    eidx_s = jnp.maximum(eidx, 0)
    rad = eval_texture(scene.textures, em.tex0[eidx_s], si.uv) \
        * m.table_lookup(em.params, eidx_s)[..., 0:3]
    # front side only (area emitters emit on the normal side)
    front = jnp.sum(si.ng * d, -1) < 0
    out = jnp.where((has & front)[:, None], rad, 0.0)
    return out, eidx.astype(jnp.int32)


def eval_environment(scene: Scene, d):
    """Env radiance for escaped rays (constant and/or envmap emitters)."""
    em = scene.emitters
    n_l = d.shape[0]
    out = jnp.zeros((n_l, 3))
    if em.env_index < 0:
        return out
    eidx = jnp.full((n_l,), em.env_index, jnp.int32)
    et = em.etype[em.env_index]
    tp = em.types_present
    if EMITTER_CONSTANT in tp:
        out = jnp.where(et == EMITTER_CONSTANT,
                        jnp.broadcast_to(em.params[em.env_index, 0:3], (n_l, 3)),
                        out)
    if EMITTER_ENVMAP in tp:
        out = jnp.where(et == EMITTER_ENVMAP, _env_radiance(scene, eidx, d), out)
    return out
