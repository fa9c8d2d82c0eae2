"""Texture evaluation over the wavefront.

Replaces the reference's Texture vcall dispatch (src/textures/{bitmap.cpp:954,
checkerboard.cpp}) with masked selects over the static set of texture types
present; bitmap lookup is a bilinear gather from the stacked bitmap array.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..scene.ir import (Scene, Textures, TEX_BITMAP, TEX_CHECKERBOARD,
                        TEX_CONST, TEX_MESHATTR, TEX_VOLUME)


def eval_texture(tex: Textures, tex_idx, uv, types=None, p=None,
                 attr=None):
    """tex_idx: (N,) int32 (-1 => white); uv: (N,2). Returns (N,3) linear
    RGB.  `types` statically narrows the texture families this call can
    reach (skips the bitmap gather for const-only slots); `p` is the world
    hit position (volume textures), `attr` the interpolated vertex
    attribute (mesh_attribute textures)."""
    idx = jnp.maximum(tex_idx, 0)
    ttype = m.table_lookup(tex.ttype, idx)
    data = m.table_lookup(tex.data, idx)
    out = jnp.ones(uv.shape[:-1] + (3,), jnp.float32)

    present = tex.types_present if types is None \
        else tuple(set(tex.types_present) & set(types))
    if TEX_CONST in present:
        out = jnp.where((ttype == TEX_CONST)[..., None], data[..., 0:3], out)
    if TEX_CHECKERBOARD in present:
        # reference src/textures/checkerboard.cpp:73-78: to_uv transform,
        # then mask = frac(uv) > 0.5 per axis; color0 where the two masks
        # AGREE (half-unit squares, one color0/color1 pair per UV unit)
        suv = uv * data[..., 6:8] + data[..., 8:10]
        fu = suv[..., 0] - jnp.floor(suv[..., 0])
        fv = suv[..., 1] - jnp.floor(suv[..., 1])
        par = (fu > 0.5) == (fv > 0.5)
        col = jnp.where(par[..., None], data[..., 0:3], data[..., 3:6])
        out = jnp.where((ttype == TEX_CHECKERBOARD)[..., None], col, out)
    if TEX_BITMAP in present:
        suv = uv * data[..., 6:8] + data[..., 8:10]
        col = _bilinear(tex, idx, suv)
        out = jnp.where((ttype == TEX_BITMAP)[..., None], col, out)
    if TEX_MESHATTR in present and attr is not None:
        # mesh_attribute.cpp: per-vertex attribute, scaled by data[0:3]
        out = jnp.where((ttype == TEX_MESHATTR)[..., None],
                        attr * data[..., 0:3], out)
    if TEX_VOLUME in present and p is not None:
        out = jnp.where((ttype == TEX_VOLUME)[..., None],
                        _trilinear_volume(tex, idx, p) * data[..., 0:3],
                        out)

    return jnp.where((tex_idx >= 0)[..., None], out, 1.0)


def eval_texture_mono(tex: Textures, tex_idx, uv):
    return jnp.mean(eval_texture(tex, tex_idx, uv), axis=-1)


def _bilinear(tex: Textures, idx, uv):
    """Bilinear, repeat wrap.  v axis points down the image rows, matching the
    reference Bitmap/uv convention."""
    bid = jnp.maximum(m.table_lookup(tex.bitmap_id, idx), 0)
    hw = m.table_lookup(tex.bitmap_hw, bid)
    h = hw[..., 0].astype(jnp.float32)
    w = hw[..., 1].astype(jnp.float32)
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    if tex.has_quads:
        # one gather: the quad row holds [c00 c01 c10 c11] (wrap-baked)
        xi = jnp.mod(x0.astype(jnp.int32), jnp.maximum(hw[..., 1], 1))
        yi = jnp.mod(y0.astype(jnp.int32), jnp.maximum(hw[..., 0], 1))
        q = tex.quads[bid, yi, xi]
        c00, c10 = q[..., 0:3], q[..., 3:6]
        c01, c11 = q[..., 6:9], q[..., 9:12]
    else:
        def fetch(xi, yi):
            xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(hw[..., 1], 1))
            yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(hw[..., 0], 1))
            return tex.bitmaps[bid, yi, xi]

        c00 = fetch(x0, y0)
        c10 = fetch(x0 + 1, y0)
        c01 = fetch(x0, y0 + 1)
        c11 = fetch(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def eval_texture_grad_mono(tex: Textures, tex_idx, uv):
    """(height, dh/du, dh/dv) for bump mapping in ONE quad tap: the
    bilinear patch's analytic gradient replaces two extra finite-difference
    texture fetches (bumpmap.cpp uses ray-differential FD; without ray
    differentials the patch gradient is the exact local derivative)."""
    idx = jnp.maximum(tex_idx, 0)
    ttype = m.table_lookup(tex.ttype, idx)
    data = m.table_lookup(tex.data, idx)
    n = uv.shape[:-1]
    h = jnp.zeros(n, jnp.float32)
    du = jnp.zeros(n, jnp.float32)
    dv = jnp.zeros(n, jnp.float32)

    if TEX_CONST in tex.types_present:
        h = jnp.where(ttype == TEX_CONST, jnp.mean(data[..., 0:3], -1), h)
    if TEX_BITMAP in tex.types_present:
        suv = uv * data[..., 6:8] + data[..., 8:10]
        bid = jnp.maximum(m.table_lookup(tex.bitmap_id, idx), 0)
        hw = m.table_lookup(tex.bitmap_hw, bid)
        hh = hw[..., 0].astype(jnp.float32)
        ww = hw[..., 1].astype(jnp.float32)
        u = suv[..., 0] - jnp.floor(suv[..., 0])
        v = suv[..., 1] - jnp.floor(suv[..., 1])
        x = u * ww - 0.5
        y = v * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        if tex.has_quads:
            xi = jnp.mod(x0.astype(jnp.int32), jnp.maximum(hw[..., 1], 1))
            yi = jnp.mod(y0.astype(jnp.int32), jnp.maximum(hw[..., 0], 1))
            q = jnp.mean(tex.quads[bid, yi, xi].reshape(n + (4, 3)), -1)
            c00, c10, c01, c11 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        else:
            def fetch(xa, ya):
                xa = jnp.mod(xa.astype(jnp.int32),
                             jnp.maximum(hw[..., 1], 1))
                ya = jnp.mod(ya.astype(jnp.int32),
                             jnp.maximum(hw[..., 0], 1))
                return jnp.mean(tex.bitmaps[bid, ya, xa], -1)
            c00 = fetch(x0, y0)
            c10 = fetch(x0 + 1, y0)
            c01 = fetch(x0, y0 + 1)
            c11 = fetch(x0 + 1, y0 + 1)
        hb = (c00 * (1 - fx) + c10 * fx) * (1 - fy) \
            + (c01 * (1 - fx) + c11 * fx) * fy
        # d/dx of the patch, then chain rule to uv (texel and to_uv scale)
        dhdx = (c10 - c00) * (1 - fy) + (c11 - c01) * fy
        dhdy = (c01 - c00) * (1 - fx) + (c11 - c10) * fx
        sel = ttype == TEX_BITMAP
        h = jnp.where(sel, hb, h)
        du = jnp.where(sel, dhdx * ww * data[..., 6], du)
        dv = jnp.where(sel, dhdy * hh * data[..., 7], dv)
    return h, du, dv


def _trilinear_volume(tex: Textures, idx, p):
    """3D texture lookup at the world position (volume texture / grid.cpp
    trilinear interpolation); resource id shared through bitmap_id."""
    vid = jnp.maximum(m.table_lookup(tex.bitmap_id, idx), 0)
    g2l = m.table_lookup(tex.vgrid_to_local, vid)
    pl = jnp.einsum("nij,nj->ni", g2l[:, :3, :3], p) + g2l[:, :3, 3]
    whd = m.table_lookup(tex.vgrid_whd, vid)
    D = (whd[:, 0] - 1).astype(jnp.float32)
    H = (whd[:, 1] - 1).astype(jnp.float32)
    W = (whd[:, 2] - 1).astype(jnp.float32)
    x = jnp.clip(pl[:, 0], 0.0, 1.0) * W
    y = jnp.clip(pl[:, 1], 0.0, 1.0) * H
    z = jnp.clip(pl[:, 2], 0.0, 1.0) * D
    x0 = jnp.clip(x.astype(jnp.int32), 0, whd[:, 2] - 2)
    y0 = jnp.clip(y.astype(jnp.int32), 0, whd[:, 1] - 2)
    z0 = jnp.clip(z.astype(jnp.int32), 0, whd[:, 0] - 2)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    fz = (z - z0)[:, None]

    def g(dz, dy, dx):
        return tex.vgrids[vid, z0 + dz, y0 + dy, x0 + dx]

    c00 = g(0, 0, 0) * (1 - fx) + g(0, 0, 1) * fx
    c01 = g(0, 1, 0) * (1 - fx) + g(0, 1, 1) * fx
    c10 = g(1, 0, 0) * (1 - fx) + g(1, 0, 1) * fx
    c11 = g(1, 1, 0) * (1 - fx) + g(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz
