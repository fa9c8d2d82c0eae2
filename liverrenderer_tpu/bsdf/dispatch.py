"""BSDF evaluation/sampling over the wavefront.

TPU-native replacement for the reference's vectorized BSDF vcalls
(src/bsdfs/*.cpp dispatched via Dr.Jit DRJIT_CALL): every BSDF *family
present in the scene* (static set) is evaluated branchlessly on all active
lanes and combined with masked selects.  With <=4 families per scene this
beats gather/scatter repacking on the VPU, and XLA fuses the whole dispatch
into the bounce megakernel.

Conventions match the reference (include/mitsuba/render/bsdf.h):
  * directions in the local shading frame, wi points away from the surface,
  * `eval` returns f(wi,wo) * |cos_theta_o|,
  * `sample` returns weight = f * |cos| / pdf and the discrete lobe pdf for
    delta lobes,
  * twosided wrapper = flip the frame when cos_theta(wi) < 0
    (src/bsdfs/twosided.cpp semantics).

Family parameter rows are documented in scene/ir.py BSDFs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import fresnel as fr
from ..core import math as m
from ..core import microfacet as mf
from ..core import warp
from ..core.types import BSDFSample
from ..scene.ir import (BSDF_BLEND, BSDF_CIRCULAR, BSDF_CONDUCTOR,
                        BSDF_DIELECTRIC,
                        BSDF_HAIR, BSDF_MEASURED, BSDF_POLARIZER,
                        BSDF_PPLASTIC, BSDF_PRINCIPLED, BSDF_PRINCIPLEDTHIN,
                        BSDF_RETARDER,
                        BSDF_DIFFUSE, BSDF_MASK, BSDF_NULL, BSDF_PLASTIC,
                        BSDF_ROUGHCONDUCTOR, BSDF_ROUGHDIELECTRIC,
                        BSDF_ROUGHPLASTIC,
                        BSDF_THINDIELECTRIC, F_DELTA, F_DELTA_REFL,
                        F_DELTA_TRANS, F_DIFFUSE_REFL, F_GLOSSY_REFL,
                        F_GLOSSY_TRANS, F_NULL, F_SMOOTH, Scene)
from ..texture.eval import eval_texture

_U32 = jnp.uint32


def bsdf_flags(scene: Scene, bsdf_idx):
    return m.table_lookup(scene.bsdfs.flags, jnp.maximum(bsdf_idx, 0))


def _ctx(scene: Scene, si, bsdf_idx):
    """Gather per-lane bsdf rows + texture values."""
    idx = jnp.maximum(bsdf_idx, 0)
    b = scene.bsdfs
    p = m.table_lookup(b.params, idx)
    t0 = eval_texture(scene.textures, m.table_lookup(b.tex0, idx), si.uv,
                      types=b.tex0_types, p=si.p, attr=si.attr)
    t1 = eval_texture(scene.textures, m.table_lookup(b.tex1, idx), si.uv,
                      types=b.tex1_types, p=si.p, attr=si.attr)
    return idx, m.table_lookup(b.btype, idx), p, t0, t1, \
        m.table_lookup(b.twosided, idx)


def _flip_z(v):
    return jnp.stack([v[..., 0], v[..., 1], -v[..., 2]], -1)


def _sanitize_dir(v):
    """Replace non-finite / degenerate direction rows with +z.

    Masked-off lanes carry garbage interactions (missed rays -> zero
    shading frames -> zero/NaN local directions); the families' masked
    selects zero their PRIMAL contribution, but a NaN produced inside
    (e.g. normalize(wi+wo) on a zero vector) still poisons reverse-mode
    through the 0-cotangent x NaN-Jacobian product — the same rule as the
    detached-sampling note in media/dispatch.py, applied to the BSDF
    dispatch boundary."""
    ok = jnp.isfinite(v).all(-1) & (jnp.sum(v * v, -1) > 0.25)
    return jnp.where(ok[..., None], jnp.where(jnp.isfinite(v), v, 0.0),
                     jnp.array([0.0, 0.0, 1.0]))


def bsdf_albedo(scene: Scene, si, bsdf_idx):
    """Approximate surface albedo (the primary reflectance texture) — used
    by the AOV integrator and denoiser feature buffers."""
    _, _, _, t0, _, _ = _ctx(scene, si, bsdf_idx)
    return t0


# ---------------------------------------------------------------------------
# Per-family implementations. Each takes local wi and returns lane-shaped
# results; the caller masks by family membership.
# ---------------------------------------------------------------------------

def _diffuse_sample(wi, u1, u2, p, t0, t1):
    wo = warp.square_to_cosine_hemisphere(u2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    active = m.cos_theta(wi) > 0
    weight = jnp.where(active[..., None], t0, 0.0)
    pdf = jnp.where(active, pdf, 0.0)
    return wo, pdf, weight, jnp.ones(pdf.shape), \
        jnp.full(pdf.shape, F_DIFFUSE_REFL, _U32)


def _diffuse_eval(wi, wo, p, t0, t1):
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    val = t0 * (warp.INV_PI * co)[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(act[..., None], val, 0.0), jnp.where(act, pdf, 0.0)


def _dielectric_sample(wi, u1, u2, p, t0, t1):
    """Smooth dielectric (src/bsdfs/dielectric.cpp:404 semantics)."""
    eta = p[..., 0]
    ci = m.cos_theta(wi)
    F, ctt, eta_it, eta_ti = fr.fresnel_dielectric(ci, eta)
    refl = u1 <= F
    wo_r = m.reflect(wi)
    wo_t = m.refract_local(wi, ctt, eta_ti)
    wo = jnp.where(refl[..., None], wo_r, wo_t)
    pdf = jnp.where(refl, F, 1.0 - F)
    # radiance scale on refraction (solid-angle compression): 1/eta_it^2
    w_r = t0
    w_t = t1 * (eta_ti * eta_ti)[..., None]
    weight = jnp.where(refl[..., None], w_r, w_t)
    eta_s = jnp.where(refl, 1.0, eta_it)
    st = jnp.where(refl, F_DELTA_REFL, F_DELTA_TRANS).astype(_U32)
    return wo, pdf, weight, eta_s, st


def _thindielectric_sample(wi, u1, u2, p, t0, t1):
    eta = p[..., 0]
    ci = m.cos_theta(wi)
    F, _, _, _ = fr.fresnel_dielectric(jnp.abs(ci), eta)
    # account for internal bounces: R' = 2F/(1+F)
    R = jnp.where(F < 1.0, F + (1.0 - F) * (1.0 - F) * F
                  / jnp.maximum(1.0 - F * F, 1e-6), 1.0)
    refl = u1 <= R
    wo = jnp.where(refl[..., None], m.reflect(wi), -wi)
    pdf = jnp.where(refl, R, 1.0 - R)
    weight = jnp.where(refl[..., None], t0, t1)
    st = jnp.where(refl, F_DELTA_REFL, F_NULL).astype(_U32)
    return wo, pdf, weight, jnp.ones(pdf.shape), st


def _conductor_sample(wi, u1, u2, p, t0, t1):
    ci = m.cos_theta(wi)
    F = fr.fresnel_conductor(ci, p[..., 0:3], p[..., 3:6])
    wo = m.reflect(wi)
    act = ci > 0
    pdf = jnp.where(act, 1.0, 0.0)
    weight = jnp.where(act[..., None], t0 * F, 0.0)
    return wo, pdf, weight, jnp.ones(pdf.shape), \
        jnp.full(pdf.shape, F_DELTA_REFL, _U32)


def _roughconductor_sample(wi, u1, u2, p, t0, t1):
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    h = mf.ggx_sample_vndf(wi, u2, ax, ay)
    wo = 2.0 * jnp.sum(wi * h, -1)[..., None] * h - wi
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    pdf_h = mf.ggx_pdf_visible(wi, h, ax, ay)
    pdf = pdf_h / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    F = fr.fresnel_conductor(jnp.sum(wi * h, -1), p[..., 0:3], p[..., 3:6])
    g2 = mf.ggx_smith_g1(wi, h, ax, ay) * mf.ggx_smith_g1(wo, h, ax, ay)
    g1 = mf.ggx_smith_g1(wi, h, ax, ay)
    weight = t0 * F * (g2 / jnp.maximum(g1, 1e-8))[..., None]
    pdf = jnp.where(act, pdf, 0.0)
    weight = jnp.where(act[..., None], weight, 0.0)
    return wo, pdf, weight, jnp.ones(pdf.shape), \
        jnp.full(pdf.shape, F_GLOSSY_REFL, _U32)


def _roughconductor_eval(wi, wo, p, t0, t1):
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    # act implies wi+wo has positive z; inactive lanes get +z so the
    # normalize cannot emit a reverse-mode NaN under the masked select
    h = m.normalize(jnp.where(act[..., None], wi + wo,
                              jnp.array([0.0, 0.0, 1.0])))
    d = mf.ggx_d(h, ax, ay)
    g = mf.ggx_smith_g1(wi, h, ax, ay) * mf.ggx_smith_g1(wo, h, ax, ay)
    F = fr.fresnel_conductor(jnp.sum(wi * h, -1), p[..., 0:3], p[..., 3:6])
    f_cos = t0 * F * (d * g / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    pdf = mf.ggx_pdf_visible(wi, h, ax, ay) \
        / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    return jnp.where(act[..., None], f_cos, 0.0), jnp.where(act, pdf, 0.0)


def _plastic_sample(wi, u1, u2, p, t0, t1):
    """Smooth plastic (src/bsdfs/plastic.cpp semantics): delta specular +
    internally-scattered diffuse with nonlinear option."""
    eta = p[..., 0]
    nonlinear = p[..., 1] > 0.5
    fdr_int = p[..., 2]
    spec_weight = p[..., 4]
    ci = m.cos_theta(wi)
    Fi, _, _, _ = fr.fresnel_dielectric(ci, eta)
    prob_spec = Fi * spec_weight / jnp.maximum(
        Fi * spec_weight + (1.0 - Fi) * (1.0 - spec_weight), 1e-8)
    pick_spec = u1 < prob_spec
    wo_spec = m.reflect(wi)
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(pick_spec[..., None], wo_spec, wo_diff)
    Fo, _, _, _ = fr.fresnel_dielectric(m.cos_theta(wo), eta)
    inv_eta2 = 1.0 / jnp.maximum(eta * eta, 1e-8)
    diff = t0
    denom = jnp.where(nonlinear[..., None], 1.0 - diff * fdr_int[..., None],
                      1.0 - fdr_int[..., None])
    diff_val = diff / jnp.maximum(denom, 1e-6) \
        * ((1.0 - Fi) * (1.0 - Fo) * inv_eta2)[..., None]
    w_spec = jnp.where(pick_spec, Fi / jnp.maximum(prob_spec, 1e-8), 0.0)
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    w_diff = diff_val / jnp.maximum(1.0 - prob_spec, 1e-8)[..., None]
    act = ci > 0
    weight = jnp.where(pick_spec[..., None], w_spec[..., None], w_diff)
    pdf = jnp.where(pick_spec, prob_spec, pdf_diff)
    weight = jnp.where(act[..., None], weight, 0.0)
    pdf = jnp.where(act, pdf, 0.0)
    st = jnp.where(pick_spec, F_DELTA_REFL, F_DIFFUSE_REFL).astype(_U32)
    return wo, pdf, weight, jnp.ones(pdf.shape), st


def _plastic_eval(wi, wo, p, t0, t1):
    eta = p[..., 0]
    nonlinear = p[..., 1] > 0.5
    fdr_int = p[..., 2]
    spec_weight = p[..., 4]
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    Fi, _, _, _ = fr.fresnel_dielectric(ci, eta)
    Fo, _, _, _ = fr.fresnel_dielectric(co, eta)
    inv_eta2 = 1.0 / jnp.maximum(eta * eta, 1e-8)
    diff = t0
    denom = jnp.where(nonlinear[..., None], 1.0 - diff * fdr_int[..., None],
                      1.0 - fdr_int[..., None])
    val = diff / jnp.maximum(denom, 1e-6) \
        * ((1.0 - Fi) * (1.0 - Fo) * inv_eta2 * warp.INV_PI * co)[..., None]
    prob_spec = Fi * spec_weight / jnp.maximum(
        Fi * spec_weight + (1.0 - Fi) * (1.0 - spec_weight), 1e-8)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - prob_spec)
    return jnp.where(act[..., None], val, 0.0), jnp.where(act, pdf, 0.0)


def _roughplastic_lobes(wi, wo, p, t0):
    """Shared terms of the rough plastic model (src/bsdfs/roughplastic.cpp):
    GGX specular on the dielectric interface + internally scattered diffuse.
    The reference tabulates the *rough* external transmittance / internal
    reflectance per (cos_theta, alpha); we use the smooth-interface Fresnel
    transmittance 1-F and the analytic internal diffuse reflectance
    (roughplastic.cpp:275,354 semantics, table replaced by its smooth
    limit)."""
    eta = p[..., 0]
    fdr_int = p[..., 2]
    ssw = p[..., 4]
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    Fi, _, _, _ = fr.fresnel_dielectric(ci, eta)
    t_i = 1.0 - Fi
    prob_spec = (1.0 - t_i) * ssw
    prob_diff = t_i * (1.0 - ssw)
    prob_spec = prob_spec / jnp.maximum(prob_spec + prob_diff, 1e-8)
    return eta, fdr_int, ax, ay, t_i, prob_spec


def _roughplastic_eval(wi, wo, p, t0, t1):
    nonlinear = p[..., 1] > 0.5
    eta, fdr_int, ax, ay, t_i, prob_spec = _roughplastic_lobes(wi, wo, p, t0)
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    d = mf.ggx_d(h, ax, ay)
    g = mf.ggx_smith_g1(wi, h, ax, ay) * mf.ggx_smith_g1(wo, h, ax, ay)
    F, _, _, _ = fr.fresnel_dielectric(jnp.sum(wi * h, -1), eta)
    spec = (F * d * g / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    Fo, _, _, _ = fr.fresnel_dielectric(co, eta)
    t_o = 1.0 - Fo
    inv_eta2 = 1.0 / jnp.maximum(eta * eta, 1e-8)
    diff = t0
    denom = jnp.where(nonlinear[..., None], 1.0 - diff * fdr_int[..., None],
                      1.0 - fdr_int[..., None])
    diff_v = diff / jnp.maximum(denom, 1e-6) \
        * (warp.INV_PI * inv_eta2 * co * t_i * t_o)[..., None]
    val = jnp.where(act[..., None], spec + diff_v, 0.0)
    pdf_spec = mf.ggx_pdf_visible(wi, h, ax, ay) \
        / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    pdf = prob_spec * pdf_spec \
        + (1.0 - prob_spec) * warp.square_to_cosine_hemisphere_pdf(wo)
    return val, jnp.where(act, pdf, 0.0)


def _roughplastic_sample(wi, u1, u2, p, t0, t1):
    eta, fdr_int, ax, ay, t_i, prob_spec = _roughplastic_lobes(wi, wi, p, t0)
    ci = m.cos_theta(wi)
    take_spec = u1 < prob_spec
    h = mf.ggx_sample_vndf(wi, u2, ax, ay)
    wo_spec = 2.0 * jnp.sum(wi * h, -1)[..., None] * h - wi
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(take_spec[..., None], wo_spec, wo_diff)
    val, pdf = _roughplastic_eval(wi, wo, p, t0, t1)
    act = (ci > 0) & (m.cos_theta(wo) > 0) & (pdf > 0)
    weight = jnp.where(act[..., None],
                       val / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    st = jnp.where(take_spec, F_GLOSSY_REFL, F_DIFFUSE_REFL).astype(_U32)
    return wo, jnp.where(act, pdf, 0.0), weight, jnp.ones(pdf.shape), st


def _pplastic_eval(wi, wo, p, t0, t1):
    """Polarized plastic, unpolarized projection (src/bsdfs/pplastic.cpp,
    Baek et al. 2018): GGX specular + Lambert diffuse attenuated by the
    in/out Fresnel transmittances; lobe selection is the static
    specular_sampling_weight (pplastic.cpp:261)."""
    eta = p[..., 0]
    ssw = p[..., 4]
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    act = (ci > 0) & (co > 0)
    h = m.normalize(wi + wo)
    d = mf.ggx_d(h, ax, ay)
    g = mf.ggx_smith_g1(wi, h, ax, ay) * mf.ggx_smith_g1(wo, h, ax, ay)
    F, _, _, _ = fr.fresnel_dielectric(jnp.sum(wi * h, -1), eta)
    spec = (F * d * g / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    Fi, _, _, _ = fr.fresnel_dielectric(ci, eta)
    Fo, _, _, _ = fr.fresnel_dielectric(co, eta)
    diff = t0 * ((1.0 - Fi) * (1.0 - Fo) * warp.INV_PI * co)[..., None]
    val = jnp.where(act[..., None], spec + diff, 0.0)
    pdf_spec = mf.ggx_pdf_visible(wi, h, ax, ay) \
        / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    pdf = ssw * pdf_spec \
        + (1.0 - ssw) * warp.square_to_cosine_hemisphere_pdf(wo)
    return val, jnp.where(act, pdf, 0.0)


def _pplastic_sample(wi, u1, u2, p, t0, t1):
    ssw = p[..., 4]
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    take_spec = u1 < ssw
    h = mf.ggx_sample_vndf(wi, u2, ax, ay)
    wo_spec = 2.0 * jnp.sum(wi * h, -1)[..., None] * h - wi
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(take_spec[..., None], wo_spec, wo_diff)
    val, pdf = _pplastic_eval(wi, wo, p, t0, t1)
    act = (ci > 0) & (m.cos_theta(wo) > 0) & (pdf > 0)
    weight = jnp.where(act[..., None],
                       val / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    st = jnp.where(take_spec, F_GLOSSY_REFL, F_DIFFUSE_REFL).astype(_U32)
    return wo, jnp.where(act, pdf, 0.0), weight, jnp.ones(pdf.shape), st


def _principledthin_probs(p):
    """Lobe selection probabilities (principledthin.cpp:290-309, all
    sampling rates at their default 1.0; diff_trans pre-halved at build)."""
    st_ = p[..., 2]
    dt = p[..., 3]
    p_sr = st_ * 0.5
    p_st = st_ * 0.5
    p_dr = (1.0 - st_) * (1.0 - dt)
    p_dt = (1.0 - st_) * dt
    tot = jnp.maximum(p_sr + p_st + p_dr + p_dt, 1e-8)
    return p_sr / tot, p_st / tot, p_dr / tot, p_dt / tot


def _principledthin_alphas(p):
    eta = jnp.maximum(p[..., 0], 1.01)
    rough = jnp.clip(p[..., 1], 0.03, 1.0)
    alpha = rough * rough
    # Disney thin-surface transmission roughness remap
    # (principledthin.cpp transmission lobe alpha)
    rt = jnp.clip((0.65 * eta - 0.35) * rough, 0.03, 1.0)
    alpha_t = rt * rt
    return eta, alpha, alpha_t


def _principledthin_eval(wi, wo, p, t0, t1):
    eta, alpha, alpha_t = _principledthin_alphas(p)
    st_ = p[..., 2]
    dt = p[..., 3]
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    p_sr, p_st, p_dr, p_dt = _principledthin_probs(p)
    up = co > 0
    act = ci > 0

    # ---- reflection side: GGX specular + Lambert diffuse ----
    h = m.normalize(wi + wo)
    d_r = mf.ggx_d(h, alpha, alpha)
    g_r = mf.ggx_smith_g1(wi, h, alpha, alpha) \
        * mf.ggx_smith_g1(wo, h, alpha, alpha)
    F_r, _, _, _ = fr.fresnel_dielectric(jnp.sum(wi * h, -1), eta)
    spec_r = st_ * F_r * d_r * g_r / jnp.maximum(4.0 * ci, 1e-8)
    diff_r = t0 * ((1.0 - st_) * (1.0 - dt) * warp.INV_PI
                   * jnp.maximum(co, 0.0))[..., None]
    pdf_h_r = mf.ggx_pdf_visible(wi, h, alpha, alpha)
    pdf_sr = pdf_h_r / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    pdf_refl = p_sr * pdf_sr \
        + p_dr * warp.square_to_cosine_hemisphere_pdf(wo)

    # ---- transmission side: thin microfacet transmission (evaluated as
    # reflection of the flipped direction, Disney thin model) + diffuse
    # Lambert transmission ----
    wo_f = _flip_z(wo)
    h_t = m.normalize(wi + wo_f)
    d_t = mf.ggx_d(h_t, alpha_t, alpha_t)
    g_t = mf.ggx_smith_g1(wi, h_t, alpha_t, alpha_t) \
        * mf.ggx_smith_g1(wo_f, h_t, alpha_t, alpha_t)
    F_t, _, _, _ = fr.fresnel_dielectric(jnp.sum(wi * h_t, -1), eta)
    spec_t = jnp.sqrt(jnp.maximum(t0, 0.0)) \
        * (st_ * (1.0 - F_t) * d_t * g_t
           / jnp.maximum(4.0 * ci, 1e-8))[..., None]
    diff_t = t0 * ((1.0 - st_) * dt * warp.INV_PI
                   * jnp.maximum(-co, 0.0))[..., None]
    pdf_h_t = mf.ggx_pdf_visible(wi, h_t, alpha_t, alpha_t)
    pdf_st = pdf_h_t / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo_f * h_t, -1)),
                                   1e-8)
    pdf_trans = p_st * pdf_st \
        + p_dt * warp.square_to_cosine_hemisphere_pdf(wo_f)

    val = jnp.where(up[..., None], spec_r[..., None] + diff_r,
                    spec_t + diff_t)
    pdf = jnp.where(up, pdf_refl, pdf_trans)
    return jnp.where(act[..., None], val, 0.0), jnp.where(act, pdf, 0.0)


def _principledthin_sample(wi, u1, u2, p, t0, t1):
    eta, alpha, alpha_t = _principledthin_alphas(p)
    ci = m.cos_theta(wi)
    p_sr, p_st, p_dr, p_dt = _principledthin_probs(p)
    c1 = p_sr
    c2 = c1 + p_st
    c3 = c2 + p_dr
    take_sr = u1 < c1
    take_st = (u1 >= c1) & (u1 < c2)
    take_dr = (u1 >= c2) & (u1 < c3)
    take_dt = u1 >= c3

    h_r = mf.ggx_sample_vndf(wi, u2, alpha, alpha)
    wo_sr = 2.0 * jnp.sum(wi * h_r, -1)[..., None] * h_r - wi
    h_t = mf.ggx_sample_vndf(wi, u2, alpha_t, alpha_t)
    wo_st = _flip_z(2.0 * jnp.sum(wi * h_t, -1)[..., None] * h_t - wi)
    wo_cos = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(take_sr[..., None], wo_sr,
                   jnp.where(take_st[..., None], wo_st,
                             jnp.where(take_dr[..., None], wo_cos,
                                       _flip_z(wo_cos))))
    val, pdf = _principledthin_eval(wi, wo, p, t0, t1)
    # reject lobe/hemisphere disagreement (microfacet "leak" below the
    # horizon): a leaked sample's density is NOT in the eval pdf of the
    # other side, so keeping it would bias MIS (principledthin.cpp:383
    # active &= transmission-side check per lobe)
    want_up = take_sr | take_dr
    act = (ci > 0) & (pdf > 0) & ((m.cos_theta(wo) > 0) == want_up)
    weight = jnp.where(act[..., None],
                       val / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    st = jnp.where(take_sr, F_GLOSSY_REFL,
                   jnp.where(take_st, F_GLOSSY_TRANS,
                             jnp.where(take_dr, F_DIFFUSE_REFL,
                                       F_GLOSSY_TRANS))).astype(_U32)
    return wo, jnp.where(act, pdf, 0.0), weight, jnp.ones(pdf.shape), st


def _roughdielectric_eval(wi, wo, p, t0, t1):
    """Rough dielectric eval/pdf (src/bsdfs/roughdielectric.cpp eval/pdf
    paths, Walter et al. 2007 microfacet refraction): both the reflection
    and transmission lobes contribute so NEE/MIS through rough glass is
    unbiased (VERDICT round-1 item 5)."""
    eta = p[..., 0]
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    refl = ci * co > 0
    # relative IOR along the actual propagation side
    eta_rel = jnp.where(ci > 0, eta, 1.0 / jnp.maximum(eta, 1e-8))
    # half vector: reflection -> bisector; transmission -> generalized
    h_r = m.normalize(wi + wo)
    h_t = m.normalize(wi + wo * eta_rel[..., None])
    h = jnp.where(refl[..., None], h_r, h_t)
    # orient toward the upper hemisphere (distribution convention)
    h = h * jnp.sign(m.cos_theta(h))[..., None]
    cos_ih = jnp.sum(wi * h, -1)
    cos_oh = jnp.sum(wo * h, -1)
    F, _, eta_it, eta_ti = fr.fresnel_dielectric(cos_ih, eta)
    # evaluate D/G in the upper-hemisphere frame of the incident side
    flip = ci < 0
    wi_f = jnp.where(flip[..., None], _flip_z(wi), wi)
    wo_f = jnp.where((co < 0)[..., None], _flip_z(wo), wo)
    h_f = jnp.where(flip[..., None], _flip_z(h), h)
    d = mf.ggx_d(h_f, ax, ay)
    g = mf.ggx_smith_g1(wi_f, h_f, ax, ay) * mf.ggx_smith_g1(wo_f, h_f,
                                                             ax, ay)
    pdf_h = mf.ggx_pdf_visible(wi_f, h_f, ax, ay)

    # ---- reflection branch: f*cos = F D G / (4 |ci|) ----
    val_r = t0 * (F * d * g / jnp.maximum(4.0 * jnp.abs(ci), 1e-8))[..., None]
    pdf_r = pdf_h * F / jnp.maximum(4.0 * jnp.abs(cos_oh), 1e-8)
    ok_r = refl & (cos_ih * ci > 0) & (cos_oh * co > 0)

    # ---- transmission branch (Walter eq. 21, x |co| for the eval
    # contract, x eta_ti^2 radiance compression as in _dielectric_sample) --
    denom = cos_ih + eta_rel * cos_oh
    denom2 = jnp.maximum(denom * denom, 1e-12)
    jac_t = (eta_rel * eta_rel) * jnp.abs(cos_oh) / denom2
    val_t_s = jnp.abs(cos_ih * cos_oh) / jnp.maximum(
        jnp.abs(ci * co), 1e-8) \
        * (eta_rel * eta_rel) * (1.0 - F) * d * g / denom2 \
        * jnp.abs(co) * (eta_ti * eta_ti)
    val_t = t1 * val_t_s[..., None]
    pdf_t = pdf_h * (1.0 - F) * jac_t
    ok_t = (~refl) & (cos_ih * ci > 0) & (cos_oh * co > 0)

    val = jnp.where(ok_r[..., None], val_r,
                    jnp.where(ok_t[..., None], val_t, 0.0))
    pdf = jnp.where(ok_r, pdf_r, jnp.where(ok_t, pdf_t, 0.0))
    return val, pdf


def _roughdielectric_sample(wi, u1, u2, p, t0, t1):
    eta = p[..., 0]
    ax = jnp.maximum(p[..., 6], 1e-4)
    ay = jnp.maximum(p[..., 7], 1e-4)
    ci = m.cos_theta(wi)
    flip = ci < 0
    wi_f = jnp.where(flip[..., None], _flip_z(wi), wi)
    h = mf.ggx_sample_vndf(wi_f, u2, ax, ay)
    h = jnp.where(flip[..., None], _flip_z(h), h)
    cos_ih = jnp.sum(wi * h, -1)
    F, ctt, eta_it, eta_ti = fr.fresnel_dielectric(cos_ih, eta)
    refl = u1 <= F
    wo_r = 2.0 * cos_ih[..., None] * h - wi
    # refraction through h
    wo_t = m.normalize(
        -eta_ti[..., None] * (wi - cos_ih[..., None] * h)
        + (ctt)[..., None] * h * jnp.sign(cos_ih)[..., None])
    wo = jnp.where(refl[..., None], wo_r, wo_t)
    co = m.cos_theta(wo)
    act = jnp.where(refl, ci * co > 0, ci * co < 0)
    h_f = jnp.where(flip[..., None], _flip_z(h), h)
    pdf_h = mf.ggx_pdf_visible(jnp.where(flip[..., None], _flip_z(wi), wi),
                               h_f, ax, ay)
    dwh_dwo_r = 1.0 / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * h, -1)), 1e-8)
    # transmission Jacobian (Walter et al. eq. 17, roughdielectric.cpp:344)
    # uses the *relative transmitted* IOR eta_it, not its inverse
    sqrt_denom = cos_ih + eta_it * jnp.sum(wo * h, -1)
    dwh_dwo_t = (eta_it * eta_it) * jnp.abs(jnp.sum(wo * h, -1)) \
        / jnp.maximum(sqrt_denom * sqrt_denom, 1e-12)
    pdf = pdf_h * jnp.where(refl, F * dwh_dwo_r, (1.0 - F) * dwh_dwo_t)
    g2 = mf.ggx_smith_g1(wi_f, h_f, ax, ay) * mf.ggx_smith_g1(
        jnp.where((co < 0)[..., None], _flip_z(wo), wo), h_f, ax, ay)
    g1 = mf.ggx_smith_g1(wi_f, h_f, ax, ay)
    wgt = (g2 / jnp.maximum(g1, 1e-8))
    weight = jnp.where(refl[..., None], t0 * wgt[..., None],
                       t1 * (wgt * eta_ti * eta_ti)[..., None])
    pdf = jnp.where(act, pdf, 0.0)
    weight = jnp.where(act[..., None], weight, 0.0)
    eta_s = jnp.where(refl, 1.0, eta_it)
    st = jnp.where(refl, F_GLOSSY_REFL, F_GLOSSY_TRANS).astype(_U32)
    return wo, pdf, weight, eta_s, st


# ---------------------------------------------------------------------------
# Principled (Disney 2012/2015) BSDF — full model (reference
# src/bsdfs/principled.cpp 905 LoC + principledhelpers.h): metallic-
# roughness base, anisotropic GGX main specular with blended
# dielectric/Schlick fresnel and spec_tint, microfacet specular
# transmission (spec_trans), GTR1 clearcoat, sheen with sheen_tint, and
# retro-reflection / Hanrahan-Krueger fake-subsurface diffuse (flatness).
# Param row layout (builder.py "principled"): p0 metallic, p1 roughness,
# p2 eta (precomputed from `specular` unless `eta` given), p3 clearcoat,
# p4 clearcoat_gloss, p5 anisotropic, p6 sheen, p7 sheen_tint,
# p8 spec_trans, p9 flatness, p10 spec_tint.
# ---------------------------------------------------------------------------

def _schlick_w(cos_t):
    """(1-cos)^5 Schlick weight (principledhelpers.h schlick_weight)."""
    w = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return (w * w) * (w * w) * w


def _calc_schlick(r0, cos_i, eta):
    """Schlick fresnel that uses the transmitted angle when the relative
    IOR along the ray is < 1 (principledhelpers.h calc_schlick)."""
    outside = cos_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    ctt2 = 1.0 - (1.0 - cos_i * cos_i) * eta_ti * eta_ti
    ctt = m.safe_sqrt(ctt2)
    w = jnp.where(eta_it > 1.0, _schlick_w(jnp.abs(cos_i)), _schlick_w(ctt))
    if r0.ndim == w.ndim:                       # scalar R0
        return r0 + (1.0 - r0) * w
    return r0 + (1.0 - r0) * w[..., None]


def _gtr1_d(wh, a):
    """GTR1 NDF for the clearcoat lobe (principledhelpers.h GTR1Isotropic)."""
    cz = m.cos_theta(wh)
    a2 = a * a
    d = (a2 - 1.0) / (jnp.pi * jnp.log(a2)
                      * (1.0 + (a2 - 1.0) * cz * cz))
    return jnp.where(d * cz > 1e-20, d, 0.0)


def _gtr1_sample(u, a):
    a2 = a * a
    phi = 2.0 * jnp.pi * u[..., 0]
    ct2 = (1.0 - jnp.power(a2, 1.0 - u[..., 1])) / (1.0 - a2)
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct2))
    ct = jnp.sqrt(jnp.maximum(0.0, ct2))
    return jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, ct], -1)


def _smith_ggx1(v, wh, alpha):
    """Separable Smith G1 with the clearcoat's fixed alpha
    (principledhelpers.h smith_ggx1)."""
    a2 = alpha * alpha
    cz = jnp.abs(m.cos_theta(v))
    cz2 = jnp.maximum(cz * cz, 1e-12)
    tan2 = (1.0 - cz2) / cz2
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * tan2))
    g = jnp.where(m.cos_theta(v) == 1.0, 1.0, g)
    return jnp.where(jnp.sum(v * wh, -1) * m.cos_theta(v) <= 0.0, 0.0, g)


def _principled_fetch(p):
    metallic = p[..., 0]
    rough = jnp.clip(p[..., 1], 0.0, 1.0)
    eta = jnp.maximum(p[..., 2], 1.0009)
    cc, ccg = p[..., 3], p[..., 4]
    aniso = p[..., 5]
    sheen, sheen_tint = p[..., 6], p[..., 7]
    strans, flat, stint = p[..., 8], p[..., 9], p[..., 10]
    r2 = rough * rough
    aspect = jnp.sqrt(1.0 - 0.9 * aniso)
    ax = jnp.maximum(1e-3, r2 / aspect)
    ay = jnp.maximum(1e-3, r2 * aspect)
    return (metallic, rough, eta, cc, ccg, ax, ay, sheen, sheen_tint,
            strans, flat, stint)


def _principled_probs(front, bsdfw, brdf, cc, F_die):
    """Lobe selection probabilities (principled.cpp sample/pdf; unit
    sampling rates)."""
    p_sr = jnp.where(front, 1.0 - bsdfw * (1.0 - F_die), F_die)
    p_st = jnp.where(front, bsdfw * (1.0 - F_die), 1.0 - F_die)
    p_cc = jnp.where(front, 0.25 * cc, 0.0)
    p_di = jnp.where(front, brdf, 0.0)
    tot = jnp.maximum(p_sr + p_st + p_cc + p_di, 1e-12)
    return p_sr / tot, p_st / tot, p_cc / tot, p_di / tot


def _principled_eval(wi, wo, p, t0, t1):
    (metallic, rough, eta, cc, ccg, ax, ay, sheen, sheen_tint, strans,
     flat, stint) = _principled_fetch(p)
    base = t0
    ci = m.cos_theta(wi)
    co = m.cos_theta(wo)
    brdf = (1.0 - metallic) * (1.0 - strans)
    bsdfw = (1.0 - metallic) * strans
    refl = ci * co > 0.0
    refr = ci * co < 0.0
    front = ci > 0.0
    eta_path = jnp.where(front, eta, 1.0 / eta)

    wh = m.normalize(wi + wo * jnp.where(refl, 1.0, eta_path)[..., None])
    wh = wh * jnp.sign(m.cos_theta(wh))[..., None]       # point up
    cos_ih = jnp.sum(wi * wh, -1)
    cos_oh = jnp.sum(wo * wh, -1)
    F_die, _, eta_it, _ = fr.fresnel_dielectric(cos_ih, eta)

    sgn = jnp.sign(ci)
    mm_r = (cos_ih * sgn > 0.0) & (cos_oh * sgn > 0.0)
    mm_t = (cos_ih * sgn > 0.0) & (cos_oh * (-sgn) > 0.0)

    # ggx_smith_g1/ggx_pdf_visible are even in v with an orientation
    # mask that already handles below-horizon directions, so wi/wo pass
    # through unflipped (the reference's mulsign(wi, cos_theta_i) is a
    # full negation, under which both are invariant)
    D = mf.ggx_d(wh, ax, ay)
    G = mf.ggx_smith_g1(wi, wh, ax, ay) * mf.ggx_smith_g1(wo, wh, ax, ay)

    val = jnp.zeros(wi.shape)

    # ---- main specular reflection (blended principled fresnel) ----
    lum = 0.212671 * base[..., 0] + 0.715160 * base[..., 1] \
        + 0.072169 * base[..., 2]
    c_tint = jnp.where(lum[..., None] > 0.0,
                       base / jnp.maximum(lum, 1e-12)[..., None], 1.0)
    r0_eta = ((eta - 1.0) / (eta + 1.0)) ** 2
    eta_it_m = jnp.where(cos_ih >= 0.0, eta, 1.0 / eta)
    f0_tint = c_tint * (((eta_it_m - 1.0) / (eta_it_m + 1.0)) ** 2)[..., None]
    del r0_eta
    F_schlick = metallic[..., None] * _calc_schlick(base, cos_ih, eta) \
        + ((1.0 - metallic) * stint)[..., None] \
        * _calc_schlick(f0_tint, cos_ih, eta)
    F_front = ((1.0 - metallic) * (1.0 - stint) * F_die)[..., None] \
        + F_schlick
    F_prin = jnp.where(front[..., None], F_front,
                       (bsdfw * F_die)[..., None])
    sr_on = refl & mm_r & (F_die > 0.0)
    val += jnp.where(sr_on[..., None],
                     F_prin * (D * G / jnp.maximum(
                         4.0 * jnp.abs(ci), 1e-8))[..., None], 0.0)

    # ---- specular microfacet transmission (radiance-mode eta scale) ----
    st_on = refr & mm_t & (bsdfw > 0.0) & (F_die < 1.0)
    denom = cos_ih + eta_path * cos_oh
    tr = bsdfw * jnp.abs(
        ((1.0 / jnp.maximum(eta_path * eta_path, 1e-12))
         * (1.0 - F_die) * D * G * eta_path * eta_path * cos_ih * cos_oh)
        / (ci * jnp.maximum(denom * denom, 1e-12)))
    val += jnp.where(st_on[..., None], jnp.sqrt(jnp.maximum(base, 0.0))
                     * tr[..., None], 0.0)

    # ---- clearcoat (GTR1, fixed 0.04 schlick, alpha-0.25 smith G) ----
    cc_on = refl & mm_r & front & (cc > 0.0)
    a_cc = 0.1 + (0.001 - 0.1) * ccg
    Fcc = _calc_schlick(jnp.full(ci.shape, 0.04), cos_ih, eta)
    Dcc = _gtr1_d(wh, a_cc)
    Gcc = _smith_ggx1(wi, wh, 0.25) * _smith_ggx1(wo, wh, 0.25)
    val += jnp.where(cc_on[..., None],
                     (0.25 * cc * Fcc * Dcc * Gcc
                      * jnp.abs(co))[..., None], 0.0)

    # ---- diffuse + retro-reflection + fake subsurface + sheen ----
    di_on = refl & front & (brdf > 0.0)
    Fo = _schlick_w(jnp.abs(co))
    Fi = _schlick_w(jnp.abs(ci))
    f_diff = (1.0 - 0.5 * Fi) * (1.0 - 0.5 * Fo)
    cos_d = cos_oh
    Rr = 2.0 * rough * cos_d * cos_d
    f_retro = Rr * (Fo + Fi + Fo * Fi * (Rr - 1.0))
    fss90 = 0.5 * Rr
    fss = (1.0 + (fss90 - 1.0) * Fo) * (1.0 + (fss90 - 1.0) * Fi)
    f_ss = 1.25 * (fss * (1.0 / jnp.maximum(jnp.abs(co) + jnp.abs(ci),
                                            1e-8) - 0.5) + 0.5)
    f_d = (f_diff + f_retro) * (1.0 - flat) + f_ss * flat
    val += jnp.where(di_on[..., None],
                     (brdf * jnp.abs(co) / jnp.pi * f_d)[..., None] * base,
                     0.0)
    sh_on = refl & front & (sheen > 0.0) & (metallic < 1.0)
    Fd = _schlick_w(jnp.abs(cos_d))
    c_sheen = 1.0 + (c_tint - 1.0) * sheen_tint[..., None]
    val += jnp.where(sh_on[..., None],
                     (sheen * (1.0 - metallic) * Fd
                      * jnp.abs(co))[..., None] * c_sheen, 0.0)

    # ---- pdf over the four lobes ----
    p_sr, p_st, p_cc, p_di = _principled_probs(front, bsdfw, brdf, cc,
                                               F_die)
    pdf_h = mf.ggx_pdf_visible(wi, wh, ax, ay)
    dwh_r = 1.0 / jnp.maximum(4.0 * jnp.abs(cos_oh), 1e-8)
    dwh_t = jnp.abs((eta_path * eta_path) * cos_oh) \
        / jnp.maximum(denom * denom, 1e-12)
    pdf = jnp.where(refl & mm_r, p_sr * pdf_h * dwh_r, 0.0)
    pdf += jnp.where(refl, p_di * jnp.maximum(co, 0.0) / jnp.pi, 0.0)
    pdf += jnp.where(refr & mm_t, p_st * pdf_h * dwh_t, 0.0)
    pdf_cc_h = jnp.maximum(m.cos_theta(wh), 0.0) * _gtr1_d(wh, a_cc)
    pdf += jnp.where(refl & mm_r, p_cc * pdf_cc_h * dwh_r, 0.0)

    act = (ci != 0.0) & (front | (bsdfw > 0.0))
    return jnp.where(act[..., None], val, 0.0), jnp.where(act, pdf, 0.0)


def _principled_sample(wi, u1, u2, p, t0, t1):
    (metallic, rough, eta, cc, ccg, ax, ay, sheen, sheen_tint, strans,
     flat, stint) = _principled_fetch(p)
    ci = m.cos_theta(wi)
    brdf = (1.0 - metallic) * (1.0 - strans)
    bsdfw = (1.0 - metallic) * strans
    front = ci > 0.0

    # sample the main-specular micro normal first; fresnel w.r.t. it
    # drives the lobe probabilities (principled.cpp:356-400).  The
    # micro normal stays in the upper hemisphere for BOTH sides (the
    # reference's mulsign(wi, cos_theta_i) convention), so the eval-side
    # wh reconstruction lands on exactly this normal and the vndf pdf
    # (even in wi) is the true sampling density.
    wi_m = wi * jnp.sign(ci)[..., None]
    h_spec = mf.ggx_sample_vndf(wi_m, u2, ax, ay)
    cos_ih = jnp.sum(wi * h_spec, -1)
    F_die, ctt, eta_it, eta_ti = fr.fresnel_dielectric(cos_ih, eta)

    p_sr, p_st, p_cc, p_di = _principled_probs(front, bsdfw, brdf, cc,
                                               F_die)
    take_di = u1 < p_di
    take_cc = (~take_di) & (u1 < p_di + p_cc)
    take_st = (~take_di) & (~take_cc) & (u1 < p_di + p_cc + p_st)
    take_sr = (~take_di) & (~take_cc) & (~take_st)

    wo_sr = 2.0 * cos_ih[..., None] * h_spec - wi
    # refract through the up-oriented micro normal: the fresnel helper's
    # cos_theta_t already carries the right (negated-incident-side) sign
    # for either hemisphere (fresnel.h refract())
    wo_st = m.normalize(
        h_spec * (eta_ti * cos_ih + ctt)[..., None]
        - eta_ti[..., None] * wi)
    a_cc = 0.1 + (0.001 - 0.1) * ccg
    h_cc = _gtr1_sample(u2, a_cc)
    wo_cc = 2.0 * jnp.sum(wi * h_cc, -1)[..., None] * h_cc - wi
    wo_di = warp.square_to_cosine_hemisphere(u2)
    wo = jnp.where(take_sr[..., None], wo_sr,
                   jnp.where(take_st[..., None], wo_st,
                             jnp.where(take_cc[..., None], wo_cc, wo_di)))
    co = m.cos_theta(wo)

    val, pdf = _principled_eval(wi, wo, p, t0, t1)
    side_ok = jnp.where(take_st, ci * co < 0.0, ci * co > 0.0)
    act = (ci != 0.0) & (front | (bsdfw > 0.0)) & side_ok & (pdf > 1e-12)
    weight = jnp.where(act[..., None],
                       val / jnp.maximum(pdf, 1e-12)[..., None], 0.0)
    eta_s = jnp.where(take_st & act, eta_it, 1.0)
    st_fl = jnp.where(take_di, jnp.uint32(F_DIFFUSE_REFL),
                      jnp.where(take_st, jnp.uint32(F_GLOSSY_TRANS),
                                jnp.uint32(F_GLOSSY_REFL)))
    return wo, jnp.where(act, pdf, 0.0), weight, eta_s, st_fl


def _null_sample(wi, u1, u2, p, t0, t1):
    wo = -wi
    n = wi.shape[:-1]
    return wo, jnp.ones(n), jnp.ones(n + (3,)), jnp.ones(n), \
        jnp.full(n, F_NULL, _U32)


def _polarizer_sample(wi, u1, u2, p, t0, t1):
    """Ideal linear polarizer element (src/bsdfs/polarizer.cpp): straight
    transmission; unpolarized scalar mode passes M00 = transmittance/2."""
    wo = -wi
    n = wi.shape[:-1]
    return wo, jnp.ones(n), 0.5 * t0, jnp.ones(n), \
        jnp.full(n, F_NULL, _U32)


def _retarder_sample(wi, u1, u2, p, t0, t1):
    """Linear retarder (src/bsdfs/retarder.cpp): phase only — unpolarized
    scalar transmission is the full transmittance."""
    wo = -wi
    n = wi.shape[:-1]
    return wo, jnp.ones(n), t0, jnp.ones(n), jnp.full(n, F_NULL, _U32)


def _circular_sample(wi, u1, u2, p, t0, t1):
    """Circular polarizer (src/bsdfs/circular.cpp): passes half of
    unpolarized light."""
    wo = -wi
    n = wi.shape[:-1]
    return wo, jnp.ones(n), 0.5 * t0, jnp.ones(n), \
        jnp.full(n, F_NULL, _U32)


def _hair_sample(wi, u1, u2, p, t0, t1):
    from .hair import hair_sample
    return hair_sample(wi, u1, u2, p, t0)


def _hair_eval(wi, wo, p, t0, t1):
    from .hair import hair_eval_pdf
    return hair_eval_pdf(wi, wo, p, t0)


_SAMPLERS = {
    BSDF_DIFFUSE: _diffuse_sample,
    BSDF_DIELECTRIC: _dielectric_sample,
    BSDF_THINDIELECTRIC: _thindielectric_sample,
    BSDF_CONDUCTOR: _conductor_sample,
    BSDF_ROUGHCONDUCTOR: _roughconductor_sample,
    BSDF_PLASTIC: _plastic_sample,
    BSDF_ROUGHPLASTIC: _roughplastic_sample,
    BSDF_PPLASTIC: _pplastic_sample,
    BSDF_ROUGHDIELECTRIC: _roughdielectric_sample,
    BSDF_PRINCIPLED: _principled_sample,
    BSDF_PRINCIPLEDTHIN: _principledthin_sample,
    BSDF_HAIR: _hair_sample,
    BSDF_POLARIZER: _polarizer_sample,
    BSDF_RETARDER: _retarder_sample,
    BSDF_CIRCULAR: _circular_sample,
    BSDF_NULL: _null_sample,
}

_EVALS = {
    BSDF_DIFFUSE: _diffuse_eval,
    BSDF_ROUGHCONDUCTOR: _roughconductor_eval,
    BSDF_PLASTIC: _plastic_eval,
    BSDF_ROUGHPLASTIC: _roughplastic_eval,
    BSDF_PPLASTIC: _pplastic_eval,
    BSDF_ROUGHDIELECTRIC: _roughdielectric_eval,
    BSDF_PRINCIPLED: _principled_eval,
    BSDF_PRINCIPLEDTHIN: _principledthin_eval,
    BSDF_HAIR: _hair_eval,
}


def _gather_ctx(scene: Scene, si, idx):
    """Per-lane (btype, params, tex0, tex1) rows for an index array."""
    b = scene.bsdfs
    p = m.table_lookup(b.params, idx)
    t0 = eval_texture(scene.textures, m.table_lookup(b.tex0, idx), si.uv,
                      types=b.tex0_types, p=si.p, attr=si.attr)
    t1 = eval_texture(scene.textures, m.table_lookup(b.tex1, idx), si.uv,
                      types=b.tex1_types, p=si.p, attr=si.attr)
    return m.table_lookup(b.btype, idx), p, t0, t1


def _family_sample(scene: Scene, wi_f, u1, u2, btype, p, t0, t1):
    """Masked-select sampling over the static family set for one
    (possibly nested-resolved) per-lane context."""
    n = wi_f.shape[:-1]
    wo = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wi_f.shape)
    pdf = jnp.zeros(n)
    weight = jnp.zeros(n + (3,))
    eta = jnp.ones(n)
    st = jnp.zeros(n, _U32)
    for ftype in scene.bsdfs.types_present:
        if ftype not in _SAMPLERS:
            continue
        fwo, fpdf, fw, feta, fst = _SAMPLERS[ftype](wi_f, u1, u2, p, t0, t1)
        sel = btype == ftype
        wo = jnp.where(sel[..., None], fwo, wo)
        pdf = jnp.where(sel, fpdf, pdf)
        weight = jnp.where(sel[..., None], fw, weight)
        eta = jnp.where(sel, feta, eta)
        st = jnp.where(sel, fst, st)
    if BSDF_MEASURED in scene.bsdfs.types_present:
        from .measured import measured_sample
        mwo, mpdf, mw = measured_sample(scene.measured, wi_f, u1, u2)
        sel = btype == BSDF_MEASURED
        wo = jnp.where(sel[..., None], mwo, wo)
        pdf = jnp.where(sel, mpdf, pdf)
        weight = jnp.where(sel[..., None], mw * t0, weight)
        st = jnp.where(sel, jnp.uint32(F_GLOSSY_REFL), st)
    return wo, pdf, weight, eta, st


def _family_eval(scene: Scene, wi_f, wo_f, btype, p, t0, t1):
    n = wi_f.shape[:-1]
    val = jnp.zeros(n + (3,))
    pdf = jnp.zeros(n)
    for ftype in scene.bsdfs.types_present:
        if ftype not in _EVALS:
            continue
        fv, fp = _EVALS[ftype](wi_f, wo_f, p, t0, t1)
        sel = btype == ftype
        val = jnp.where(sel[..., None], fv, val)
        pdf = jnp.where(sel, fp, pdf)
    if BSDF_MEASURED in scene.bsdfs.types_present:
        from .measured import measured_eval_pdf
        mv, mp = measured_eval_pdf(scene.measured, wi_f, wo_f)
        sel = btype == BSDF_MEASURED
        val = jnp.where(sel[..., None], mv * t0, val)
        pdf = jnp.where(sel, mp, pdf)
    return val, pdf


def _scalar_weight(scene: Scene, si, idx):
    """Blend weight / mask opacity: mean of the outer row's tex0
    (the reference evaluates these textures as eval_1 scalars)."""
    b = scene.bsdfs
    t0 = eval_texture(scene.textures, m.table_lookup(b.tex0, idx), si.uv,
                      types=b.tex0_types, p=si.p, attr=si.attr)
    return jnp.clip(jnp.mean(t0, -1), 1e-4, 1.0 - 1e-4)


def _nested_masks(scene: Scene, btype):
    tp = scene.bsdfs.types_present
    zeros = jnp.zeros(btype.shape, bool)
    is_blend = (btype == BSDF_BLEND) if BSDF_BLEND in tp else zeros
    is_mask = (btype == BSDF_MASK) if BSDF_MASK in tp else zeros
    return is_blend, is_mask


def bsdf_sample(scene: Scene, si, bsdf_idx, u1, u2) -> BSDFSample:
    """Sample the BSDF at each lane. Returns local-frame wo.

    blendbsdf / mask are resolved one level deep before family dispatch
    (src/bsdfs/blendbsdf.cpp:108-160, mask.cpp:121-166): the lane picks a
    nested BSDF stochastically (rescaling u1 like the reference), samples
    it, and — for blend — combines with the other nested lobe's eval/pdf so
    MIS stays consistent."""
    b = scene.bsdfs
    idx = jnp.maximum(bsdf_idx, 0)
    btype = m.table_lookup(b.btype, idx)
    twosided = m.table_lookup(b.twosided, idx)
    wi = _sanitize_dir(si.wi)
    flip = twosided & (m.cos_theta(wi) < 0)
    wi_f = jnp.where(flip[..., None], _flip_z(wi), wi)

    tp = b.types_present
    has_nest = (BSDF_BLEND in tp) or (BSDF_MASK in tp)
    idx_eff, u1_eff = idx, u1
    if has_nest:
        is_blend, is_mask = _nested_masks(scene, btype)
        wsel = _scalar_weight(scene, si, idx)
        inner = jnp.maximum(m.table_lookup(b.inner, idx), 0)
        inner2 = jnp.maximum(m.table_lookup(b.inner2, idx), 0)
        # blend: u1 <= w -> nested[1] (blendbsdf.cpp:131-132)
        pick2 = is_blend & (u1 <= wsel)
        pick1 = is_blend & ~pick2
        # mask: u1 < opacity -> nested, else null transmission (mask.cpp:157)
        mask_nested = is_mask & (u1 < wsel)
        mask_trans = is_mask & ~mask_nested
        u1_eff = jnp.where(pick2 | mask_nested, u1 / wsel, u1)
        u1_eff = jnp.where(pick1, (u1 - wsel) / (1.0 - wsel), u1_eff)
        idx_eff = jnp.where(pick2, inner2,
                            jnp.where(pick1 | mask_nested, inner, idx))

    bt_e, p_e, t0_e, t1_e = _gather_ctx(scene, si, idx_eff)
    wo, pdf, weight, eta, st = _family_sample(scene, wi_f, u1_eff, u2,
                                              bt_e, p_e, t0_e, t1_e)

    if has_nest and BSDF_BLEND in tp:
        # other-lobe eval for the full blended pdf / value
        # (blendbsdf.cpp:137-155)
        idx_oth = jnp.where(pick2, inner, inner2)
        bt_o, p_o, t0_o, t1_o = _gather_ctx(scene, si, idx_oth)
        val_o, pdf_o = _family_eval(scene, wi_f, wo, bt_o, p_o, t0_o, t1_o)
        q_ch = jnp.where(pick2, wsel, 1.0 - wsel)
        q_o = 1.0 - q_ch
        pdf_b = q_ch * pdf + q_o * pdf_o
        f_b = q_ch[..., None] * (weight * pdf[..., None]) \
            + q_o[..., None] * val_o
        res_b = jnp.where((pdf_b > 0)[..., None],
                          f_b / jnp.maximum(pdf_b, 1e-12)[..., None], 0.0)
        pdf = jnp.where(is_blend, pdf_b, pdf)
        weight = jnp.where(is_blend[..., None], res_b, weight)

    if has_nest and BSDF_MASK in tp:
        det_w = jax.lax.stop_gradient(wsel)
        pdf = jnp.where(mask_nested, pdf * det_w, pdf)
        weight = jnp.where(mask_nested[..., None],
                           weight * (wsel / det_w)[..., None], weight)
        wo = jnp.where(mask_trans[..., None], -wi_f, wo)
        pdf = jnp.where(mask_trans, 1.0 - det_w, pdf)
        weight = jnp.where(
            mask_trans[..., None],
            jnp.broadcast_to(((1.0 - wsel) / (1.0 - det_w))[..., None],
                             weight.shape), weight)
        eta = jnp.where(mask_trans, 1.0, eta)
        st = jnp.where(mask_trans, jnp.uint32(F_NULL), st)

    wo = jnp.where(flip[..., None], _flip_z(wo), wo)
    return BSDFSample(wo=wo, pdf=pdf, eta=eta, sampled_type=st, weight=weight)


def bsdf_eval_pdf(scene: Scene, si, bsdf_idx, wo) -> Tuple:
    """Evaluate f*cos and pdf for a given outgoing direction (local frame).
    Delta lobes evaluate to zero (reference bsdf.h eval contract).
    blend = (1-w) * nested0 + w * nested1 (blendbsdf.cpp:177-178,193);
    mask = opacity * nested (mask.cpp:169-188)."""
    b = scene.bsdfs
    idx = jnp.maximum(bsdf_idx, 0)
    btype = m.table_lookup(b.btype, idx)
    twosided = m.table_lookup(b.twosided, idx)
    wi = _sanitize_dir(si.wi)
    wo = _sanitize_dir(wo)
    flip = twosided & (m.cos_theta(wi) < 0)
    wi_f = jnp.where(flip[..., None], _flip_z(wi), wi)
    wo_f = jnp.where(flip[..., None], _flip_z(wo), wo)

    tp = b.types_present
    has_nest = (BSDF_BLEND in tp) or (BSDF_MASK in tp)
    idx_a = idx
    if has_nest:
        is_blend, is_mask = _nested_masks(scene, btype)
        wsel = _scalar_weight(scene, si, idx)
        inner = jnp.maximum(m.table_lookup(b.inner, idx), 0)
        inner2 = jnp.maximum(m.table_lookup(b.inner2, idx), 0)
        idx_a = jnp.where(is_blend | is_mask, inner, idx)

    bt_a, p_a, t0_a, t1_a = _gather_ctx(scene, si, idx_a)
    val, pdf = _family_eval(scene, wi_f, wo_f, bt_a, p_a, t0_a, t1_a)

    if has_nest and BSDF_BLEND in tp:
        idx_b2 = jnp.where(is_blend, inner2, idx_a)
        bt_b, p_b, t0_b, t1_b = _gather_ctx(scene, si, idx_b2)
        val2, pdf2 = _family_eval(scene, wi_f, wo_f, bt_b, p_b, t0_b, t1_b)
        val = jnp.where(is_blend[..., None],
                        (1.0 - wsel)[..., None] * val
                        + wsel[..., None] * val2, val)
        pdf = jnp.where(is_blend, (1.0 - wsel) * pdf + wsel * pdf2, pdf)
    if has_nest and BSDF_MASK in tp:
        val = jnp.where(is_mask[..., None], val * wsel[..., None], val)
        pdf = jnp.where(is_mask, pdf * jax.lax.stop_gradient(wsel), pdf)
    return val, pdf


def eval_null_transmission(scene: Scene, si, bsdf_idx):
    """Transmission along a straight shadow ray (reference
    bsdf.cpp eval_null_transmission): 1 for null/mask pass-through, 0 else."""
    idx = jnp.maximum(bsdf_idx, 0)
    btype = m.table_lookup(scene.bsdfs.btype, idx)
    out = jnp.zeros(si.uv.shape[:-1] + (3,))
    if BSDF_NULL in scene.bsdfs.types_present:
        out = jnp.where((btype == BSDF_NULL)[..., None], 1.0, out)
    if BSDF_MASK in scene.bsdfs.types_present:
        op = eval_texture(scene.textures, scene.bsdfs.tex0[idx], si.uv)
        out = jnp.where((btype == BSDF_MASK)[..., None], 1.0 - op, out)
    for ptype, fac in ((BSDF_POLARIZER, 0.5), (BSDF_RETARDER, 1.0),
                       (BSDF_CIRCULAR, 0.5)):
        if ptype in scene.bsdfs.types_present:
            tr = eval_texture(scene.textures, scene.bsdfs.tex0[idx], si.uv)
            out = jnp.where((btype == ptype)[..., None], fac * tr, out)
    return out
