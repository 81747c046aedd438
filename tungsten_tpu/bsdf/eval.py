"""Batched BSDF eval / sample / pdf over the flattened material table.

Convention (matches ref src/core/bsdfs/Bsdf.hpp + SurfaceScatterEvent):
  * directions in the local tangent frame, +z = shading normal;
  * `wi` points *away* from the surface toward the previous path vertex;
  * `wo` is the scattered direction;
  * eval() returns f * |cos(theta_o)| (the reference folds the cosine in);
  * sample() returns (wo, weight=f*cos/pdf, pdf, flags);
  * eval()/pdf() cover the *non-Dirac* lobes only (the reference's NEE
    paths always request AllButSpecular, which is the only context that
    evaluates these), while sample() covers all lobes.

Dispatch is branchless masked-select over the BSDF types actually present
in the scene (a static tuple) — the TPU-friendly analog of the
reference's virtual dispatch.  Nested materials (smooth/rough coat,
mixed, transparency) re-dispatch one level down over their child types.

Per-type formula parity is against the reference implementations in
src/core/bsdfs/*.cpp (each function cites its source).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tungsten_tpu.bsdf import fresnel as fr
from tungsten_tpu.bsdf import microfacet as mf
from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.bsdf.types import P, AUX
from tungsten_tpu.utils.vecmath import INV_PI
from tungsten_tpu.scene.textures import eval_texture

# sample() flag bits
FLAG_SPECULAR = 1
FLAG_VALID = 2
FLAG_TRANSMIT = 4

NESTED_TYPES = (bt.SMOOTH_COAT, bt.ROUGH_COAT, bt.MIXED, bt.TRANSPARENCY)


def _cosine_hemisphere(u1, u2):
    phi = u1 * (2.0 * jnp.pi)
    r = jnp.sqrt(u2)
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


def _cosine_pdf(wo):
    return jnp.abs(wo[..., 2]) * INV_PI


def _uniform_hemisphere(u1, u2):
    phi = u1 * (2.0 * jnp.pi)
    z = u2
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


def _reflect_z(wi):
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def _is_mirror_dir(wi, wo, tol=1e-3):
    """checkReflectionConstraint analog for float wavefronts."""
    m = _reflect_z(wi)
    return jnp.sum(jnp.abs(wo - m), axis=-1) < tol


class ShadePoint:
    """Per-ray material bindings gathered once per bounce."""

    def __init__(self, scene, bsdf_idx, uv):
        self.scene = scene
        self.idx = bsdf_idx
        self.uv = uv
        self.type = scene.bsdf_type[bsdf_idx]
        self.params = scene.bsdf_params[bsdf_idx]
        self.aux = scene.bsdf_aux[bsdf_idx]
        self.albedo = eval_texture(
            scene.tex_type, scene.tex_const, scene.tex_params,
            scene.tex_bitmap_id, scene.bitmaps,
            scene.bsdf_albedo_tex[bsdf_idx], uv)
        # textured roughness: params[ROUGHNESS] < 0 marks a texture ref
        r_tex = self.aux[..., AUX.RATIO_TEX]
        r_scalar = self.params[..., P.ROUGHNESS]
        if scene.tex_type.shape[0] > 0:
            r_val = eval_texture(
                scene.tex_type, scene.tex_const, scene.tex_params,
                scene.tex_bitmap_id, scene.bitmaps,
                jnp.clip(r_tex, 0, scene.tex_type.shape[0] - 1), uv)[..., 0]
            self.roughness = jnp.where(r_scalar < 0.0, r_val, r_scalar)
        else:
            self.roughness = r_scalar
        self.dist = self.aux[..., AUX.DISTRIBUTION]

    def child(self, slot=AUX.CHILD0):
        idx = jnp.clip(self.aux[..., slot], 0,
                       self.scene.bsdf_type.shape[0] - 1)
        return ShadePoint(self.scene, idx, self.uv)

    def ratio(self):
        """mixed-ratio / opacity texture value."""
        r_tex = jnp.clip(self.aux[..., AUX.RATIO_TEX], 0,
                         self.scene.tex_type.shape[0] - 1)
        return eval_texture(
            self.scene.tex_type, self.scene.tex_const, self.scene.tex_params,
            self.scene.tex_bitmap_id, self.scene.bitmaps, r_tex, self.uv)[..., 0]


# =================================================================== lambert

def _lambert_eval(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok[..., None], sp.albedo * (INV_PI * wo[..., 2:3]), 0.0)


def _lambert_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok, wo[..., 2] * INV_PI, 0.0)


def _lambert_sample(sp, wi, U, ctx):
    wo = _cosine_hemisphere(U["u1"], U["u2"])
    pdf = _cosine_pdf(wo)
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], sp.albedo, 0.0)
    flags = jnp.where(ok, FLAG_VALID, 0)
    return wo, weight, pdf, flags


# ==================================================================== mirror

def _zero_eval(sp, wi, wo, ctx):
    return jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)


def _zero_pdf(sp, wi, wo, ctx):
    return jnp.zeros(wi.shape[:-1], wi.dtype)


def _mirror_sample(sp, wi, U, ctx):
    wo = _reflect_z(wi)
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], sp.albedo, 0.0)
    pdf = jnp.where(ok, 1.0, 0.0)
    flags = jnp.where(ok, FLAG_VALID | FLAG_SPECULAR, 0)
    return wo, weight, pdf, flags


def _null_sample(sp, wi, U, ctx):
    wo = _reflect_z(wi)
    z3 = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    return wo, z3, jnp.zeros(wi.shape[:-1]), jnp.zeros(wi.shape[:-1], jnp.int32)


# ================================================================= conductor

def _conductor_sample(sp, wi, U, ctx):
    """ref ConductorBsdf::sample"""
    wo = _reflect_z(wi)
    eta = sp.params[..., P.ETA_R:P.ETA_B + 1]
    k = sp.params[..., P.K_R:P.K_B + 1]
    F = fr.conductor_reflectance_rgb(eta, k, wi[..., 2])
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], sp.albedo * F, 0.0)
    pdf = jnp.where(ok, 1.0, 0.0)
    flags = jnp.where(ok, FLAG_VALID | FLAG_SPECULAR, 0)
    return wo, weight, pdf, flags


# =========================================================== rough conductor

def _rough_conductor_eval(sp, wi, wo, ctx):
    """ref RoughConductorBsdf::eval"""
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    alpha = mf.roughness_to_alpha(sp.dist, sp.roughness)
    hr = wi + wo
    hr = hr / jnp.maximum(jnp.linalg.norm(hr, axis=-1, keepdims=True), 1e-20)
    cos_m = jnp.sum(wi * hr, axis=-1)
    eta = sp.params[..., P.ETA_R:P.ETA_B + 1]
    k = sp.params[..., P.K_R:P.K_B + 1]
    F = fr.conductor_reflectance_rgb(eta, k, cos_m)
    G = mf.G(sp.dist, alpha, wi, wo, hr)
    D = mf.D(sp.dist, alpha, hr)
    f = (G * D * 0.25) / jnp.maximum(wi[..., 2], 1e-20)
    return jnp.where(ok[..., None], sp.albedo * F * f[..., None], 0.0)


def _rough_conductor_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    alpha = mf.roughness_to_alpha(sp.dist, sp.roughness)
    hr = wi + wo
    hr = hr / jnp.maximum(jnp.linalg.norm(hr, axis=-1, keepdims=True), 1e-20)
    p = mf.pdf(sp.dist, alpha, hr) * 0.25 / \
        jnp.maximum(jnp.abs(jnp.sum(wi * hr, axis=-1)), 1e-20)
    return jnp.where(ok, p, 0.0)


def _rough_conductor_sample(sp, wi, U, ctx):
    """ref RoughConductorBsdf::sample"""
    alpha = mf.roughness_to_alpha(sp.dist, sp.roughness)
    # DETACHED microfacet sampling: the sampled half-vector carries
    # no parameter gradient (detached-sampling estimator — the warp's
    # d(m)/d(roughness) is singular at the domain edges and NaNs the
    # replay backward); the weight D·G/pdf keeps its roughness
    # dependence at the detached m
    m = jax.lax.stop_gradient(
        mf.sample(sp.dist, alpha, U["u1"], U["u2"]))
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo = 2.0 * wi_dot_m[..., None] * m - wi
    ok = (wi[..., 2] > 0) & (wi_dot_m > 0) & (wo[..., 2] > 0)
    G = mf.G(sp.dist, alpha, wi, wo, m)
    D = mf.D(sp.dist, alpha, m)
    m_pdf = mf.pdf(sp.dist, alpha, m)
    pdf = m_pdf * 0.25 / jnp.maximum(wi_dot_m, 1e-20)
    w = wi_dot_m * G * D / jnp.maximum(wi[..., 2] * m_pdf, 1e-20)
    eta = sp.params[..., P.ETA_R:P.ETA_B + 1]
    k = sp.params[..., P.K_R:P.K_B + 1]
    F = fr.conductor_reflectance_rgb(eta, k, wi_dot_m)
    weight = jnp.where(ok[..., None], sp.albedo * F * w[..., None], 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    flags = jnp.where(ok, FLAG_VALID, 0)
    return wo, weight, pdf, flags


# ================================================================ dielectric

def _dielectric_sample(sp, wi, U, ctx):
    """ref DielectricBsdf::sample (both Dirac lobes, refraction-enabled
    governed by params[EXTRA0])."""
    ior = sp.params[..., P.IOR]
    enable_t = sp.params[..., P.EXTRA0] > 0.5
    eta = jnp.where(wi[..., 2] < 0.0, ior, 1.0 / ior)
    F, cos_t = fr.dielectric_reflectance(eta, jnp.abs(wi[..., 2]))
    refl_prob = jnp.where(enable_t, F, 1.0)

    take_refl = U["lobe2"] < refl_prob
    wo_r = _reflect_z(wi)
    wo_t = jnp.stack([
        -wi[..., 0] * eta, -wi[..., 1] * eta,
        -jnp.copysign(cos_t, wi[..., 2])], axis=-1)
    wo = jnp.where(take_refl[..., None], wo_r, wo_t)
    w_r = jnp.where(enable_t, 1.0, F)
    w_t = 1.0 - F  # only reachable when enable_t
    if not ctx.get("adjoint", False):
        # radiance compression across the boundary (ref
        # Bsdf::sample(event, adjoint=false) multiplies by
        # sqr(eta(event)) = (etaI/etaO)^2, Bsdf.hpp:71-83)
        w_t = w_t * eta * eta
    w = jnp.where(take_refl, w_r, w_t)
    pdf = jnp.where(take_refl, refl_prob, 1.0 - refl_prob)
    ok = jnp.where(take_refl, wi[..., 2] != 0.0, F < 1.0)
    weight = jnp.where(ok[..., None], sp.albedo * w[..., None], 0.0)
    flags = jnp.where(ok, FLAG_VALID | FLAG_SPECULAR, 0) | \
        jnp.where(ok & ~take_refl, FLAG_TRANSMIT, 0)
    return wo, weight, jnp.where(ok, pdf, 0.0), flags


# ========================================================== rough dielectric

def _rough_dielectric_parts(sp, wi, wo):
    ior = sp.params[..., P.IOR]
    wi_n = wi[..., 2]
    wo_n = wo[..., 2]
    reflect = wi_n * wo_n >= 0.0
    eta = jnp.where(wi_n < 0.0, ior, 1.0 / ior)
    m_r = jnp.sign(wi_n)[..., None] * (wi + wo)
    m_t = -(wi * eta[..., None] + wo)
    m = jnp.where(reflect[..., None], m_r, m_t)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-20)
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_dot_m = jnp.sum(wo * m, axis=-1)
    F, _ = fr.dielectric_reflectance(1.0 / ior, wi_dot_m)
    return reflect, eta, m, wi_dot_m, wo_dot_m, F


def _rough_dielectric_eval(sp, wi, wo, ctx):
    """ref RoughDielectricBsdf::evalBase (sampleR and sampleT on)."""
    enable_t = sp.params[..., P.EXTRA0] > 0.5
    reflect, eta, m, wi_dot_m, wo_dot_m, F = _rough_dielectric_parts(sp, wi, wo)
    alpha = mf.roughness_to_alpha(sp.dist, sp.roughness)
    G = mf.G(sp.dist, alpha, wi, wo, m)
    D = mf.D(sp.dist, alpha, m)
    abs_wi_n = jnp.maximum(jnp.abs(wi[..., 2]), 1e-20)
    f_r = F * G * D * 0.25 / abs_wi_n
    denom = jnp.maximum((eta * wi_dot_m + wo_dot_m) ** 2, 1e-20)
    f_t = jnp.abs(wi_dot_m * wo_dot_m) * (1.0 - F) * G * D / (denom * abs_wi_n)
    if not ctx.get("adjoint", False):
        # camera-transport eta^2 on the transmission lobe
        # (ref Bsdf::eval(event, adjoint=false), Bsdf.hpp:84-96)
        f_t = f_t * eta * eta
    f = jnp.where(reflect, f_r, jnp.where(enable_t, f_t, 0.0))
    return sp.albedo * f[..., None]


def _rough_dielectric_pdf(sp, wi, wo, ctx):
    """ref RoughDielectricBsdf::pdfBase."""
    enable_t = sp.params[..., P.EXTRA0] > 0.5
    reflect, eta, m, wi_dot_m, wo_dot_m, F = _rough_dielectric_parts(sp, wi, wo)
    rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi[..., 2]))) * sp.roughness
    s_alpha = mf.roughness_to_alpha(sp.dist, rough)
    pm = mf.pdf(sp.dist, s_alpha, m)
    pdf_r = pm * 0.25 / jnp.maximum(jnp.abs(wi_dot_m), 1e-20)
    pdf_t = pm * jnp.abs(wo_dot_m) / jnp.maximum((eta * wi_dot_m + wo_dot_m) ** 2, 1e-20)
    pdf = jnp.where(reflect, pdf_r * jnp.where(enable_t, F, 1.0),
                    jnp.where(enable_t, pdf_t * (1.0 - F), 0.0))
    return pdf


def _rough_dielectric_sample(sp, wi, U, ctx):
    """ref RoughDielectricBsdf::sampleBase."""
    ior = sp.params[..., P.IOR]
    enable_t = sp.params[..., P.EXTRA0] > 0.5
    wi_n = wi[..., 2]
    eta_n = jnp.where(wi_n < 0.0, ior, 1.0 / ior)
    rough = sp.roughness
    s_rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi_n))) * rough
    alpha = mf.roughness_to_alpha(sp.dist, rough)
    s_alpha = mf.roughness_to_alpha(sp.dist, s_rough)
    m = jax.lax.stop_gradient(          # detached sampling (see
        mf.sample(sp.dist, s_alpha,     # rough_conductor note)
                  U["u1"], U["u2"]))
    pm = mf.pdf(sp.dist, s_alpha, m)
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    F, cos_t = fr.dielectric_reflectance(1.0 / ior, wi_dot_m)
    eta_m = jnp.where(wi_dot_m < 0.0, ior, 1.0 / ior)

    reflect = jnp.where(enable_t, U["lobe2"] < F, jnp.ones_like(F, bool))
    wo_r = 2.0 * wi_dot_m[..., None] * m - wi
    wo_t = (eta_m * wi_dot_m - jnp.sign(wi_dot_m) * cos_t)[..., None] * m - \
        eta_m[..., None] * wi
    wo = jnp.where(reflect[..., None], wo_r, wo_t)
    wo_n = wo[..., 2]
    ok = (pm > 1e-10) & ((wi_n * wo_n > 0.0) == reflect)
    wo_dot_m = jnp.sum(wo * m, axis=-1)
    G = mf.G(sp.dist, alpha, wi, wo, m)
    D = mf.D(sp.dist, alpha, m)
    w = jnp.abs(wi_dot_m) * G * D / jnp.maximum(jnp.abs(wi_n) * pm, 1e-20)
    pdf_r = pm * 0.25 / jnp.maximum(jnp.abs(wi_dot_m), 1e-20)
    pdf_t = pm * jnp.abs(wo_dot_m) / \
        jnp.maximum((eta_n * wi_dot_m + wo_dot_m) ** 2, 1e-20)
    pdf = jnp.where(reflect, pdf_r, pdf_t)
    # enable_t: the F-choice goes into the pdf; otherwise into the weight
    pdf = jnp.where(enable_t, pdf * jnp.where(reflect, F, 1.0 - F), pdf)
    w = jnp.where(enable_t, w, w * jnp.where(reflect, F, 1.0 - F))
    if not ctx.get("adjoint", False):
        # camera-transport eta^2 on refraction (Bsdf.hpp:71-83)
        w = jnp.where(reflect, w, w * eta_n * eta_n)
    weight = jnp.where(ok[..., None], sp.albedo * w[..., None], 0.0)
    flags = jnp.where(ok, FLAG_VALID, 0) | \
        jnp.where(ok & ~reflect, FLAG_TRANSMIT, 0)
    return wo, weight, jnp.where(ok, pdf, 0.0), flags


# =================================================================== plastic

def _plastic_diffuse_f(sp, wi, wo):
    """Shared diffuse layer term of Plastic (ref PlasticBsdf::eval)."""
    ior = sp.params[..., P.IOR]
    eta = 1.0 / ior
    Fi, _ = fr.dielectric_reflectance(eta, wi[..., 2])
    Fo, _ = fr.dielectric_reflectance(eta, wo[..., 2])
    dfres = sp.params[..., P.EXTRA0]
    alb = sp.albedo
    brdf = ((1.0 - Fi) * (1.0 - Fo) * eta * eta * wo[..., 2] * INV_PI)[..., None] \
        * alb / (1.0 - alb * dfres[..., None])
    sig = sp.params[..., P.SIGMA_A_R:P.SIGMA_A_B + 1] * \
        sp.params[..., P.THICKNESS][..., None]
    atten = jnp.exp(sig * (-1.0 / jnp.maximum(wo[..., 2:3], 1e-6)
                           - 1.0 / jnp.maximum(wi[..., 2:3], 1e-6)))
    return brdf * atten


def _plastic_eval(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok[..., None], _plastic_diffuse_f(sp, wi, wo), 0.0)


def _plastic_pdf(sp, wi, wo, ctx):
    # non-specular request: pure cosine pdf (ref PlasticBsdf::pdf, sampleT)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok, _cosine_pdf(wo), 0.0)


def _plastic_sample(sp, wi, U, ctx):
    """ref PlasticBsdf::sample (both lobes)."""
    ior = sp.params[..., P.IOR]
    eta = 1.0 / ior
    Fi, _ = fr.dielectric_reflectance(eta, wi[..., 2])
    avg_trans = sp.params[..., P.EXTRA1]
    spec_prob = Fi / jnp.maximum(Fi + avg_trans * (1.0 - Fi), 1e-20)
    take_spec = U["lobe2"] < spec_prob

    wo_s = _reflect_z(wi)
    w_spec = Fi / jnp.maximum(spec_prob, 1e-20)

    wo_d = _cosine_hemisphere(U["u1"], U["u2"])
    f_d = _plastic_diffuse_f(sp, wi, wo_d)
    pdf_d = _cosine_pdf(wo_d) * (1.0 - spec_prob)
    w_d = f_d / jnp.maximum(pdf_d, 1e-20)[..., None]

    ok = wi[..., 2] > 0
    wo = jnp.where(take_spec[..., None], wo_s, wo_d)
    weight = jnp.where(take_spec[..., None],
                       jnp.repeat(w_spec[..., None], 3, axis=-1), w_d)
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(take_spec, spec_prob, pdf_d)
    flags = jnp.where(ok, FLAG_VALID, 0) | \
        jnp.where(ok & take_spec, FLAG_SPECULAR, 0)
    return wo, weight, jnp.where(ok, pdf, 0.0), flags


# ============================================================= rough plastic

def _rough_plastic_eval(sp, wi, wo, ctx):
    """glossy (rough-dielectric reflection) + diffuse substrate
    (ref RoughPlasticBsdf::eval)."""
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    # glossy reflection part = rough dielectric eval with T disabled
    reflect, eta, m, wi_dot_m, wo_dot_m, F = _rough_dielectric_parts(sp, wi, wo)
    alpha = mf.roughness_to_alpha(sp.dist, sp.roughness)
    G = mf.G(sp.dist, alpha, wi, wo, m)
    D = mf.D(sp.dist, alpha, m)
    glossy = F * G * D * 0.25 / jnp.maximum(jnp.abs(wi[..., 2]), 1e-20)
    diffuse = _plastic_diffuse_f(sp, wi, wo)
    return jnp.where(ok[..., None], glossy[..., None] + diffuse, 0.0)


def _rough_plastic_probs(sp, wi):
    ior = sp.params[..., P.IOR]
    Fi, _ = fr.dielectric_reflectance(1.0 / ior, wi[..., 2])
    sub_w = sp.params[..., P.EXTRA2] * sp.params[..., P.EXTRA1] * (1.0 - Fi)
    return Fi / jnp.maximum(Fi + sub_w, 1e-20)


def _rough_plastic_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    spec_prob = _rough_plastic_probs(sp, wi)
    reflect, eta, m, wi_dot_m, wo_dot_m, F = _rough_dielectric_parts(sp, wi, wo)
    rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi[..., 2]))) * sp.roughness
    s_alpha = mf.roughness_to_alpha(sp.dist, rough)
    pm = mf.pdf(sp.dist, s_alpha, m)
    glossy_pdf = pm * 0.25 / jnp.maximum(jnp.abs(wi_dot_m), 1e-20)
    pdf = glossy_pdf * spec_prob + _cosine_pdf(wo) * (1.0 - spec_prob)
    return jnp.where(ok, pdf, 0.0)


def _rough_plastic_sample(sp, wi, U, ctx):
    """ref RoughPlasticBsdf::sample: pick lobe, sample it, MIS-combine
    both lobes' f and pdf."""
    spec_prob = _rough_plastic_probs(sp, wi)
    take_spec = U["lobe2"] < spec_prob

    # glossy branch: rough-dielectric reflection sample (T off)
    ior = sp.params[..., P.IOR]
    rough = sp.roughness
    s_rough = (1.2 - 0.2 * jnp.sqrt(jnp.abs(wi[..., 2]))) * rough
    s_alpha = mf.roughness_to_alpha(sp.dist, s_rough)
    m = jax.lax.stop_gradient(          # detached sampling (see
        mf.sample(sp.dist, s_alpha,     # rough_conductor note)
                  U["u1"], U["u2"]))
    wi_dot_m = jnp.sum(wi * m, axis=-1)
    wo_g = 2.0 * wi_dot_m[..., None] * m - wi

    wo_d = _cosine_hemisphere(U["u1"], U["u2"])
    wo = jnp.where(take_spec[..., None], wo_g, wo_d)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)

    # combined f and pdf at the chosen wo
    f = _rough_plastic_eval(sp, wi, wo, ctx)
    pdf = _rough_plastic_pdf(sp, wi, wo, ctx)
    weight = jnp.where((ok & (pdf > 1e-20))[..., None],
                       f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    flags = jnp.where(ok & (pdf > 1e-20), FLAG_VALID, 0)
    return wo, weight, pdf, flags


# ================================================================ oren-nayar

def _oren_nayar_eval(sp, wi, wo, ctx):
    """ref OrenNayarBsdf::eval (full Fujii/improved form)."""
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    theta_r = jnp.arccos(jnp.clip(wo[..., 2], -1, 1))
    theta_i = jnp.arccos(jnp.clip(wi[..., 2], -1, 1))
    alpha = jnp.maximum(theta_r, theta_i)
    beta = jnp.minimum(theta_r, theta_i)
    sin_alpha = jnp.sin(alpha)
    denom = (wi[..., 0] ** 2 + wi[..., 1] ** 2) * (wo[..., 0] ** 2 + wo[..., 1] ** 2)
    cos_dphi = jnp.where(
        denom <= 0.0, 1.0,
        (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1])
        / jnp.sqrt(jnp.maximum(denom, 1e-30)))
    sigma = sp.roughness / jnp.sqrt(2.0)
    s_sq = sigma * sigma
    C1 = 1.0 - 0.5 * s_sq / (s_sq + 0.33)
    C2 = 0.45 * s_sq / (s_sq + 0.09)
    C2 = jnp.where(cos_dphi >= 0.0, C2 * sin_alpha,
                   C2 * (sin_alpha - ((2.0 * INV_PI) * beta) ** 3))
    C3 = 0.125 * (s_sq / (s_sq + 0.09)) * \
        ((4.0 * INV_PI * INV_PI) * alpha * beta) ** 2
    fr1 = C1 + cos_dphi * C2 * jnp.tan(beta) + \
        (1.0 - jnp.abs(cos_dphi)) * C3 * jnp.tan(0.5 * (alpha + beta))
    fr2 = 0.17 * s_sq / (s_sq + 0.13) * \
        (1.0 - cos_dphi * ((2.0 * INV_PI) * beta) ** 2)
    alb = sp.albedo
    f = (alb * fr1[..., None] + alb * alb * fr2[..., None]) * \
        wo[..., 2:3] * INV_PI
    return jnp.where(ok[..., None], f, 0.0)


def _oren_nayar_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ratio = jnp.clip(sp.roughness, 0.01, 1.0)
    p = (0.5 * INV_PI) * ratio + _cosine_pdf(wo) * (1.0 - ratio)
    return jnp.where(ok, p, 0.0)


def _oren_nayar_sample(sp, wi, U, ctx):
    ratio = jnp.clip(sp.roughness, 0.01, 1.0)
    uni = _uniform_hemisphere(U["u1"], U["u2"])
    cos = _cosine_hemisphere(U["u1"], U["u2"])
    wo = jnp.where((U["lobe2"] < ratio)[..., None], uni, cos)
    pdf = _oren_nayar_pdf(sp, wi, wo, ctx)
    f = _oren_nayar_eval(sp, wi, wo, ctx)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0) & (pdf > 1e-20)
    weight = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    return wo, weight, pdf, jnp.where(ok, FLAG_VALID, 0)


# ===================================================================== phong

def _phong_terms(sp):
    n = sp.params[..., P.EXTRA0]
    dr = sp.params[..., P.EXTRA1]
    return n, dr


def _phong_eval(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    n, dr = _phong_terms(sp)
    cos_t = jnp.sum(_reflect_z(wi) * wo, axis=-1)
    glossy = jnp.where(cos_t > 0,
                       jnp.power(jnp.maximum(cos_t, 1e-20), n)
                       * (n + 2.0) / (2.0 * jnp.pi) * (1.0 - dr), 0.0)
    f = sp.albedo * (wo[..., 2] * (dr * INV_PI + glossy))[..., None]
    return jnp.where(ok[..., None], f, 0.0)


def _phong_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    n, dr = _phong_terms(sp)
    cos_t = jnp.sum(_reflect_z(wi) * wo, axis=-1)
    glossy = jnp.where(cos_t > 0,
                       jnp.power(jnp.maximum(cos_t, 1e-20), n)
                       * (n + 1.0) / (2.0 * jnp.pi), 0.0)
    p = glossy * (1.0 - dr) + dr * _cosine_pdf(wo)
    return jnp.where(ok, p, 0.0)


def _phong_sample(sp, wi, U, ctx):
    n, dr = _phong_terms(sp)
    take_glossy = U["lobe2"] >= dr
    phi = U["u1"] * 2.0 * jnp.pi
    cos_theta = jnp.power(jnp.maximum(U["u2"], 1e-20), 1.0 / (n + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta,
                       cos_theta], axis=-1)
    # frame around the mirror direction
    from tungsten_tpu.utils.vecmath import ortho_frame, to_global
    mdir = _reflect_z(wi)
    t, b = ortho_frame(mdir)
    wo_g = to_global(t, b, mdir, local)
    wo_d = _cosine_hemisphere(U["u1"], U["u2"])
    wo = jnp.where(take_glossy[..., None], wo_g, wo_d)
    pdf = _phong_pdf(sp, wi, wo, ctx)
    f = _phong_eval(sp, wi, wo, ctx)
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0) & (pdf > 1e-20)
    weight = jnp.where(ok[..., None], f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    return wo, weight, pdf, jnp.where(ok, FLAG_VALID, 0)


# ================================================================= thinsheet

def _thinsheet_transmittance(sp, wi):
    """ref ThinSheetBsdf::eval — the forward-lobe transmittance."""
    ior = sp.params[..., P.IOR]
    R, cos_t = fr.thin_film_reflectance(1.0 / ior, jnp.abs(wi[..., 2]))
    trans = 1.0 - R
    sig = sp.params[..., P.SIGMA_A_R:P.SIGMA_A_B + 1]
    thickness = sp.params[..., P.THICKNESS]
    atten = jnp.exp(-sig * (thickness[..., None] * 2.0 /
                            jnp.maximum(cos_t[..., None], 1e-6)))
    atten = jnp.where(cos_t[..., None] > 0, atten, 1.0)
    return trans[..., None] * atten


def _thinsheet_sample(sp, wi, U, ctx):
    wo = _reflect_z(wi)
    ior = sp.params[..., P.IOR]
    R, cos_t = fr.thin_film_reflectance(1.0 / ior, jnp.abs(wi[..., 2]))
    trans = _thinsheet_transmittance(sp, wi)
    w = R[..., None] / jnp.maximum(1.0 - jnp.mean(trans, -1, keepdims=True), 1e-20)
    pdf = jnp.ones(wi.shape[:-1])
    flags = jnp.full(wi.shape[:-1], FLAG_VALID | FLAG_SPECULAR, jnp.int32)
    return wo, jnp.broadcast_to(w, wi.shape), pdf, flags


# ====================================================== diffuse transmission

def _difftrans_eval(sp, wi, wo, ctx):
    tr = sp.params[..., P.EXTRA0]
    factor = jnp.where(wi[..., 2] * wo[..., 2] < 0.0, tr, 1.0 - tr)
    return sp.albedo * (factor * INV_PI * jnp.abs(wo[..., 2]))[..., None]


def _difftrans_pdf(sp, wi, wo, ctx):
    tr = sp.params[..., P.EXTRA0]
    factor = jnp.where(wi[..., 2] * wo[..., 2] < 0.0, tr, 1.0 - tr)
    return factor * _cosine_pdf(wo)


def _difftrans_sample(sp, wi, U, ctx):
    tr = sp.params[..., P.EXTRA0]
    transmit = U["lobe2"] < tr
    wo = _cosine_hemisphere(U["u1"], U["u2"])
    z = jnp.copysign(wo[..., 2], wi[..., 2])
    z = jnp.where(transmit, -z, z)
    wo = jnp.concatenate([wo[..., :2], z[..., None]], axis=-1)
    # branch probability folded into the pdf so pdf() and sample() agree
    pdf = _cosine_pdf(wo) * jnp.where(transmit, tr, 1.0 - tr)
    weight = jnp.broadcast_to(sp.albedo, wo.shape)
    flags = jnp.full(wi.shape[:-1], FLAG_VALID, jnp.int32) | \
        jnp.where(transmit, FLAG_TRANSMIT, 0)
    return wo, weight, pdf, flags


# =============================================================== smooth coat

def _coat_warp(ior, w):
    """Refract direction w into the coating (top interface)."""
    eta = 1.0 / ior
    F, cos_t = fr.dielectric_reflectance(eta, jnp.abs(w[..., 2]))
    warped = jnp.stack([
        w[..., 0] * eta, w[..., 1] * eta,
        jnp.copysign(cos_t, w[..., 2])], axis=-1)
    return warped, F, cos_t


def _smooth_coat_eval(sp, wi, wo, ctx):
    """ref SmoothCoatBsdf::eval (substrate branch; the specular lobe is
    Dirac and contributes 0 to non-delta eval)."""
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ior = sp.params[..., P.IOR]
    eta = 1.0 / ior
    wi_s, Fi, cos_ti = _coat_warp(ior, wi)
    wo_s, Fo, cos_to = _coat_warp(ior, wo)
    laplacian = eta * eta * wo[..., 2] / jnp.maximum(cos_to, 1e-6)
    child = sp.child()
    sub_f = _dispatch_eval(child, wi_s, wo_s, ctx["child_types"], ctx)
    sig = sp.params[..., P.SIGMA_A_R:P.SIGMA_A_B + 1] * \
        sp.params[..., P.THICKNESS][..., None]
    atten = jnp.exp(sig * (-1.0 / jnp.maximum(cos_to[..., None], 1e-6)
                           - 1.0 / jnp.maximum(cos_ti[..., None], 1e-6)))
    f = (laplacian * (1.0 - Fi) * (1.0 - Fo))[..., None] * sub_f * atten
    return jnp.where(ok[..., None], f, 0.0)


def _smooth_coat_pdf(sp, wi, wo, ctx):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    ior = sp.params[..., P.IOR]
    eta = 1.0 / ior
    wi_s, Fi, cos_ti = _coat_warp(ior, wi)
    wo_s, Fo, cos_to = _coat_warp(ior, wo)
    child = sp.child()
    sub_pdf = _dispatch_pdf(child, wi_s, wo_s, ctx["child_types"], ctx)
    avg_trans = sp.params[..., P.EXTRA1]
    spec_prob = Fi / jnp.maximum(Fi + avg_trans * (1.0 - Fi), 1e-20)
    p = sub_pdf * (1.0 - spec_prob) * eta * eta * \
        jnp.abs(wo[..., 2] / jnp.maximum(cos_to, 1e-6))
    return jnp.where(ok, p, 0.0)


def _smooth_coat_sample(sp, wi, U, ctx):
    """ref SmoothCoatBsdf::sample."""
    ior = sp.params[..., P.IOR]
    eta = 1.0 / ior
    wi_s, Fi, cos_ti = _coat_warp(ior, wi)
    avg_trans = sp.params[..., P.EXTRA1]
    spec_prob = Fi / jnp.maximum(Fi + avg_trans * (1.0 - Fi), 1e-20)
    take_spec = U["lobe"] < spec_prob

    # specular branch
    wo_spec = _reflect_z(wi)
    w_spec = Fi / jnp.maximum(spec_prob, 1e-20)

    # substrate branch: sample child with warped wi
    child = sp.child()
    U_sub = dict(U)
    U_sub["lobe"] = U["lobe2"]
    U_sub["lobe2"] = U["lobe2"]
    wo_sub, w_sub, pdf_sub, fl_sub = _dispatch_sample(
        child, wi_s, U_sub, ctx["child_types"], ctx)
    Fo, cos_to = fr.dielectric_reflectance(ior, wo_sub[..., 2])
    cos_sub = wo_sub[..., 2]
    wo_out = jnp.stack([
        wo_sub[..., 0] * ior, wo_sub[..., 1] * ior, cos_to], axis=-1)
    sig = sp.params[..., P.SIGMA_A_R:P.SIGMA_A_B + 1] * \
        sp.params[..., P.THICKNESS][..., None]
    atten = jnp.exp(sig * (-1.0 / jnp.maximum(cos_sub[..., None], 1e-6)
                           - 1.0 / jnp.maximum(cos_ti[..., None], 1e-6)))
    w_subst = w_sub * ((1.0 - Fi) * (1.0 - Fo))[..., None] * atten / \
        jnp.maximum(1.0 - spec_prob, 1e-20)[..., None]
    pdf_subst = pdf_sub * (1.0 - spec_prob) * eta * eta * \
        cos_to / jnp.maximum(cos_sub, 1e-20)
    ok_sub = ((fl_sub & FLAG_VALID) != 0) & (Fo < 1.0)

    ok = wi[..., 2] > 0
    wo = jnp.where(take_spec[..., None], wo_spec, wo_out)
    weight = jnp.where(take_spec[..., None], w_spec[..., None],
                       jnp.where(ok_sub[..., None], w_subst, 0.0))
    weight = jnp.where(ok[..., None], weight, 0.0)
    pdf = jnp.where(take_spec, spec_prob, pdf_subst)
    valid = ok & jnp.where(take_spec, jnp.ones_like(ok), ok_sub)
    flags = jnp.where(valid, FLAG_VALID, 0) | \
        jnp.where(valid & take_spec, FLAG_SPECULAR, 0)
    return wo, weight, jnp.where(valid, pdf, 0.0), flags


# ===================================================================== mixed

def _mixed_eval(sp, wi, wo, ctx):
    ratio = sp.ratio()
    c0 = sp.child(AUX.CHILD0)
    c1 = sp.child(AUX.CHILD1)
    f0 = _dispatch_eval(c0, wi, wo, ctx["child_types"], ctx)
    f1 = _dispatch_eval(c1, wi, wo, ctx["child_types"], ctx)
    return sp.albedo * (f0 * ratio[..., None] + f1 * (1.0 - ratio[..., None]))


def _mixed_pdf(sp, wi, wo, ctx):
    ratio = sp.ratio()
    c0 = sp.child(AUX.CHILD0)
    c1 = sp.child(AUX.CHILD1)
    p0 = _dispatch_pdf(c0, wi, wo, ctx["child_types"], ctx)
    p1 = _dispatch_pdf(c1, wi, wo, ctx["child_types"], ctx)
    return p0 * ratio + p1 * (1.0 - ratio)


def _mixed_sample(sp, wi, U, ctx):
    """ref MixedBsdf::sample with one-sample MIS over the two children."""
    ratio = sp.ratio()
    take0 = U["lobe"] < ratio
    c0 = sp.child(AUX.CHILD0)
    c1 = sp.child(AUX.CHILD1)
    U_sub = dict(U)
    U_sub["lobe"] = U["lobe2"]
    wo0, w0, p0, f0 = _dispatch_sample(c0, wi, U_sub, ctx["child_types"], ctx)
    wo1, w1, p1, f1 = _dispatch_sample(c1, wi, U_sub, ctx["child_types"], ctx)
    wo = jnp.where(take0[..., None], wo0, wo1)
    # combined f and pdf at the chosen direction
    fA = _dispatch_eval(c0, wi, wo, ctx["child_types"], ctx)
    fB = _dispatch_eval(c1, wi, wo, ctx["child_types"], ctx)
    pA = _dispatch_pdf(c0, wi, wo, ctx["child_types"], ctx)
    pB = _dispatch_pdf(c1, wi, wo, ctx["child_types"], ctx)
    own_w = jnp.where(take0[..., None], w0, w1)
    own_p = jnp.where(take0, p0, p1)
    own_flags = jnp.where(take0, f0, f1)
    spec = (own_flags & FLAG_SPECULAR) != 0
    # for non-specular children: f = fA*r + fB*(1-r); pdf = pA*r + pB*(1-r)
    f = fA * ratio[..., None] + fB * (1.0 - ratio[..., None])
    pdf = pA * ratio + pB * (1.0 - ratio)
    w_mix = jnp.where(pdf[..., None] > 1e-20, f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    # specular child picked: keep its weight/pdf scaled by pick prob
    pick_p = jnp.where(take0, ratio, 1.0 - ratio)
    w_spec = own_w / jnp.maximum(pick_p, 1e-20)[..., None]
    p_spec = own_p * pick_p
    weight = sp.albedo * jnp.where(spec[..., None], w_spec, w_mix)
    pdf = jnp.where(spec, p_spec, pdf)
    valid = (own_flags & FLAG_VALID) != 0
    weight = jnp.where(valid[..., None], weight, 0.0)
    flags = jnp.where(valid, FLAG_VALID, 0) | \
        jnp.where(valid & spec, FLAG_SPECULAR, 0)
    return wo, weight, jnp.where(valid, pdf, 0.0), flags


# ============================================================== transparency

def _transparency_eval(sp, wi, wo, ctx):
    return _dispatch_eval(sp.child(), wi, wo, ctx["child_types"], ctx)


def _transparency_pdf(sp, wi, wo, ctx):
    return _dispatch_pdf(sp.child(), wi, wo, ctx["child_types"], ctx)


def _transparency_sample(sp, wi, U, ctx):
    return _dispatch_sample(sp.child(), wi, U, ctx["child_types"], ctx)


# ------------------------------------------------------------- dispatch core

# type id -> (eval, sample, pdf)
_REGISTRY = {
    bt.LAMBERT: (_lambert_eval, _lambert_sample, _lambert_pdf),
    bt.MIRROR: (_zero_eval, _mirror_sample, _zero_pdf),
    bt.NULL: (_zero_eval, _null_sample, _zero_pdf),
    bt.CONDUCTOR: (_zero_eval, _conductor_sample, _zero_pdf),
    bt.ROUGH_CONDUCTOR: (_rough_conductor_eval, _rough_conductor_sample,
                         _rough_conductor_pdf),
    bt.DIELECTRIC: (_zero_eval, _dielectric_sample, _zero_pdf),
    bt.ROUGH_DIELECTRIC: (_rough_dielectric_eval, _rough_dielectric_sample,
                          _rough_dielectric_pdf),
    bt.PLASTIC: (_plastic_eval, _plastic_sample, _plastic_pdf),
    bt.ROUGH_PLASTIC: (_rough_plastic_eval, _rough_plastic_sample,
                       _rough_plastic_pdf),
    bt.OREN_NAYAR: (_oren_nayar_eval, _oren_nayar_sample, _oren_nayar_pdf),
    bt.PHONG: (_phong_eval, _phong_sample, _phong_pdf),
    bt.THINSHEET: (_zero_eval, _thinsheet_sample, _zero_pdf),
    bt.DIFFUSE_TRANSMISSION: (_difftrans_eval, _difftrans_sample,
                              _difftrans_pdf),
    bt.SMOOTH_COAT: (_smooth_coat_eval, _smooth_coat_sample, _smooth_coat_pdf),
    bt.ROUGH_COAT: (_smooth_coat_eval, _smooth_coat_sample, _smooth_coat_pdf),
    bt.MIXED: (_mixed_eval, _mixed_sample, _mixed_pdf),
    bt.TRANSPARENCY: (_transparency_eval, _transparency_sample,
                      _transparency_pdf),
    bt.FORWARD: (_zero_eval, _null_sample, _zero_pdf),
}

# fiber BCSDFs (hair/rough_wire/lambertian_fiber) live in bsdf/fiber.py
from tungsten_tpu.bsdf import fiber as _fiber  # noqa: E402

_REGISTRY[bt.HAIR] = (_fiber.hair_eval, _fiber.hair_sample, _fiber.hair_pdf)
_REGISTRY[bt.ROUGH_WIRE] = (_fiber.rough_wire_eval, _fiber.rough_wire_sample,
                            _fiber.rough_wire_pdf)
_REGISTRY[bt.LAMBERTIAN_FIBER] = (
    _fiber.lambertian_fiber_eval, _fiber.lambertian_fiber_sample,
    _fiber.lambertian_fiber_pdf)

# BSDFs whose continuation sample is a Dirac lobe only — NEE's
# AllButSpecular sample must fail on them entirely.
PURE_SPECULAR = frozenset(
    {bt.MIRROR, bt.NULL, bt.CONDUCTOR, bt.DIELECTRIC, bt.THINSHEET,
     bt.FORWARD})


def supported_types():
    return frozenset(_REGISTRY)


def _child_types(present_types):
    return tuple(t for t in present_types if t not in NESTED_TYPES)


def _make_ctx(present_types, adjoint=False):
    return {"child_types": _child_types(present_types),
            "adjoint": adjoint}


def _dispatch_eval(sp, wi, wo, types, ctx):
    out = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    for t in types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        val = fns[0](sp, wi, wo, ctx)
        out = jnp.where((sp.type == t)[..., None], val, out)
    return out


def _dispatch_pdf(sp, wi, wo, types, ctx):
    out = jnp.zeros(wi.shape[:-1], wi.dtype)
    for t in types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        val = fns[2](sp, wi, wo, ctx)
        out = jnp.where(sp.type == t, val, out)
    return out


def _dispatch_sample(sp, wi, U, types, ctx):
    wo = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    weight = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    pdf = jnp.zeros(wi.shape[:-1], wi.dtype)
    flags = jnp.zeros(wi.shape[:-1], jnp.int32)
    for t in types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        w, wt, p, fl = fns[1](sp, wi, U, ctx)
        m = sp.type == t
        wo = jnp.where(m[..., None], w, wo)
        weight = jnp.where(m[..., None], wt, weight)
        pdf = jnp.where(m, p, pdf)
        flags = jnp.where(m, fl, flags)
    return wo, weight, pdf, flags


# ----------------------------------------------------------------- public

def bsdf_eval(sp: ShadePoint, wi, wo, present_types, include_specular=False,
              adjoint=False):
    """f * cos(theta_o); Dirac lobes contribute 0 (the reference's NEE
    convention).  Non-adjoint (camera) transport scales transmissive
    lobes by eta^2 = (etaI/etaO)^2 — the radiance compression across a
    refractive boundary (ref Bsdf::eval(event, adjoint),
    Bsdf.hpp:84-96); adjoint (light/importance) transport omits it."""
    return _dispatch_eval(sp, wi, wo, present_types,
                          _make_ctx(present_types, adjoint))


def bsdf_pdf(sp: ShadePoint, wi, wo, present_types):
    return _dispatch_pdf(sp, wi, wo, present_types, _make_ctx(present_types))


def bsdf_sample(sp: ShadePoint, wi, u_lobe, u1, u2, present_types,
                u_lobe2=None, no_specular=False, adjoint=False):
    """Sample a direction for every ray; returns (wo, weight, pdf, flags)."""
    U = {"lobe": u_lobe, "u1": u1, "u2": u2,
         "lobe2": u_lobe2 if u_lobe2 is not None else u_lobe}
    wo, weight, pdf, flags = _dispatch_sample(
        sp, wi, U, present_types, _make_ctx(present_types, adjoint))
    if no_specular:
        # AllButSpecular request: pure-Dirac BSDFs fail; mixed-lobe BSDFs
        # keep their non-specular branch only when it was the one sampled.
        spec = (flags & FLAG_SPECULAR) != 0
        flags = jnp.where(spec, 0, flags)
        weight = jnp.where(spec[..., None], 0.0, weight)
    return wo, weight, pdf, flags


def bsdf_forward(sp: ShadePoint, wi, present_types):
    """Forward-lobe transparency f(wi -> -wi) — what the reference's
    handleSurface evaluates via makeForwardEvent: nonzero for `forward`
    (1), `transparency` (1 - opacity), and `thinsheet` (its
    transmittance)."""
    out = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    if bt.FORWARD in present_types:
        out = jnp.where((sp.type == bt.FORWARD)[..., None],
                        jnp.ones_like(out), out)
    if bt.TRANSPARENCY in present_types:
        out = jnp.where((sp.type == bt.TRANSPARENCY)[..., None],
                        (1.0 - sp.ratio())[..., None], out)
    if bt.THINSHEET in present_types:
        out = jnp.where((sp.type == bt.THINSHEET)[..., None],
                        _thinsheet_transmittance(sp, wi), out)
    return out
