"""Batched BSDF eval / sample / pdf over the flattened material table.

Convention (matches ref src/core/bsdfs/Bsdf.hpp + SurfaceScatterEvent):
  * directions in the local tangent frame, +z = shading normal;
  * `wi` points *away* from the surface toward the previous path vertex;
  * `wo` is the scattered direction;
  * eval() returns f * |cos(theta_o)| (the reference folds the cosine in);
  * sample() returns (wo, weight=f*cos/pdf, pdf, flags).

Dispatch is branchless masked-select over the BSDF types actually present
in the scene (a static tuple) — each present type is evaluated for the
whole wavefront and blended by mask, which is the TPU-friendly analog of
the reference's virtual dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp

from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.bsdf.types import P, AUX
from tungsten_tpu.utils.vecmath import INV_PI
from tungsten_tpu.scene.textures import eval_texture

# sample() flag bits
FLAG_SPECULAR = 1
FLAG_VALID = 2
FLAG_TRANSMIT = 4


def _cosine_hemisphere(u1, u2):
    phi = u1 * (2.0 * jnp.pi)
    r = jnp.sqrt(u2)
    z = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1)


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


# --------------------------------------------------------------- lambert

def _lambert_eval(sp, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok[..., None], sp.albedo * (INV_PI * wo[..., 2:3]), 0.0)


def _lambert_pdf(sp, wi, wo):
    ok = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    return jnp.where(ok, wo[..., 2] * INV_PI, 0.0)


def _lambert_sample(sp, wi, u_lobe, u1, u2):
    wo = _cosine_hemisphere(u1, u2)
    pdf = wo[..., 2] * INV_PI
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], sp.albedo, 0.0)
    flags = jnp.where(ok, FLAG_VALID, 0)
    return wo, weight, pdf, flags


# ---------------------------------------------------------------- mirror

def _mirror_eval(sp, wi, wo):
    return jnp.zeros_like(sp.albedo)


def _mirror_pdf(sp, wi, wo):
    return jnp.zeros(wi.shape[:-1], wi.dtype)


def _mirror_sample(sp, wi, u_lobe, u1, u2):
    wo = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    ok = wi[..., 2] > 0
    weight = jnp.where(ok[..., None], sp.albedo, 0.0)
    pdf = jnp.where(ok, 1.0, 0.0)
    flags = jnp.where(ok, FLAG_VALID | FLAG_SPECULAR, 0)
    return wo, weight, pdf, flags


# ------------------------------------------------------------------ null

def _null_eval(sp, wi, wo):
    return jnp.zeros_like(sp.albedo)


def _null_pdf(sp, wi, wo):
    return jnp.zeros(wi.shape[:-1], wi.dtype)


def _null_sample(sp, wi, u_lobe, u1, u2):
    wo = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)
    return wo, jnp.zeros_like(sp.albedo), jnp.zeros(wi.shape[:-1]), \
        jnp.zeros(wi.shape[:-1], jnp.int32)


# ------------------------------------------------------------- dispatch

# type id -> (eval, sample, pdf); extended as the zoo grows.
_REGISTRY = {
    bt.LAMBERT: (_lambert_eval, _lambert_sample, _lambert_pdf),
    bt.MIRROR: (_mirror_eval, _mirror_sample, _mirror_pdf),
    bt.NULL: (_null_eval, _null_sample, _null_pdf),
}


def register(type_id, eval_fn, sample_fn, pdf_fn):
    _REGISTRY[type_id] = (eval_fn, sample_fn, pdf_fn)


def supported_types():
    return frozenset(_REGISTRY)


def bsdf_eval(sp: ShadePoint, wi, wo, present_types, include_specular=False):
    """f * cos(theta_o) for the whole batch.  Specular lobes contribute 0
    to eval (matching the reference's Dirac convention)."""
    out = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    for t in present_types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        val = fns[0](sp, wi, wo)
        out = jnp.where((sp.type == t)[..., None], val, out)
    return out


def bsdf_pdf(sp: ShadePoint, wi, wo, present_types):
    out = jnp.zeros(wi.shape[:-1], wi.dtype)
    for t in present_types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        val = fns[2](sp, wi, wo)
        out = jnp.where(sp.type == t, val, out)
    return out


def bsdf_sample(sp: ShadePoint, wi, u_lobe, u1, u2, present_types,
                no_specular=False):
    """Sample a direction for every ray; returns (wo, weight, pdf, flags)."""
    wo = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    weight = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    pdf = jnp.zeros(wi.shape[:-1], wi.dtype)
    flags = jnp.zeros(wi.shape[:-1], jnp.int32)
    for t in present_types:
        fns = _REGISTRY.get(t)
        if fns is None:
            continue
        w, wt, p, fl = fns[1](sp, wi, u_lobe, u1, u2)
        m = sp.type == t
        wo = jnp.where(m[..., None], w, wo)
        weight = jnp.where(m[..., None], wt, weight)
        pdf = jnp.where(m, p, pdf)
        flags = jnp.where(m, fl, flags)
    if no_specular:
        spec = (flags & FLAG_SPECULAR) != 0
        flags = jnp.where(spec, 0, flags)
        weight = jnp.where(spec[..., None], 0.0, weight)
    return wo, weight, pdf, flags
