"""Phase functions: isotropic / Henyey-Greenstein / Rayleigh, batched.

Convention parity with ref src/core/phasefunctions/: `wi` is the ray's
direction of travel (NOT flipped), eval(wi, wo) over cos(theta) =
wi . wo; sample builds a frame around wi.
"""
from __future__ import annotations

import jax.numpy as jnp

from tungsten_tpu.utils.vecmath import (
    INV_FOUR_PI, ortho_frame, to_global)

P_ISOTROPIC = 0
P_HENYEY_GREENSTEIN = 1
P_RAYLEIGH = 2

NAMES = {"isotropic": P_ISOTROPIC, "henyey_greenstein": P_HENYEY_GREENSTEIN,
         "rayleigh": P_RAYLEIGH}


def _hg(cos_t, g):
    term = 1.0 + g * g - 2.0 * g * cos_t
    return INV_FOUR_PI * (1.0 - g * g) / (term * jnp.sqrt(jnp.maximum(term, 1e-12)))


def _rayleigh(cos_t):
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)


def phase_eval(ptype, g, wi, wo):
    """Scalar phase value (also the pdf — phases integrate to 1)."""
    cos_t = jnp.sum(wi * wo, axis=-1)
    out = jnp.full(cos_t.shape, INV_FOUR_PI)
    out = jnp.where(ptype == P_HENYEY_GREENSTEIN,
                    jnp.where(jnp.abs(g) < 1e-4, INV_FOUR_PI, _hg(cos_t, g)),
                    out)
    out = jnp.where(ptype == P_RAYLEIGH, _rayleigh(cos_t), out)
    return out


def phase_pdf(ptype, g, wi, wo):
    return phase_eval(ptype, g, wi, wo)


def phase_sample(ptype, g, wi, u1, u2):
    """Sample wo around wi; returns (wo, pdf).  Weight is always 1."""
    phi = u1 * 2.0 * jnp.pi

    # isotropic: uniform sphere
    z_iso = u2 * 2.0 - 1.0
    # HG inverse CDF (guard g ~ 0)
    g_safe = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sq = (1.0 - g_safe * g_safe) / (1.0 + g_safe * (u2 * 2.0 - 1.0))
    z_hg = (1.0 + g_safe * g_safe - sq * sq) / (2.0 * g_safe)
    use_iso_hg = jnp.abs(g) < 1e-4
    # rayleigh inverse CDF (cardano)
    zr = u2 * 4.0 - 2.0
    inv_z = jnp.sqrt(zr * zr + 1.0)
    u = jnp.cbrt(zr + inv_z)
    z_ray = u - 1.0 / u

    cos_t = jnp.where(ptype == P_RAYLEIGH, z_ray,
                      jnp.where(ptype == P_HENYEY_GREENSTEIN,
                                jnp.where(use_iso_hg, z_iso, z_hg), z_iso))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    local = jnp.stack([jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t],
                      axis=-1)
    t, b = ortho_frame(wi)
    wo = to_global(t, b, wi, local)
    return wo, phase_eval(ptype, g, wi, wo)
