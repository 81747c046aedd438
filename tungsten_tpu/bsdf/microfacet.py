"""Microfacet distributions (Beckmann / Phong / GGX), batched with a
per-ray distribution id.

Formula parity with ref src/core/bsdfs/Microfacet.hpp: D, the rational
Smith G1 approximations, pdf = D * m.z, and the exact inverse-CDF
sampling per distribution.  roughnessToAlpha clamps at 1e-3 and converts
Phong roughness to an exponent.
"""
from __future__ import annotations

import jax.numpy as jnp

from tungsten_tpu.bsdf.types import DIST_BECKMANN, DIST_PHONG, DIST_GGX

MIN_ALPHA = 1e-3


def roughness_to_alpha(dist, roughness):
    r = jnp.maximum(roughness, MIN_ALPHA)
    phong = 2.0 / (r * r) - 2.0
    return jnp.where(dist == DIST_PHONG, phong, r)


def D(dist, alpha, m):
    mz = m[..., 2]
    cos_sq = mz * mz
    tan_sq = jnp.maximum(1.0 - cos_sq, 0.0) / jnp.maximum(cos_sq, 1e-20)
    cos_qu = cos_sq * cos_sq
    a_sq = alpha * alpha

    beck = jnp.exp(-tan_sq / jnp.maximum(a_sq, 1e-20)) / \
        jnp.maximum(jnp.pi * a_sq * cos_qu, 1e-20)
    phong = (alpha + 2.0) / (2.0 * jnp.pi) * \
        jnp.power(jnp.maximum(mz, 1e-20), alpha)
    ggx = a_sq / jnp.maximum(jnp.pi * cos_qu * (a_sq + tan_sq) ** 2, 1e-20)

    d = jnp.where(dist == DIST_BECKMANN, beck,
                  jnp.where(dist == DIST_PHONG, phong, ggx))
    return jnp.where(mz > 0.0, d, 0.0)


def G1(dist, alpha, v, m):
    vz = v[..., 2]
    ok = jnp.sum(v * m, axis=-1) * vz > 0.0
    cos_sq = vz * vz
    tan_theta = jnp.abs(jnp.sqrt(jnp.maximum(1.0 - cos_sq, 0.0)) /
                        jnp.where(jnp.abs(vz) > 1e-20, vz, 1e-20))
    tan_theta = jnp.maximum(tan_theta, 1e-20)

    a_beck = 1.0 / jnp.maximum(alpha * tan_theta, 1e-20)
    a_phong = jnp.sqrt(0.5 * alpha + 1.0) / tan_theta
    a = jnp.where(dist == DIST_PHONG, a_phong, a_beck)
    rational = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    smith = jnp.where(a < 1.6, rational, 1.0)

    a_sq = alpha * alpha
    tan_sq = jnp.maximum(1.0 - cos_sq, 0.0) / jnp.maximum(cos_sq, 1e-20)
    ggx = 2.0 / (1.0 + jnp.sqrt(1.0 + a_sq * tan_sq))

    g = jnp.where(dist == DIST_GGX, ggx, smith)
    return jnp.where(ok, g, 0.0)


def G(dist, alpha, wi, wo, m):
    return G1(dist, alpha, wi, m) * G1(dist, alpha, wo, m)


def pdf(dist, alpha, m):
    return D(dist, alpha, m) * m[..., 2]


def sample(dist, alpha, u1, u2):
    """Sample a microfacet normal m; (u1, u2) uniform."""
    phi = u2 * (2.0 * jnp.pi)
    u1 = jnp.minimum(u1, 1.0 - 1e-7)

    tan_sq_beck = -alpha * alpha * jnp.log(1.0 - u1)
    cos_beck = 1.0 / jnp.sqrt(1.0 + tan_sq_beck)
    cos_phong = jnp.power(jnp.maximum(u1, 1e-20), 1.0 / (alpha + 2.0))
    tan_sq_ggx = alpha * alpha * u1 / jnp.maximum(1.0 - u1, 1e-20)
    cos_ggx = 1.0 / jnp.sqrt(1.0 + tan_sq_ggx)

    cos_theta = jnp.where(dist == DIST_BECKMANN, cos_beck,
                          jnp.where(dist == DIST_PHONG, cos_phong, cos_ggx))
    r = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r, cos_theta], axis=-1)
