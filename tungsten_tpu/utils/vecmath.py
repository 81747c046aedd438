"""SoA 3-vector math over jnp arrays of shape (..., 3).

Replaces the reference's Vec<T,N>/Mat4f/TangentFrame foundation
(ref: src/core/math/{Vec.hpp,Mat4f.cpp,TangentFrame.hpp}) with batched
jnp ops.  All functions broadcast over leading dims so the same code
serves a single ray or a wavefront of millions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PI = float(np.pi)
TWO_PI = 2.0 * PI
FOUR_PI = 4.0 * PI
INV_PI = 1.0 / PI
INV_TWO_PI = 1.0 / TWO_PI
INV_FOUR_PI = 1.0 / FOUR_PI


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    """Dot product keeping the trailing axis (for broadcasting against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(a):
    return jnp.sum(a * a, axis=-1)


def length(a):
    return jnp.sqrt(length_sq(a))


def normalize(a, eps: float = 0.0):
    n = length(a)
    if eps:
        n = jnp.maximum(n, eps)
    return a / n[..., None]


def safe_normalize(a):
    return normalize(a, eps=1e-20)


def reflect(w, n):
    """Mirror w about normal n (both pointing away from surface convention
    is up to the caller; matches -w + 2*dot(w,n)*n for incoming w)."""
    return 2.0 * dot3(w, n) * n - w


def lerp(a, b, t):
    return a + (b - a) * t


def luminance(rgb):
    """Rec. 709 luminance, same weights as ref Vec3f::luminance."""
    return (
        rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722
    )


def ortho_frame(n):
    """Branchless orthonormal basis from unit normal n: returns (tangent,
    bitangent).  Duff et al. 2017, matching ref TangentFrame
    (src/core/math/TangentFrame.hpp:22-31) so local shading frames agree.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    tangent = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bitangent = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return tangent, bitangent


def to_local(t, b, n, w):
    """World direction -> tangent frame (t,b,n) local coords (z = normal)."""
    return jnp.stack([dot(t, w), dot(b, w), dot(n, w)], axis=-1)


def to_global(t, b, n, w):
    """Tangent-frame local coords -> world direction."""
    return (
        t * w[..., 0:1] + b * w[..., 1:2] + n * w[..., 2:3]
    )


def transform_point(mat, p):
    """Apply (..., 4, 4) or (4,4) affine matrix to points (..., 3)."""
    return (
        jnp.einsum("...ij,...j->...i", mat[..., :3, :3], p) + mat[..., :3, 3]
    )


def transform_vector(mat, v):
    """Apply rotation/scale part of affine matrix to vectors (..., 3)."""
    return jnp.einsum("...ij,...j->...i", mat[..., :3, :3], v)


def max_component(a):
    return jnp.max(a, axis=-1)


def avg_component(a):
    return jnp.mean(a, axis=-1)


def where3(mask, a, b):
    """Select whole 3-vectors with a (...,)-shaped bool mask."""
    return jnp.where(mask[..., None], a, b)
