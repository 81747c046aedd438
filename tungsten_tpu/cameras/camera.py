"""Camera ray generation, reconstruction filters, tonemapping.

Pinhole parity (ref: src/core/cameras/PinholeCamera.cpp:70-88): local ray
direction through pixel (x, y) with filter-importance-sampled subpixel
offset, using pixelSize.x for both axes; weight is 1 because the filter
is sampled proportionally (ref ReconstructionFilter: tabulated; here:
analytic inverse CDFs, same distributions).

Tonemap formulas match ref src/core/cameras/Tonemap.hpp:25-45.
"""
from __future__ import annotations

import jax.numpy as jnp

from tungsten_tpu.utils import rng


def filter_sample(filter_name: str, u):
    """Inverse-CDF sample of the reconstruction filter, in pixels.
    u in [0,1) -> offset in [-width, width]."""
    if filter_name == "dirac":
        return jnp.zeros_like(u)
    if filter_name == "box":
        return u - 0.5
    # tent (default for everything else for now; gaussian etc. TODO)
    lo = jnp.sqrt(jnp.maximum(2.0 * u, 0.0)) - 1.0
    hi = 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0))
    return jnp.where(u < 0.5, lo, hi)


def generate_rays(scene, settings, pixel, sample_idx, seed):
    """pixel (R,) linear index, sample_idx (R,) -> (o (R,3), d (R,3)).

    The subpixel offset is addressed by (pixel, sample) through the
    counter RNG so any sharding generates identical rays.
    """
    w = settings.width
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)
    u1, u2 = rng.random_2d(seed, pixel, sample_idx, rng.DIM_CAMERA)
    fx = filter_sample(settings.filter, u1)
    fy = filter_sample(settings.filter, u2)

    inv_w = 1.0 / w
    # aspect ratio follows the *render* resolution (ref Camera::precompute
    # recomputes _ratio from _res), not the scene file's stored resolution
    ratio = settings.height / settings.width
    lx = -1.0 + (px + 0.5 + fx) * (2.0 * inv_w)
    ly = ratio - (py + 0.5 + fy) * (2.0 * inv_w)
    lz = jnp.broadcast_to(scene.cam_plane_dist, lx.shape)

    if settings.camera_type == "thinlens":
        # ref ThinlensCamera::sampleDirection: aperture-disk lens position,
        # direction through the focus plane
        u3, u4 = rng.random_2d(seed, pixel, sample_idx, rng.DIM_CAMERA + 2)
        r = jnp.sqrt(u3) * settings.aperture_size
        phi = u4 * (2.0 * jnp.pi)
        lens = jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r,
                          jnp.zeros_like(r)], axis=-1)
        plane = jnp.stack([lx, ly, lz], axis=-1)
        plane = plane * (settings.focus_distance / plane[..., 2:3])
        local = plane - lens
        local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
        d = local @ scene.cam_mat[:3, :3].T
        o = lens @ scene.cam_mat[:3, :3].T + scene.cam_mat[:3, 3]
        return o, d

    local = jnp.stack([lx, ly, lz], axis=-1)
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)

    d = local @ scene.cam_mat[:3, :3].T
    o = jnp.broadcast_to(scene.cam_mat[:3, 3], d.shape)
    return o, d


def tonemap(name: str, c):
    if name == "linear":
        return c
    if name == "gamma":
        return jnp.maximum(c, 0.0) ** (1.0 / 2.2)
    if name == "reinhard":
        return jnp.maximum(c / (c + 1.0), 0.0) ** (1.0 / 2.2)
    if name == "filmic":
        x = jnp.maximum(0.0, c - 0.004)
        return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)
    if name == "pbrt":
        c = jnp.maximum(c, 0.0)
        return jnp.where(
            c < 0.0031308, 12.92 * c,
            1.055 * jnp.maximum(c, 1e-20) ** (1.0 / 2.4) - 0.055)
    raise ValueError(f"unknown tonemap {name}")
