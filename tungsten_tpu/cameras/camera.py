"""Camera ray generation, reconstruction filters, tonemapping.

Pinhole parity (ref: src/core/cameras/PinholeCamera.cpp:70-88): local ray
direction through pixel (x, y) with filter-importance-sampled subpixel
offset, using pixelSize.x for both axes; weight is 1 because the filter
is sampled proportionally (ref ReconstructionFilter::sample — the color
buffer stays a simple unweighted average).  Gaussian / Mitchell /
Catmull-Rom / Lanczos use a host-tabulated inverse CDF of the filter
profile (negative lobes clamped to 0 in the *sampling* table, which the
reference's raw-value CDF approximates as well); dirac/box/tent are
analytic.  Formulas ref ReconstructionFilter.hpp:45-207.

Tonemap formulas match ref src/core/cameras/Tonemap.hpp:25-45.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.utils import rng

FILTER_WIDTHS = {"dirac": 0.0, "box": 0.5, "tent": 1.0, "gaussian": 2.0,
                 "mitchell_netravali": 2.0, "catmull_rom": 2.0,
                 "lanczos": 2.0}


def filter_eval(name: str, x):
    """Filter profile f(x), numpy (ref ReconstructionFilter::eval)."""
    x = np.abs(np.asarray(x, np.float64))
    if name == "box":
        return np.where(x <= 0.5, 1.0, 0.0)
    if name == "tent":
        return np.maximum(1.0 - x, 0.0)
    if name == "gaussian":
        return np.maximum(np.exp(-2.0 * x * x) - np.exp(-8.0), 0.0)
    if name == "mitchell_netravali":
        B = C = 1.0 / 3.0
        f1 = ((12 - 9 * B - 6 * C) * x ** 3 + (-18 + 12 * B + 6 * C) * x ** 2
              + (6 - 2 * B)) / 6.0
        f2 = ((-B - 6 * C) * x ** 3 + (6 * B + 30 * C) * x ** 2
              + (-12 * B - 48 * C) * x + (8 * B + 24 * C)) / 6.0
        return np.where(x < 1.0, f1, np.where(x < 2.0, f2, 0.0))
    if name == "catmull_rom":
        f1 = (9 * x ** 3 - 15 * x ** 2 + 6) / 6.0
        f2 = (-3 * x ** 3 + 15 * x ** 2 - 24 * x + 12) / 6.0
        return np.where(x < 1.0, f1, np.where(x < 2.0, f2, 0.0))
    if name == "lanczos":
        with np.errstate(invalid="ignore", divide="ignore"):
            f = np.sin(np.pi * x) * np.sin(np.pi * x / 2.0) / \
                (np.pi * np.pi * x * x / 2.0)
        f = np.where(x == 0.0, 1.0, f)
        return np.where(x < 2.0, f, 0.0)
    return np.zeros_like(x)


@functools.lru_cache(maxsize=16)
def _filter_invcdf(name: str, res: int = 256) -> tuple:
    """Tabulated inverse CDF of max(f, 0) over [0, width]."""
    width = FILTER_WIDTHS[name]
    xs = (np.arange(res) + 0.5) * (width / res)
    f = np.maximum(filter_eval(name, xs), 0.0)
    cdf = np.concatenate([[0.0], np.cumsum(f)])
    cdf /= cdf[-1]
    n_inv = 256
    u = np.linspace(0.0, 1.0, n_inv)
    inv = np.interp(u, cdf, np.arange(res + 1) * (width / res))
    return tuple(inv.astype(np.float32))


def filter_sample(filter_name: str, u):
    """Inverse-CDF sample of the reconstruction filter, in pixels.
    u in [0,1) -> signed offset in [-width, width] (the sign comes from
    folding u, ref ReconstructionFilter::sample)."""
    if filter_name == "dirac":
        return jnp.zeros_like(u)
    if filter_name == "box":
        return u - 0.5
    if filter_name == "tent":
        lo = jnp.sqrt(jnp.maximum(2.0 * u, 0.0)) - 1.0
        hi = 1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * u, 0.0))
        return jnp.where(u < 0.5, lo, hi)
    inv = jnp.asarray(np.asarray(_filter_invcdf(filter_name)))
    negative = u < 0.5
    xi = jnp.where(negative, u * 2.0, (u - 0.5) * 2.0)
    pos = xi * (inv.shape[0] - 1)
    i0 = jnp.clip(pos.astype(jnp.int32), 0, inv.shape[0] - 2)
    frac = pos - i0
    mag = inv[i0] * (1.0 - frac) + inv[i0 + 1] * frac
    return jnp.where(negative, -mag, mag)


# cubemap face layouts (ref src/core/cameras/CubemapCamera.cpp:14-53):
# modes horizontal_cross / vertical_cross / row / column; face order
# +x -x +y -y +z -z; basis vectors index that same order.
_CUBE_BASIS = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                        [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
_CUBE_MODES = {"horizontal_cross": 0, "vertical_cross": 1,
               "row": 2, "column": 3}
_CUBE_RES_U = [4, 3, 6, 1]
_CUBE_RES_V = [3, 4, 1, 6]
_CUBE_OFF_U = [[2, 0, 1, 1, 1, 3], [1, 1, 1, 1, 0, 2],
               [0, 1, 2, 3, 4, 5], [0, 0, 0, 0, 0, 0]]
_CUBE_OFF_V = [[1, 1, 0, 2, 1, 1], [1, 3, 0, 2, 1, 1],
               [0, 0, 0, 0, 0, 0], [0, 1, 2, 3, 4, 5]]
_CUBE_BU = [[5, 4, 0, 0, 0, 1], [5, 5, 5, 5, 0, 1],
            [5, 4, 0, 0, 0, 1], [5, 4, 0, 0, 0, 1]]
_CUBE_BV = [[3, 3, 4, 5, 3, 3], [3, 2, 0, 1, 3, 3],
            [3, 3, 4, 5, 3, 3], [3, 3, 4, 5, 3, 3]]


def sample_aperture(scene, settings, u3, u4, u5):
    """Thinlens lens-plane position (R,3) in camera-local space,
    importance-sampled from the aperture shape (ref ThinlensCamera::
    samplePosition).  Default = uniform disk (DiskTexture); with a
    bitmap aperture, alias-table texel pick (u5) + in-texel jitter —
    sampling is proportional to the texture so the sample weight is 1."""
    if settings.aperture_tex:
        nt = scene.cam_ap_prob.shape[0]
        x = u5 * nt
        idx = jnp.minimum(x.astype(jnp.int32), nt - 1)
        f = x - idx
        keep = f < scene.cam_ap_prob[idx]
        texel = jnp.where(keep, idx, scene.cam_ap_alias[idx])
        w_ap = scene.cam_ap_hw[1]
        row = texel // w_ap
        col = texel - row * w_ap
        ax = ((col + u3) / w_ap) * 2.0 - 1.0
        ay = 1.0 - ((row + u4) / scene.cam_ap_hw[0]) * 2.0
        return jnp.stack([ax, ay, jnp.zeros_like(ax)],
                         axis=-1) * settings.aperture_size
    r = jnp.sqrt(u3) * settings.aperture_size
    phi = u4 * (2.0 * jnp.pi)
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r,
                      jnp.zeros_like(r)], axis=-1)


def generate_rays(scene, settings, pixel, sample_idx, seed):
    """pixel (R,) linear index, sample_idx (R,) -> (o (R,3), d (R,3))."""
    o, d, _ = generate_rays_w(scene, settings, pixel, sample_idx, seed)
    return o, d


def generate_rays_w(scene, settings, pixel, sample_idx, seed):
    """pixel (R,) linear index, sample_idx (R,) -> (o, d, weight (R,)).

    The subpixel offset is addressed by (pixel, sample) through the
    counter RNG so any sharding generates identical rays.  `weight` is
    1 except for thinlens cat-eye-vignetted samples (weight 0 — the
    reference's sampleDirection returns false and the sample counts
    black, ThinlensCamera.cpp:118-123); aperture-texture lens samples
    are importance-sampled so their weight stays 1.
    """
    w = settings.width
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)
    u1, u2 = rng.random_2d(seed, pixel, sample_idx, rng.DIM_CAMERA)
    fx = filter_sample(settings.filter, u1)
    fy = filter_sample(settings.filter, u2)

    if settings.camera_type == "equirectangular":
        # ref EquirectangularCamera::uvToDirection (uv.y from the bottom)
        u = (px + 0.5 + fx) / settings.width
        v = 1.0 - (py + 0.5 + fy) / settings.height
        phi = (u - 0.5) * (2.0 * jnp.pi)
        theta = (1.0 - v) * jnp.pi
        sin_t = jnp.sin(theta)
        local = jnp.stack([jnp.cos(phi) * sin_t, -jnp.cos(theta),
                           jnp.sin(phi) * sin_t], axis=-1)
        d = local @ scene.cam_mat[:3, :3].T
        o = jnp.broadcast_to(scene.cam_mat[:3, 3], d.shape)
        return o, d, jnp.ones(d.shape[:1])

    if settings.camera_type == "cubemap":
        mode = _CUBE_MODES.get(getattr(settings, "cubemap_mode",
                                       "horizontal_cross"), 0)
        fs_u = 1.0 / _CUBE_RES_U[mode]
        fs_v = 1.0 / _CUBE_RES_V[mode]
        u = (px + 0.5 + fx) / settings.width
        v = (py + 0.5 + fy) / settings.height
        off_u = jnp.asarray(_CUBE_OFF_U[mode], jnp.float32) * fs_u
        off_v = jnp.asarray(_CUBE_OFF_V[mode], jnp.float32) * fs_v
        bu = jnp.asarray(_CUBE_BASIS[_CUBE_BU[mode]])
        bv = jnp.asarray(_CUBE_BASIS[_CUBE_BV[mode]])
        base = jnp.asarray(_CUBE_BASIS)
        du = u[:, None] - off_u[None, :]      # (R, 6)
        dv = v[:, None] - off_v[None, :]
        inside = (du >= 0) & (du <= fs_u) & (dv >= 0) & (dv <= fs_v)
        face = jnp.argmax(inside, axis=-1)
        ok = jnp.any(inside, axis=-1)
        ou = jnp.take_along_axis(du, face[:, None], 1)[:, 0] / fs_u
        ov = jnp.take_along_axis(dv, face[:, None], 1)[:, 0] / fs_v
        local = (base[face] + bu[face] * (ou * 2 - 1)[:, None]
                 + bv[face] * (ov * 2 - 1)[:, None])
        local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
        d = local @ scene.cam_mat[:3, :3].T
        o = jnp.broadcast_to(scene.cam_mat[:3, 3], d.shape)
        # dead zones of the cross layouts get a degenerate ray that
        # cannot hit anything (t_max handling zeroes it out downstream)
        d = jnp.where(ok[:, None], d, jnp.asarray([0.0, 1.0, 0.0]))
        return o, d, jnp.ones(d.shape[:1])

    inv_w = 1.0 / w
    # aspect ratio follows the *render* resolution (ref Camera::precompute
    # recomputes _ratio from _res), not the scene file's stored resolution
    ratio = settings.height / settings.width
    lx = -1.0 + (px + 0.5 + fx) * (2.0 * inv_w)
    ly = ratio - (py + 0.5 + fy) * (2.0 * inv_w)
    lz = jnp.broadcast_to(scene.cam_plane_dist, lx.shape)

    if settings.camera_type == "thinlens":
        # ref ThinlensCamera::sampleDirection: aperture lens position,
        # direction through the focus plane
        u3, u4 = rng.random_2d(seed, pixel, sample_idx, rng.DIM_CAMERA + 2)
        u5 = rng.random_1d(seed ^ jnp.uint32(0xA9E27),
                           pixel, sample_idx, rng.DIM_CAMERA + 2)
        lens = sample_aperture(scene, settings, u3, u4, u5)
        plane = jnp.stack([lx, ly, lz], axis=-1)
        plane = plane * (settings.focus_distance / plane[..., 2:3])
        local = plane - lens
        local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
        w = jnp.ones(local.shape[:1])
        if settings.cat_eye > 0.0:
            # cat-eye bokeh vignetting (ref ThinlensCamera.cpp:118-123):
            # project the lens point onto the virtual diaphragm plane
            # along the ray; outside the aperture radius -> black
            dia = lens[..., :2] - settings.cat_eye * scene.cam_plane_dist                 * local[..., :2] / jnp.maximum(local[..., 2:3], 1e-9)
            inside = jnp.sum(dia * dia, axis=-1) <=                 settings.aperture_size ** 2
            w = jnp.where(inside, w, 0.0)
        d = local @ scene.cam_mat[:3, :3].T
        o = lens @ scene.cam_mat[:3, :3].T + scene.cam_mat[:3, 3]
        return o, d, w

    local = jnp.stack([lx, ly, lz], axis=-1)
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)

    d = local @ scene.cam_mat[:3, :3].T
    o = jnp.broadcast_to(scene.cam_mat[:3, 3], d.shape)
    return o, d, jnp.ones(d.shape[:1])


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
