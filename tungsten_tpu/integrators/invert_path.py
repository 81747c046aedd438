"""Path-element inversion beyond BSDFs: camera, emitter position,
medium distance.

Extends the Bsdf::invert machinery (bsdf/invert.py) with the other
inversion interfaces the reference defines for reversible-jump MLT
(ref Primitive::invertPosition/invertDirection, Primitive.hpp:59-101;
Medium::invertDistance, Medium.hpp:29-74; Camera::invertPosition/
invertDirection, Camera.hpp:74-106): each maps a concrete path element
back to the primary-sample-space uniforms that would regenerate it,
matched to THIS build's samplers.

Contract per inversion (mirrors bsdf/invert.py):
    regenerate(invert(x)) == x      on the deterministic coordinates
Discrete preimage choices consume `mu` untracked uniforms.  Inversions
that cannot recover a coordinate exactly report valid=False so RJ
proposals fall back to re-randomizing the dim block.
"""
from __future__ import annotations

import jax.numpy as jnp



# ------------------------------------------------------------- camera

def invert_camera_direction(scene, settings, d_world):
    """Pinhole inverse of generate_rays' direction mapping: world
    direction -> (pixel (R,) i32, u1, u2, valid).  Matches the box
    (and dirac) reconstruction filters — the jitter u = f + 0.5; other
    filters are not invertible here (valid=False).  Ref
    PinholeCamera::invertDirection (PinholeCamera.cpp:94-99)."""
    R = d_world.shape[0]
    w, h = settings.width, settings.height
    local = d_world @ scene.cam_mat[:3, :3]        # R^T = inverse rot
    lz = local[..., 2]
    ok = lz > 1e-6
    scale = jnp.where(ok, scene.cam_plane_dist / jnp.maximum(lz, 1e-6),
                      0.0)
    lx = local[..., 0] * scale
    ly = local[..., 1] * scale
    ratio = h / w
    fx_px = (lx + 1.0) * (0.5 * w) - 0.5           # px + fx
    fy_px = (ratio - ly) * (0.5 * w) - 0.5         # py + fy
    px = jnp.clip(jnp.round(fx_px).astype(jnp.int32), 0, w - 1)
    py = jnp.clip(jnp.round(fy_px).astype(jnp.int32), 0, h - 1)
    fx = fx_px - px
    fy = fy_px - py
    if settings.filter in ("box", "dirac"):
        u1 = jnp.clip(fx + 0.5, 0.0, 1.0)
        u2 = jnp.clip(fy + 0.5, 0.0, 1.0)
        ok = ok & (jnp.abs(fx) <= 0.5 + 1e-4) & (jnp.abs(fy) <= 0.5 + 1e-4)
    else:
        u1 = jnp.zeros((R,))
        u2 = jnp.zeros((R,))
        ok = jnp.zeros((R,), bool)
    pixel = (py * w + px).astype(jnp.int32)
    ok = ok & (settings.camera_type == "pinhole")
    return pixel, u1, u2, ok


# ------------------------------------------------- emitter position

def invert_area_light_point(scene, light_idx, tri, b1, b2, mu):
    """Inverse of area_light_sample's position coordinates: given the
    hit triangle (global id) and its barycentrics (b1, b2) over
    (e1, e2), recover (u_tri, u1, u2) such that sampling with them
    regenerates the same point (ref TriangleMesh::invertPosition).

    The alias-table triangle pick is inverted through the triangle's
    OWN bin (`keep` branch, u_tri in [k, k + prob)/cnt); preimages that
    reach the triangle through other bins' alias branches are not
    enumerated — mu covers the within-bin coordinate.  valid=False when
    the triangle is not part of the light."""
    off = scene.light_tri_off[light_idx]
    cnt = jnp.maximum(scene.light_tri_cnt[light_idx], 1)
    slot = scene.lt_slot[jnp.clip(tri, 0, scene.lt_slot.shape[0] - 1)]
    k = slot - off
    ok = (slot >= 0) & (k >= 0) & (k < cnt)
    prob = scene.lt_prob[jnp.clip(slot, 0, scene.lt_prob.shape[0] - 1)]
    u_tri = (k.astype(jnp.float32)
             + mu * jnp.maximum(prob, 1e-6)) / cnt.astype(jnp.float32)
    # a = 1 - su, b = (1 - u2) * su  with su = sqrt(u1)
    su = jnp.clip(1.0 - b1, 1e-6, 1.0)
    u1 = su * su
    u2 = 1.0 - jnp.clip(b2 / su, 0.0, 1.0)
    ok = ok & (b1 >= 0.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0 + 1e-5)
    return u_tri, u1, u2, ok


def invert_choose_light(scene, settings, p, li, mu):
    """Inverse of lights.choose_light: u_sel in the CDF bin of light
    `li` as seen from p (radiance-weighted pick, ref
    TraceBase::chooseLight).  mu covers the within-bin coordinate.
    Single-light scenes accept any u_sel (weight-1 shortcut)."""
    import jax.numpy as jnp
    R = p.shape[0]
    nl = settings.num_lights
    if nl <= 1:
        return mu, jnp.ones((R,), bool)
    from tungsten_tpu.integrators.lights import _choose_light_weights
    w, total = _choose_light_weights(scene, settings, p)
    cdf = jnp.cumsum(w, axis=-1)
    li_c = jnp.clip(li, 0, nl - 1)
    lo = jnp.where(li_c > 0,
                   jnp.take_along_axis(
                       cdf, jnp.maximum(li_c - 1, 0)[..., None],
                       axis=-1)[..., 0], 0.0)
    w_i = jnp.take_along_axis(w, li_c[..., None], axis=-1)[..., 0]
    u_sel = (lo + mu * jnp.maximum(w_i, 1e-12)) / jnp.maximum(total, 1e-30)
    ok = (li >= 0) & (li < nl) & (w_i > 0.0)
    return jnp.clip(u_sel, 0.0, 1.0 - 1e-7), ok


# ------------------------------------------------- medium distance

def invert_medium_distance(ttype, params, start_on_surface, t_unit):
    """Inverse of transmittance.sample_distance for the exponential
    law: unit-optical-depth distance -> u1 (ref Medium::invertDistance,
    Medium.hpp:29-74).  Non-exponential laws report valid=False (their
    samplers branch on u2 / iterate Newton steps; RJ falls back to
    re-randomizing the slot)."""
    from tungsten_tpu.media.transmittance import T_EXPONENTIAL
    u1 = 1.0 - jnp.exp(-t_unit)
    ok = (ttype == T_EXPONENTIAL) & (t_unit >= 0.0)
    return jnp.clip(u1, 0.0, 1.0 - 1e-7), ok
