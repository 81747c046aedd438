"""Wavefront path tracer: the TPU-native counterpart of the reference's
recursive per-ray hot loop (ref: src/core/integrators/path_tracer/
PathTracer.cpp:14-149 and TraceBase.cpp:246-568).

Design: SoA ray/path state over the whole wavefront; a lax.while_loop
over bounces; per bounce one closest-hit traversal for the continuation
ray plus (when NEE is on) one occlusion traversal for the light-strategy
shadow ray and one closest-hit for the independent bsdf-strategy MIS ray
— the same three traversals per bounce the reference performs.

Estimator parity notes (each mirrors a reference guard):
  * NEE runs at every non-specular-capable surface while
    bounce < max_bounces - 1 (TraceBase::handleSurface).
  * Direct emitter hits count only when light sampling is off, the
    previous vertex was specular, or the light is not samplable
    (TraceBase.cpp:540-543) — the bsdf-strategy contribution is
    otherwise already accounted inside NEE's independent bsdf sample
    (TraceBase::bsdfSample, which re-samples the BSDF).
  * Escaped rays collect the environment with the same guard plus
    min_bounces <= bounce < max_bounces (PathTracer.cpp:128-129).
  * Russian roulette after bounce 2 at max|throughput| < 0.1
    (PathTracer.cpp:111-117).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tungsten_tpu.bsdf.eval import (
    FLAG_SPECULAR, FLAG_VALID, NESTED_TYPES, ShadePoint,
    bsdf_eval, bsdf_forward, bsdf_pdf, bsdf_sample)
from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.cameras.camera import generate_rays
from tungsten_tpu.integrators import lights as L
from tungsten_tpu.ops.intersect import bvh_intersect, occluded
from tungsten_tpu.scene.flatten import LIGHT_AREA, LIGHT_INFINITE
from tungsten_tpu.utils import rng
from tungsten_tpu.utils import vecmath as vm

INF = jnp.float32(3.0e38)
EPSILON = 5e-4  # ray-offset epsilon (ref TraceableScene.hpp:39 DefaultEpsilon)
SHADOW_FUDGE = 1.0 - 1e-3


def _expand_hit(scene, o, d, res):
    """IntersectionInfo expansion: position, normals, uv, prim, bsdf."""
    t = res["t"]
    p = o + d * t[..., None]
    tri = jnp.clip(res["tri"], 0, scene.tri_v0.shape[0] - 1)
    u = res["u"][..., None]
    v = res["v"][..., None]

    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    ng_tri = jnp.cross(e1, e2)
    ng_tri = ng_tri / jnp.maximum(
        jnp.linalg.norm(ng_tri, axis=-1, keepdims=True), 1e-20)
    w = 1.0 - u - v
    ns_tri = scene.tri_n0[tri] * w + scene.tri_n1[tri] * u + scene.tri_n2[tri] * v
    ns_len = jnp.linalg.norm(ns_tri, axis=-1, keepdims=True)
    ns_tri = jnp.where(ns_len > 1e-6, ns_tri / jnp.maximum(ns_len, 1e-20), ng_tri)
    uv_tri = (scene.tri_uv0[tri] * w + scene.tri_uv1[tri] * u
              + scene.tri_uv2[tri] * v)
    prim_tri = scene.tri_prim[tri]

    is_sph = res["sph"] >= 0
    if scene.sph_radius.shape[0] > 0:
        si = jnp.clip(res["sph"], 0, scene.sph_radius.shape[0] - 1)
        c = scene.sph_center[si]
        ng_s = (p - c) / jnp.maximum(scene.sph_radius[si][..., None], 1e-20)
        ng = vm.where3(is_sph, ng_s, ng_tri)
        ns = vm.where3(is_sph, ng_s, ns_tri)
        prim = jnp.where(is_sph, scene.sph_prim[si], prim_tri)
        # spherical uv
        phi = jnp.arctan2(ng_s[..., 2], ng_s[..., 0]) * vm.INV_TWO_PI + 0.5
        theta = jnp.arccos(jnp.clip(-ng_s[..., 1], -1, 1)) * vm.INV_PI
        uv = jnp.where(is_sph[..., None],
                       jnp.stack([phi, theta], -1), uv_tri)
    else:
        ng, ns, prim, uv = ng_tri, ns_tri, prim_tri, uv_tri

    prim = jnp.clip(prim, 0, scene.prim_bsdf.shape[0] - 1)
    return dict(p=p, ng=ng, ns=ns, uv=uv, prim=prim,
                bsdf=scene.prim_bsdf[prim])


def _nee(scene, settings, sp, info, wi_local, frame, seed, pixel, sample_idx,
         bounce_dim_base, detach=False):
    """Next-event estimation with both MIS strategies toward one chosen
    light; returns (R,3) contribution (excluding throughput)."""
    t, b, n = frame
    p = info["p"]
    R = p.shape[0]
    nl = settings.num_lights
    if nl == 0:
        return jnp.zeros((R, 3))

    u_sel = rng.random_1d(seed, pixel, sample_idx,
                          bounce_dim_base + rng.BounceDims.LIGHT_SELECT)
    li = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
    sel_weight = jnp.float32(nl)
    ltype = scene.light_type[li]

    # ---------------- light strategy ----------------
    u1, u2 = rng.random_2d(seed, pixel, sample_idx,
                           bounce_dim_base + rng.BounceDims.LIGHT_SAMPLE)
    u_tri = rng.random_1d(seed, pixel, sample_idx,
                          bounce_dim_base + rng.BounceDims.LIGHT_TRI)
    a = L.area_light_sample(scene, li, p, u_tri, u1, u2)

    if settings.has_env:
        ed, erad, epdf = L.env_sample(scene, u1, u2)
        is_env = ltype == LIGHT_INFINITE
        d = vm.where3(is_env, ed, a["d"])
        dist = jnp.where(is_env, INF, a["dist"])
        pdf = jnp.where(is_env, epdf, a["pdf"])
        emis = jnp.where(is_env[..., None], erad, a["emission"])
        valid = jnp.where(is_env, epdf > 0, a["valid"])
    else:
        d, dist, pdf, emis, valid = (
            a["d"], a["dist"], a["pdf"], a["emission"], a["valid"])

    wo_local = vm.to_local(t, b, n, d)
    f = bsdf_eval(sp, wi_local, wo_local, settings.present_bsdf_types)
    do_shadow = valid & (jnp.max(f, axis=-1) > 0.0) & (pdf > 1e-20)

    shadow_o = p + d * EPSILON
    far = jnp.where(dist >= INF, INF, dist * SHADOW_FUDGE)
    occ = occluded(scene, shadow_o, d, 0.0, far)
    if detach:
        occ = jax.lax.stop_gradient(occ)
    vis = do_shadow & ~occ

    mis_l = L.power_heuristic(
        pdf, bsdf_pdf(sp, wi_local, wo_local, settings.present_bsdf_types))
    contrib_l = jnp.where(
        vis[..., None],
        f * emis / jnp.maximum(pdf, 1e-20)[..., None] * mis_l[..., None],
        0.0)

    # ---------------- bsdf strategy (independent sample) ----------------
    ub = rng.random_1d(seed, pixel, sample_idx,
                       bounce_dim_base + rng.BounceDims.NEE_BSDF_LOBE)
    ub1, ub2 = rng.random_2d(seed, pixel, sample_idx,
                             bounce_dim_base + rng.BounceDims.NEE_BSDF_SAMPLE)
    ub_l2 = rng.random_1d(seed, pixel, sample_idx,
                          bounce_dim_base + rng.BounceDims.NEE_BSDF_LOBE2)
    wo_b, wt_b, pdf_b, flags_b = bsdf_sample(
        sp, wi_local, ub, ub1, ub2, settings.present_bsdf_types,
        u_lobe2=ub_l2, no_specular=True)
    wd = vm.to_global(t, b, n, wo_b)
    ok_b = ((flags_b & FLAG_VALID) != 0) & (jnp.max(wt_b, axis=-1) > 0)

    res_b = bvh_intersect(scene, p + wd * EPSILON, wd, 0.0, INF)
    if detach:
        res_b = _detach(res_b)
    hit_prim = jnp.where(
        res_b["tri"] >= 0,
        scene.tri_prim[jnp.clip(res_b["tri"], 0, scene.tri_v0.shape[0] - 1)],
        -1)
    if scene.sph_prim.shape[0] > 0:
        sprim = scene.sph_prim[
            jnp.clip(res_b["sph"], 0, scene.sph_prim.shape[0] - 1)]
        hit_prim = jnp.where(res_b["sph"] >= 0, sprim, hit_prim)

    # area light: first hit must be the chosen light, front side.
    # (hit_t sanitized: misses carry t=INF whose square is inf and would
    # poison gradients through the untaken where-branch)
    tri_b = jnp.clip(res_b["tri"], 0, scene.tri_v0.shape[0] - 1)
    nb = jnp.cross(scene.tri_e1[tri_b], scene.tri_e2[tri_b])
    nb = nb / jnp.maximum(jnp.linalg.norm(nb, axis=-1, keepdims=True), 1e-20)
    hit_t = jnp.where(res_b["hit"], res_b["t"], 1.0)
    lpdf_area = L.area_light_direct_pdf(scene, li, hit_t, wd, nb)
    front = jnp.sum(wd * nb, axis=-1) < 0.0
    hit_light_area = (ltype == LIGHT_AREA) & res_b["hit"] & \
        (hit_prim == scene.light_prim[li]) & front
    e_area = scene.light_emission[li]

    if settings.has_env:
        escape = (ltype == LIGHT_INFINITE) & ~res_b["hit"]
        e_env = L.env_eval(scene, wd)
        lpdf_env = L.env_pdf(scene, wd)
        got = jnp.where(ltype == LIGHT_INFINITE, escape, hit_light_area)
        e_b = jnp.where((ltype == LIGHT_INFINITE)[..., None], e_env, e_area)
        lpdf = jnp.where(ltype == LIGHT_INFINITE, lpdf_env, lpdf_area)
    else:
        got, e_b, lpdf = hit_light_area, e_area, lpdf_area

    mis_b = L.power_heuristic(pdf_b, lpdf)
    contrib_b = jnp.where(
        (ok_b & got)[..., None], wt_b * e_b * mis_b[..., None], 0.0)

    return (contrib_l + contrib_b) * sel_weight


def _detach(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


def _init_state(scene, settings, pixel, sample_idx, seed, detach):
    R = pixel.shape[0]
    o, d = generate_rays(scene, settings, pixel, sample_idx, seed)
    res = bvh_intersect(scene, o, d, 0.0, INF)
    if detach:
        res = _detach(res)
    return dict(
        o=o, d=d,
        t=res["t"], tri=res["tri"], sph=res["sph"],
        u=res["u"], v=res["v"], hit=res["hit"],
        throughput=jnp.ones((R, 3)),
        emission=jnp.zeros((R, 3)),
        was_specular=jnp.ones((R,), bool),
        alive=jnp.ones((R,), bool),
        bounce=jnp.int32(0),
        rays=jnp.int32(R),  # primary rays already traced
    )


def _make_bounce_body(scene, settings, pixel, sample_idx, seed,
                      detach: bool = False):
    """The per-bounce wavefront step, shared by the while_loop forward
    path and the bounded-depth differentiable path.  With detach=True all
    intersection results are stop-gradient'ed (detached sampling —
    interior derivatives only, as in path-replay differentiable
    rendering; geometry/silhouette terms are out of scope)."""

    def body(s):
        bounce = s["bounce"]
        dim_base = rng.DIMS_CAMERA + bounce * rng.DIMS_PER_BOUNCE
        alive = s["alive"]
        active = alive & s["hit"]
        escaped = alive & ~s["hit"]

        emission = s["emission"]

        # ---- escaped rays: environment (ref handleInfiniteLights) ----
        if settings.has_env:
            env_ok = escaped & (bounce >= settings.min_bounces)
            guard = (~jnp.bool_(settings.enable_light_sampling)) | \
                s["was_specular"] | (scene.env_light_index < 0)
            env_val = L.env_eval(scene, s["d"])
            emission = emission + jnp.where(
                (env_ok & guard)[..., None],
                s["throughput"] * env_val, 0.0)

        info = _expand_hit(scene, s["o"], s["d"], s)

        # two-sided shading: flip the shading frame toward the ray
        backside = jnp.sum(info["ng"] * s["d"], axis=-1) > 0.0
        flip = backside if settings.two_sided_shading else jnp.zeros_like(backside)
        ns = jnp.where(flip[..., None], -info["ns"], info["ns"])
        tan, bit = vm.ortho_frame(ns)
        wi_local = vm.to_local(tan, bit, ns, -s["d"])

        sp = ShadePoint(scene, info["bsdf"], info["uv"])

        # ---- forward/transparency lobe passthrough (ref handleSurface
        # transparency branch: continue straight through, no NEE/emission) ----
        has_forward = any(
            t in settings.present_bsdf_types
            for t in (bt.FORWARD, bt.TRANSPARENCY, bt.THINSHEET))
        if has_forward:
            transp = bsdf_forward(sp, wi_local, settings.present_bsdf_types)
            t_scalar = jnp.mean(transp, axis=-1)
            u_fwd = rng.random_1d(seed, pixel, sample_idx,
                                  dim_base + rng.BounceDims.FORWARD)
            take_forward = active & (u_fwd < t_scalar)
            fwd_weight = transp / jnp.maximum(t_scalar, 1e-20)[..., None]
        else:
            take_forward = jnp.zeros_like(active)
            fwd_weight = None
        shade = active & ~take_forward

        # ---- NEE ----
        if settings.enable_light_sampling and settings.num_lights > 0:
            nee = _nee(scene, settings, sp, info, wi_local, (tan, bit, ns),
                       seed, pixel, sample_idx, dim_base, detach=detach)
            do_nee = shade & (bounce < settings.max_bounces - 1)
            emission = emission + jnp.where(
                do_nee[..., None], nee * s["throughput"], 0.0)

        # ---- direct emitter hit ----
        etex = scene.prim_emission_tex[info["prim"]]
        is_emissive = etex >= 0
        samplable = scene.prim_light[info["prim"]] >= 0
        guard = (~jnp.bool_(settings.enable_light_sampling)) | \
            s["was_specular"] | ~samplable
        front = jnp.sum(info["ng"] * s["d"], axis=-1) < 0.0
        li = jnp.clip(scene.prim_light[info["prim"]], 0,
                      max(scene.light_emission.shape[0] - 1, 0))
        e_val = scene.light_emission[li]
        # non-samplable emissive prims: look up their emission texture const
        e_tex = scene.tex_const[jnp.clip(etex, 0, scene.tex_const.shape[0] - 1)]
        e_hit = jnp.where(samplable[..., None], e_val, e_tex)
        take_emit = shade & is_emissive & front & \
            (bounce >= settings.min_bounces) & guard
        emission = emission + jnp.where(
            take_emit[..., None], s["throughput"] * e_hit, 0.0)

        # ---- continuation bsdf sample ----
        ul = rng.random_1d(seed, pixel, sample_idx,
                           dim_base + rng.BounceDims.BSDF_LOBE)
        u1, u2 = rng.random_2d(seed, pixel, sample_idx,
                               dim_base + rng.BounceDims.BSDF_SAMPLE)
        ul2 = rng.random_1d(seed, pixel, sample_idx,
                            dim_base + rng.BounceDims.BSDF_LOBE2)
        wo, wt, pdf, flags = bsdf_sample(
            sp, wi_local, ul, u1, u2, settings.present_bsdf_types,
            u_lobe2=ul2)
        ok = ((flags & FLAG_VALID) != 0) & (jnp.max(wt, axis=-1) > 0)
        new_d = vm.to_global(tan, bit, ns, wo)
        if has_forward:
            new_d = vm.where3(take_forward, s["d"], new_d)
            wt = jnp.where(take_forward[..., None], fwd_weight, wt)
            ok = jnp.where(take_forward, jnp.max(fwd_weight, axis=-1) > 0, ok)
        throughput = jnp.where((active & ok)[..., None],
                               s["throughput"] * wt, s["throughput"])
        was_specular = jnp.where(shade & ok, (flags & FLAG_SPECULAR) != 0,
                                 s["was_specular"])
        alive2 = active & ok

        # ---- russian roulette (ref PathTracer.cpp:111-117) ----
        r_pdf = jnp.max(jnp.abs(throughput), axis=-1)
        do_rr = alive2 & (bounce > 2) & (r_pdf < 0.1)
        u_rr = rng.random_1d(seed, pixel, sample_idx,
                             dim_base + rng.BounceDims.ROULETTE)
        survive = u_rr < r_pdf
        throughput = jnp.where((do_rr & survive)[..., None],
                               throughput / jnp.maximum(r_pdf, 1e-20)[..., None],
                               throughput)
        alive2 = alive2 & (~do_rr | survive)
        alive2 = alive2 & (jnp.max(throughput, axis=-1) > 0.0)

        # ---- next intersection ----
        new_o = info["p"] + new_d * EPSILON
        o2 = vm.where3(alive2, new_o, s["o"])
        d2 = vm.where3(alive2, new_d, s["d"])
        res = bvh_intersect(scene, o2, d2, 0.0,
                            jnp.where(alive2, INF, 0.0))
        if detach:
            res = _detach(res)

        # ray accounting: continuation + (shadow + bsdf-MIS when NEE ran)
        rays = s["rays"] + jnp.sum(alive2.astype(jnp.int32))
        if settings.enable_light_sampling and settings.num_lights > 0:
            nee_rays = jnp.sum((shade & (bounce < settings.max_bounces - 1))
                               .astype(jnp.int32))
            rays = rays + 2 * nee_rays

        return dict(
            o=o2, d=d2,
            t=res["t"], tri=res["tri"], sph=res["sph"],
            u=res["u"], v=res["v"], hit=res["hit"] & alive2,
            throughput=throughput,
            emission=emission,
            was_specular=was_specular,
            alive=alive2,
            bounce=bounce + 1,
            rays=rays,
        )

    return body


def trace_wave(scene, settings, pixel, sample_idx, seed, with_stats=False):
    """Trace one radiance sample per entry; pixel/sample_idx (R,) int32.
    Returns radiance (R,3), or (radiance, rays_traced) with stats."""
    state = _init_state(scene, settings, pixel, sample_idx, seed, False)
    body = _make_bounce_body(scene, settings, pixel, sample_idx, seed)

    def cond(s):
        return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

    final = jax.lax.while_loop(cond, body, state)
    # Escapes are credited at the top of the body; rays whose final
    # intersect happened at bounce == max_bounces fall outside the
    # reference's `bounce < maxBounces` env guard, so nothing to add here.
    if with_stats:
        return final["emission"], final["rays"]
    return final["emission"]


def trace_wave_diff(scene, settings, pixel, sample_idx, seed):
    """Differentiable radiance estimate: same estimator, but a static
    bounce count (lax.fori_loop, reverse-differentiable) and detached
    intersections/sampling decisions, so gradients flow through the
    shading chain (albedo/emission/roughness/ior/textures) only."""
    state = _init_state(scene, settings, pixel, sample_idx, seed, True)
    body = _make_bounce_body(scene, settings, pixel, sample_idx, seed,
                             detach=True)
    final = jax.lax.fori_loop(0, settings.max_bounces,
                              lambda i, s: body(s), state)
    return final["emission"]
