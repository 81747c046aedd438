"""Wavefront path tracer: the TPU-native counterpart of the reference's
recursive per-ray hot loop (ref: src/core/integrators/path_tracer/
PathTracer.cpp:14-149 and TraceBase.cpp:62-568).

Design: SoA ray/path state over the whole wavefront; a lax.while_loop
over bounces; per bounce one closest-hit traversal for the continuation
ray plus (when NEE is on) shadow traversals for the light-strategy ray
and the independent bsdf/phase-strategy MIS ray — the same per-bounce
ray census as the reference.

Estimator parity notes (each mirrors a reference guard):
  * NEE runs at every shading vertex (surface or medium) while
    bounce < max_bounces - 1 (TraceBase::handleSurface/handleVolume).
  * Direct emitter hits count only when light sampling is off, the
    previous vertex was specular, or the light is not samplable
    (TraceBase.cpp:540-543) — the bsdf-strategy contribution is
    otherwise already accounted inside NEE's independent bsdf sample
    (TraceBase::bsdfSample, which re-samples the BSDF).
  * Escaped rays collect the environment with the same guard plus
    min_bounces <= bounce < max_bounces (PathTracer.cpp:128-129).
  * Media: homogeneous distance sampling with spectral channel MIS and
    pluggable transmittance laws (HomogeneousMedium.cpp:65-108); shadow
    rays walk through forward-lobe surfaces and accumulate medium
    transmittance (TraceBase::generalizedShadowRay, :62-142).
  * Russian roulette after bounce 2 at max|throughput| < 0.1
    (PathTracer.cpp:111-117).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.bsdf.eval import (
    FLAG_SPECULAR, FLAG_VALID, NESTED_TYPES, ShadePoint,
    bsdf_eval, bsdf_forward, bsdf_pdf, bsdf_sample)
from tungsten_tpu.cameras.camera import generate_rays
from tungsten_tpu.integrators import lights as L
from tungsten_tpu.media import grid as GR
from tungsten_tpu.media import phase as PH
from tungsten_tpu.media import transmittance as TR
from tungsten_tpu.ops import intersect as _isect
from tungsten_tpu.ops.intersect import bvh_intersect, occluded
from tungsten_tpu.scene.flatten import (
    LIGHT_AREA, LIGHT_CAP, LIGHT_INFINITE, LIGHT_POINT)
from tungsten_tpu.utils import rng
from tungsten_tpu.utils import vecmath as vm

INF = jnp.float32(3.0e38)
EPSILON = 5e-4  # ray-offset epsilon (ref TraceableScene.hpp:39 DefaultEpsilon)
SHADOW_FUDGE = 1.0 - 1e-3
MAX_SHADOW_HOPS = 8  # forward-surface crossings a shadow ray may pass
# one-sample-MIS shadow rays: True routes them through the any-hit wave
# drain as their own launch (A/B'd on TPU vs the round-4 fused 2R
# closest-hit batch — see PROFILE_r05.md)
SHADOW_ANY_HIT = True
# When the body-start state sort is active the closest-hit launch is
# exactly sorted, but shadow rays only inherit the PARENT ray's
# octant/origin key.  True = give the any-hit shadow launch its own
# per-launch sort anyway: its directions (fresh light samples) span
# octants, and the octant-first cull degrades badly without it
# (round-5b A/B: 808 -> 611 ms staged wave).
SHADOW_OWN_SORT = True
# Body-start state sort (round-5b): the bounce body traces its
# continuation ray AT THE TOP and, on Pallas backends, first reorders
# the WHOLE wavefront state by the traversal sort key (one 2-operand
# key sort + one packed row gather) so BOTH launches (closest
# continuation + any-hit shadow) skip their per-launch 10-operand
# sort / 5-operand un-permute pairs entirely.  Shadow rays inherit the
# parent ray's origin locality.  Off for the detached replay path —
# the path-replay suffix math assumes lanes keep their identity.
BODY_SORT = True


def _detach(tree):
    return jax.tree.map(jax.lax.stop_gradient, tree)


def _has_forward_types(settings):
    return any(t in settings.present_bsdf_types
               for t in (bt.FORWARD, bt.TRANSPARENCY, bt.THINSHEET))


# ---------------------------------------------------------------- media

def _medium_tr(scene, settings, med, o, d, seg_len, start_surf, end_surf):
    """Transmittance of `seg_len` through medium index `med` (-1 = vacuum).
    Heterogeneous media integrate the density along the segment (ref
    VoxelMedium/ExponentialMedium::transmittance); infinite segments
    through a homogeneous medium transmit 0 (HomogeneousMedium)."""
    m = jnp.clip(med, 0, scene.med_sigma_a.shape[0] - 1)
    sigma_t = scene.med_sigma_a[m] + scene.med_sigma_s[m]
    if any(k != GR.MED_HOMOGENEOUS for k in settings.med_kinds):
        ut = GR.unit_tau(scene, settings, m, o, d, seg_len)
    else:
        ut = jnp.minimum(seg_len, INF)
    tau = sigma_t * ut[..., None]
    tr = TR.eval_tr(scene.med_trans_type[m], tau, scene.med_trans_params[m],
                    start_surf, end_surf)
    # ut is INF only where the density never falls off along an
    # infinite segment; exp(-inf) underflows to 0 already, but guard
    # NaNs from 0*inf in the law params
    tr = jnp.where(jnp.isfinite(tr), tr, 0.0)
    tr = jnp.where(((seg_len >= INF) & (ut >= INF))[..., None], 0.0, tr)
    return jnp.where((med >= 0)[..., None], tr, 1.0)


def _hit_prim(scene, res):
    """Primitive id of a hit (-1 on miss)."""
    if scene.tri_v0.shape[0] > 0:
        prim = jnp.where(
            res["tri"] >= 0,
            scene.tri_prim[jnp.clip(res["tri"], 0,
                                    scene.tri_v0.shape[0] - 1)],
            -1)
    else:
        prim = jnp.full(res["t"].shape, -1, jnp.int32)
    if scene.sph_prim.shape[0] > 0:
        sprim = scene.sph_prim[
            jnp.clip(res["sph"], 0, scene.sph_prim.shape[0] - 1)]
        prim = jnp.where(res["sph"] >= 0, sprim, prim)
    if getattr(scene, "dsk_prim", None) is not None and \
            scene.dsk_prim.shape[0] > 0 and "dsk" in res:
        dprim = scene.dsk_prim[
            jnp.clip(res["dsk"], 0, scene.dsk_prim.shape[0] - 1)]
        prim = jnp.where(res["dsk"] >= 0, dprim, prim)
    if getattr(scene, "cyl_prim", None) is not None and \
            scene.cyl_prim.shape[0] > 0 and "cyl" in res:
        yprim = scene.cyl_prim[
            jnp.clip(res["cyl"], 0, scene.cyl_prim.shape[0] - 1)]
        prim = jnp.where(res["cyl"] >= 0, yprim, prim)
    if scene.crv_seg_prim.shape[0] > 0 and "crv" in res:
        cprim = scene.crv_seg_prim[
            jnp.clip(res["crv"], 0, scene.crv_seg_prim.shape[0] - 1)]
        prim = jnp.where(res["crv"] >= 0, cprim, prim)
    return prim


def _hit_ng(scene, res, o=None, d=None):
    """Geometric normal of a triangle (or, with o/d given, analytic
    disk/cylinder) hit.  Callers only use it where a matching channel
    is >= 0; tri-only callers may omit o/d."""
    if scene.tri_v0.shape[0] == 0:
        ng = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                              res["t"].shape + (3,))
    else:
        tri = jnp.clip(res["tri"], 0, scene.tri_v0.shape[0] - 1)
        ng = jnp.cross(scene.tri_e1[tri], scene.tri_e2[tri])
        ng = ng / jnp.maximum(
            jnp.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    if o is not None and scene.sph_radius.shape[0] > 0 and "sph" in res:
        si = jnp.clip(res["sph"], 0, scene.sph_radius.shape[0] - 1)
        ps = o + d * res["t"][..., None]
        ng_s = (ps - scene.sph_center[si]) / jnp.maximum(
            scene.sph_radius[si][..., None], 1e-20)
        ng = vm.where3(res["sph"] >= 0, ng_s, ng)
    if o is not None and getattr(scene, "dsk_r", None) is not None \
            and scene.dsk_r.shape[0] > 0 and "dsk" in res:
        di = jnp.clip(res["dsk"], 0, scene.dsk_r.shape[0] - 1)
        ng = vm.where3(res["dsk"] >= 0, scene.dsk_n[di], ng)
    if o is not None and getattr(scene, "cyl_r", None) is not None \
            and scene.cyl_r.shape[0] > 0 and "cyl" in res:
        is_y = res["cyl"] >= 0
        yi = jnp.clip(res["cyl"], 0, scene.cyl_r.shape[0] - 1)
        p = o + d * res["t"][..., None]
        rot = scene.cyl_rot[yi]
        pl = jnp.einsum("ri,rij->rj", p - scene.cyl_pos[yi], rot)
        r_y = jnp.maximum(scene.cyl_r[yi], 1e-20)
        hh = jnp.maximum(scene.cyl_hh[yi], 1e-20)
        px, py, pz = pl[..., 0] / r_y, pl[..., 1], pl[..., 2] / r_y
        on_cap = (jnp.abs(jnp.abs(py) - hh) < 1e-4 * hh) & \
            (px * px + pz * pz < 1.0) & scene.cyl_capped[yi]
        n_side = jnp.stack([px, jnp.zeros_like(px), pz], -1)
        n_side = n_side / jnp.maximum(
            jnp.linalg.norm(n_side, axis=-1, keepdims=True), 1e-20)
        n_cap = jnp.stack([jnp.zeros_like(py),
                           jnp.where(py >= 0, 1.0, -1.0),
                           jnp.zeros_like(py)], -1)
        n_loc = vm.where3(on_cap, n_cap, n_side)
        ng = vm.where3(is_y, jnp.einsum("rij,rj->ri", rot, n_loc), ng)
    return ng


def _hit_uv_bsdf(scene, res):
    """Minimal hit expansion for shadow rays: uv + bsdf + prim + backside."""
    u = res["u"][..., None]
    v = res["v"][..., None]
    if scene.tri_v0.shape[0] > 0:
        tri = jnp.clip(res["tri"], 0, scene.tri_v0.shape[0] - 1)
        w = 1.0 - u - v
        uv = (scene.tri_uv0[tri] * w + scene.tri_uv1[tri] * u
              + scene.tri_uv2[tri] * v)
        prim = scene.tri_prim[tri]
    else:
        uv = jnp.concatenate([u, v], axis=-1)
        prim = jnp.zeros(res["t"].shape, jnp.int32)
    if scene.sph_prim.shape[0] > 0:
        si = jnp.clip(res["sph"], 0, scene.sph_prim.shape[0] - 1)
        prim = jnp.where(res["sph"] >= 0, scene.sph_prim[si], prim)
    if getattr(scene, "dsk_prim", None) is not None and \
            scene.dsk_prim.shape[0] > 0 and "dsk" in res:
        di = jnp.clip(res["dsk"], 0, scene.dsk_prim.shape[0] - 1)
        prim = jnp.where(res["dsk"] >= 0, scene.dsk_prim[di], prim)
    if getattr(scene, "cyl_prim", None) is not None and \
            scene.cyl_prim.shape[0] > 0 and "cyl" in res:
        yi = jnp.clip(res["cyl"], 0, scene.cyl_prim.shape[0] - 1)
        prim = jnp.where(res["cyl"] >= 0, scene.cyl_prim[yi], prim)
    if scene.crv_seg_prim.shape[0] > 0 and "crv" in res:
        ci = jnp.clip(res["crv"], 0, scene.crv_seg_prim.shape[0] - 1)
        is_crv = res["crv"] >= 0
        prim = jnp.where(is_crv, scene.crv_seg_prim[ci], prim)
        uv = jnp.where(is_crv[..., None],
                       jnp.stack([res["u"], res["v"]], axis=-1), uv)
    prim = jnp.clip(prim, 0, scene.prim_bsdf.shape[0] - 1)
    return uv, scene.prim_bsdf[prim], prim


def _select_medium(scene, prim, cur_med, geometric_backside):
    """ref Primitive::selectMedium (Primitive.hpp:177-183)."""
    im = scene.prim_int_medium[prim]
    em = scene.prim_ext_medium[prim]
    overrides = (im >= 0) | (em >= 0)
    return jnp.where(overrides, jnp.where(geometric_backside, im, em),
                     cur_med)


def _shadow_transmittance(scene, settings, o, d, dist, medium,
                          starts_on_surface, detach=False, endcap_prim=None):
    """Generalized shadow ray (ref TraceBase::generalizedShadowRay):
    walks through forward-lobe surfaces, accumulating their transparency
    and the transmittance of each medium segment.  Returns (R,3).

    endcap_prim (R,) excludes the target light primitive from occlusion,
    like the reference's endCap — vital when the light is closer than the
    ray-offset epsilon allows the fudged far clip to exclude."""
    simple = not settings.has_media and not _has_forward_types(settings)
    if simple:
        far = jnp.where(dist >= INF, INF, dist * SHADOW_FUDGE)
        if endcap_prim is None:
            occ = occluded(scene, o, d, 0.0, far)
        else:
            res = bvh_intersect(scene, o, d, 0.0, far)
            hp = _hit_prim(scene, res)
            occ = res["hit"] & (hp != endcap_prim)
        if detach:
            occ = jax.lax.stop_gradient(occ)
        return jnp.where(occ[..., None], 0.0, 1.0)

    R = o.shape[0]
    state = dict(
        o=o,
        remaining=jnp.where(dist >= INF, INF, dist * SHADOW_FUDGE),
        med=medium,
        tr=jnp.ones((R, 3)),
        start_surf=starts_on_surface,
        active=jnp.ones((R,), bool),
        hops=jnp.int32(0),
    )

    def cond(s):
        return (s["hops"] < MAX_SHADOW_HOPS) & jnp.any(s["active"])

    def body(s):
        res = bvh_intersect(scene, s["o"], d, EPSILON,
                            jnp.where(s["active"], s["remaining"], 0.0))
        if detach:
            res = _detach(res)
        did_hit = res["hit"] & s["active"]
        if endcap_prim is not None:
            # reaching the target light ends the walk successfully; the
            # medium segment still runs to the light's surface
            reached_cap = did_hit & (_hit_prim(scene, res) == endcap_prim)
            did_hit = did_hit & ~reached_cap
        seg = jnp.where(did_hit, res["t"],
                        jnp.where(res["hit"] & s["active"], res["t"],
                                  s["remaining"]))

        tr = s["tr"]
        if settings.has_media:
            end_surf = did_hit | jnp.ones_like(did_hit)  # light end = surface
            seg_tr = _medium_tr(scene, settings, s["med"], s["o"], d, seg,
                                s["start_surf"], end_surf)
            tr = tr * jnp.where(s["active"][..., None], seg_tr, 1.0)

        # surface crossing: must be a forward-lobe surface
        uv, bsdf_idx, prim = _hit_uv_bsdf(scene, res)
        if _has_forward_types(settings):
            sp = ShadePoint(scene, bsdf_idx, uv)
            # forward transparency is wi-dependent only for thinsheet
            ng = _hit_ng(scene, res)
            cosd = jnp.abs(jnp.sum(d * ng, axis=-1))
            wi_proxy = jnp.stack(
                [jnp.sqrt(jnp.maximum(1 - cosd ** 2, 0.0)),
                 jnp.zeros_like(cosd), cosd], axis=-1)
            transp = bsdf_forward(sp, wi_proxy, settings.present_bsdf_types)
        else:
            transp = jnp.zeros((R, 3))
        passes = jnp.max(transp, axis=-1) > 0.0
        blocked = did_hit & ~passes
        tr = jnp.where(blocked[..., None], 0.0, tr)
        tr = tr * jnp.where(did_hit[..., None] & passes[..., None],
                            transp, 1.0)

        # medium handoff at the crossing
        if settings.has_media:
            ng = _hit_ng(scene, res)
            backside = jnp.sum(d * ng, axis=-1) > 0.0
            # continuing through: entering if we hit the front face
            new_med = _select_medium(scene, prim, s["med"], ~backside)
            med = jnp.where(did_hit & passes, new_med, s["med"])
        else:
            med = s["med"]

        o2 = jnp.where(did_hit[..., None], s["o"] + d * res["t"][..., None],
                       s["o"])
        remaining = jnp.where(did_hit, s["remaining"] - res["t"],
                              s["remaining"])
        active = s["active"] & did_hit & passes & (remaining > EPSILON)
        return dict(o=o2, remaining=remaining, med=med, tr=tr,
                    start_surf=jnp.where(did_hit, True, s["start_surf"]),
                    active=active, hops=s["hops"] + 1)

    final = jax.lax.while_loop(cond, body, state)
    # rays that ran out of hops while still active are conservatively blocked
    return jnp.where(final["active"][..., None], 0.0, final["tr"])


# ----------------------------------------------------------------- NEE

def _one_sample_mis(settings) -> bool:
    """True when the simple path uses ONE-SAMPLE MIS: the continuation
    bsdf sample doubles as the bsdf-side MIS strategy (emitter hits get
    power-heuristic weights against the light-selection-aware NEE pdf)
    instead of the reference's independent estimateDirect re-sample
    (TraceBase::bsdfSample).  Identical expectation — both are unbiased
    MIS combinations of the same two strategies — but one fewer bsdf
    sample AND one fewer closest-hit ray per shading vertex (round-4
    perf: the per-bounce ray census drops 3R -> 2R and the two
    traversal launches merge into one).  Media / forward-lobe /
    cap-light / fixed-path-length (MMLT) scenes keep the reference
    estimator structure."""
    return (not settings.has_media and not _has_forward_types(settings)
            and bool(settings.enable_light_sampling)
            and settings.num_lights > 0 and settings.num_caps == 0
            and settings.mlt_path_length < 0)


def _light_select_pmf(scene, settings, p, li):
    """P(choose_light picks li | shading point p) — the selection factor
    of the NEE strategy's directional density, needed by the
    one-sample-MIS emitter-hit weight (counterpart of
    TraceBase::chooseLight's weights)."""
    nl = settings.num_lights
    if nl <= 1:
        return jnp.ones(li.shape)
    w, total = L._choose_light_weights(scene, settings, p)
    wi = jnp.take_along_axis(w, jnp.clip(li, 0, nl - 1)[..., None],
                             axis=-1)[..., 0]
    return wi / jnp.maximum(total, 1e-30)


def _nee(scene, settings, ctx, seed, pixel, sample_idx, bounce_dim_base,
         detach=False, extra_ray=None, want_tr=False, want_dir=False):
    """Next-event estimation with both MIS strategies toward one chosen
    light, at surface vertices (bsdf) or medium vertices (phase).
    ctx: p, is_volume, sp/frame/wi_local (surface), ray_d/phase params
    (volume), medium (for shadow transmittance).
    extra_ray: optional (o, d, t_max) continuation rays traced in the
    SAME batched traversal as the two NEE strategies (3R rays per
    kernel call — the Pallas traversal's fixed cost amortizes ~3x).
    want_tr additionally returns (tr (R,3), tr_valid (R,)) — the
    light-strategy shadow transmittance, valid only where the shadow ray
    was actually traced (ref TraceBase::lightSample only writes
    *transmittance after a valid light sample with f > 0; feeds the
    visibility AOV, PathTracer.cpp:92-93).
    ctx["gate"] (optional (R,) bool): vertices that actually want NEE
    this bounce (alive, shading, not past max_bounces-1) — rays for
    gated-off vertices get tmax 0 so the traversal culls them, and the
    MEASURED ray count (always the last element of the returned tuple)
    only includes rays actually traced.
    Returns (R,3) contribution (excluding path throughput), plus
    extra_res when extra_ray is given, plus (tr, tr_valid) with
    want_tr, plus the traced-ray count (i32 scalar) last."""
    p = ctx["p"]
    presorted = ctx.get("presorted", False)
    R = p.shape[0]
    nl = settings.num_lights
    if nl == 0:
        z = jnp.zeros((R, 3))
        out = (z,)
        if extra_ray is not None:
            res_x = bvh_intersect(scene, extra_ray[0], extra_ray[1], 0.0,
                                  extra_ray[2])
            if detach:
                res_x = _detach(res_x)
            out = out + (res_x,)
        if want_tr:
            out = out + ((jnp.zeros((R, 3)), jnp.zeros((R,), bool)),)
        if want_dir:
            out = out + ((jnp.zeros((R, 3)), jnp.zeros((R,), bool)),)
        return out + (jnp.int32(0),)
    is_vol = ctx["is_volume"]
    sp = ctx["sp"]
    wi_local = ctx["wi_local"]
    t, b, n = ctx["frame"]

    u_sel = rng.random_1d(seed, pixel, sample_idx,
                          bounce_dim_base + rng.BounceDims.LIGHT_SELECT)
    # radiance-weighted pick (ref TraceBase::chooseLight); single-light
    # scenes take the weight-1 shortcut inside
    li, sel_weight = L.choose_light(scene, settings, p, u_sel)
    ltype = scene.light_type[li]

    def eval_f_pdf(d_world):
        """(f (R,3) with cos folded in, pdf (R,)) of the scatter function
        at this vertex toward d_world — bsdf for surfaces, phase for
        medium vertices."""
        wo_local = vm.to_local(t, b, n, d_world)
        f_s = bsdf_eval(sp, wi_local, wo_local, settings.present_bsdf_types)
        p_s = bsdf_pdf(sp, wi_local, wo_local, settings.present_bsdf_types)
        if settings.has_media:
            pe = PH.phase_eval(ctx["phase_type"], ctx["phase_g"],
                               ctx["ray_d"], d_world)
            f = jnp.where(is_vol[..., None], pe[..., None], f_s)
            pdf = jnp.where(is_vol, pe, p_s)
            return f, pdf
        return f_s, p_s

    # ---------------- light strategy ----------------
    gate = ctx.get("gate")
    u1, u2 = rng.random_2d(seed, pixel, sample_idx,
                           bounce_dim_base + rng.BounceDims.LIGHT_SAMPLE)
    u_tri = rng.random_1d(seed, pixel, sample_idx,
                          bounce_dim_base + rng.BounceDims.LIGHT_TRI)
    if getattr(settings, "has_area_lights", True):
        a = L.area_light_sample(scene, li, p, u_tri, u1, u2)
    else:
        # every light in the scene is env/cap/point/analytic — skip the
        # triangle alias machinery (its ~6 random gathers per bounce
        # are pure waste here; round-5 glue profile)
        z = jnp.zeros((R,))
        a = dict(d=jnp.zeros((R, 3)).at[:, 2].set(1.0), dist=z, pdf=z,
                 emission=jnp.zeros((R, 3)),
                 valid=jnp.zeros((R,), bool))

    if settings.has_env:
        ed, erad, epdf = L.env_sample(scene, u1, u2, active=gate)
        is_env = ltype == LIGHT_INFINITE
        d = vm.where3(is_env, ed, a["d"])
        dist = jnp.where(is_env, INF, a["dist"])
        pdf = jnp.where(is_env, epdf, a["pdf"])
        emis = jnp.where(is_env[..., None], erad, a["emission"])
        valid = jnp.where(is_env, epdf > 0, a["valid"])
    else:
        d, dist, pdf, emis, valid = (
            a["d"], a["dist"], a["pdf"], a["emission"], a["valid"])
    if settings.num_caps > 0:
        is_cap = ltype == LIGHT_CAP
        cd, cpdf = L.cap_light_sample(scene, li, u1, u2)
        d = vm.where3(is_cap, cd, d)
        dist = jnp.where(is_cap, INF, dist)
        pdf = jnp.where(is_cap, cpdf, pdf)
        emis = jnp.where(is_cap[..., None], scene.light_emission[li], emis)
        valid = jnp.where(is_cap, True, valid)
    is_dirac = jnp.zeros_like(valid)
    if settings.has_points:
        is_pt = ltype == LIGHT_POINT
        pvec = scene.light_aux[li, :3] - p
        p_rsq = jnp.sum(pvec * pvec, axis=-1)
        p_dist = jnp.sqrt(jnp.maximum(p_rsq, 1e-20))
        d = vm.where3(is_pt, pvec / p_dist[..., None], d)
        dist = jnp.where(is_pt, p_dist, dist)
        pdf = jnp.where(is_pt, p_rsq, pdf)
        emis = jnp.where(is_pt[..., None], scene.light_emission[li], emis)
        valid = jnp.where(is_pt, True, valid)
        is_dirac = is_dirac | is_pt
    if settings.has_disk_lights:
        from tungsten_tpu.scene.flatten import LIGHT_DISK
        is_dl = ltype == LIGHT_DISK
        dl = L.disk_light_sample(scene, li, p, u1, u2)
        d = vm.where3(is_dl, dl["d"], d)
        dist = jnp.where(is_dl, dl["dist"], dist)
        pdf = jnp.where(is_dl, dl["pdf"], pdf)
        emis = jnp.where(is_dl[..., None], dl["emission"], emis)
        valid = jnp.where(is_dl, dl["valid"], valid)
    if settings.has_cyl_lights:
        from tungsten_tpu.scene.flatten import LIGHT_CYLINDER
        is_cl = ltype == LIGHT_CYLINDER
        cl = L.cyl_light_sample(scene, li, p, u1, u2, u_tri)
        d = vm.where3(is_cl, cl["d"], d)
        dist = jnp.where(is_cl, cl["dist"], dist)
        pdf = jnp.where(is_cl, cl["pdf"], pdf)
        emis = jnp.where(is_cl[..., None], cl["emission"], emis)
        valid = jnp.where(is_cl, cl["valid"], valid)
    if settings.has_sphere_lights:
        from tungsten_tpu.scene.flatten import LIGHT_SPHERE
        is_sl = ltype == LIGHT_SPHERE
        sl = L.sphere_light_sample(scene, li, p, u1, u2)
        d = vm.where3(is_sl, sl["d"], d)
        dist = jnp.where(is_sl, sl["dist"], dist)
        pdf = jnp.where(is_sl, sl["pdf"], pdf)
        emis = jnp.where(is_sl[..., None], sl["emission"], emis)
        valid = jnp.where(is_sl, sl["valid"], valid)

    f, pdf_counter = eval_f_pdf(d)
    do_shadow = valid & (jnp.max(f, axis=-1) > 0.0) & (pdf > 1e-20)
    if gate is not None:
        do_shadow = do_shadow & gate

    from tungsten_tpu.scene.flatten import LIGHT_CYLINDER as _LCY
    from tungsten_tpu.scene.flatten import LIGHT_DISK as _LDK
    from tungsten_tpu.scene.flatten import LIGHT_SPHERE as _LSP
    surface_light = jnp.isin(ltype,
                             jnp.asarray([LIGHT_AREA, _LDK, _LCY, _LSP]))
    endcap = jnp.where(surface_light, scene.light_prim[li], -2)
    shadow_o = p + d * EPSILON

    if _one_sample_mis(settings):
        # ONE-SAMPLE MIS: no independent bsdf strategy here — the
        # continuation ray (extra_ray) carries it, weighted at its
        # emitter hit in the bounce body.  The NEE weight's counter is
        # therefore the FULL NEE density (selection pmf x directional
        # pdf) vs the bsdf pdf.
        far_sh = jnp.where(do_shadow,
                           jnp.where(dist >= INF, INF,
                                     dist * SHADOW_FUDGE), 0.0)
        if SHADOW_ANY_HIT:
            # shadow rays through the ANY-HIT drain (~1.4x cheaper per
            # ray and the segments are light-clipped), continuation
            # through closest-hit; both launches live inside the same
            # fused bounce program so the split costs no dispatch
            occ = jnp.zeros((R,), bool)
            res_extra = None
            if extra_ray is not None:
                res_extra = bvh_intersect(scene, extra_ray[0],
                                          extra_ray[1], 0.0, extra_ray[2],
                                          presorted=presorted)
            occ = bvh_intersect(
                scene, shadow_o, d, 0.0, far_sh, any_hit=True,
                presorted=presorted and not SHADOW_OWN_SORT)["hit"]
            if detach:
                occ = jax.lax.stop_gradient(occ)
                res_extra = _detach(res_extra)
        else:
            # fused 2R closest-hit batch (one sort + cull amortized)
            parts_o = [shadow_o]
            parts_d = [d]
            parts_t = [far_sh]
            if extra_ray is not None:
                parts_o.append(extra_ray[0])
                parts_d.append(extra_ray[1])
                parts_t.append(extra_ray[2])
            res_all = bvh_intersect(scene,
                                    jnp.concatenate(parts_o, axis=0),
                                    jnp.concatenate(parts_d, axis=0), 0.0,
                                    jnp.concatenate(parts_t, axis=0),
                                    presorted=presorted)
            if detach:
                res_all = _detach(res_all)
            occ = res_all["hit"][:R]
            res_extra = {k: v[R:] for k, v in res_all.items()} \
                if extra_ray is not None else None
        tr = jnp.where((do_shadow & ~occ)[..., None], 1.0, 0.0)

        pmf = jnp.ones((R,)) / sel_weight
        mis_l = L.power_heuristic(pdf * pmf, pdf_counter)
        mis_l = jnp.where(is_dirac, 1.0, mis_l)
        out = f * tr * emis / jnp.maximum(pdf, 1e-20)[..., None] \
            * mis_l[..., None] * sel_weight[..., None]
        rets = (out,)
        if extra_ray is not None:
            rets = rets + (res_extra,)
        if want_tr:
            rets = rets + ((tr, do_shadow),)
        if want_dir:
            visible = do_shadow & (jnp.max(tr, axis=-1) > 0.0)
            rets = rets + ((d, visible),)
        return rets + (jnp.sum(do_shadow.astype(jnp.int32)),)

    # ---------------- bsdf/phase strategy (independent sample) ----------
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
    if settings.has_media:
        pw, ppdf = PH.phase_sample(ctx["phase_type"], ctx["phase_g"],
                                   ctx["ray_d"], ub1, ub2)
        wd = vm.where3(is_vol, pw, wd)
        wt_b = jnp.where(is_vol[..., None], 1.0, wt_b)
        pdf_b = jnp.where(is_vol, ppdf, pdf_b)
        ok_b = jnp.where(is_vol, ppdf > 0, ok_b)

    simple = not settings.has_media and not _has_forward_types(settings)
    res_extra = None
    if simple:
        # batched traversals for both MIS strategies (+ optionally the
        # continuation ray): the shadow segment runs through the ANY-HIT
        # kernel (~1.6x cheaper than closest-hit, and the reference
        # semantics — occluded() with farT shy of the light sample,
        # TraceableScene.hpp occlusion path — rather than the previous
        # closest-hit + endcap-prim comparison); the bsdf-strategy and
        # continuation closest hits share one 2R batch
        far = jnp.where(do_shadow,
                        jnp.where(dist >= INF, INF, dist * SHADOW_FUDGE),
                        0.0)
        res_sh = bvh_intersect(scene, shadow_o, d, 0.0, far,
                               any_hit=True, presorted=presorted)
        # the bsdf-strategy ray is dead where the sample is invalid
        # (specular vertices: no_specular sampling returns weight 0) or
        # the vertex is gated off — a mirror-trapped tail otherwise
        # traces R useless INF rays per bounce
        trace_b = ok_b if gate is None else (ok_b & gate)
        parts_o = [p + wd * EPSILON]
        parts_d = [wd]
        parts_t = [jnp.where(trace_b, INF, 0.0)]
        if extra_ray is not None:
            parts_o.append(extra_ray[0])
            parts_d.append(extra_ray[1])
            parts_t.append(extra_ray[2])
        res_all = bvh_intersect(scene, jnp.concatenate(parts_o, axis=0),
                                jnp.concatenate(parts_d, axis=0), 0.0,
                                jnp.concatenate(parts_t, axis=0),
                                presorted=presorted)
        if detach:
            res_all = _detach(res_all)
            res_sh = _detach(res_sh)
        res_b = {k: v[:R] for k, v in res_all.items()}
        if extra_ray is not None:
            res_extra = {k: v[R:] for k, v in res_all.items()}
        occ = res_sh["hit"]
        tr = jnp.where((do_shadow & ~occ)[..., None], 1.0, 0.0)
    else:
        tr = _shadow_transmittance(scene, settings, shadow_o, d, dist,
                                   ctx["medium"], ~is_vol, detach=detach,
                                   endcap_prim=endcap)
        tr = jnp.where(do_shadow[..., None], tr, 0.0)
        trace_b = ok_b if gate is None else (ok_b & gate)
        res_b = bvh_intersect(scene, p + wd * EPSILON, wd, 0.0,
                              jnp.where(trace_b, INF, 0.0))
        if detach:
            res_b = _detach(res_b)
        if extra_ray is not None:
            res_extra = bvh_intersect(scene, extra_ray[0], extra_ray[1],
                                      0.0, extra_ray[2])
            if detach:
                res_extra = _detach(res_extra)

    mis_l = L.power_heuristic(pdf, pdf_counter)
    mis_l = jnp.where(is_dirac, 1.0, mis_l)  # Dirac lights skip MIS
    contrib_l = f * tr * emis / jnp.maximum(pdf, 1e-20)[..., None] \
        * mis_l[..., None]

    hit_prim = _hit_prim(scene, res_b)

    # area/disk/cylinder light: first hit must be the chosen light,
    # front side.  (hit_t sanitized: misses carry t=INF whose square is
    # inf and would poison gradients through the untaken where-branch)
    nb = _hit_ng(scene, res_b, p + wd * EPSILON, wd)
    hit_t = jnp.where(res_b["hit"], res_b["t"], 1.0)
    lpdf_area = L.area_light_direct_pdf(
        scene, li, hit_t, wd, nb, p=p,
        has_sphere_lights=settings.has_sphere_lights)
    front = jnp.sum(wd * nb, axis=-1) < 0.0
    hit_light_area = surface_light & res_b["hit"] & \
        (hit_prim == scene.light_prim[li]) & front
    e_area = scene.light_emission[li]

    if settings.has_env:
        escape = (ltype == LIGHT_INFINITE) & ~res_b["hit"]
        e_env = L.env_eval(scene, wd, active=escape & trace_b)
        lpdf_env = L.env_pdf(scene, wd, active=escape & trace_b)
        got = jnp.where(ltype == LIGHT_INFINITE, escape, hit_light_area)
        e_b = jnp.where((ltype == LIGHT_INFINITE)[..., None], e_env, e_area)
        lpdf = jnp.where(ltype == LIGHT_INFINITE, lpdf_env, lpdf_area)
    else:
        got, e_b, lpdf = hit_light_area, e_area, lpdf_area
    if settings.num_caps > 0:
        is_cap = ltype == LIGHT_CAP
        aux = scene.light_aux[li]
        in_cap = jnp.sum(wd * aux[..., :3], axis=-1) >= aux[..., 3]
        got = jnp.where(is_cap, ~res_b["hit"] & in_cap, got)
        e_b = jnp.where(is_cap[..., None], scene.light_emission[li], e_b)
        lpdf = jnp.where(is_cap, L.cap_pdf_value(aux[..., 3]), lpdf)
    got = got & ~is_dirac  # no bsdf strategy toward Dirac lights

    # shadow/visibility for the strategy ray: for a simple scene the
    # closest-hit test above already proves visibility; media/forward
    # scenes need the transmittance along the segment
    if settings.has_media or _has_forward_types(settings):
        seg = jnp.where(res_b["hit"], res_b["t"], INF)
        tr_b = _shadow_transmittance(
            scene, settings, p + wd * EPSILON, wd, seg, ctx["medium"],
            ~is_vol, detach=detach, endcap_prim=endcap)
    else:
        tr_b = jnp.ones((R, 3))

    mis_b = L.power_heuristic(pdf_b, lpdf)
    contrib_b = jnp.where(
        (ok_b & got)[..., None], wt_b * tr_b * e_b * mis_b[..., None], 0.0)

    out = (contrib_l + contrib_b) * sel_weight[..., None]
    rets = (out,)
    if extra_ray is not None:
        rets = rets + (res_extra,)
    if want_tr:
        rets = rets + ((tr, do_shadow),)
    if want_dir:
        # the light-strategy direction + whether a shadow ray was traced
        # and reached the light (feeds RJ technique-swap inversion)
        visible = do_shadow & (jnp.max(tr, axis=-1) > 0.0)
        rets = rets + ((d, visible),)
    # measured NEE ray count: shadow rays actually traced + bsdf-MIS
    # rays actually traced (ref counts every estimateDirect ray; the
    # previous 2-per-shading-vertex estimate overcounted dead/specular
    # vertices)
    nee_rays = (jnp.sum(do_shadow.astype(jnp.int32))
                + jnp.sum(trace_b.astype(jnp.int32)))
    return rets + (nee_rays,)


# ------------------------------------------------------------ hit expand

def _expand_hit(scene, o, d, res):
    """IntersectionInfo expansion: position, normals, uv, prim, bsdf."""
    t = res["t"]
    p = o + d * t[..., None]
    u = res["u"][..., None]
    v = res["v"][..., None]

    if scene.tri_v0.shape[0] > 0:
        tri = jnp.clip(res["tri"], 0, scene.tri_v0.shape[0] - 1)
        # ONE packed gather row [e1, e2, n0, n1, n2, uv0, uv1, uv2]
        # instead of eight table gathers (round-5 glue profile)
        row = scene.tri_shade[tri]
        e1 = row[..., 0:3]
        e2 = row[..., 3:6]
        ng_tri = jnp.cross(e1, e2)
        ng_tri = ng_tri / jnp.maximum(
            jnp.linalg.norm(ng_tri, axis=-1, keepdims=True), 1e-20)
        w = 1.0 - u - v
        ns_tri = row[..., 6:9] * w + row[..., 9:12] * u + row[..., 12:15] * v
        ns_len = jnp.linalg.norm(ns_tri, axis=-1, keepdims=True)
        ns_tri = jnp.where(ns_len > 1e-6, ns_tri / jnp.maximum(ns_len, 1e-20), ng_tri)
        uv_tri = (row[..., 15:17] * w + row[..., 17:19] * u
                  + row[..., 19:21] * v)
        prim_tri = scene.tri_prim[tri]
    else:
        ng_tri = ns_tri = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), p.shape)
        uv_tri = jnp.concatenate([u, v], axis=-1)
        prim_tri = jnp.zeros(t.shape, jnp.int32)

    is_sph = res["sph"] >= 0
    if scene.sph_radius.shape[0] > 0:
        si = jnp.clip(res["sph"], 0, scene.sph_radius.shape[0] - 1)
        c = scene.sph_center[si]
        ng_s = (p - c) / jnp.maximum(scene.sph_radius[si][..., None], 1e-20)
        ng = vm.where3(is_sph, ng_s, ng_tri)
        ns = vm.where3(is_sph, ng_s, ns_tri)
        prim = jnp.where(is_sph, scene.sph_prim[si], prim_tri)
        phi = jnp.arctan2(ng_s[..., 2], ng_s[..., 0]) * vm.INV_TWO_PI + 0.5
        theta = jnp.arccos(jnp.clip(-ng_s[..., 1], -1, 1)) * vm.INV_PI
        uv = jnp.where(is_sph[..., None],
                       jnp.stack([phi, theta], -1), uv_tri)
    else:
        ng, ns, prim, uv = ng_tri, ns_tri, prim_tri, uv_tri

    if getattr(scene, "dsk_r", None) is not None and \
            scene.dsk_r.shape[0] > 0 and "dsk" in res:
        # ref Disk::intersectionInfo (Disk.cpp:113-127): Ng = Ns = n,
        # uv = (atan2 azimuth, radial fraction) in the disk frame
        is_d = res["dsk"] >= 0
        di = jnp.clip(res["dsk"], 0, scene.dsk_r.shape[0] - 1)
        nd = scene.dsk_n[di]
        dv = p - scene.dsk_c[di]
        tan_d, bit_d = vm.ortho_frame(nd)
        x = jnp.sum(dv * bit_d, axis=-1)
        y = jnp.sum(dv * tan_d, axis=-1)
        r_frac = jnp.linalg.norm(dv, axis=-1) / \
            jnp.maximum(scene.dsk_r[di], 1e-20)
        u_d = jnp.arctan2(y, x) * vm.INV_TWO_PI + 0.5
        ng = vm.where3(is_d, nd, ng)
        ns = vm.where3(is_d, nd, ns)
        prim = jnp.where(is_d, scene.dsk_prim[di], prim)
        uv = jnp.where(is_d[..., None],
                       jnp.stack([u_d, r_frac], -1), uv)

    if getattr(scene, "cyl_r", None) is not None and \
            scene.cyl_r.shape[0] > 0 and "cyl" in res:
        # ref Cylinder::intersectionInfo (Cylinder.cpp:123-133): cap
        # hits take the axial normal + planar uv, side hits the radial
        # normal + (azimuth, height) uv — classified from the local hit
        is_y = res["cyl"] >= 0
        yi = jnp.clip(res["cyl"], 0, scene.cyl_r.shape[0] - 1)
        rot = scene.cyl_rot[yi]                       # (R, 3, 3)
        pl = jnp.einsum("ri,rij->rj", p - scene.cyl_pos[yi], rot)
        r_y = jnp.maximum(scene.cyl_r[yi], 1e-20)
        hh = jnp.maximum(scene.cyl_hh[yi], 1e-20)
        px, py, pz = pl[..., 0] / r_y, pl[..., 1], pl[..., 2] / r_y
        # cap iff the hit lies on an end plane (within tolerance) and
        # inside the unit circle; the rim is owned by the side normal
        rr = px * px + pz * pz
        on_cap = (jnp.abs(jnp.abs(py) - hh) < 1e-4 * hh) & (rr < 1.0) & \
            scene.cyl_capped[yi]
        n_side = jnp.stack(
            [px, jnp.zeros_like(px), pz], -1)
        n_side = n_side / jnp.maximum(
            jnp.linalg.norm(n_side, axis=-1, keepdims=True), 1e-20)
        n_cap = jnp.stack([jnp.zeros_like(py),
                           jnp.where(py >= 0, 1.0, -1.0),
                           jnp.zeros_like(py)], -1)
        n_loc = vm.where3(on_cap, n_cap, n_side)
        n_w = jnp.einsum("rij,rj->ri", rot, n_loc)
        u_side = jnp.arctan2(pz, px) * vm.INV_TWO_PI + 0.5
        v_side = py / (2.0 * hh) + 0.5
        uv_y = jnp.where(on_cap[..., None],
                         jnp.stack([px, pz], -1) * 0.5 + 0.5,
                         jnp.stack([u_side, v_side], -1))
        ng = vm.where3(is_y, n_w, ng)
        ns = vm.where3(is_y, n_w, ns)
        prim = jnp.where(is_y, scene.cyl_prim[yi], prim)
        uv = jnp.where(is_y[..., None], uv_y, uv)

    out = dict()
    if scene.crv_seg_p0.shape[0] > 0 and "crv" in res:
        # curve hit expansion (ref Curves::intersectionInfo,
        # Curves.cpp:484-529): evaluate spline tangent at the hit
        # parameter, normal per render mode, frame bitangent = tangent
        from tungsten_tpu.scene.flatten import (
            CURVE_MODE_BCSDF_CYLINDER, CURVE_MODE_RIBBON)
        is_crv = res["crv"] >= 0
        ci = jnp.clip(res["crv"], 0, scene.crv_seg_p0.shape[0] - 1)
        tc = res["u"][..., None]
        p0c = scene.crv_seg_p0[ci][..., :3]
        p1c = scene.crv_seg_p1[ci][..., :3]
        p2c = scene.crv_seg_p2[ci][..., :3]
        # q(t) = a t^2 + b t + c ; q'(t) = 2 a t + b
        ac = 0.5 * p0c - p1c + 0.5 * p2c
        bc = p1c - p0c
        cc = 0.5 * (p0c + p1c)
        point = ac * tc * tc + bc * tc + cc
        tang = 2.0 * ac * tc + bc
        tang = tang / jnp.maximum(
            jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-20)
        mode = scene.crv_seg_mode[ci]
        # cylinder / half_cylinder: radial normal at the hit point
        lp = p - point
        lp = lp - tang * jnp.sum(lp * tang, axis=-1, keepdims=True)
        ng_cyl = lp / jnp.maximum(
            jnp.linalg.norm(lp, axis=-1, keepdims=True), 1e-20)
        # bcsdf_cylinder: normal faces the viewer, orthogonal to tangent
        mw = -d
        nb = mw - tang * jnp.sum(tang * mw, axis=-1, keepdims=True)
        ng_b = nb / jnp.maximum(
            jnp.linalg.norm(nb, axis=-1, keepdims=True), 1e-20)
        ng_c = jnp.where((mode == CURVE_MODE_BCSDF_CYLINDER)[..., None],
                         ng_b, ng_cyl)
        # ribbon: interpolated node normal, orthogonalized to tangent
        n0c = scene.crv_seg_n0[ci]
        n1c = scene.crv_seg_n1[ci]
        n2c = scene.crv_seg_n2[ci]
        anr = 0.5 * n0c - n1c + 0.5 * n2c
        bnr = n1c - n0c
        cnr = 0.5 * (n0c + n1c)
        nr = anr * tc * tc + bnr * tc + cnr
        nr = tang * jnp.sum(tang * nr, axis=-1, keepdims=True) - nr
        nr = nr / jnp.maximum(
            jnp.linalg.norm(nr, axis=-1, keepdims=True), 1e-20)
        ng_c = jnp.where((mode == CURVE_MODE_RIBBON)[..., None], nr, ng_c)

        ng = vm.where3(is_crv, ng_c, ng)
        ns = vm.where3(is_crv, ng_c, ns)
        prim = jnp.where(is_crv, scene.crv_seg_prim[ci], prim)
        uv = jnp.where(is_crv[..., None],
                       jnp.stack([res["u"], res["v"]], axis=-1), uv)
        out["is_curve"] = is_crv
        out["crv_tangent"] = tang

    prim = jnp.clip(prim, 0, scene.prim_bsdf.shape[0] - 1)
    out.update(p=p, ng=ng, ns=ns, uv=uv, prim=prim,
               bsdf=scene.prim_bsdf[prim])
    return out


def shading_frame(settings, info, ns):
    """Tangent frame at a shading point: arbitrary orthonormal frame for
    surfaces, tangent-aligned for curves (ref Curves::tangentSpace —
    bitangent = fiber tangent, so local y = sin(theta) for BCSDFs)."""
    tan, bit = vm.ortho_frame(ns)
    if "is_curve" in info:
        ct = info["crv_tangent"]
        t2 = jnp.cross(ct, ns)
        t2 = t2 / jnp.maximum(
            jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-20)
        tan = vm.where3(info["is_curve"], t2, tan)
        bit = vm.where3(info["is_curve"], ct, bit)
    return tan, bit


# --------------------------------------------------------------- the loop

def _init_state(scene, settings, pixel, sample_idx, seed, detach):
    """Initial wavefront: camera rays, NOT yet traced — the bounce body
    traces each bounce's rays at its top (so the body-start state sort
    covers them; see BODY_SORT)."""
    R = pixel.shape[0]
    from tungsten_tpu.cameras.camera import generate_rays_w
    o, d, cam_w = generate_rays_w(scene, settings, pixel, sample_idx, seed)
    state = dict(
        o=o, d=d,
        throughput=jnp.broadcast_to(cam_w[..., None], (R, 3)) * 1.0,
        emission=jnp.zeros((R, 3)),
        was_specular=jnp.ones((R,), bool),
        alive=cam_w > 0.0,
        bounce=jnp.int32(0),
        rays=jnp.int32(0),  # counted at each body's top trace
        pixel=pixel, sample=sample_idx,
    )
    if settings.has_media:
        state["medium"] = jnp.full((R,), scene.cam_medium, jnp.int32)
        state["med_first"] = jnp.ones((R,), bool)
        state["med_bounce"] = jnp.zeros((R,), jnp.int32)
    if _one_sample_mis(settings):
        # pdf of the bsdf sample that produced the current ray (the
        # one-sample-MIS forward density; primaries are specular-rooted
        # so the value is never read at bounce 0)
        state["pdf_fwd"] = jnp.zeros((R,))
    if settings.track_aovs:
        # output-value tracking (ref PathTracer.cpp:43-44,78-96):
        # recorded once per path at the first non-specular (or
        # terminating) surface vertex; hit distance accumulates across
        # the leading specular chain
        state["aov_recorded"] = jnp.zeros((R,), bool)
        state["aov_dist"] = jnp.zeros((R,))
        state["aov_depth"] = jnp.zeros((R, 2))    # (value, count)
        state["aov_normal"] = jnp.zeros((R, 4))   # (xyz, count)
        state["aov_albedo"] = jnp.zeros((R, 4))   # (rgb, count)
        state["aov_vis"] = jnp.zeros((R, 2))      # (value, count)
    return state


def _make_bounce_body(scene, settings, seed, detach: bool = False):
    """The per-bounce wavefront step, shared by the while_loop forward
    path, the staged-compaction path, and the bounded-depth
    differentiable path.  Ray identity (pixel, sample) travels in the
    state so wavefronts can be compacted between bounces.  With
    detach=True all intersection results are stop-gradient'ed (detached
    sampling — interior derivatives only)."""

    # body-start sort only helps when the Pallas wave path is active
    # (read at trace time, like USE_PALLAS elsewhere); the detached
    # replay path must keep lane identity for its suffix math
    body_sort = BODY_SORT and not detach and bool(_isect.USE_PALLAS) \
        and _isect.SORT_RAYS

    def body(s):
        if body_sort:
            Rs = s["pixel"].shape[0]
            key = _isect.ray_sort_key(scene, s["o"], s["d"], ~s["alive"])
            _, order = jax.lax.sort(
                [key, jnp.arange(Rs, dtype=jnp.int32)], num_keys=1,
                is_stable=True)
            s = _gather_rows(s, order)

        pixel = s["pixel"]
        sample_idx = s["sample"]
        bounce = s["bounce"]
        dim_base = rng.DIMS_CAMERA + bounce * rng.DIMS_PER_BOUNCE
        alive = s["alive"]
        R = pixel.shape[0]

        # ---- this bounce's closest-hit trace (camera ray at bounce 0,
        # the previous body's continuation sample after) ----
        res = bvh_intersect(scene, s["o"], s["d"], 0.0,
                            jnp.where(alive, INF, 0.0),
                            presorted=body_sort)
        if detach:
            res = _detach(res)
        rays_top = jnp.sum(alive.astype(jnp.int32))

        emission = s["emission"]
        throughput = s["throughput"]

        # ---- medium distance sampling (ref HomogeneousMedium) ----
        if settings.has_media:
            med = s["medium"]
            in_med = alive & (med >= 0)
            mi = jnp.clip(med, 0, scene.med_sigma_a.shape[0] - 1)
            sigma_s = scene.med_sigma_s[mi]
            sigma_t = scene.med_sigma_a[mi] + sigma_s
            absorb_only = jnp.max(sigma_s, axis=-1) == 0.0
            tt = scene.med_trans_type[mi]
            tp = scene.med_trans_params[mi]

            u_c, u_d, u_e = rng.random_3d(
                seed, pixel, sample_idx, dim_base + rng.BounceDims.MEDIUM)
            comp = jnp.minimum((u_c * 3).astype(jnp.int32), 2)
            sigma_tc = jnp.take_along_axis(sigma_t, comp[..., None],
                                           axis=-1)[..., 0]
            t_law = TR.sample_distance(tt, tp, s["med_first"], u_d, u_e)
            max_t = jnp.where(res["hit"], res["t"], INF)
            het = any(k != GR.MED_HOMOGENEOUS for k in settings.med_kinds)
            if het:
                # heterogeneous: invert the unit optical depth
                # (ref VoxelMedium/ExponentialMedium::sampleDistance)
                tau_c = t_law / jnp.maximum(sigma_tc, 1e-20)
                t_m, rho, tau_tot = GR.inverse_unit_tau(
                    scene, settings, mi, s["o"], s["d"], max_t, tau_c)
                exited = (t_m >= max_t) | absorb_only
                ut_used = jnp.where(exited, tau_tot, tau_c)
                rho = jnp.where(exited, 1.0, rho)[..., None]
            else:
                t_m = t_law / jnp.maximum(sigma_tc, 1e-20)
                exited = (t_m >= max_t) | absorb_only
                ut_used = jnp.minimum(jnp.where(absorb_only, max_t, t_m),
                                      max_t)
                rho = 1.0
            t_s = jnp.minimum(jnp.where(absorb_only, max_t, t_m), max_t)
            tau = sigma_t * ut_used[..., None]
            sbar = TR.sigma_bar(tt, tp)
            w_exit = TR.eval_tr(tt, tau, tp, s["med_first"],
                                jnp.ones_like(exited))
            p_exit = jnp.mean(
                TR.surface_probability(tt, tau, tp, s["med_first"]), axis=-1)
            tr_med = TR.eval_tr(tt, tau, tp, s["med_first"],
                                jnp.zeros_like(exited))
            w_scat = tr_med * rho * sigma_s * sbar[..., None]
            p_scat = jnp.mean(
                rho * sigma_t * TR.medium_pdf(tt, tau, tp, s["med_first"]),
                axis=-1)
            w = jnp.where(exited[..., None], w_exit, w_scat) / \
                jnp.maximum(jnp.where(exited, p_exit, p_scat), 1e-20)[..., None]
            # absorption-only media skip the MC division (pdf 1, ref :76-82)
            w = jnp.where(absorb_only[..., None],
                          TR.eval_tr(tt, tau, tp, s["med_first"],
                                     jnp.ones_like(exited)), w)
            # volumetric emission at the scatter point (ref
            # PathTracer.cpp:56, VoxelMedium.cpp:142: grid emission *
            # Tr / pdf, credited before the weight multiplies in)
            if het and len(scene.grid_density) > 0:
                p_scatter = s["o"] + s["d"] * t_s[..., None]
                e_med = GR.emission(scene, settings, mi, p_scatter) * \
                    tr_med / jnp.maximum(p_scat, 1e-20)[..., None]
                emission = emission + jnp.where(
                    (in_med & ~exited)[..., None],
                    throughput * e_med, 0.0)
            throughput = jnp.where(in_med[..., None], throughput * w,
                                   throughput)
            # absorption-only + no surface: a homogeneous fog extends to
            # infinity (weight 0, ref HomogeneousMedium early-out); a
            # bounded/falling-off heterogeneous medium still lets the
            # attenuated ray escape to the environment
            died_in_fog = in_med & absorb_only & ~res["hit"]
            if het:
                died_in_fog = died_in_fog & \
                    (scene.med_kind[mi] == GR.MED_HOMOGENEOUS)
            # medium max-bounce cap (ref Medium::_maxBounce)
            over_bounce = in_med & (s["med_bounce"] >
                                    scene.med_max_bounce[mi])
            vol_scatter = in_med & ~exited & ~died_in_fog & ~over_bounce
            alive = alive & ~died_in_fog & ~over_bounce
            med_point = s["o"] + s["d"] * t_s[..., None]
            med_first = jnp.where(in_med & ~absorb_only, False,
                                  s["med_first"])
            med_bounce = s["med_bounce"] + jnp.where(
                in_med & ~absorb_only, 1, 0)
        else:
            vol_scatter = jnp.zeros((R,), bool)
            med_point = s["o"]

        active = alive & res["hit"] & ~vol_scatter
        escaped = alive & ~res["hit"] & ~vol_scatter

        # ---- escaped rays: environment + caps (ref handleInfiniteLights) ----
        one_sample = _one_sample_mis(settings)
        if settings.has_env or settings.num_caps > 0:
            env_ok = escaped & (bounce >= settings.min_bounces)
            if settings.mlt_path_length >= 0:
                # MMLT: this chain only measures length-k paths
                env_ok = env_ok & (bounce + 1 == settings.mlt_path_length)
            guard = (~jnp.bool_(settings.enable_light_sampling)) | \
                s["was_specular"]
            if settings.has_env:
                env_val = L.env_eval(scene, s["d"], active=env_ok)
                if one_sample:
                    # one-sample MIS: a non-specular escape into a
                    # samplable env light is power-heuristic-weighted
                    # against the NEE density (selection pmf x env pdf)
                    eli = jnp.full((R,), scene.env_light_index, jnp.int32)
                    epdf = L.env_pdf(scene, s["d"], active=env_ok) * \
                        _light_select_pmf(scene, settings, s["o"], eli)
                    w_env = jnp.where(
                        guard | (scene.env_light_index < 0), 1.0,
                        L.power_heuristic(s["pdf_fwd"], epdf))
                    emission = emission + jnp.where(
                        env_ok[..., None],
                        throughput * env_val * w_env[..., None], 0.0)
                else:
                    env_guard = guard | (scene.env_light_index < 0)
                    emission = emission + jnp.where(
                        (env_ok & env_guard)[..., None],
                        throughput * env_val, 0.0)
            if settings.num_caps > 0:
                cap_samp, cap_unsamp = L.eval_caps(scene, s["d"])
                emission = emission + jnp.where(
                    env_ok[..., None],
                    throughput * (jnp.where(guard[..., None], cap_samp, 0.0)
                                  + cap_unsamp), 0.0)

        info = _expand_hit(scene, s["o"], s["d"], res)

        # two-sided shading: flip the shading frame toward the ray
        backside = jnp.sum(info["ng"] * s["d"], axis=-1) > 0.0
        flip = backside if settings.two_sided_shading else \
            jnp.zeros_like(backside)
        # transmissive BSDFs handle both hemispheres themselves — never flip
        transmissive = jnp.isin(
            scene.bsdf_type[info["bsdf"]],
            jnp.asarray([bt.DIELECTRIC, bt.ROUGH_DIELECTRIC,
                         bt.DIFFUSE_TRANSMISSION]))
        flip = flip & ~transmissive
        ns = jnp.where(flip[..., None], -info["ns"], info["ns"])
        tan, bit = shading_frame(settings, info, ns)
        wi_local = vm.to_local(tan, bit, ns, -s["d"])

        sp = ShadePoint(scene, info["bsdf"], info["uv"])

        # ---- forward/transparency lobe passthrough (ref handleSurface
        # transparency branch: continue straight, no NEE/emission) ----
        if _has_forward_types(settings):
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

        # ---- continuation: bsdf sample / phase sample / forward ----
        # (computed BEFORE NEE so the continuation ray joins the NEE
        # strategies in one batched traversal; `throughput` stays the
        # at-vertex value for the NEE/emitter terms, the continuation
        # carries thr_next)
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
        new_o = info["p"]
        if _has_forward_types(settings):
            new_d = vm.where3(take_forward, s["d"], new_d)
            wt = jnp.where(take_forward[..., None], fwd_weight, wt)
            ok = jnp.where(take_forward, jnp.max(fwd_weight, axis=-1) > 0, ok)
        if settings.has_media:
            pw, _ = PH.phase_sample(
                scene.med_phase[jnp.clip(s["medium"], 0,
                                         scene.med_phase.shape[0] - 1)],
                scene.med_g[jnp.clip(s["medium"], 0,
                                     scene.med_g.shape[0] - 1)],
                s["d"], u1, u2)
            new_d = vm.where3(vol_scatter, pw, new_d)
            new_o = vm.where3(vol_scatter, med_point, new_o)
            ok = jnp.where(vol_scatter, True, ok)
            wt = jnp.where(vol_scatter[..., None], 1.0, wt)

        thr_next = jnp.where(((active | vol_scatter) & ok)[..., None],
                             throughput * wt, throughput)
        was_specular = jnp.where(shade & ok, (flags & FLAG_SPECULAR) != 0,
                                 s["was_specular"])
        if settings.has_media:
            # ref handleVolume: wasSpecular = !enableVolumeLightSampling
            was_specular = jnp.where(
                vol_scatter,
                ~jnp.bool_(settings.enable_volume_light_sampling),
                was_specular)
        alive2 = (active | vol_scatter) & ok

        # ---- medium handoff at the surface (ref handleSurface tail) ----
        if settings.has_media:
            geo_back = jnp.sum(new_d * info["ng"], axis=-1) < 0.0
            new_med = _select_medium(scene, info["prim"], s["medium"],
                                     geo_back)
            medium = jnp.where(active & ok, new_med, s["medium"])
            # state.reset() on surface scatter
            med_first = jnp.where(active & ok, True, med_first)
            med_bounce = jnp.where(active & ok, 0, med_bounce)

        # ---- russian roulette (ref PathTracer.cpp:111-117) ----
        r_pdf = jnp.max(jnp.abs(thr_next), axis=-1)
        do_rr = alive2 & (bounce > 2) & (r_pdf < 0.1)
        u_rr = rng.random_1d(seed, pixel, sample_idx,
                             dim_base + rng.BounceDims.ROULETTE)
        survive = u_rr < r_pdf
        thr_next = jnp.where((do_rr & survive)[..., None],
                             thr_next / jnp.maximum(r_pdf, 1e-20)[..., None],
                             thr_next)
        alive2 = alive2 & (~do_rr | survive)
        alive2 = alive2 & (jnp.max(thr_next, axis=-1) > 0.0)

        o2 = vm.where3(alive2, new_o + new_d * EPSILON, s["o"])
        d2 = vm.where3(alive2, new_d, s["d"])

        # ---- NEE (surface + medium vertices together); the
        # continuation ray is traced at the NEXT body's top, not here ----
        nee_ray_count = jnp.int32(0)
        if settings.enable_light_sampling and settings.num_lights > 0:
            do_nee = (shade | vol_scatter) & \
                (bounce < settings.max_bounces - 1)
            if settings.mlt_path_length >= 0:
                do_nee = do_nee & (bounce + 2 == settings.mlt_path_length)
            ctx = dict(
                p=jnp.where(vol_scatter[..., None], med_point, info["p"])
                if settings.has_media else info["p"],
                is_volume=vol_scatter,
                sp=sp, frame=(tan, bit, ns), wi_local=wi_local,
                ray_d=s["d"],
                medium=s.get("medium", None) if settings.has_media else None,
                gate=do_nee,
                presorted=body_sort,
            )
            if settings.has_media:
                mi2 = jnp.clip(s["medium"], 0, scene.med_phase.shape[0] - 1)
                ctx["phase_type"] = scene.med_phase[mi2]
                ctx["phase_g"] = scene.med_g[mi2]
            want_dir = "rj_dims" in s
            rets = _nee(scene, settings, ctx, seed, pixel, sample_idx,
                        dim_base, detach=detach,
                        want_tr=settings.track_aovs, want_dir=want_dir)
            rets = list(rets)
            nee = rets[0]
            nee_ray_count = rets[-1]
            k = 1
            if settings.track_aovs:
                tr_nee, tr_valid = rets[k]
                k += 1
            if want_dir:
                nee_dir, nee_dir_ok = rets[k]
            emission = emission + jnp.where(
                do_nee[..., None], nee * throughput, 0.0)

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
        e_tex = scene.tex_const[jnp.clip(etex, 0, scene.tex_const.shape[0] - 1)]
        e_hit = jnp.where(samplable[..., None], e_val, e_tex)
        if one_sample:
            # one-sample MIS (see _one_sample_mis): non-specular hits
            # on samplable area lights count with the power-heuristic
            # weight vs the NEE density toward this hit; guard cases
            # (specular / unsamplable / light sampling off) keep full
            # credit exactly as the reference's emitter-hit guard
            lpdf = L.area_light_direct_pdf(
                scene, li, res["t"], s["d"], info["ng"], p=s["o"],
                has_sphere_lights=settings.has_sphere_lights) * \
                _light_select_pmf(scene, settings, s["o"], li)
            w_emit = jnp.where(guard, 1.0,
                               L.power_heuristic(s["pdf_fwd"], lpdf))
            take_emit = shade & is_emissive & front & \
                (bounce >= settings.min_bounces)
            emission = emission + jnp.where(
                take_emit[..., None],
                throughput * e_hit * w_emit[..., None], 0.0)
        else:
            take_emit = shade & is_emissive & front & \
                (bounce >= settings.min_bounces) & guard
            if settings.mlt_path_length >= 0:
                take_emit = take_emit & \
                    (bounce + 1 == settings.mlt_path_length)
            emission = emission + jnp.where(
                take_emit[..., None], throughput * e_hit, 0.0)

        # ---- output-value capture (ref PathTracer.cpp:78-96,133-140):
        # depth/normal/albedo/visibility at the first non-specular or
        # terminating surface vertex; escapes record normal/env-albedo ----
        if settings.track_aovs:
            aov_dist = s["aov_dist"] + jnp.where(active, res["t"], 0.0)
            terminate = active & ~ok
            rec = shade & ~s["aov_recorded"] & (~was_specular | terminate)
            esc = escaped & ~s["aov_recorded"]
            one = jnp.ones((R,))

            def add(buf, val, cnt_mask):
                c = cnt_mask.astype(jnp.float32)
                if val.ndim == 1:
                    val = val[..., None]
                return buf + jnp.concatenate(
                    [val * c[..., None], c[..., None]], axis=-1) * 1.0

            aov_depth = add(s["aov_depth"], aov_dist, rec)
            # escaped primaries record depth 0 (PathTracer.cpp:134-135)
            aov_depth = add(aov_depth, jnp.zeros((R,)),
                            esc & (bounce == 0))
            aov_normal = add(s["aov_normal"], info["ns"], rec)
            aov_normal = add(aov_normal, -s["d"], esc)
            alb = sp.albedo + jnp.where(is_emissive[..., None], e_hit, 0.0)
            aov_albedo = add(s["aov_albedo"], alb, rec)
            if settings.has_env:
                aov_albedo = add(aov_albedo,
                                 L.env_eval(scene, s["d"], active=esc), esc)
            if settings.enable_light_sampling and settings.num_lights > 0:
                vis_ok = rec & tr_valid
                aov_vis = add(s["aov_vis"], jnp.mean(tr_nee, axis=-1),
                              vis_ok)
            else:
                aov_vis = s["aov_vis"]
            aov_recorded = s["aov_recorded"] | rec | esc
            del one

        # ---- RJ technique-exchange inversion (ref ReversibleJumpMlt-
        # Tracer.cpp:128-196, LightPath::invert): at the chain's chosen
        # bounce, invert BOTH techniques' coordinates so the MLT
        # proposal can EXCHANGE them —
        #   forward: the NEE connection direction -> the CONTINUATION
        #     sampler's primary-sample coordinates (Bsdf::invert);
        #   reverse: the continuation ray's area-light hit -> the NEE
        #     sampler's coordinates (invert_choose_light +
        #     invert_area_light_point, the Primitive::invertPosition
        #     machinery).
        # Applying both at once makes the swap self-inverse (see
        # integrators/mlt.py), matching the reference's auto-reject-on-
        # failed-inversion acceptance. ----
        if "rj_dims" in s:
            from tungsten_tpu.bsdf.invert import bsdf_invert
            from tungsten_tpu.integrators.invert_path import (
                invert_area_light_point, invert_choose_light)
            from tungsten_tpu.scene.flatten import LIGHT_AREA
            at_b = shade & (bounce == s["rj_b"])
            if settings.enable_light_sampling and settings.num_lights > 0:
                wo_l = vm.to_local(tan, bit, ns, nee_dir)
                mu = jnp.stack(rng.untracked_4d(
                    seed ^ jnp.uint32(0x52A11CE), pixel, sample_idx,
                    dim_base), axis=-1)
                inv = bsdf_invert(sp, wi_local, wo_l,
                                  settings.present_bsdf_types, mu)
                take = at_b & nee_dir_ok & inv["valid"]
                new_dims = jnp.stack([inv["lobe"], inv["u1"],
                                      inv["u2"], inv["lobe2"]], axis=-1)
                rj_dims = jnp.where(take[..., None], new_dims,
                                    s["rj_dims"])
                rj_valid = s["rj_valid"] | take

                # reverse side: did bounce rj_b's CONTINUATION ray hit
                # the front face of a samplable area light?  With the
                # trace-at-top body that ray is exactly THIS body's top
                # trace (`res`), checked when bounce == rj_b + 1; the
                # rj_b shading point travels in s["rj_pp"].  The rj_b
                # body's RNG dims key the inversion jitter so forward
                # and reverse use the same stream position.
                at_rev = s["alive"] & (bounce == s["rj_b"] + 1)
                dim_prev = rng.DIMS_CAMERA + \
                    (bounce - 1) * rng.DIMS_PER_BOUNCE
                hit_prim2 = _hit_prim(scene, res)
                li_hit = scene.prim_light[hit_prim2]
                li_c = jnp.clip(li_hit, 0,
                                max(scene.light_type.shape[0] - 1, 0))
                ng_hit = _hit_ng(scene, res)
                front2 = jnp.sum(s["d"] * ng_hit, axis=-1) < 0.0
                is_area_hit = res["hit"] & (li_hit >= 0) & \
                    (scene.light_type[li_c] == LIGHT_AREA) & front2 & \
                    (res["tri"] >= 0)
                mu2 = jnp.stack(rng.untracked_4d(
                    seed ^ jnp.uint32(0x2E5),
                    pixel, sample_idx, dim_prev), axis=-1)
                u_tri, lu1, lu2, ok_pos = invert_area_light_point(
                    scene, li_c, jnp.clip(res["tri"], 0,
                                          scene.lt_slot.shape[0] - 1),
                    res["u"], res["v"], mu2[:, 0])
                u_sel, ok_sel = invert_choose_light(
                    scene, settings, s["rj_pp"], li_hit, mu2[:, 1])
                take_r = at_rev & is_area_hit & ok_pos & ok_sel
                nee_dims = jnp.stack([u_sel, lu1, lu2, u_tri], axis=-1)
                rj_nee = jnp.where(take_r[..., None], nee_dims,
                                   s["rj_nee"])
                rj_rev_valid = s["rj_rev_valid"] | take_r
                rj_pp = vm.where3(at_b, info["p"], s["rj_pp"])
            else:
                rj_dims, rj_valid = s["rj_dims"], s["rj_valid"]
                rj_nee = s["rj_nee"]
                rj_rev_valid = s["rj_rev_valid"]
                rj_pp = s["rj_pp"]

        throughput = thr_next

        # ray accounting: this body's top closest-hit trace + measured
        # NEE rays (shadow + bsdf-MIS actually traced, from _nee)
        rays = s["rays"] + rays_top + nee_ray_count

        out = dict(
            o=o2, d=d2,
            throughput=throughput,
            emission=emission,
            was_specular=was_specular,
            alive=alive2,
            bounce=bounce + 1,
            rays=rays,
            pixel=pixel, sample=sample_idx,
        )
        if settings.has_media:
            out["medium"] = medium
            out["med_first"] = med_first
            out["med_bounce"] = med_bounce
        if one_sample:
            out["pdf_fwd"] = jnp.where(shade & ok, pdf, s["pdf_fwd"])
        if settings.track_aovs:
            out["aov_recorded"] = aov_recorded
            out["aov_dist"] = aov_dist
            out["aov_depth"] = aov_depth
            out["aov_normal"] = aov_normal
            out["aov_albedo"] = aov_albedo
            out["aov_vis"] = aov_vis
        if "rj_dims" in s:
            out["rj_b"] = s["rj_b"]
            out["rj_dims"] = rj_dims
            out["rj_valid"] = rj_valid
            out["rj_nee"] = rj_nee
            out["rj_rev_valid"] = rj_rev_valid
            out["rj_pp"] = rj_pp
        return out

    return body


def trace_wave(scene, settings, pixel, sample_idx, seed, with_stats=False):
    """Trace one radiance sample per entry; pixel/sample_idx (R,) int32.
    Returns radiance (R,3), or (radiance, rays_traced) with stats."""
    state = _init_state(scene, settings, pixel, sample_idx, seed, False)
    body = _make_bounce_body(scene, settings, seed)

    def cond(s):
        return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

    final = jax.lax.while_loop(cond, body, state)
    # Escapes are credited at the top of the body; rays whose final
    # intersect happened at bounce == max_bounces fall outside the
    # reference's `bounce < maxBounces` env guard, so nothing to add here.
    if with_stats:
        return final["emission"], final["rays"]
    return final["emission"]


def trace_wave_rj(scene, settings, pixel, sample_idx, seed, rj_b):
    """Trace one sample per entry while recording, at per-ray bounce
    rj_b, BOTH technique inversions (see the rj block in
    _make_bounce_body): the continuation-sampler coordinates that aim
    the bounce's BSDF sample at the NEE-chosen light direction, and the
    NEE-sampler coordinates that reproduce the continuation ray's
    area-light hit.  Returns (radiance, rj_dims (R,4), rj_valid (R,),
    rj_nee (R,4), rj_rev_valid (R,)) — the raw material for the
    reversible-jump technique-EXCHANGE proposal."""
    state = _init_state(scene, settings, pixel, sample_idx, seed, False)
    R = pixel.shape[0]
    state["rj_b"] = jnp.broadcast_to(jnp.asarray(rj_b, jnp.int32), (R,))
    state["rj_dims"] = jnp.zeros((R, 4))
    state["rj_valid"] = jnp.zeros((R,), bool)
    state["rj_nee"] = jnp.zeros((R, 4))
    state["rj_rev_valid"] = jnp.zeros((R,), bool)
    state["rj_pp"] = jnp.zeros((R, 3))
    body = _make_bounce_body(scene, settings, seed)

    def cond(s):
        return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

    final = jax.lax.while_loop(cond, body, state)
    return (final["emission"], final["rj_dims"], final["rj_valid"],
            final["rj_nee"], final["rj_rev_valid"])


def trace_wave_aovs(scene, settings, pixel, sample_idx, seed):
    """Trace one sample per entry with output-value tracking.  Returns
    (radiance (R,3), aovs) where aovs maps depth/normal/albedo/
    visibility to (value, count) arrays — count is 0 or 1 per sample,
    mirroring the reference's per-AOV OutputBuffer::addSample counting
    (OutputBuffer.hpp:88-130: AOVs average over the samples that
    recorded them, not over spp)."""
    from dataclasses import replace as _replace
    settings = _replace(settings, track_aovs=True)
    state = _init_state(scene, settings, pixel, sample_idx, seed, False)
    body = _make_bounce_body(scene, settings, seed)

    def cond(s):
        return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

    final = jax.lax.while_loop(cond, body, state)
    aovs = dict(depth=final["aov_depth"], normal=final["aov_normal"],
                albedo=final["aov_albedo"], visibility=final["aov_vis"])
    return final["emission"], aovs


def _zero_cotangent(x):
    """Zero cotangent for a leaf: float0 for non-inexact dtypes."""
    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros_like(x)
    import numpy as _np
    return _np.zeros(jnp.shape(x), jax.dtypes.float0)


def _cot_add(a, b):
    if isinstance(a, jnp.ndarray) or hasattr(a, "dtype"):
        if a.dtype == jax.dtypes.float0:
            return a
    return a + b


_REPLAY_CACHE = {}


def _replay_tracer(settings):
    """Path-replay backprop (BASELINE north star; Vicini et al. 2021
    style, detached-sampling variant).  Forward saves NOTHING per
    bounce; backward re-traces the identical path — the
    (pixel, sample, bounce, dim)-keyed counter RNG (utils/rng.py)
    reproduces every decision bit-exactly — and accumulates per-bounce
    VJPs with O(1) memory in path length:

        L = e_0 + w_0 (e_1 + w_1 (e_2 + ...)),  all decisions detached
        dL = sum_b T_b (de_b + dw_b . S_{b+1}),
        S_{b+1} = (L - prefix_{b+1}) / T_{b+1}   (suffix radiance)

    In state terms: the bounce body maps a DETACHED state to cumulative
    (emission', throughput') = (prefix + T_b e_b(theta),
    T_b w_b(theta)), so passing cotangents (g, g * S_{b+1}) to one
    bounce's VJP yields exactly the two summands.  Replaces the round-1
    whole-wavefront reverse-AD tape (which OOM'd past ~3 bounces)."""
    if settings in _REPLAY_CACHE:
        return _REPLAY_CACHE[settings]

    @jax.custom_vjp
    def trace(scene, pixel, sample_idx, seed):
        state = _init_state(scene, settings, pixel, sample_idx, seed, True)
        body = _make_bounce_body(scene, settings, seed, detach=True)

        def cond(s):
            return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

        return jax.lax.while_loop(cond, body, state)["emission"]

    def fwd(scene, pixel, sample_idx, seed):
        L = trace(scene, pixel, sample_idx, seed)
        return L, (scene, pixel, sample_idx, seed, L)

    def bwd(res, g):
        scene, pixel, sample_idx, seed, L = res
        sc_det = jax.lax.stop_gradient(scene)
        state0 = _init_state(sc_det, settings, pixel, sample_idx, seed,
                             True)
        grads0 = jax.tree.map(_zero_cotangent, scene)

        def body_grad(carry):
            state, grads = carry
            state_det = jax.lax.stop_gradient(state)

            def f_local(sc):
                out = _make_bounce_body(sc, settings, seed,
                                        detach=True)(state_det)
                return out

            out, vjp_fn = jax.vjp(f_local, scene)
            thr = out["throughput"]
            suffix = jnp.where(jnp.abs(thr) > 1e-12,
                               (L - out["emission"]) /
                               jnp.where(jnp.abs(thr) > 1e-12, thr, 1.0),
                               0.0)
            cot = {k: _zero_cotangent(v) for k, v in out.items()}
            cot["emission"] = g
            cot["throughput"] = g * suffix
            (g_scene,) = vjp_fn(cot)
            grads = jax.tree.map(_cot_add, grads, g_scene)
            return jax.lax.stop_gradient(out), grads

        def cond(carry):
            s = carry[0]
            return (s["bounce"] < settings.max_bounces) & \
                jnp.any(s["alive"])

        _, grads = jax.lax.while_loop(cond, body_grad, (state0, grads0))
        return (grads, _zero_cotangent(pixel),
                _zero_cotangent(sample_idx), _zero_cotangent(seed))

    trace.defvjp(fwd, bwd)
    _REPLAY_CACHE[settings] = trace
    return trace


def trace_wave_replay(scene, settings, pixel, sample_idx, seed):
    """Differentiable radiance estimate via path-replay backprop: flat
    memory in bounce count, full `max_bounces` depth (see
    _replay_tracer).  Gradients flow through the shading chain
    (albedo/emission/roughness/ior/textures); sampling decisions and
    intersections are detached (interior derivatives only)."""
    return _replay_tracer(settings)(scene, pixel, sample_idx, seed)


# Backward-compatible name: round 1's taped reverse-AD implementation
# is superseded by the replay tracer.
trace_wave_diff = trace_wave_replay


# ------------------------------------------------ staged wavefront API
#
# The reference amortizes dead paths by per-tile work queues
# (PathTraceIntegrator.cpp tile scheduler); the TPU equivalent is
# wavefront compaction: run a few bounces at full width, then gather the
# surviving rays into a narrower wavefront so late bounces don't pay
# full-width shading.  Host drives the width schedule (render.py).

def init_wave(scene, settings, pixel, sample_idx, seed):
    """Initial wavefront state (camera rays, traced by the first
    bounce body — see _init_state)."""
    return _init_state(scene, settings, pixel, sample_idx, seed, False)


def run_bounces(scene, settings, seed, state, bounce_end):
    """Advance the wavefront until bounce_end (or extinction)."""
    body = _make_bounce_body(scene, settings, seed)
    end = jnp.minimum(jnp.int32(bounce_end), settings.max_bounces)

    def cond(s):
        return (s["bounce"] < end) & jnp.any(s["alive"])

    return jax.lax.while_loop(cond, body, state)


def bank_emission(state, n_total):
    """Scatter every ray's accumulated radiance into an (n_total, 3)
    framebuffer by pixel id (padded rays with pixel >= n_total are
    dropped).  NaN guard as in ref PathTracer.cpp:119-122."""
    pix = jnp.clip(state["pixel"].astype(jnp.int32), 0, n_total - 1)
    em = state["emission"]
    em = jnp.where(jnp.isfinite(em), em, 0.0)
    em = jnp.where((state["pixel"] < n_total)[..., None], em, 0.0)
    return jnp.zeros((n_total, 3)).at[pix].add(em)


def _gather_rows(state, idx):
    """Apply a row permutation/slice `idx` to every leading-R state
    field with ONE packed row gather.

    The ~20 per-ray state fields are PACKED into one (r, F) f32 matrix
    (ints/bools bitcast) and moved with a SINGLE row gather: round-5
    profiling measured the per-field gather form at 146 ms per
    1M-wide stage (large-table random gathers ~3-6 ms EACH at these
    row counts, and the telescoping width schedule runs many stages)
    vs ~0.6 ms for one wide row gather of the same bytes."""
    r = state["alive"].shape[0]
    new_r = idx.shape[0]
    cols = []
    specs = []          # (key, trailing_shape, kind, width)
    passthru = {}
    for k, v in state.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == r:
            flat = v.reshape(r, -1)
            if flat.dtype == jnp.bool_:
                kind = "bool"
                flat = flat.astype(jnp.int32)
            elif jnp.issubdtype(flat.dtype, jnp.integer):
                kind = str(flat.dtype)
            else:
                kind = "f32"
            if kind != "f32":
                flat = jax.lax.bitcast_convert_type(
                    flat.astype(jnp.int32) if kind == "bool" else flat,
                    jnp.float32)
            specs.append((k, v.shape[1:], kind, flat.shape[1]))
            cols.append(flat)
        else:
            passthru[k] = v
    packed = jnp.concatenate(cols, axis=1)
    rows = packed[idx]                      # ONE gather

    out = dict(passthru)
    off = 0
    for k, tshape, kind, w in specs:
        part = rows[:, off:off + w]
        off += w
        if kind == "bool":
            part = jax.lax.bitcast_convert_type(part, jnp.int32) != 0
        elif kind != "f32":
            part = jax.lax.bitcast_convert_type(
                part, jnp.int32).astype(kind)
        out[k] = part.reshape((new_r,) + tshape)
    return out


def compact_wave(state, new_r: int):
    """Gather alive rays to the front and slice to new_r rows; zeroes
    the emission accumulator (bank_emission must be called first)."""
    order = jnp.argsort(jnp.where(state["alive"], 0, 1).astype(jnp.int32),
                        stable=True)
    out = _gather_rows(state, order[:new_r])
    out["emission"] = jnp.zeros((new_r, 3))
    # compacted-away padding must not resurrect
    out["alive"] = out["alive"] & (jnp.arange(new_r) < jnp.sum(state["alive"]))
    return out


def trace_wave_staged(scene, settings, pixel, sample_idx, seed,
                      n_total: int, min_wave: int = 4096, step: int = 2):
    """The ENTIRE width-staged bounce schedule as ONE device program:
    primary trace, then a static chain of narrowing stages — each stage
    runs the bounce body at a fixed wavefront width until the survivors
    fit the next width (a device-side while_loop condition), banks every
    ray's radiance into the framebuffer, and compacts on-device.

    This replaces the round-3/4 host-driven schedule whose per-bounce
    `int(jnp.sum(alive))` sync + re-dispatch cost ~2x the actual
    traversal on this remote-TPU backend (each host round trip pays the
    ~25 ms axon dispatch floor; a 64-bounce materialtest render made
    ~60 of them).  Fused, the host submits ONE program per (chunk, spp
    batch) and syncs once at the end.

    Returns ((n_total, 3) framebuffer sum, rays traced)."""
    R = pixel.shape[0]
    body = _make_bounce_body(scene, settings, seed)
    state = _init_state(scene, settings, pixel, sample_idx, seed, False)
    fb = jnp.zeros((n_total, 3))

    w = R
    while w // step >= min_wave:
        nxt = w // step

        def cond(s, nxt=nxt):
            return (s["bounce"] < settings.max_bounces) & \
                (jnp.sum(s["alive"].astype(jnp.int32)) > nxt)

        state = jax.lax.while_loop(cond, body, state)
        fb = fb + bank_emission(state, n_total)
        state = compact_wave(state, nxt)
        w = nxt

    def cond_tail(s):
        return (s["bounce"] < settings.max_bounces) & jnp.any(s["alive"])

    state = jax.lax.while_loop(cond_tail, body, state)
    fb = fb + bank_emission(state, n_total)
    return fb, state["rays"]
