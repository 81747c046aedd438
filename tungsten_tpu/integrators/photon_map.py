"""Photon mapping + progressive photon mapping, TPU-native.

Re-design of ref src/core/integrators/photon_map/ +
progressive_photon_map/ (PhotonTracer.cpp, PhotonMapIntegrator.cpp,
ProgressivePhotonMapIntegrator.cpp):

  * photon pass: a wavefront of light subpaths (PhotonTracer::
    tracePhotonPath, :422-554) depositing a photon {pos, incoming dir,
    power * |Ns.d / Ng.d|, bounce} at every non-pure-specular surface
    hit; photon powers are normalized by the number of EMITTED paths
    (PhotonMapIntegrator.cpp:134 `scale = 1/totalTraced`).
  * acceleration: instead of the reference's KdTree kNN, photons are
    sorted by hash-grid cell id (cell size = gather radius) on device;
    queries scan the 3x3x3 neighborhood via searchsorted ranges and
    select the k nearest by top_k -- the kNN-with-max-radius query of
    KdTree::nearestNeighbours, with a static per-cell candidate cap
    (densely packed cells beyond the cap are truncated; the k-radius
    shrink makes this matter less exactly where cells are dense).
  * camera pass (PhotonTracer::traceSensorPath, :246-420): walk through
    pure-specular bounces and forward transparency only; at the first
    other surface, credit emission and estimate radiance as
    sum_k power_k * f(wi, -dir_k)/|cos(wo_k)| * INV_PI / radiusSq with
    radiusSq = dist_k if k neighbours found else r^2, guarded by the
    full-path bounce window (fullPathBounce = bounce + p.bounce - 1 in
    [min_bounces, max_bounces)).
  * PPM: per spp-round iteration i, retrace photons (seed offset by
    iteration) and gather at surfaceRadius = r0 * sqrt(gamma_i),
    gamma_i = prod_{k=1..i} (k+alpha)/(k+1)
    (ProgressivePhotonMapIntegrator.cpp:58-72).

Round-1 scope: surface photons only (volume photon maps -- points/
beams/planes -- are follow-up; the water-caustic fixture has no media).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.bsdf.eval import (
    FLAG_SPECULAR, FLAG_VALID, ShadePoint, bsdf_eval, bsdf_forward,
    bsdf_sample)
from tungsten_tpu.cameras.camera import generate_rays
from tungsten_tpu.integrators.bdpt import _sample_light_root
from tungsten_tpu.integrators.path_tracer import (
    EPSILON, INF, _expand_hit, _has_forward_types, _medium_tr,
    _select_medium, shading_frame)
from tungsten_tpu.integrators import lights as L
from tungsten_tpu.media import grid as GR
from tungsten_tpu.media import phase as PH
from tungsten_tpu.media import transmittance as TR
from tungsten_tpu.ops.intersect import bvh_intersect, occluded
from tungsten_tpu.utils import rng
from tungsten_tpu.utils import vecmath as vm

PHOTON_DIM_OFFSET = 8192   # RNG dim family for photon walks
CELL_CAP = 48              # candidate photons scanned per grid cell
GRID_RES = 1024            # max cells per axis (key fits int32)

# BSDF types whose every lobe is specular: the camera walk passes
# through these (ref requestedLobe = SpecularLobe succeeds) and photons
# are NOT deposited on them (ref !lobes().isPureSpecular()).
PURE_SPECULAR_TYPES = (bt.MIRROR, bt.DIELECTRIC, bt.CONDUCTOR)


def _is_pure_specular(scene, settings, bsdf_idx):
    t = scene.bsdf_type[bsdf_idx]
    out = jnp.zeros(bsdf_idx.shape, bool)
    for ty in PURE_SPECULAR_TYPES:
        if ty in settings.present_bsdf_types:
            out = out | (t == ty)
    return out


# ------------------------------------------------------------ photon pass

@functools.partial(jax.jit, static_argnames=("settings", "n_paths"))
def trace_photons(scene, settings, n_paths: int, seed, path_offset):
    """Trace n_paths light subpaths, depositing surface photons.
    Returns dict of (n_paths * B,) arrays (B = max_bounces - 1 deposit
    slots): pos (N,3), dir (N,3) incoming, power (N,3) (NOT yet
    normalized by path count), bounce (N,), valid (N,); plus scalar
    "rays" = MEASURED rays traced (alive walks per bounce, not the
    n_paths * B upper bound)."""
    R = n_paths
    B = max(settings.max_bounces - 1, 1)
    pixel = jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(path_offset)
    sample = jnp.zeros((R,), jnp.uint32)

    root = _sample_light_root(scene, settings, R, seed, pixel, sample)
    # photon throughput leaving the light: Le * pi * area * numLights
    # (cosine-sampled emission, ref tracePhotonPath throughput)
    thr0 = root["alpha_walk"]

    out = dict(
        pos=jnp.zeros((R, B, 3)), dir=jnp.zeros((R, B, 3)),
        power=jnp.zeros((R, B, 3)), bounce=jnp.zeros((R, B), jnp.int32),
        valid=jnp.zeros((R, B), bool),
        vol=jnp.zeros((R, B), bool),
        # photon BEAMS (ref PhotonBeam, Photon.hpp:74-83): one per
        # medium segment of the walk; power is the INCIDENT power at
        # the segment start — the 1D gather applies Tr along the beam
        # analytically (full-segment beams, vs the reference's
        # stochastic sampled-length formulation)
        b_o=jnp.zeros((R, B, 3)), b_d=jnp.zeros((R, B, 3)),
        b_len=jnp.zeros((R, B)), b_pow=jnp.zeros((R, B, 3)),
        b_valid=jnp.zeros((R, B), bool),
    )
    planes_mode = settings.vol_photon_type == "planes"
    if planes_mode:
        # photon PLANES (ref PhotonPlane0D, Photon.hpp:83-100;
        # precomputePlane0D, PhotonMapIntegrator.cpp:151-162): the 2D
        # volume estimator — a parallelogram spanned by the segment
        # INTO a volume scatter vertex (p0 -> p1) and the UNCLAMPED
        # sampled length l1 along the direction OUT of it (d1).  Power
        # = |p1-p0| * l1 * (continued throughput at the far vertex) —
        # the two lengths cancel the distance-sampling pdfs so the
        # camera-side 0D estimate divides only by the plane Jacobian.
        out.update(
            pl_p0=jnp.zeros((R, B, 3)), pl_p1=jnp.zeros((R, B, 3)),
            pl_d1=jnp.zeros((R, B, 3)), pl_l1=jnp.zeros((R, B)),
            pl_pow=jnp.zeros((R, B, 3)),
            pl_valid=jnp.zeros((R, B), bool),
        )

    def body(i, carry):
        if planes_mode:
            (out, o, d, thr, alive, med, med_first, nrays,
             pp0, pp1, plen0, pact) = carry
        else:
            out, o, d, thr, alive, med, med_first, nrays = carry
        nrays = nrays + jnp.sum(alive.astype(jnp.int32))
        dims = PHOTON_DIM_OFFSET + 16 + i * rng.DIMS_PER_BOUNCE
        res = bvh_intersect(scene, o, d, 0.0, jnp.where(alive, INF, 0.0))
        hit = res["hit"] & alive

        # ---- medium flight: may scatter before the surface, depositing
        # a VOLUME photon (ref PhotonTracer::tracePhotonPath volume
        # deposit; PhotonMapIntegrator.hpp:36-71 volume maps) ----
        vol_scatter = jnp.zeros((R,), bool)
        vol_point = o
        vol_power = thr
        seg_pow = thr          # incident power at the segment start
        if settings.has_media:
            in_med = alive & (med >= 0)
            mi = jnp.clip(med, 0, scene.med_sigma_a.shape[0] - 1)
            sigma_s = scene.med_sigma_s[mi]
            sigma_t = scene.med_sigma_a[mi] + sigma_s
            absorb_only = jnp.max(sigma_s, axis=-1) == 0.0
            tt = scene.med_trans_type[mi]
            tp = scene.med_trans_params[mi]
            u_c, u_d, u_e = rng.random_3d(seed, pixel, sample,
                                          dims + rng.BounceDims.MEDIUM)
            comp = jnp.minimum((u_c * 3).astype(jnp.int32), 2)
            sigma_tc = jnp.take_along_axis(sigma_t, comp[..., None],
                                           axis=-1)[..., 0]
            t_law = TR.sample_distance(tt, tp, med_first, u_d, u_e)
            max_t = jnp.where(hit, res["t"], INF)
            het = any(k != GR.MED_HOMOGENEOUS for k in settings.med_kinds)
            if het:
                tau_c = t_law / jnp.maximum(sigma_tc, 1e-20)
                t_m, rho, tau_tot = GR.inverse_unit_tau(
                    scene, settings, mi, o, d, max_t, tau_c)
                exited = (t_m >= max_t) | absorb_only
                ut_used = jnp.where(exited, tau_tot, tau_c)
                rho = jnp.where(exited, 1.0, rho)[..., None]
            else:
                t_m = t_law / jnp.maximum(sigma_tc, 1e-20)
                exited = (t_m >= max_t) | absorb_only
                ut_used = jnp.minimum(
                    jnp.where(absorb_only, max_t, t_m), max_t)
                rho = 1.0
            t_s = jnp.minimum(jnp.where(absorb_only, max_t, t_m), max_t)
            tau = sigma_t * ut_used[..., None]
            sbar = TR.sigma_bar(tt, tp)
            w_exit = TR.eval_tr(tt, tau, tp, med_first,
                                jnp.ones_like(exited))
            p_exit = jnp.mean(
                TR.surface_probability(tt, tau, tp, med_first), axis=-1)
            tr_med = TR.eval_tr(tt, tau, tp, med_first,
                                jnp.zeros_like(exited))
            p_scat = jnp.mean(
                rho * sigma_t * TR.medium_pdf(tt, tau, tp, med_first),
                axis=-1)
            # deposit weight INCLUDES sigma_s: the volume photon
            # represents a physical scattering event, whose density per
            # unit length is sigma_s * Tr — the camera-march gather
            # (Jensen's volume radiance estimate) then needs no sigma
            # factor at all.  (Round-2 shipped this without sigma_s,
            # claiming it "cancels"; the fog-glow fixture measured the
            # resulting 1/sigma_s = 4x over-brightness.)
            w_vol = tr_med * rho * sigma_s * sbar[..., None] / \
                jnp.maximum(p_scat, 1e-20)[..., None]
            w_scat = w_vol
            w = jnp.where(exited[..., None],
                          w_exit / jnp.maximum(p_exit, 1e-20)[..., None],
                          w_scat)
            w = jnp.where(absorb_only[..., None], w_exit, w)
            vol_scatter = in_med & ~exited
            vol_point = o + d * t_s[..., None]
            vol_power = thr * jnp.where(in_med[..., None], w_vol, 1.0)
            if planes_mode:
                # continued (UNCLAMPED) distance + weight of this
                # segment (ref MediumSample::continuedT /
                # continuedWeight, HomogeneousMedium.cpp:86-100): the
                # plane extends l1 = continuedT past any surface hit,
                # with the volume-scatter weight evaluated at that
                # unclamped length
                t_unc = jnp.minimum(t_m, 1e7)
                tau_cont = sigma_t * t_unc[..., None]
                tr_cont = TR.eval_tr(tt, tau_cont, tp, med_first,
                                     jnp.zeros_like(exited))
                p_cont = jnp.mean(
                    sigma_t * TR.medium_pdf(tt, tau_cont, tp, med_first),
                    axis=-1)
                w_cont = sigma_s * sbar[..., None] * tr_cont / \
                    jnp.maximum(p_cont, 1e-20)[..., None]
                # emit the plane pending from the PREVIOUS bounce's
                # volume vertex (precomputePlane0D: power =
                # |p1-p0| * l1 * p2.power with p2.power = thr(p1) *
                # continuedWeight of this segment)
                emit = pact & in_med & alive & (plen0 > 0) & (t_unc > 0)
                ppow = plen0[..., None] * t_unc[..., None] * \
                    seg_pow * w_cont
                ppow = jnp.where(jnp.isfinite(ppow), ppow, 0.0)
                out = dict(out)
                out["pl_p0"] = out["pl_p0"].at[:, i].set(
                    jnp.where(emit[..., None], pp0, 0.0))
                out["pl_p1"] = out["pl_p1"].at[:, i].set(
                    jnp.where(emit[..., None], pp1, 0.0))
                out["pl_d1"] = out["pl_d1"].at[:, i].set(
                    jnp.where(emit[..., None], d, 0.0))
                out["pl_l1"] = out["pl_l1"].at[:, i].set(
                    jnp.where(emit, t_unc, 0.0))
                out["pl_pow"] = out["pl_pow"].at[:, i].set(
                    jnp.where(emit[..., None], ppow, 0.0))
                out["pl_valid"] = out["pl_valid"].at[:, i].set(emit)
            thr = thr * jnp.where(in_med[..., None], w, 1.0)
            # a volume scatter preempts the surface this bounce
            hit = hit & ~vol_scatter
            med_first = jnp.where(in_med & ~absorb_only, False, med_first)

        info = _expand_hit(scene, o, d, res)
        backside = jnp.sum(info["ng"] * d, axis=-1) > 0.0
        ns = jnp.where(backside[..., None] & settings.two_sided_shading,
                       -info["ns"], info["ns"])
        tan, bit = shading_frame(settings, info, ns)
        wi_local = vm.to_local(tan, bit, ns, -d)
        sp = ShadePoint(scene, info["bsdf"], info["uv"])

        if _has_forward_types(settings):
            transp = bsdf_forward(sp, wi_local, settings.present_bsdf_types)
            t_scalar = jnp.mean(transp, axis=-1)
            u_fwd = rng.random_1d(seed, pixel, sample,
                                  dims + rng.BounceDims.FORWARD)
            take_fwd = hit & (jnp.max(transp, axis=-1) > 0) & \
                (u_fwd < t_scalar)
            fwd_w = transp / jnp.maximum(t_scalar, 1e-20)[..., None]
        else:
            take_fwd = jnp.zeros((R,), bool)
            fwd_w = None

        # deposit on non-pure-specular surfaces (shading-normal
        # asymmetry factor folded into the stored power, ref :546)
        spec_surf = _is_pure_specular(scene, settings, info["bsdf"])
        dep = hit & ~spec_surf & ~take_fwd
        asym = jnp.abs(jnp.sum(ns * d, axis=-1) /
                       jnp.where(jnp.abs(jnp.sum(info["ng"] * d, axis=-1))
                                 < 1e-9, 1e-9,
                                 jnp.sum(info["ng"] * d, axis=-1)))
        p_pow = thr * jnp.clip(asym, 0.0, 8.0)[..., None]
        if settings.has_media and settings.vol_photon_type in ("beams",
                                                              "planes"):
            # the beam spans the whole unoccluded segment (to the
            # surface hit), independent of where the walk scattered —
            # its transmittance is applied analytically at gather time.
            # In PLANES mode only LOW-ORDER segments (starting at the
            # light root or a surface vertex) become beams; interior
            # volume-to-volume segments are covered by the planes
            # (ref buildPlaneGrid: insertDicedBeam gated on
            # p1.onSurface() && lowOrderScattering, planes on
            # !p1.onSurface(), PhotonMapIntegrator.cpp:305-330)
            in_med_seg = alive & (med >= 0)
            if planes_mode:
                in_med_seg = in_med_seg & ~pact
            blen = jnp.where(res["hit"], res["t"], 1e8)
            out = dict(out)
            out["b_o"] = out["b_o"].at[:, i].set(
                jnp.where(in_med_seg[..., None], o, 0.0))
            out["b_d"] = out["b_d"].at[:, i].set(
                jnp.where(in_med_seg[..., None], d, 0.0))
            out["b_len"] = out["b_len"].at[:, i].set(
                jnp.where(in_med_seg, jnp.minimum(blen, 1e8), 0.0))
            out["b_pow"] = out["b_pow"].at[:, i].set(
                jnp.where(in_med_seg[..., None], seg_pow, 0.0))
            out["b_valid"] = out["b_valid"].at[:, i].set(in_med_seg)

        # one slot per bounce serves either a surface or a volume photon
        any_dep = dep | vol_scatter
        slot_pos = vm.where3(vol_scatter, vol_point, info["p"])
        slot_pow = jnp.where(vol_scatter[..., None], vol_power, p_pow)
        out2 = dict(out)
        out2["pos"] = out2["pos"].at[:, i].set(
            jnp.where(any_dep[..., None], slot_pos, out["pos"][:, i]))
        out2["dir"] = out2["dir"].at[:, i].set(
            jnp.where(any_dep[..., None], d, out["dir"][:, i]))
        out2["power"] = out2["power"].at[:, i].set(
            jnp.where(any_dep[..., None], slot_pow, out["power"][:, i]))
        out2["bounce"] = out2["bounce"].at[:, i].set(
            jnp.where(any_dep, i + 1, out["bounce"][:, i]))
        out2["valid"] = out2["valid"].at[:, i].set(any_dep)
        out2["vol"] = out2["vol"].at[:, i].set(vol_scatter)

        # continue the walk (full BSDF sampling, ref handleSurface)
        ul = rng.random_1d(seed, pixel, sample,
                           dims + rng.BounceDims.BSDF_LOBE)
        u1, u2 = rng.random_2d(seed, pixel, sample,
                               dims + rng.BounceDims.BSDF_SAMPLE)
        ul2 = rng.random_1d(seed, pixel, sample,
                            dims + rng.BounceDims.BSDF_LOBE2)
        wo, wt, _, flags = bsdf_sample(sp, wi_local, ul, u1, u2,
                                       settings.present_bsdf_types,
                                       u_lobe2=ul2, adjoint=True)
        ok = ((flags & FLAG_VALID) != 0) & (jnp.max(wt, axis=-1) > 0)
        new_d = vm.to_global(tan, bit, ns, wo)
        # adjoint shading-normal correction (ref Bsdf::sample(event,
        # adjoint=true), Bsdf.hpp:75-79):
        # |(wo.Ng)(wi.Ns)| / |(wi.Ng)(wo.Ns)|
        adj = jnp.abs(jnp.sum(new_d * info["ng"], axis=-1)
                      * wi_local[..., 2]) / jnp.maximum(
            jnp.abs(jnp.sum(d * info["ng"], axis=-1) * wo[..., 2]),
            1e-9)
        wt = wt * jnp.clip(adj, 0.0, 8.0)[..., None]
        if _has_forward_types(settings):
            new_d = vm.where3(take_fwd, d, new_d)
            wt = jnp.where(take_fwd[..., None], fwd_w, wt)
            ok = jnp.where(take_fwd, jnp.max(fwd_w, axis=-1) > 0, ok)
        thr2 = jnp.where(hit[..., None], thr * wt, thr)
        o2 = info["p"] + new_d * EPSILON
        if settings.has_media:
            # volume scatter: continue via the phase function
            pw, _ = PH.phase_sample(
                scene.med_phase[jnp.clip(med, 0,
                                         scene.med_phase.shape[0] - 1)],
                scene.med_g[jnp.clip(med, 0, scene.med_g.shape[0] - 1)],
                d, u1, u2)
            new_d = vm.where3(vol_scatter, pw, new_d)
            o2 = vm.where3(vol_scatter, vol_point + pw * EPSILON, o2)
            ok = jnp.where(vol_scatter, True, ok)
            # medium handoff at surface crossings
            geo_back = jnp.sum(new_d * info["ng"], axis=-1) < 0.0
            med2 = jnp.where(hit & ok,
                             _select_medium(scene, info["prim"], med,
                                            geo_back), med)
            med_first = jnp.where(hit & ok, True, med_first)
        else:
            med2 = med
        alive2 = (hit | vol_scatter) & ok & (jnp.max(thr2, axis=-1) > 0)
        if planes_mode:
            # next bounce's pending plane roots at THIS bounce's volume
            # vertex: segment start o, scatter point, segment length
            pact2 = vol_scatter & alive2
            pp0_2 = vm.where3(vol_scatter, o, pp0)
            pp1_2 = vm.where3(vol_scatter, vol_point, pp1)
            plen0_2 = jnp.where(vol_scatter, t_s, plen0)
            return (out2, o2, new_d, thr2, alive2, med2, med_first,
                    nrays, pp0_2, pp1_2, plen0_2, pact2)
        return out2, o2, new_d, thr2, alive2, med2, med_first, nrays

    carry = (out, root["q"] + root["d0"] * EPSILON, root["d0"], thr0,
             jnp.ones((R,), bool),
             root.get("med", jnp.full((R,), -1, jnp.int32))
             if settings.has_media else jnp.full((R,), -1, jnp.int32),
             jnp.ones((R,), bool), jnp.int32(0))
    if planes_mode:
        carry = carry + (jnp.zeros((R, 3)), jnp.zeros((R, 3)),
                         jnp.zeros((R,)), jnp.zeros((R,), bool))
    carry = jax.lax.fori_loop(0, B, body, carry)
    out, nrays = carry[0], carry[7]
    res = {k: v.reshape((R * B,) + v.shape[2:]) for k, v in out.items()}
    res["rays"] = nrays
    return res


# ------------------------------------------------------------- hash grid

def build_photon_grid(photons, radius):
    """Sort photons by hash-grid cell id (cell size = gather radius).
    Returns a grid dict with sorted photon SoA + sorted keys + origin.
    The TPU counterpart of the reference's KdTree build: a single
    device sort instead of a recursive median split."""
    pos = photons["pos"]
    valid = photons["valid"]
    big = jnp.float32(GRID_RES - 3)
    lo = jnp.min(jnp.where(valid[..., None], pos, jnp.inf), axis=0) - radius
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    inv = 1.0 / radius
    cell = jnp.clip(((pos - lo) * inv).astype(jnp.int32), 1, big.astype(
        jnp.int32))
    key = (cell[:, 0] * GRID_RES + cell[:, 1]) * GRID_RES + cell[:, 2]
    key = jnp.where(valid, key, jnp.int32(2**31 - 1))  # invalid to the back
    order = jnp.argsort(key)
    return dict(
        key=key[order],
        pos=pos[order], dir=photons["dir"][order],
        power=photons["power"][order], bounce=photons["bounce"][order],
        valid=valid[order], lo=lo, inv_cell=inv,
    )


def _gather_estimate(scene, settings, grid, radius, p, frame, wi_local,
                     bsdf_idx, uv, cam_bounce):
    """Reference-equivalent kNN density estimate at surface points p
    (R,3).  Collects candidates from the 27 neighbor cells, picks the
    k = gather_photon_count nearest, radius-clamps, and sums
    power * f / |cos| * INV_PI / r^2."""
    R = p.shape[0]
    K = settings.gather_count
    tan, bit, ns = frame
    cell = jnp.clip(((p - grid["lo"]) * grid["inv_cell"]).astype(jnp.int32),
                    1, GRID_RES - 3)
    keys = grid["key"]
    N = keys.shape[0]

    cand_d2 = []
    cand_ix = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                k = ((cell[:, 0] + dx) * GRID_RES + (cell[:, 1] + dy)) * \
                    GRID_RES + (cell[:, 2] + dz)
                start = jnp.searchsorted(keys, k, side="left")
                end = jnp.searchsorted(keys, k, side="right")
                end = jnp.minimum(end, start + CELL_CAP)
                for j in range(CELL_CAP):
                    ix = jnp.minimum(start + j, N - 1)
                    ok = (start + j) < end
                    dv = grid["pos"][ix] - p
                    d2 = jnp.sum(dv * dv, axis=-1)
                    d2 = jnp.where(ok & (d2 <= radius * radius), d2, jnp.inf)
                    cand_d2.append(d2)
                    cand_ix.append(ix)
    d2 = jnp.stack(cand_d2, axis=1)      # (R, 27*CAP)
    ixs = jnp.stack(cand_ix, axis=1)

    # k nearest within the radius (ref KdTree::nearestNeighbours)
    neg, sel = jax.lax.top_k(-d2, K)
    sel_d2 = -neg                        # (R, K) ascending? top_k sorts desc
    sel_ix = jnp.take_along_axis(ixs, sel, axis=1)
    got = jnp.isfinite(sel_d2)
    count = jnp.sum(got, axis=1)
    kth = jnp.max(jnp.where(got, sel_d2, 0.0), axis=1)
    r2 = jnp.where(count >= K, kth, radius * radius)

    # evaluate f at the gather point toward each selected photon
    sp = ShadePoint(scene, jnp.repeat(bsdf_idx, K), uv.repeat(K, axis=0))
    pdirs = grid["dir"][sel_ix.reshape(-1)]          # (R*K, 3)
    wo_l = vm.to_local(jnp.repeat(tan, K, axis=0), jnp.repeat(bit, K, axis=0),
                       jnp.repeat(ns, K, axis=0), -pdirs)
    wi_rep = jnp.repeat(wi_local, K, axis=0)
    f = bsdf_eval(sp, wi_rep, wo_l, settings.present_bsdf_types)
    f = f / jnp.maximum(jnp.abs(wo_l[..., 2]), 1e-6)[..., None]
    f = f.reshape(R, K, 3)

    power = grid["power"][sel_ix.reshape(-1)].reshape(R, K, 3)
    pb = grid["bounce"][sel_ix.reshape(-1)].reshape(R, K)
    full_bounce = cam_bounce[:, None] + pb - 1
    ok = got & (full_bounce >= settings.min_bounces) & \
        (full_bounce < settings.max_bounces) & \
        (sel_d2 <= r2[:, None] + 1e-12)
    est = jnp.sum(jnp.where(ok[..., None], power * f, 0.0), axis=1)
    return est * (vm.INV_PI / jnp.maximum(r2, 1e-20))[..., None]


# ------------------------------------------------------------ photon beams

BEAM_CELLS = 24    # rasterized centerline cells per beam (long beams
                   # truncate; fog-scale beams span ~10 cells)
BEAM_CAP = 32    # candidate beams scanned per grid cell


def build_beam_grid(photons, radius):
    """Hash grid over photon BEAMS (the 1D volume estimator's accel;
    ref GridAccel's beam rasterization, GridAccel.hpp:98-160): each
    beam's centerline is sampled every cell (cell = 2*gather radius),
    deduplicated, and the (cell, beam) pairs are sorted by cell key.
    A query visits the 27 cells around each camera-march point; the
    closest-approach OWNERSHIP cell (the cell containing the beam's
    closest point) makes each (ray, beam) pair count exactly once."""
    bo = photons["b_o"]
    bd = photons["b_d"]
    blen = photons["b_len"]
    valid = photons["b_valid"]
    N = bo.shape[0]
    cell = 2.0 * radius
    inv = 1.0 / cell
    lo = jnp.min(jnp.where(valid[..., None], bo, jnp.inf), axis=0) - \
        2.0 * cell
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)

    t_k = (jnp.arange(BEAM_CELLS, dtype=jnp.float32) + 0.5) * cell
    pts = bo[:, None, :] + bd[:, None, :] * t_k[None, :, None]
    ok = valid[:, None] & (t_k[None, :] <= blen[:, None] + cell)
    cid = jnp.clip(((pts - lo) * inv).astype(jnp.int32), 1, GRID_RES - 3)
    key = (cid[..., 0] * GRID_RES + cid[..., 1]) * GRID_RES + cid[..., 2]
    key = jnp.where(ok, key, jnp.int32(2**31 - 1))
    # in-beam dedup: consecutive samples in the same cell keep the first
    dup = jnp.concatenate(
        [jnp.zeros((N, 1), bool), key[:, 1:] == key[:, :-1]], axis=1)
    key = jnp.where(dup, jnp.int32(2**31 - 1), key)
    bid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                           key.shape)
    key = key.reshape(-1)
    bid = bid.reshape(-1)
    order = jnp.argsort(key)
    return dict(key=key[order], bid=bid[order],
                b_o=bo, b_d=bd, b_len=blen, b_pow=photons["b_pow"],
                lo=lo, cell=jnp.float32(cell), inv_cell=jnp.float32(inv))


def _beam_eval(scene, settings, bgrid, radius, o, d, t1):
    """In-scattered radiance along the camera segment from the BEAM
    map (ref evalBeam1D, PhotonTracer.cpp:120-135): for each beam
    passing within `radius` of the camera ray, add
      power * phase(b_d, -d) * sigma_s * Tr_cam(t) * Tr_beam(s)
            / (2 radius sin theta)
    at the closest-approach point.  Full-length beams with ANALYTIC
    transmittance (the reference samples stochastic beam lengths
    instead; analytic is strictly lower variance for the homogeneous
    exponential media this path supports — heterogeneous scenes fall
    back to the points estimator in render.py).

    All R*M march points batch into ONE 27-neighborhood scan (like
    _volume_march) so the trace stays ~27*BEAM_CAP taps, not
    27*BEAM_CAP*M."""
    R = o.shape[0]
    med = jnp.full((R,), scene.cam_medium, jnp.int32)
    in_med = med >= 0
    mi = jnp.clip(med, 0, max(scene.med_sigma_a.shape[0] - 1, 0))
    sigma_s = scene.med_sigma_s[mi]                    # (R, 3)
    sigma_t = sigma_s + scene.med_sigma_a[mi]
    ptype = scene.med_phase[mi]
    pg = scene.med_g[mi]

    M = VOL_MARCH_STEPS
    step = t1 / M                                      # (R,)
    j = jnp.arange(M, dtype=jnp.float32)[None, :]
    tj = (j + 0.5) * step[:, None]                     # (R, M)
    xj = o[:, None, :] + d[:, None, :] * tj[..., None]
    cj = jnp.clip(((xj - bgrid["lo"]) * bgrid["inv_cell"])
                  .astype(jnp.int32), 1, GRID_RES - 3)
    ckey = (cj[..., 0] * GRID_RES + cj[..., 1]) * GRID_RES + cj[..., 2]
    # visit each cell once per ray (consecutive march points share
    # cells when step < cell)
    fresh = jnp.concatenate(
        [jnp.ones((R, 1), bool), ckey[:, 1:] != ckey[:, :-1]], axis=1)

    N = R * M
    rep = lambda a: jnp.repeat(a, M, axis=0)
    oN, dN, t1N = rep(o), rep(d), jnp.repeat(t1, M)
    ssN, stN = rep(sigma_s), rep(sigma_t)
    ptN, pgN = jnp.repeat(ptype, M), jnp.repeat(pg, M)
    cjN = cj.reshape(N, 3)
    freshN = fresh.reshape(N)

    keys = bgrid["key"]
    NK = keys.shape[0]
    acc = jnp.zeros((N, 3))
    qr = jnp.arange(BEAM_CAP, dtype=jnp.int32)[None, :]     # (1, CAP)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                k = ((cjN[:, 0] + dx) * GRID_RES
                     + (cjN[:, 1] + dy)) * GRID_RES + (cjN[:, 2] + dz)
                start = jnp.searchsorted(keys, k, side="left")
                end = jnp.minimum(
                    jnp.searchsorted(keys, k, side="right"),
                    start + BEAM_CAP)
                # all CAP candidates of this neighbor cell at once:
                # (N, CAP) fully vectorized (432 scalarized taps
                # measured pathological XLA:CPU compile times)
                ix = jnp.minimum(start[:, None] + qr, NK - 1)
                okq = freshN[:, None] & ((start[:, None] + qr)
                                         < end[:, None])
                b = bgrid["bid"][ix]                     # (N, CAP)
                bo = bgrid["b_o"][b]                     # (N, CAP, 3)
                bd = bgrid["b_d"][b]
                bl = bgrid["b_len"][b]
                bp = bgrid["b_pow"][b]
                oN2 = oN[:, None, :]
                dN2 = dN[:, None, :]
                # closest approach (intersectBeam1D)
                l = bo - oN2
                cr = jnp.cross(l, bd)
                sin2 = 1.0 - jnp.sum(dN2 * bd, axis=-1) ** 2
                u = cr / jnp.maximum(
                    jnp.linalg.norm(cr, axis=-1, keepdims=True), 1e-12)
                nrm = jnp.cross(bd, u)
                denom = jnp.sum(nrm * dN2, axis=-1)
                t = jnp.sum(nrm * l, axis=-1) / \
                    jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
                x = oN2 + dN2 * t[..., None]
                dist = jnp.abs(jnp.sum(u * (x - bo), axis=-1))
                s_b = jnp.sum(bd * (x - bo), axis=-1)
                okb = (okq & (dist <= radius) & (sin2 > 1e-9)
                       & (t > 1e-4) & (t < t1N[:, None])
                       & (s_b >= 0.0) & (s_b <= bl))
                # ownership: the beam's closest point must lie in the
                # queried cell (exact pair dedup)
                pb = bo + bd * s_b[..., None]
                cb = jnp.clip(((pb - bgrid["lo"]) * bgrid["inv_cell"])
                              .astype(jnp.int32), 1, GRID_RES - 3)
                bkey = (cb[..., 0] * GRID_RES + cb[..., 1]) * \
                    GRID_RES + cb[..., 2]
                okb = okb & (bkey == k[:, None])
                ph = PH.phase_eval(ptN[:, None], pgN[:, None], bd, -dN2)
                tr = jnp.exp(-stN[:, None, :] * (t + s_b)[..., None])
                inv_sin = jax.lax.rsqrt(jnp.maximum(sin2, 1e-9))
                w = (bp * ssN[:, None, :] * ph[..., None] * tr
                     * (inv_sin / (2.0 * radius))[..., None])
                acc = acc + jnp.sum(
                    jnp.where(okb[..., None], w, 0.0), axis=1)
    acc = acc.reshape(R, M, 3).sum(axis=1)
    return jnp.where(in_med[..., None], acc, 0.0)


# ------------------------------------------------------------ photon planes

PLANE_U = 12     # rasterized samples along the first segment
PLANE_V = 24     # rasterized samples along the extrusion (long planes
                 # truncate, like BEAM_CELLS)
PLANE_CAP = 16   # candidate planes scanned per grid cell


def build_plane_grid(photons, radius):
    """Hash grid over photon PLANES (the 2D volume estimator's accel;
    ref GridAccel rasterization of the PhotonPlane0D quad,
    PhotonMapIntegrator::buildPlaneGrid): each parallelogram
    p0 + u*(p1-p0) + v*l1*d1 is point-sampled on a PLANE_U x PLANE_V
    lattice (spacing capped at one cell), the per-plane cell keys are
    sorted + deduplicated exactly, and the (cell, plane) pairs sorted
    by key.  Ownership at query time = the camera ray's plane-hit
    point must lie in the queried cell, so each (ray, plane) pair
    counts exactly once."""
    p0 = photons["pl_p0"]
    p1 = photons["pl_p1"]
    d1 = photons["pl_d1"]
    l1 = photons["pl_l1"]
    valid = photons["pl_valid"]
    N = p0.shape[0]
    cell = 2.0 * radius
    inv = 1.0 / cell
    corners = jnp.stack([p0, p1, p1 + d1 * l1[..., None],
                         p0 + d1 * l1[..., None]], axis=1)  # (N,4,3)
    lo = jnp.min(jnp.where(valid[..., None, None], corners, jnp.inf),
                 axis=(0, 1)) - 2.0 * cell
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)

    u_k = (jnp.arange(PLANE_U, dtype=jnp.float32) + 0.5) / PLANE_U
    v_k = (jnp.arange(PLANE_V, dtype=jnp.float32) + 0.5) * cell
    # v spacing = one cell up to the truncation cap (coverage along the
    # extrusion mirrors the beam rasterization)
    pts = (p0[:, None, None, :]
           + (p1 - p0)[:, None, None, :] * u_k[None, :, None, None]
           + d1[:, None, None, :] * v_k[None, None, :, None])
    ok = valid[:, None, None] & \
        (v_k[None, None, :] <= l1[:, None, None] + cell)
    cid = jnp.clip(((pts - lo) * inv).astype(jnp.int32), 1, GRID_RES - 3)
    key = (cid[..., 0] * GRID_RES + cid[..., 1]) * GRID_RES + cid[..., 2]
    key = jnp.where(ok, key, jnp.int32(2**31 - 1)).reshape(N, -1)
    # exact per-plane dedup: sort the lattice keys, drop repeats
    key = jnp.sort(key, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((N, 1), bool), key[:, 1:] == key[:, :-1]], axis=1)
    key = jnp.where(dup, jnp.int32(2**31 - 1), key)
    pid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                           key.shape)
    key = key.reshape(-1)
    pid = pid.reshape(-1)
    order = jnp.argsort(key)
    return dict(key=key[order], pid=pid[order],
                p0=p0, p1=p1, d1=d1, l1=l1, pow=photons["pl_pow"],
                lo=lo, inv_cell=jnp.float32(inv))


def _plane_eval(scene, settings, pgrid, o, d, t1):
    """In-scattered radiance along the camera segment from the PLANE
    map (ref evalPlane0D, PhotonTracer.cpp:138-157): for each plane the
    ray pierces, add
      sigma_t(x)^2 * |invDet| * phase(d1, -d) * Tr_cam(t) * power
    at the exact ray-plane intersection (0D: no kernel width), with the
    reference's occlusion test from the hit point back along -d1 for
    v*l1 applied to the LARGEST contribution per march cell (the common
    <=1-hit-per-cell case is exact; extra same-cell hits go untested —
    documented estimator approximation).  Homogeneous camera media only
    (render.py falls back to points otherwise, like beams)."""
    R = o.shape[0]
    med = jnp.full((R,), scene.cam_medium, jnp.int32)
    in_med = med >= 0
    mi = jnp.clip(med, 0, max(scene.med_sigma_a.shape[0] - 1, 0))
    sigma_t = scene.med_sigma_s[mi] + scene.med_sigma_a[mi]   # (R,3)
    ptype = scene.med_phase[mi]
    pg = scene.med_g[mi]

    M = VOL_MARCH_STEPS
    step = t1 / M
    j = jnp.arange(M, dtype=jnp.float32)[None, :]
    tj = (j + 0.5) * step[:, None]
    xj = o[:, None, :] + d[:, None, :] * tj[..., None]
    cj = jnp.clip(((xj - pgrid["lo"]) * pgrid["inv_cell"])
                  .astype(jnp.int32), 1, GRID_RES - 3)
    ckey = (cj[..., 0] * GRID_RES + cj[..., 1]) * GRID_RES + cj[..., 2]
    fresh = jnp.concatenate(
        [jnp.ones((R, 1), bool), ckey[:, 1:] != ckey[:, :-1]], axis=1)

    N = R * M
    rep = lambda a: jnp.repeat(a, M, axis=0)
    oN, dN, t1N = rep(o), rep(d), jnp.repeat(t1, M)
    stN = rep(sigma_t)
    ptN, pgN = jnp.repeat(ptype, M), jnp.repeat(pg, M)
    cjN = cj.reshape(N, 3)
    freshN = fresh.reshape(N)

    keys = pgrid["key"]
    NK = keys.shape[0]
    acc = jnp.zeros((N, 3))
    # shadow-test slot: largest-luminance hit per march row
    best_w = jnp.zeros((N, 3))
    best_x = jnp.zeros((N, 3))
    best_d1 = jnp.zeros((N, 3))
    best_len = jnp.zeros((N,))
    qr = jnp.arange(PLANE_CAP, dtype=jnp.int32)[None, :]
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                k = ((cjN[:, 0] + dx) * GRID_RES
                     + (cjN[:, 1] + dy)) * GRID_RES + (cjN[:, 2] + dz)
                start = jnp.searchsorted(keys, k, side="left")
                end = jnp.minimum(
                    jnp.searchsorted(keys, k, side="right"),
                    start + PLANE_CAP)
                ix = jnp.minimum(start[:, None] + qr, NK - 1)
                okq = freshN[:, None] & ((start[:, None] + qr)
                                         < end[:, None])
                p = pgrid["pid"][ix]                     # (N, CAP)
                p0 = pgrid["p0"][p]                      # (N, CAP, 3)
                p1 = pgrid["p1"][p]
                d1 = pgrid["d1"][p]
                l1 = pgrid["l1"][p]
                ppow = pgrid["pow"][p]
                oN2 = oN[:, None, :]
                dN2 = dN[:, None, :]
                # Moller-Trumbore against the parallelogram with
                # e1 = p1-p0 (first segment), e2 = d1*l1 (extrusion)
                # (ref intersectPlane0D, PhotonTracer.cpp:67-95)
                e1 = p1 - p0
                e2 = d1 * l1[..., None]
                P = jnp.cross(dN2, e2)
                det = jnp.sum(e1 * P, axis=-1)
                inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-8,
                                          1e-8, det)
                T = oN2 - p0
                uu = jnp.sum(T * P, axis=-1) * inv_det
                Q = jnp.cross(T, e1)
                vv = jnp.sum(dN2 * Q, axis=-1) * inv_det
                t = jnp.sum(e2 * Q, axis=-1) * inv_det
                okb = (okq & (jnp.abs(det) > 1e-8)
                       & (uu >= 0.0) & (uu <= 1.0)
                       & (vv >= 0.0) & (vv <= 1.0)
                       & (t > 1e-4) & (t < t1N[:, None]))
                x = oN2 + dN2 * t[..., None]
                cb = jnp.clip(((x - pgrid["lo"]) * pgrid["inv_cell"])
                              .astype(jnp.int32), 1, GRID_RES - 3)
                bkey = (cb[..., 0] * GRID_RES + cb[..., 1]) * \
                    GRID_RES + cb[..., 2]
                okb = okb & (bkey == k[:, None])
                ph = PH.phase_eval(ptN[:, None], pgN[:, None], d1, -dN2)
                tr = jnp.exp(-stN[:, None, :] * t[..., None])
                w = (stN[:, None, :] ** 2 * jnp.abs(inv_det)[..., None]
                     * ph[..., None] * tr * ppow)
                w = jnp.where(okb[..., None], w, 0.0)
                acc = acc + jnp.sum(w, axis=1)
                # track the largest hit of this cell block for the
                # shadow pass
                lum = jnp.sum(w, axis=-1)
                bi = jnp.argmax(lum, axis=1)
                bl = jnp.take_along_axis(lum, bi[:, None], axis=1)[:, 0]
                better = bl > jnp.sum(best_w, axis=-1)
                g = lambda a: jnp.take_along_axis(
                    a, bi[:, None, None], axis=1)[:, 0]
                best_w = jnp.where(better[:, None], g(w), best_w)
                best_x = jnp.where(better[:, None], g(x), best_x)
                best_d1 = jnp.where(better[:, None], g(d1), best_d1)
                blen = jnp.take_along_axis(vv * l1, bi[:, None],
                                           axis=1)[:, 0]
                best_len = jnp.where(better, blen, best_len)
    # occlusion along -d1 for v*l1 (ref evalPlane0D's shadowRay):
    # subtract occluded best-slot contributions
    do_sh = jnp.sum(best_w, axis=-1) > 0.0
    occ = occluded(scene, best_x, -best_d1, EPSILON,
                   jnp.where(do_sh, best_len * (1.0 - 1e-3), 0.0))
    acc = acc - jnp.where((do_sh & occ)[:, None], best_w, 0.0)
    acc = acc.reshape(R, M, 3).sum(axis=1)
    return jnp.where(in_med[..., None], acc, 0.0)


@functools.partial(jax.jit, static_argnames=("settings",))
def plane_pass(scene, settings, pgrid, pixel, sample_idx, seed):
    """Standalone plane-map camera pass (primary rays), mirroring
    beam_pass."""
    R = pixel.shape[0]
    from tungsten_tpu.cameras.camera import generate_rays_w
    o, d, cam_w = generate_rays_w(scene, settings, pixel, sample_idx, seed)
    res = bvh_intersect(scene, o, d, 0.0, INF)
    diag = jnp.linalg.norm(scene.bvh_max[0] - scene.bvh_min[0])
    t1 = jnp.where(res["hit"], res["t"], diag * 1.5)
    return _plane_eval(scene, settings, pgrid, o, d, t1) * cam_w[..., None]


# ------------------------------------------------------------ camera pass

VOL_MARCH_STEPS = 32   # camera-segment march steps for the volume map


def _volume_march(scene, settings, vgrid, vradius, o, d, t1, seed,
                  pixel, sample_idx):
    """In-scattered radiance along the primary camera segment from the
    VOLUME photon map: march t in (0, t1), 3D-kernel point estimate
    L(x,w) = sum_k phase(w . w_k) power_k / (4/3 pi r^3), integrated as
    sum dt * Tr(0,t) * L (the sigma_s of the in-scatter integral
    cancels against Jensen's volume radiance estimate).  Ref: the
    volume-photon branch of PhotonMapIntegrator (points mode,
    PhotonMapSettings volumePhotonType "points")."""
    R = o.shape[0]
    med = jnp.full((R,), scene.cam_medium, jnp.int32)
    in_med = med >= 0
    u_j = rng.random_1d(seed, pixel, sample_idx, PHOTON_DIM_OFFSET + 7)
    kernel = 3.0 / (4.0 * jnp.pi * jnp.maximum(vradius, 1e-9) ** 3)
    mi = jnp.clip(med, 0, max(scene.med_phase.shape[0] - 1, 0))
    ptype = scene.med_phase[mi]
    pg = scene.med_g[mi]

    # all march points gathered as ONE batch: per-step gathers would
    # unroll the 27-cell scan VOL_MARCH_STEPS times (41k-op trace)
    M = VOL_MARCH_STEPS
    dt = t1 / M                                        # (R,)
    j = jnp.arange(M, dtype=jnp.float32)[None, :]      # (1, M)
    t = (j + u_j[:, None]) * dt[:, None]               # (R, M)
    x = (o[:, None, :] + d[:, None, :] * t[..., None]).reshape(R * M, 3)
    est = _gather_volume(scene, settings, vgrid, vradius, x,
                         jnp.repeat(-d, M, axis=0),
                         jnp.repeat(ptype, M), jnp.repeat(pg, M))
    est = est.reshape(R, M, 3)
    tr = _medium_tr(scene, settings,
                    jnp.repeat(med, M), jnp.repeat(o, M, axis=0),
                    jnp.repeat(d, M, axis=0), t.reshape(R * M),
                    jnp.ones((R * M,), bool),
                    jnp.zeros((R * M,), bool)).reshape(R, M, 3)
    acc = jnp.sum(est * tr, axis=1) * (kernel * dt)[:, None]
    return jnp.where(in_med[..., None], acc, 0.0)


def _gather_volume(scene, settings, vgrid, vradius, p, wo, ptype, pg):
    """Sum of phase-weighted photon powers within vradius of p (R,3)."""
    R = p.shape[0]
    cell = jnp.clip(((p - vgrid["lo"]) * vgrid["inv_cell"])
                    .astype(jnp.int32), 1, GRID_RES - 3)
    keys = vgrid["key"]
    N = keys.shape[0]
    acc = jnp.zeros((R, 3))
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                k = ((cell[:, 0] + dx) * GRID_RES
                     + (cell[:, 1] + dy)) * GRID_RES + (cell[:, 2] + dz)
                start = jnp.searchsorted(keys, k, side="left")
                end = jnp.searchsorted(keys, k, side="right")
                end = jnp.minimum(end, start + CELL_CAP)
                for j in range(CELL_CAP):
                    ix = jnp.minimum(start + j, N - 1)
                    ok = (start + j) < end
                    dv = vgrid["pos"][ix] - p
                    d2 = jnp.sum(dv * dv, axis=-1)
                    ok = ok & (d2 <= vradius * vradius)
                    ph = PH.phase_eval(ptype, pg, vgrid["dir"][ix], wo)
                    acc = acc + jnp.where(
                        ok[..., None], vgrid["power"][ix] * ph[..., None],
                        0.0)
    return acc


@functools.partial(jax.jit, static_argnames=("settings",))
def gather_pass(scene, settings, grid, radius, pixel, sample_idx, seed,
                vgrid=None, vradius=None):
    """Specular-chain camera walk + photon gather (ref traceSensorPath).
    Returns (radiance (R,3), rays traced — measured alive walks per
    bounce, not an upper bound)."""
    R = pixel.shape[0]
    from tungsten_tpu.cameras.camera import generate_rays_w
    o, d, cam_w = generate_rays_w(scene, settings, pixel, sample_idx, seed)

    state = dict(
        o=o, d=d, thr=jnp.broadcast_to(cam_w[..., None], (R, 3)) * 1.0,
        result=jnp.zeros((R, 3)),
        alive=jnp.ones((R,), bool), stopped=jnp.zeros((R,), bool),
        bounce=jnp.zeros((R,), jnp.int32), nrays=jnp.int32(0),
        med=jnp.full((R,), scene.cam_medium, jnp.int32),
        g_p=jnp.zeros((R, 3)), g_ns=jnp.zeros((R, 3)),
        g_wi=jnp.zeros((R, 3)), g_bsdf=jnp.zeros((R,), jnp.int32),
        g_uv=jnp.zeros((R, 2)), g_thr=jnp.zeros((R, 3)),
        g_bounce=jnp.zeros((R,), jnp.int32),
        g_t1=jnp.zeros((R,)),
    )

    def body(i, s):
        dims = rng.DIMS_CAMERA + i * rng.DIMS_PER_BOUNCE
        s = dict(s, nrays=s["nrays"] + jnp.sum(s["alive"].astype(jnp.int32)))
        res = bvh_intersect(scene, s["o"], s["d"], 0.0,
                            jnp.where(s["alive"], INF, 0.0))
        hit = res["hit"] & s["alive"]
        escaped = s["alive"] & ~res["hit"]

        # medium transmittance along the camera segment: PT attenuates
        # every segment through the fog (handleVolume path), so the
        # gather walk must too or photon images come out ~1/Tr too
        # bright (ref traceSensorPath's medium handling,
        # PhotonTracer.cpp:246-420)
        if settings.has_media:
            seg = jnp.where(hit, res["t"], INF)
            seg_tr = _medium_tr(scene, settings, s["med"], s["o"], s["d"],
                                seg, jnp.ones((R,), bool),
                                jnp.ones((R,), bool))
            s["thr"] = s["thr"] * jnp.where(s["alive"][..., None],
                                            seg_tr, 1.0)
        bounce = s["bounce"] + hit.astype(jnp.int32)
        # primary segment length for the volume-map march (escaped
        # primaries march through the scene's bounding diagonal);
        # i is a traced loop index, so mask instead of branching
        diag = jnp.linalg.norm(scene.bvh_max[0] - scene.bvh_min[0])
        s["g_t1"] = jnp.where(i == 0,
                              jnp.where(res["hit"], res["t"], diag * 1.5),
                              s["g_t1"])

        result = s["result"]
        if settings.has_env:
            env_ok = escaped & (i >= settings.min_bounces)
            result = result + jnp.where(env_ok[..., None],
                                        s["thr"] * L.env_eval(scene, s["d"]),
                                        0.0)

        info = _expand_hit(scene, s["o"], s["d"], res)
        backside = jnp.sum(info["ng"] * s["d"], axis=-1) > 0.0
        ns = jnp.where(backside[..., None] & settings.two_sided_shading,
                       -info["ns"], info["ns"])
        tan, bit = shading_frame(settings, info, ns)
        wi_local = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(scene, info["bsdf"], info["uv"])

        if _has_forward_types(settings):
            transp = bsdf_forward(sp, wi_local, settings.present_bsdf_types)
            t_scalar = jnp.mean(transp, axis=-1)
            u_fwd = rng.random_1d(seed, pixel, sample_idx,
                                  dims + rng.BounceDims.FORWARD)
            take_fwd = hit & (jnp.max(transp, axis=-1) > 0) & \
                (u_fwd < t_scalar)
            fwd_w = transp / jnp.maximum(t_scalar, 1e-20)[..., None]
        else:
            take_fwd = jnp.zeros((R,), bool)
            fwd_w = None

        spec_surf = _is_pure_specular(scene, settings, info["bsdf"])
        stop_here = hit & ~spec_surf & ~take_fwd

        # emissive credit at the stop vertex (ref :409-410)
        etex = scene.prim_emission_tex[info["prim"]]
        li = jnp.clip(scene.prim_light[info["prim"]], 0,
                      max(scene.light_emission.shape[0] - 1, 0))
        e_val = jnp.where(
            (scene.prim_light[info["prim"]] >= 0)[..., None],
            scene.light_emission[li],
            scene.tex_const[jnp.clip(etex, 0,
                                     scene.tex_const.shape[0] - 1)])
        front = jnp.sum(info["ng"] * s["d"], axis=-1) < 0.0
        emit = stop_here & (etex >= 0) & front & (i >= settings.min_bounces)
        result = result + jnp.where(emit[..., None], s["thr"] * e_val, 0.0)

        # record the gather point once
        for k, v in [("g_p", info["p"]), ("g_ns", ns), ("g_wi", wi_local),
                     ("g_uv", info["uv"]), ("g_thr", s["thr"])]:
            s[k] = jnp.where(stop_here[..., None] if v.ndim == 2
                             else stop_here, v, s[k])
        s["g_bsdf"] = jnp.where(stop_here, info["bsdf"], s["g_bsdf"])
        s["g_bounce"] = jnp.where(stop_here, bounce, s["g_bounce"])
        stopped = s["stopped"] | stop_here

        # specular / forward continuation
        ul = rng.random_1d(seed, pixel, sample_idx,
                           dims + rng.BounceDims.BSDF_LOBE)
        u1, u2 = rng.random_2d(seed, pixel, sample_idx,
                               dims + rng.BounceDims.BSDF_SAMPLE)
        ul2 = rng.random_1d(seed, pixel, sample_idx,
                            dims + rng.BounceDims.BSDF_LOBE2)
        wo, wt, _, flags = bsdf_sample(sp, wi_local, ul, u1, u2,
                                       settings.present_bsdf_types,
                                       u_lobe2=ul2)
        ok = ((flags & FLAG_VALID) != 0) & (jnp.max(wt, axis=-1) > 0)
        new_d = vm.to_global(tan, bit, ns, wo)
        if _has_forward_types(settings):
            new_d = vm.where3(take_fwd, s["d"], new_d)
            wt = jnp.where(take_fwd[..., None], fwd_w, wt)
            ok = jnp.where(take_fwd, jnp.max(fwd_w, axis=-1) > 0, ok)
        thr = jnp.where((hit & ~stop_here)[..., None], s["thr"] * wt,
                        s["thr"])
        alive = hit & ~stop_here & ok & (jnp.max(thr, axis=-1) > 0)

        s2 = dict(s)
        if settings.has_media:
            # medium handoff when the specular walk crosses a surface
            geo_back = jnp.sum(new_d * info["ng"], axis=-1) < 0.0
            s2["med"] = jnp.where(alive,
                                  _select_medium(scene, info["prim"],
                                                 s["med"], geo_back),
                                  s["med"])
        s2.update(o=vm.where3(alive, info["p"] + new_d * EPSILON, s["o"]),
                  d=vm.where3(alive, new_d, s["d"]),
                  thr=thr, result=result, alive=alive, stopped=stopped,
                  bounce=bounce)
        return s2

    s = jax.lax.fori_loop(0, settings.max_bounces, body, state)

    tan, bit = vm.ortho_frame(s["g_ns"])
    est = _gather_estimate(scene, settings, grid, radius, s["g_p"],
                           (tan, bit, s["g_ns"]), s["g_wi"], s["g_bsdf"],
                           s["g_uv"], s["g_bounce"])
    result = s["result"] + jnp.where(s["stopped"][..., None],
                                     s["g_thr"] * est, 0.0)
    if vgrid is not None and settings.has_media:
        result = result + _volume_march(scene, settings, vgrid,
                                        vradius, o, d, s["g_t1"],
                                        seed, pixel, sample_idx)
    return result, s["nrays"]


@functools.partial(jax.jit, static_argnames=("settings",))
def beam_pass(scene, settings, bgrid, vradius, pixel, sample_idx, seed):
    """Standalone beam-map camera pass: primary rays + their hit
    distance + the 1D beam gather.  Kept OUTSIDE gather_pass's jit —
    fusing the 27x16-tap beam scan into the camera-walk graph measured
    pathological XLA:CPU compile times."""
    R = pixel.shape[0]
    from tungsten_tpu.cameras.camera import generate_rays_w
    o, d, cam_w = generate_rays_w(scene, settings, pixel, sample_idx, seed)
    res = bvh_intersect(scene, o, d, 0.0, INF)
    diag = jnp.linalg.norm(scene.bvh_max[0] - scene.bvh_min[0])
    t1 = jnp.where(res["hit"], res["t"], diag * 1.5)
    return _beam_eval(scene, settings, bgrid, vradius, o, d, t1) \
        * cam_w[..., None]


def ppm_gamma(iteration: int, alpha: float) -> float:
    """Radius shrink factor: gamma_i = prod_{k=1..i} (k+alpha)/(k+1)
    (ref ProgressivePhotonMapIntegrator.cpp:58-60)."""
    g = 1.0
    for k in range(1, iteration + 1):
        g *= (k + alpha) / (k + 1.0)
    return g
