"""Bidirectional path tracer: wavefront SoA subpaths + all (s,t)
connection strategies with balance-heuristic MIS.

TPU-native re-design of ref src/core/integrators/bidirectional_path_tracer/
(LightPath.hpp/cpp, PathVertex.cpp): camera and emitter subpaths are
fixed-size SoA vertex arrays (R, V, ...) built by bounded random walks;
every (s,t) strategy is evaluated as a masked wavefront computation with
one visibility traversal per strategy; t=1 lens connections scatter-add
into a splat buffer, exactly the AtomicFramebuffer pattern.

MIS parity: the balance heuristic computed from forward/backward
area-measure pdf ratio products, with Dirac (specular) vertices excluded
from the connectable set — the ratio recursion mirrors
LightPath::misWeight (LightPath.cpp:96-180).

Round-1 scope: surfaces only (no media vertices), pinhole camera, area
lights.  The estimator is validated by equivalence with the forward path
tracer (both estimate the same transport).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tungsten_tpu.bsdf.eval import (
    FLAG_SPECULAR, FLAG_VALID, ShadePoint, bsdf_eval, bsdf_pdf, bsdf_sample)
from tungsten_tpu.cameras.camera import generate_rays
from tungsten_tpu.integrators.path_tracer import (
    EPSILON, INF, _expand_hit, _hit_prim)
from tungsten_tpu.ops.intersect import bvh_intersect, occluded
from tungsten_tpu.utils import rng
from tungsten_tpu.utils import vecmath as vm

# RNG dim blocks for BDPT (separate stream family from the PT layout):
# camera subpath uses the standard camera dims + per-bounce blocks;
# light subpath uses an offset block so the two walks are decorrelated.
LIGHT_WALK_DIM_OFFSET = 4096


def _area_pdf(pdf_solid, d, dist, n_at):
    """Solid-angle pdf at a vertex -> area pdf at the next vertex."""
    cos_next = jnp.abs(jnp.sum(d * n_at, axis=-1))
    return pdf_solid * cos_next / jnp.maximum(dist * dist, 1e-20)


def _trace_subpath(scene, settings, o0, d0, alpha0, adjoint, seed, pixel,
                   sample_idx, dim_base, nv, pdf0_solid, n0):
    """Random walk storing per-vertex SoA arrays.

    Returns dict of (R, nv, ...) arrays: p, ns, ng, wi (unit, toward the
    previous vertex), alpha (throughput up to and including this vertex's
    cosine/f terms, i.e. Veach alpha), pdf_fwd (area), pdf_rev (area, pdf
    of this vertex from its successor; filled one step delayed), bsdf,
    uv, spec, valid, prim.
    o0/d0: first ray; alpha0 (R,3); pdf0_solid: solid-angle pdf of d0
    from the root; n0: root normal (for area conversion), or None for a
    Dirac root direction... the caller converts.
    """
    R = o0.shape[0]

    def zeros(shape, dtype=jnp.float32):
        return jnp.zeros((R, nv) + shape, dtype)

    out = dict(
        p=zeros((3,)), ns=zeros((3,)), ng=zeros((3,)), wi=zeros((3,)),
        alpha=zeros((3,)), pdf_fwd=zeros(()), pdf_rev=zeros(()),
        bsdf=zeros((), jnp.int32), uv=zeros((2,)),
        spec=zeros((), bool), valid=zeros((), bool),
        prim=zeros((), jnp.int32), dist_prev=zeros(()),
    )

    def body(i, carry):
        out, o, d, alpha, pdf_solid, prev_n, alive = carry
        res = bvh_intersect(scene, o, d, 0.0, INF)
        hit = res["hit"] & alive
        info = _expand_hit(scene, o, d, res)

        # two-sided shading flip (match the PT path)
        backside = jnp.sum(info["ng"] * d, axis=-1) > 0.0
        ns = jnp.where(backside[..., None] & settings.two_sided_shading,
                       -info["ns"], info["ns"])

        dist = res["t"]
        pdf_fwd = _area_pdf(pdf_solid, d, dist, info["ng"])

        for k, v in [("p", info["p"]), ("ns", ns), ("ng", info["ng"]),
                     ("wi", -d), ("alpha", alpha),
                     ("uv", info["uv"])]:
            out[k] = out[k].at[:, i].set(jnp.where(
                hit[..., None] if v.ndim == 2 else hit, v, out[k][:, i]))
        out["pdf_fwd"] = out["pdf_fwd"].at[:, i].set(
            jnp.where(hit, pdf_fwd, 0.0))
        out["bsdf"] = out["bsdf"].at[:, i].set(
            jnp.where(hit, info["bsdf"], 0))
        out["prim"] = out["prim"].at[:, i].set(jnp.where(hit, info["prim"], -1))
        out["valid"] = out["valid"].at[:, i].set(hit)
        out["dist_prev"] = out["dist_prev"].at[:, i].set(
            jnp.where(hit, dist, 0.0))

        # sample continuation
        tan, bit = vm.ortho_frame(ns)
        wi_local = vm.to_local(tan, bit, ns, -d)
        sp = ShadePoint(scene, info["bsdf"], info["uv"])
        dims = dim_base + i * rng.DIMS_PER_BOUNCE
        ul = rng.random_1d(seed, pixel, sample_idx, dims + rng.BounceDims.BSDF_LOBE)
        u1, u2 = rng.random_2d(seed, pixel, sample_idx,
                               dims + rng.BounceDims.BSDF_SAMPLE)
        ul2 = rng.random_1d(seed, pixel, sample_idx,
                            dims + rng.BounceDims.BSDF_LOBE2)
        wo, wt, pdf, flags = bsdf_sample(sp, wi_local, ul, u1, u2,
                                         settings.present_bsdf_types,
                                         u_lobe2=ul2)
        spec = (flags & FLAG_SPECULAR) != 0
        ok = ((flags & FLAG_VALID) != 0) & (jnp.max(wt, axis=-1) > 0)
        out["spec"] = out["spec"].at[:, i].set(hit & spec)

        new_d = vm.to_global(tan, bit, ns, wo)
        new_alpha = alpha * wt

        # reverse pdf of the PREVIOUS vertex: pdf of sampling wi from wo
        pdf_rev_solid = bsdf_pdf(sp, wo, wi_local, settings.present_bsdf_types)
        pdf_rev_solid = jnp.where(spec, pdf, pdf_rev_solid)
        prev_pdf_rev = _area_pdf(pdf_rev_solid, -d, dist, prev_n)
        if True:
            upd = jnp.where(hit & (i > 0), prev_pdf_rev, 0.0)
            out["pdf_rev"] = out["pdf_rev"].at[:, jnp.maximum(i - 1, 0)].set(
                jnp.where(hit & (i > 0), prev_pdf_rev,
                          out["pdf_rev"][:, jnp.maximum(i - 1, 0)]))

        # russian roulette kept OFF inside subpaths (bounded nv instead)
        alive = hit & ok
        o2 = info["p"] + new_d * EPSILON
        return out, o2, new_d, new_alpha, pdf, info["ng"], alive

    carry = (out, o0, d0, alpha0, pdf0_solid, n0, jnp.ones((R,), bool))
    out, *_ = jax.lax.fori_loop(0, nv, body, carry)
    return out


def _sample_light_root(scene, settings, R, seed, pixel, sample_idx):
    """Pick a light uniformly + a point and cosine direction on it.
    Returns root dict: q, n, Le, alpha0 (for the walk), pdf_a (area pdf
    incl. light pick), d0, pdf0_solid, alpha_vertex0 (R,3)."""
    nl = settings.num_lights
    base = LIGHT_WALK_DIM_OFFSET
    u_sel = rng.random_1d(seed, pixel, sample_idx, base + 0)
    li = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
    pick_pdf = 1.0 / nl

    u1, u2 = rng.random_2d(seed, pixel, sample_idx, base + 1)
    u_tri = rng.random_1d(seed, pixel, sample_idx, base + 3)
    from tungsten_tpu.integrators.lights import jax_searchsorted_rows
    cdf = scene.light_cdf[li]
    k = jnp.clip(jax_searchsorted_rows(cdf, u_tri) - 1, 0,
                 scene.light_tris.shape[1] - 1)
    tri = jnp.clip(jnp.take_along_axis(scene.light_tris[li], k[..., None],
                                       axis=-1)[..., 0], 0,
                   scene.tri_v0.shape[0] - 1)
    su = jnp.sqrt(jnp.maximum(u1, 0.0))
    b1 = 1.0 - su
    b2 = (1.0 - u2) * su
    v0 = scene.tri_v0[tri]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]
    q = v0 + b1[..., None] * e1 + b2[..., None] * e2
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    area = scene.light_area[li]
    pdf_a = pick_pdf / jnp.maximum(area, 1e-20)
    Le = scene.light_emission[li]

    # cosine-hemisphere emission direction
    u3, u4 = rng.random_2d(seed, pixel, sample_idx, base + 4)
    phi = u3 * 2.0 * jnp.pi
    r = jnp.sqrt(u4)
    z = jnp.sqrt(jnp.maximum(1.0 - u4, 0.0))
    t, b = vm.ortho_frame(n)
    d0 = vm.to_global(t, b, n, jnp.stack(
        [jnp.cos(phi) * r, jnp.sin(phi) * r, z], axis=-1))
    pdf0_solid = jnp.maximum(z, 1e-9) * vm.INV_PI

    # Veach: alpha^L_1 = Le / pdf_a ; the walk's alpha after leaving the
    # light divides by dir pdf and multiplies cos: alpha0_walk =
    # alpha1 * cos / pdf0_solid = (Le/pdf_a) * pi (for cosine sampling)
    alpha_v0 = Le / pdf_a[..., None]
    alpha_walk = alpha_v0 * (z / pdf0_solid)[..., None]
    return dict(q=q, n=n, Le=Le, li=li, prim=scene.light_prim[li],
                pdf_a=pdf_a, d0=d0, pdf0_solid=pdf0_solid,
                alpha_v0=alpha_v0, alpha_walk=alpha_walk,
                pick_pdf=pick_pdf, area=area)


def _camera_dir_pdf(scene, settings, d_world):
    """Solid-angle pdf of the pinhole camera emitting direction d
    (= invPlaneArea / cos^3 localz, ref PinholeCamera::sampleDirection)."""
    local = d_world @ scene.cam_mat[:3, :3]  # transpose of fwd transform
    cosz = jnp.maximum(local[..., 2], 1e-6)
    ratio = settings.height / settings.width
    plane_area = (2.0 / scene.cam_plane_dist) * \
        (2.0 * ratio / scene.cam_plane_dist)
    return (1.0 / plane_area) / jnp.maximum(cosz ** 3, 1e-9)


def _camera_pixel(scene, settings, d_world):
    """Map a world direction into (pixel_idx, valid)."""
    local = d_world @ scene.cam_mat[:3, :3]
    ok = local[..., 2] > 0
    lx = local[..., 0] / jnp.maximum(local[..., 2], 1e-9) * scene.cam_plane_dist
    ly = local[..., 1] / jnp.maximum(local[..., 2], 1e-9) * scene.cam_plane_dist
    w, h = settings.width, settings.height
    ratio = h / w
    px = (lx + 1.0) * 0.5 * w
    py = (ratio - ly) * (0.5 * w)
    ok = ok & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pix = jnp.clip(py.astype(jnp.int32), 0, h - 1) * w + \
        jnp.clip(px.astype(jnp.int32), 0, w - 1)
    return pix, ok


def _eval_bsdf_at(scene, settings, verts, idx, wi_world, wo_world):
    """f(cos-folded) and pdfs at stored vertex idx: wi = toward previous,
    wo = the new connection direction.  Returns (f, pdf_fwd_solid,
    pdf_rev_solid)."""
    ns = verts["ns"][:, idx]
    tan, bit = vm.ortho_frame(ns)
    wi_l = vm.to_local(tan, bit, ns, wi_world)
    wo_l = vm.to_local(tan, bit, ns, wo_world)
    sp = ShadePoint(scene, verts["bsdf"][:, idx], verts["uv"][:, idx])
    f = bsdf_eval(sp, wi_l, wo_l, settings.present_bsdf_types)
    pdf_f = bsdf_pdf(sp, wi_l, wo_l, settings.present_bsdf_types)
    pdf_r = bsdf_pdf(sp, wo_l, wi_l, settings.present_bsdf_types)
    return f, pdf_f, pdf_r


def _mis_weight(pdf_fwd, pdf_rev, connectable, s, t):
    """Balance-heuristic MIS over the combined path arrays (length s+t,
    emitter side first).  All (R, s+t).  Mirrors LightPath::misWeight's
    ratio recursion: the ratio product accumulates over every vertex, but
    an alternative strategy is only *added* when both vertices adjacent
    to its connection are connectable (non-Dirac)."""
    n = s + t
    weight = jnp.ones(pdf_fwd.shape[0])
    # camera-side alternatives: connection moves toward the camera
    pi = jnp.ones_like(weight)
    for i in range(s + 1, n):
        pi = pi * pdf_fwd[:, i - 1] / jnp.maximum(pdf_rev[:, i - 1], 1e-20)
        ok = connectable[:, i - 1] & connectable[:, i]
        weight = weight + jnp.where(ok, pi, 0.0)
    # emitter-side alternatives: connection moves toward the light
    pi = jnp.ones_like(weight)
    for i in range(s - 1, 0, -1):
        pi = pi * pdf_rev[:, i] / jnp.maximum(pdf_fwd[:, i], 1e-20)
        ok = connectable[:, i - 1] & connectable[:, i]
        weight = weight + jnp.where(ok, pi, 0.0)
    if s >= 1:
        # the pure-camera-path (s'=0) strategy — always available for
        # non-Dirac area emitters (ref LightPath.cpp:166-173)
        pi = pi * pdf_rev[:, 0] / jnp.maximum(pdf_fwd[:, 0], 1e-20)
        weight = weight + pi
    return 1.0 / jnp.maximum(weight, 1e-20)


def trace_bdpt(scene, settings, pixel, sample_idx, seed, max_vertices=8,
               max_edges=None):
    """One BDPT sample per entry.  Returns (radiance (R,3) for the pixel's
    own estimator, splat_pixels (R*NS,), splat_values (R*NS,3)).
    max_edges caps total path segments (= the PT max_bounces semantics);
    strategies with s + t - 1 > max_edges are skipped."""
    R = pixel.shape[0]
    NV = max_vertices
    ME = max_edges if max_edges is not None else 2 * NV

    # ---- camera subpath ----
    o, d = generate_rays(scene, settings, pixel, sample_idx, seed)
    cam_pos = scene.cam_mat[:3, 3]
    pdf_cam_dir = _camera_dir_pdf(scene, settings, d)
    cam = _trace_subpath(scene, settings, o, d, jnp.ones((R, 3)), False,
                         seed, pixel, sample_idx, rng.DIMS_CAMERA, NV,
                         pdf_cam_dir, jnp.broadcast_to(
                             scene.cam_mat[:3, 2], (R, 3)))

    # ---- light subpath ----
    root = _sample_light_root(scene, settings, R, seed, pixel, sample_idx)
    lig = _trace_subpath(scene, settings, root["q"] + root["d0"] * EPSILON,
                         root["d0"], root["alpha_walk"], True,
                         seed, pixel, sample_idx,
                         LIGHT_WALK_DIM_OFFSET + 16, NV,
                         root["pdf0_solid"], root["n"])

    radiance = jnp.zeros((R, 3))
    splat_pix = []
    splat_val = []

    light_prim = root["prim"]
    Le = root["Le"]
    pdf_light_a = root["pdf_a"]

    # ================= s = 0: camera path hits a light =================
    for t in range(1, NV + 1):
        if t - 1 > ME:
            continue
        ci = t - 1  # camera vertex array index of the path's end
        v_ok = cam["valid"][:, ci]
        prim = cam["prim"][:, ci]
        etex = scene.prim_emission_tex[jnp.clip(prim, 0, scene.prim_emission_tex.shape[0] - 1)]
        emissive = v_ok & (etex >= 0)
        li = jnp.clip(scene.prim_light[jnp.clip(prim, 0, scene.prim_light.shape[0] - 1)], 0,
                      scene.light_emission.shape[0] - 1)
        e_hit = scene.light_emission[li]
        front = jnp.sum(cam["ng"][:, ci] * cam["wi"][:, ci], axis=-1) > 0.0
        contrib = cam["alpha"][:, ci] * e_hit
        if t == 1:
            # direct light hit from the camera; the (1,1) lens-splat
            # strategy samples the same 1-edge paths, so balance against
            # its density (light-area pdf vs camera pdf) unless the
            # reconstruction filter is Dirac
            nl0 = settings.num_lights
            area0 = scene.light_area[li]
            pdfA0 = (1.0 / nl0) / jnp.maximum(area0, 1e-20)
            if settings.filter != "dirac":
                w1 = 1.0 / (1.0 + pdfA0 /
                            jnp.maximum(cam["pdf_fwd"][:, 0], 1e-20))
            else:
                w1 = jnp.ones((R,))
            radiance = radiance + jnp.where(
                (emissive & front)[..., None], contrib * w1[..., None], 0.0)
            continue
        # MIS arrays for s=0: combined path = camera reversed, n = t
        # pdf_fwd[j] (emitter-side direction) j=0..t-1: j=0: light area pdf;
        # j=1: light dir pdf at hit toward camera vertex t-2; j>=2: camera
        # pdf_rev. pdf_rev[j] = camera pdf_fwd reversed.
        nl = settings.num_lights
        area = scene.light_area[li]
        pdfA_here = (1.0 / nl) / jnp.maximum(area, 1e-20)
        dprev = cam["dist_prev"][:, ci]
        cos_here = jnp.abs(jnp.sum(cam["ng"][:, ci] * cam["wi"][:, ci], axis=-1))
        # emission direction pdf (cosine) from the light toward v[t-2]:
        cos_em = cos_here
        pdf_em_solid = cos_em * vm.INV_PI
        n_prev = cam["ng"][:, ci - 1] if ci >= 1 else jnp.broadcast_to(
            scene.cam_mat[:3, 2], (R, 3))
        pdf_em_area = _area_pdf(pdf_em_solid, -cam["wi"][:, ci], dprev, n_prev)

        pdf_fwd = [pdfA_here, pdf_em_area]
        pdf_rev = [cam["pdf_fwd"][:, ci], cam["pdf_fwd"][:, ci - 1]]
        conn = [jnp.ones_like(emissive),
                ~cam["spec"][:, ci - 1] if ci >= 1 else jnp.ones_like(emissive)]
        for j in range(2, t):
            cj = t - 1 - j  # camera vertex index
            pdf_fwd.append(cam["pdf_rev"][:, cj])
            pdf_rev.append(cam["pdf_fwd"][:, cj])
            conn.append(~cam["spec"][:, cj] if cj >= 1
                        else jnp.ones_like(emissive))
        pf = jnp.stack(pdf_fwd, axis=1)
        pr = jnp.stack(pdf_rev, axis=1)
        cn = jnp.stack(conn, axis=1)
        w = _mis_weight_s0(pf, pr, cn, t,
                           root_connectable=settings.filter != "dirac")
        radiance = radiance + jnp.where(
            (emissive & front)[..., None], contrib * w[..., None], 0.0)

    # ================= s >= 1, t >= 2: connections =================
    for s in range(1, NV + 1):
        for t in range(2, NV + 1):
            if s + t - 1 > ME:
                continue
            contrib, w, ok = _connect(scene, settings, cam, lig, root, s, t, R)
            radiance = radiance + jnp.where(ok[..., None],
                                            contrib * w[..., None], 0.0)

    # ================= t = 1: light path to the lens (splat) ===========
    for s in range(1, NV + 1):
        if s > ME:
            continue
        pixv, val, ok = _connect_lens(scene, settings, cam, lig, root, s, R,
                                      cam_pos)
        splat_pix.append(jnp.where(ok, pixv, 0))
        splat_val.append(jnp.where(ok[..., None], val, 0.0))

    splat_pix = jnp.concatenate(splat_pix) if splat_pix else jnp.zeros((0,), jnp.int32)
    splat_val = jnp.concatenate(splat_val) if splat_val else jnp.zeros((0, 3))
    return radiance, splat_pix, splat_val


def _mis_weight_s0(pdf_fwd, pdf_rev, connectable, t, root_connectable=True):
    """MIS for the s=0 strategy: the current strategy is the full camera
    path; alternatives extend the light side, up to the t'=1 splat
    (k = t, admitted when the reconstruction filter is non-Dirac)."""
    weight = jnp.ones(pdf_fwd.shape[0])
    pi = jnp.ones_like(weight)
    for k in range(1, t + 1):
        pi = pi * pdf_fwd[:, k - 1] / jnp.maximum(pdf_rev[:, k - 1], 1e-20)
        if k < t:
            ok = connectable[:, k - 1] & connectable[:, k]
        else:
            ok = connectable[:, k - 1] & root_connectable
        weight = weight + jnp.where(ok, pi, 0.0)
    return 1.0 / jnp.maximum(weight, 1e-20)


def _build_emitter_side(scene, cam, lig, root, s, R, pdf_conn_to_light,
                        pdf_light_rev_solid):
    """Combined-array entries for the emitter side (indices 0..s-1).
    pdf_conn_to_light: area pdf of the connecting light vertex being
    sampled from the camera side.  pdf_light_rev_solid: solid-angle pdf at
    the connecting light vertex toward its predecessor given the new
    incoming (connection) direction, or None when s == 1."""
    pdf_fwd, pdf_rev, conn = [], [], []
    if s == 1:
        pdf_fwd.append(root["pdf_a"] * jnp.ones((R,)))
        pdf_rev.append(pdf_conn_to_light)
        conn.append(jnp.ones((R,), bool))
        return pdf_fwd, pdf_rev, conn
    # index 0: the light root
    pdf_fwd.append(root["pdf_a"] * jnp.ones((R,)))
    if s == 2:
        # reverse pdf of the root from the connecting vertex, with the new
        # incoming direction (ref PathVertex::evalPdfs -> pdfBackward[s-2])
        prev_rev = _area_pdf(pdf_light_rev_solid, lig["wi"][:, 0],
                             lig["dist_prev"][:, 0], root["n"])
        pdf_rev.append(prev_rev)
    else:
        pdf_rev.append(lig["pdf_rev"][:, 0])
    conn.append(jnp.ones((R,), bool))
    # middle vertices: combined index j = 1..s-2, walk index j-1
    for j in range(1, s - 1):
        wj = j - 1
        pdf_fwd.append(lig["pdf_fwd"][:, wj])
        if j == s - 2:
            n_target = lig["ng"][:, s - 3] if s >= 3 and s - 3 >= 0 else root["n"]
            prev_rev = _area_pdf(pdf_light_rev_solid, lig["wi"][:, s - 2],
                                 lig["dist_prev"][:, s - 2], n_target)
            pdf_rev.append(prev_rev)
        else:
            pdf_rev.append(lig["pdf_rev"][:, wj])
        conn.append(~lig["spec"][:, wj])
    # index s-1: the connecting light vertex (walk s-2); forced connectable
    pdf_fwd.append(lig["pdf_fwd"][:, s - 2])
    pdf_rev.append(pdf_conn_to_light)
    conn.append(jnp.ones((R,), bool))
    return pdf_fwd, pdf_rev, conn


def _build_camera_side(scene, cam, t, R, pdf_light_to_cam, pdf_cam_rev_solid,
                       root_connectable=True):
    """Combined-array entries for the camera side (indices s..s+t-1).
    The connecting camera vertex is combined index s (forced connectable).
    The camera root's connectable flag follows the reconstruction
    filter's Dirac-ness (ref PathVertex: _dirac = camera->isFilterDirac()),
    so with the default tent filter the t'=1 splat strategy participates
    in every strategy's MIS weight.
    pdf_cam_rev_solid: solid pdf at the connecting camera vertex toward
    its predecessor given the new (connection) incoming direction."""
    ci = t - 2  # camera walk index of the connecting vertex
    pdf_fwd, pdf_rev, conn = [], [], []
    # connecting camera vertex
    pdf_fwd.append(pdf_light_to_cam)
    pdf_rev.append(cam["pdf_fwd"][:, ci])
    conn.append(jnp.ones((R,), bool))
    # its predecessor: reverse pdf recomputed with the connection direction
    if t >= 2:
        if ci >= 1:
            n_prev = cam["ng"][:, ci - 1]
            prev_rev = _area_pdf(pdf_cam_rev_solid, cam["wi"][:, ci],
                                 cam["dist_prev"][:, ci], n_prev)
            pdf_fwd.append(prev_rev)
            pdf_rev.append(cam["pdf_fwd"][:, ci - 1])
            conn.append(~cam["spec"][:, ci - 1])
        else:
            # predecessor is the camera root (lens)
            pdf_fwd.append(jnp.ones((R,)))
            pdf_rev.append(jnp.ones((R,)))
            conn.append(jnp.full((R,), root_connectable))
            return pdf_fwd, pdf_rev, conn
    # remaining camera vertices toward the root
    for j in range(2, t):
        cj = ci - j  # walk index; cj == -1 means the camera root
        if cj >= 0:
            pdf_fwd.append(cam["pdf_rev"][:, cj])
            pdf_rev.append(cam["pdf_fwd"][:, cj])
            conn.append(~cam["spec"][:, cj])
        else:
            pdf_fwd.append(jnp.ones((R,)))
            pdf_rev.append(jnp.ones((R,)))
            conn.append(jnp.full((R,), root_connectable))
    return pdf_fwd, pdf_rev, conn


def _connect(scene, settings, cam, lig, root, s, t, R):
    """Connect light vertex s-1 with camera vertex t-1 (array indices
    s-2 / t-2 into the stored walks; s==1 means the light root point)."""
    ci = t - 2
    cam_ok = cam["valid"][:, ci] & ~cam["spec"][:, ci]
    pc = cam["p"][:, ci]

    if s == 1:
        pl = root["q"]
        nl_ = root["n"]
        alpha_l = root["alpha_v0"]
        lig_ok = jnp.ones((R,), bool)
    else:
        si = s - 2
        lig_ok = lig["valid"][:, si] & ~lig["spec"][:, si]
        pl = lig["p"][:, si]
        nl_ = lig["ns"][:, si]
        alpha_l = lig["alpha"][:, si]

    dvec = pl - pc
    r2 = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r2, 1e-20))
    dw = dvec / dist[..., None]  # camera vertex -> light vertex

    # camera-side f (cos at the camera vertex folded in)
    f_c, pdf_c_f, pdf_c_r = _eval_bsdf_at(
        scene, settings, cam, ci, cam["wi"][:, ci], dw)
    cos_l = jnp.sum(-dw * nl_, axis=-1)

    if s == 1:
        f_l = jnp.ones((R, 3))
        pdf_l_f = jnp.maximum(cos_l, 0.0) * vm.INV_PI  # emission dir pdf
        pdf_l_r = jnp.zeros((R,))
        ok_l = cos_l > 0
    else:
        si = s - 2
        f_l, pdf_l_f, pdf_l_r = _eval_bsdf_at(
            scene, settings, lig, si, lig["wi"][:, si], -dw)
        f_l = f_l / jnp.maximum(jnp.abs(cos_l), 1e-6)[..., None]
        ok_l = jnp.ones((R,), bool)

    G = jnp.abs(cos_l) / jnp.maximum(r2, 1e-20)
    contrib = cam["alpha"][:, ci] * f_c * G[..., None] * f_l * alpha_l

    ok = cam_ok & lig_ok & ok_l & (jnp.max(contrib, axis=-1) > 0)
    occ = occluded(scene, pc + dw * EPSILON, dw, 0.0, dist * (1.0 - 1e-3))
    ok = ok & ~occ

    # ---- MIS combined arrays ----
    pdf_conn_to_light = _area_pdf(pdf_c_f, dw, dist, nl_)
    pdf_light_to_cam = _area_pdf(pdf_l_f, -dw, dist, cam["ng"][:, ci])
    e_f, e_r, e_c = _build_emitter_side(scene, cam, lig, root, s, R,
                                        pdf_conn_to_light, pdf_l_r)
    c_f, c_r, c_c = _build_camera_side(
        scene, cam, t, R, pdf_light_to_cam, pdf_c_r,
        root_connectable=settings.filter != "dirac")
    pf = jnp.stack(e_f + c_f, axis=1)
    pr = jnp.stack(e_r + c_r, axis=1)
    cn = jnp.stack(e_c + c_c, axis=1)
    w = _mis_weight(pf, pr, cn, s, t)
    return contrib, w, ok


def _connect_lens(scene, settings, cam, lig, root, s, R, cam_pos,
                  mis=True):
    """t=1: connect light vertex s-1 to the pinhole lens; returns
    (pixel, value, ok) for splatting.  The camera root is forced
    connectable in its own strategy (ref misWeight's override).
    mis=False gives the plain light-tracing estimator (every lens
    connection at weight 1 — ref LightTracer.cpp:12-88, which has no
    competing strategies)."""
    if s == 1:
        pl = root["q"]
        nl_ = root["n"]
        alpha_l = root["alpha_v0"]
        lig_ok = jnp.ones((R,), bool)
        spec_l = jnp.zeros((R,), bool)
    else:
        si = s - 2
        lig_ok = lig["valid"][:, si]
        spec_l = lig["spec"][:, si]
        pl = lig["p"][:, si]
        nl_ = lig["ns"][:, si]
        alpha_l = lig["alpha"][:, si]

    dvec = jnp.broadcast_to(cam_pos, (R, 3)) - pl
    r2 = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(r2, 1e-20))
    dw = dvec / dist[..., None]  # light vertex -> camera

    pix, in_frame = _camera_pixel(scene, settings, -dw)
    pdf_dir = _camera_dir_pdf(scene, settings, -dw)
    cos_l = jnp.sum(dw * nl_, axis=-1)

    if s == 1:
        f_l = jnp.ones((R, 3))
        pdf_l_f = jnp.maximum(cos_l, 0.0) * vm.INV_PI
        pdf_l_r = jnp.zeros((R,))
        ok_l = cos_l > 0
    else:
        si = s - 2
        f_l, pdf_l_f, pdf_l_r = _eval_bsdf_at(
            scene, settings, lig, si, lig["wi"][:, si], dw)
        f_l = f_l / jnp.maximum(jnp.abs(cos_l), 1e-6)[..., None]
        ok_l = jnp.ones((R,), bool)

    G = jnp.abs(cos_l) / jnp.maximum(r2, 1e-20)
    # pinhole importance: a pixel's estimator averages radiance over its
    # footprint with density pdf_dir over solid angle; splatting
    # alpha * f * G * pdf_dir / |cos(axis)| reproduces the pixel estimate
    # (validated against the forward tracer).
    cos_axis = jnp.abs(jnp.sum(
        dw * jnp.broadcast_to(scene.cam_mat[:3, 2], (R, 3)), axis=-1))
    val = alpha_l * f_l * G[..., None] * pdf_dir[..., None] / \
        jnp.maximum(cos_axis, 1e-9)[..., None]

    ok = lig_ok & ~spec_l & ok_l & in_frame & (jnp.max(val, axis=-1) > 0)
    occ = occluded(scene, pl + dw * EPSILON, dw, 0.0, dist * (1.0 - 1e-3))
    ok = ok & ~occ

    if not mis:
        return pix, val, ok

    # MIS: emitter side + a single connectable camera root entry
    pdf_conn_to_light = _area_pdf(pdf_dir, -dw, dist, nl_)
    e_f, e_r, e_c = _build_emitter_side(scene, cam, lig, root, s, R,
                                        pdf_conn_to_light, pdf_l_r)
    c_f = [jnp.ones((R,))]
    c_r = [jnp.ones((R,))]
    c_c = [jnp.ones((R,), bool)]  # forced connectable in its own strategy
    pf = jnp.stack(e_f + c_f, axis=1)
    pr = jnp.stack(e_r + c_r, axis=1)
    cn = jnp.stack(e_c + c_c, axis=1)
    w = _mis_weight(pf, pr, cn, s, 1)
    return pix, val * w[..., None], ok


def trace_light(scene, settings, pixel, sample_idx, seed, max_vertices=8,
                max_edges=None):
    """Adjoint particle (light) tracer: one emitter subpath per entry,
    every vertex connected to the lens and splatted — the reference's
    light_tracer integrator (LightTracer.cpp:12-88, LightTraceIntegrator
    .cpp:82-95), i.e. BDPT's t=1 family at MIS weight 1.
    Returns (splat_pixels (R*S,), splat_values (R*S,3))."""
    R = pixel.shape[0]
    NV = max_vertices
    ME = max_edges if max_edges is not None else 2 * NV
    cam_pos = scene.cam_mat[:3, 3]

    root = _sample_light_root(scene, settings, R, seed, pixel, sample_idx)
    lig = _trace_subpath(scene, settings, root["q"] + root["d0"] * EPSILON,
                         root["d0"], root["alpha_walk"], True,
                         seed, pixel, sample_idx,
                         LIGHT_WALK_DIM_OFFSET + 16, NV,
                         root["pdf0_solid"], root["n"])
    splat_pix, splat_val = [], []
    for s in range(1, NV + 1):
        if s > ME:
            continue
        pixv, val, ok = _connect_lens(scene, settings, None, lig, root, s,
                                      R, cam_pos, mis=False)
        splat_pix.append(jnp.where(ok, pixv, 0))
        splat_val.append(jnp.where(ok[..., None], val, 0.0))
    return jnp.concatenate(splat_pix), jnp.concatenate(splat_val)
