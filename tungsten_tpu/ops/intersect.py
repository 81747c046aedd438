"""Ray-scene intersection: jnp reference implementations.

Replaces embree's rtcIntersect/rtcOccluded single-ray queries
(ref: src/core/primitives/TriangleMesh.cpp:317-343,
src/core/renderer/TraceableScene.hpp:112-134) with wavefront-vectorized
kernels: every function takes SoA ray batches (R,3)/(R,) and intersects
the whole batch per step.

Traversal uses the flattened BVH's *skip pointers*: each ray keeps a
node cursor; a box hit advances depth-first (cursor+1), a miss jumps
`skip[cursor]`.  This stackless scheme maps directly onto the Pallas
coherent-traversal kernel (ops/pallas_trace.py) where a whole ray block
shares the cursor.

A Hit is the SoA tuple (t, tri_id, u, v); tri_id == -1 means miss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)


def ray_tri(o, d, v0, e1, e2, t_min, t_max):
    """Möller-Trumbore. All args broadcast; returns (hit, t, u, v)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-16, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > 1e-16)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return hit, t, u, v


def ray_box(o, inv_d, lo, hi, t_max):
    """Slab test; returns (hit, t_near)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), 0.0)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    # slight conservative inflation for watertightness (robust slab test)
    return t_near <= t_far * 1.00000024, t_near


def ray_sphere(o, d, center, radius, t_min, t_max):
    """Analytic sphere; returns (hit, t) for the nearest valid root."""
    oc = o - center
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where((t0 > t_min) & (t0 < t_max), t0, t1)
    hit = ok & (t > t_min) & (t < t_max)
    return hit, t


MAX_LEAF = 4  # must match bvh.build_bvh max_leaf_size

# When True, triangle traversal (closest-hit AND any-hit) runs through
# the Pallas wave kernel (ops/wave_trace.py) instead of the
# XLA-gather loop.  Enabled automatically at scene-flatten time on TPU
# backends for scenes whose cluster tables fit in VMEM.
USE_PALLAS = False

# ray-sort key layout: "octant" = dead|octant|morton5|dir-morton4 (the
# round-2 layout); (pos, dir) tuple = dead|origin-morton|dir-morton
# with pos/dir bits per axis.  Round-3 interleaved A/B on the bounce
# workload (tools: /tmp/sort_ab2.py pattern): octant 555-559 ms,
# (4,6) 592-599 ms, (3,7) 676-679 ms, (5,4)-no-octant 674 ms,
# (6,4) 834 ms -> the octant-first layout stands.
SORT_LAYOUT = "octant"

# When False, _wave_dispatch skips the per-call ray sort + un-permute
# entirely and feeds the kernel in submission order (round-4 A/B: the
# two sorts cost ~53 ms per bounce at 786k rays — tools_bprof.py —
# against whatever extra traversal the less-coherent warps cost).
SORT_RAYS = True


def enable_pallas_if_suitable(scene) -> bool:
    """Turn the Pallas wave traversal on when running on a TPU backend:
    scenes whose cluster tables fit in VMEM (~12 MB) take the RESIDENT
    kernel; larger scenes take the PAGED kernel (tables stream through
    VMEM per 256-cluster page, wave_trace.wave_intersect_paged) — no
    more silent fallback to the slow XLA gather loop."""
    global USE_PALLAS
    import jax
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    if platform == "cpu":
        USE_PALLAS = False
    elif scene.wk_attr.size * 4 < 13 * 1024 * 1024:
        USE_PALLAS = True
    else:
        USE_PALLAS = "paged"
    return USE_PALLAS


def bvh_intersect(scene, o, d, t_min, t_max, any_hit: bool = False,
                  presorted: bool = False):
    """Closest-hit (or any-hit) traversal of the scene BVH + spheres +
    curves.

    Args:
      scene: FlatScene
      o, d: (R,3) ray origins/directions
      t_min: scalar or (R,)
      t_max: scalar or (R,) far clip
      any_hit: occlusion query — stop at first hit
      presorted: caller guarantees rays already arrive in a
        traversal-coherent order (e.g. the path tracer's body-end
        state sort) — the wave dispatch skips its per-call sort +
        un-permute
    Returns:
      dict with t (R,), tri (R,) [-1 = miss or sphere], sph (R,),
      crv (R,) [curve segment id, -1 otherwise], u, v (R,), hit (R,)
      bool.  For curve hits u = spline parameter, v = azimuthal coord.
    """
    # clip every ray's far limit at the exit of the scene-wide occluder
    # bounding box: no geometry exists past it, so INF rays (env shadow
    # rays, continuations) become SHORT rays and the traversal's
    # interval culls tighten to the populated region.  Escape semantics
    # are unchanged — `hit` comes from the winner channels, not t.
    if getattr(scene, "geo_lo", None) is not None:
        safe_d = jnp.where(jnp.abs(d) < 1e-20,
                           jnp.where(d >= 0, 1e-20, -1e-20), d)
        tx = jnp.maximum((scene.geo_lo - o) / safe_d,
                         (scene.geo_hi - o) / safe_d)
        exit_t = jnp.maximum(jnp.min(tx, axis=-1), 0.0) * 1.0001 + 1e-4
        t_max = jnp.minimum(
            jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                             exit_t.shape), exit_t)
    res = _tri_sph_intersect(scene, o, d, t_min, t_max, any_hit,
                             presorted=presorted)
    R = o.shape[0]
    crv = jnp.full((R,), -1, jnp.int32)
    if getattr(scene, "crv_pc_q0", None) is not None and \
            scene.crv_pc_q0.shape[0] > 0:
        cur_best = jnp.where(res["hit"], res["t"],
                             jnp.broadcast_to(
                                 jnp.asarray(t_max, jnp.float32), (R,)))
        ct, cseg, cu, cv, chit = _curve_traverse(
            scene, o, d, jnp.broadcast_to(
                jnp.asarray(t_min, jnp.float32), (R,)),
            cur_best, any_hit)
        better = chit
        res["t"] = jnp.where(better, ct, res["t"])
        res["tri"] = jnp.where(better, -1, res["tri"])
        res["sph"] = jnp.where(better, -1, res["sph"])
        res["dsk"] = jnp.where(better, -1, res["dsk"])
        res["cyl"] = jnp.where(better, -1, res["cyl"])
        res["u"] = jnp.where(better, cu, res["u"])
        res["v"] = jnp.where(better, cv, res["v"])
        res["hit"] = res["hit"] | chit
        crv = jnp.where(better, cseg, crv)
    res["crv"] = crv
    return res


def _curve_traverse(scene, o, d, t_min, t_max, any_hit: bool):
    """Skip-pointer walk over the curve-piece BVH.  Pieces are linear
    chords of the quadratic segments; the leaf test is the reference's
    half-cylinder / ribbon intersector in a ray-aligned frame
    (ref Curves.cpp:51-133, intersectTemplate:430-470)."""
    from tungsten_tpu.scene.flatten import CURVE_MODE_RIBBON
    R = o.shape[0]
    num_nodes = scene.cbvh_meta.shape[0]
    n_pieces = scene.crv_pc_q0.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d >= 0, 1e-20, -1e-20), d)

    # ray-aligned frame (lx, ly, lz=d) — Curves.cpp:433-442
    dxz = jnp.sqrt(d[:, 0] ** 2 + d[:, 2] ** 2)
    deg = dxz == 0.0
    sdxz = jnp.maximum(dxz, 1e-20)
    lx = jnp.where(deg[:, None],
                   jnp.asarray([1.0, 0.0, 0.0]),
                   jnp.stack([d[:, 2] / sdxz, jnp.zeros((R,)),
                              -d[:, 0] / sdxz], axis=-1))
    ly = jnp.where(deg[:, None],
                   jnp.stack([jnp.zeros((R,)), jnp.zeros((R,)),
                              -d[:, 1]], axis=-1),
                   jnp.stack([lx[:, 2] * d[:, 1], dxz,
                              -d[:, 1] * lx[:, 0]], axis=-1))

    def proj(p):  # world point (R,3) -> ray frame
        q = p - o
        return jnp.stack([jnp.sum(q * lx, -1), jnp.sum(q * ly, -1),
                          jnp.sum(q * d, -1)], axis=-1)

    # mode is per-segment device data; evaluate both chord tests and
    # select by mode (branchless — the ribbon test is a handful of fma)
    has_ribbon = True

    def piece_test(pid, best):
        """best = (t, seg, u, v, hit); test piece pid (R,) for each ray."""
        pid = jnp.clip(pid, 0, n_pieces - 1)
        q0w = scene.crv_pc_q0[pid]
        q1w = scene.crv_pc_q1[pid]
        e0 = proj(q0w[:, :3])
        e1 = proj(q1w[:, :3])
        w0, w1 = q0w[:, 3], q1w[:, 3]
        pt0 = scene.crv_pc_t0[pid]
        pt1 = scene.crv_pc_t1[pid]
        seg = scene.crv_pc_seg[pid]
        mode = scene.crv_seg_mode[seg]
        bt, bseg, bu, bv, bhit = best

        # ---- half-cylinder chord test (Curves.cpp:51-94) ----
        vxy = e1[:, :2] - e0[:, :2]
        lsq = jnp.sum(vxy * vxy, -1)
        inv_lsq = 1.0 / jnp.maximum(lsq, 1e-30)
        seg_t = -jnp.sum(e0[:, :2] * vxy, -1) * inv_lsq
        signed = e0[:, 0] * vxy[:, 1] - e0[:, 1] * vxy[:, 0]
        dist = jnp.abs(signed) * jnp.sqrt(inv_lsq)
        width = w0 * (1.0 - seg_t) + w1 * seg_t
        depth = e0[:, 2] * (1.0 - seg_t) + e1[:, 2] * seg_t
        dz = e1[:, 2] - e0[:, 2]
        y_sq = width * width - dist * dist
        l_sq = y_sq * (1.0 + dz * dz * inv_lsq)
        delta = jnp.sqrt(jnp.maximum(l_sq, 0.0))
        t0 = depth - delta
        v3 = e0 - e1
        lsq3 = jnp.maximum(jnp.sum(v3 * v3, -1), 1e-30)
        e0z = jnp.stack([e0[:, 0], e0[:, 1], e0[:, 2] - t0], axis=-1)
        seg_t2 = jnp.sum(e0z * v3, -1) / lsq3
        new_t = seg_t2 * (pt1 - pt0) + pt0
        ok_cyl = (dist <= width) & (seg_t2 >= 0.0) & (t0 < bt) & \
            (t0 > t_min) & (new_t >= 0.0) & (new_t <= 1.0)
        v_cyl = 0.5 + 0.5 * dist / jnp.maximum(width, 1e-30)

        ok, t_hit, u_hit, v_hit = ok_cyl, t0, new_t, v_cyl
        if has_ribbon:
            # ---- ribbon test (Curves.cpp:96-133) ----
            nm = proj(scene.crv_pc_nmid[pid] + o)  # vector: project rot only
            v3d = e1 - e0
            lsq_r = jnp.sum(v3d * v3d, -1)
            inv_r = 1.0 / jnp.maximum(lsq_r, 1e-30)
            nr = v3d * (jnp.sum(v3d * nm, -1) * inv_r)[:, None] - nm
            t0r = jnp.sum(nr * e0, -1) / jnp.where(
                jnp.abs(nr[:, 2]) < 1e-20, 1e-20, nr[:, 2])
            local_p = jnp.stack([-e0[:, 0], -e0[:, 1], t0r - e0[:, 2]],
                                axis=-1)
            seg_tr = jnp.sum(local_p * v3d, -1) * inv_r
            width_r = w0 * (1.0 - seg_tr) + w1 * seg_tr
            dvec = local_p - v3d * seg_tr[:, None]
            dist_sq = jnp.sum(dvec * dvec, -1)
            new_tr = seg_tr * (pt1 - pt0) + pt0
            ok_rib = (t0r >= t_min) & (t0r < bt) & (seg_tr >= 0.0) & \
                (seg_tr <= 1.0) & (dist_sq <= width_r * width_r) & \
                (new_tr >= 0.0) & (new_tr <= 1.0)
            is_rib = mode == CURVE_MODE_RIBBON
            ok = jnp.where(is_rib, ok_rib, ok_cyl)
            t_hit = jnp.where(is_rib, t0r, t0)
            u_hit = jnp.where(is_rib, new_tr, new_t)
            v_hit = jnp.where(is_rib, 0.0, v_cyl)

        return (jnp.where(ok, t_hit, bt),
                jnp.where(ok, seg, bseg),
                jnp.where(ok, u_hit, bu),
                jnp.where(ok, v_hit, bv),
                bhit | ok)

    UNROLL = 4

    def step(state):
        node, best = state
        nlo = scene.cbvh_min[node]
        nhi = scene.cbvh_max[node]
        meta = scene.cbvh_meta[node]
        skip = scene.cbvh_skip[node]
        box_hit, _ = ray_box(o, inv_d, nlo, nhi, best[0])
        is_leaf = meta[:, 1] > 0
        test_leaf = box_hit & is_leaf
        for k in range(MAX_LEAF):
            pid = meta[:, 0] + k
            valid = test_leaf & (k < meta[:, 1])
            t, sg, u, v, h = piece_test(pid, best)
            best = (jnp.where(valid, t, best[0]),
                    jnp.where(valid, sg, best[1]),
                    jnp.where(valid, u, best[2]),
                    jnp.where(valid, v, best[3]),
                    jnp.where(valid, h, best[4]))
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, skip)
        if any_hit:
            nxt = jnp.where(best[4], num_nodes, nxt)
        return nxt, best

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    def cond(state):
        return jnp.any(state[0] < num_nodes)

    best0 = (t_max, jnp.full((R,), -1, jnp.int32),
             jnp.zeros((R,)), jnp.zeros((R,)), jnp.zeros((R,), bool))
    _, best = jax.lax.while_loop(
        cond, body, (jnp.zeros((R,), jnp.int32), best0))
    return best


def _analytic_prims(scene, o, d, t_min, t_max):
    """Dense tests against every analytic primitive (spheres, disks,
    cylinders — counts are tiny).  Returns (best_t, sph, dsk, cyl)
    winner channels, each -1 where that type did not win."""
    R = o.shape[0]
    best_t = t_max
    best_sph = jnp.full((R,), -1, jnp.int32)
    best_dsk = jnp.full((R,), -1, jnp.int32)
    best_cyl = jnp.full((R,), -1, jnp.int32)

    S = scene.sph_radius.shape[0]
    if S > 0:
        hs, ts = ray_sphere(
            o[:, None, :], d[:, None, :],
            scene.sph_center[None, :, :], scene.sph_radius[None, :],
            t_min[:, None], best_t[:, None],
        )  # (R, S)
        ts = jnp.where(hs, ts, INF)
        k = jnp.argmin(ts, axis=1)
        tk = jnp.take_along_axis(ts, k[:, None], axis=1)[:, 0]
        got = tk < best_t
        best_t = jnp.where(got, tk, best_t)
        best_sph = jnp.where(got, k.astype(jnp.int32), best_sph)

    dsk_r = getattr(scene, "dsk_r", None)
    D = dsk_r.shape[0] if dsk_r is not None else 0
    if D > 0:
        # world-space plane test (ref Disk.cpp:64-87)
        nd = jnp.sum(d[:, None, :] * scene.dsk_n[None], -1)     # (R, D)
        nd = jnp.where(jnp.abs(nd) < 1e-12,
                       jnp.where(nd >= 0, 1e-12, -1e-12), nd)
        tp = jnp.sum((scene.dsk_c[None] - o[:, None, :])
                     * scene.dsk_n[None], -1) / nd
        q = o[:, None, :] + tp[..., None] * d[:, None, :]
        vq = q - scene.dsk_c[None]
        r_sq = jnp.sum(vq * vq, -1)
        ok = (tp > t_min[:, None]) & (tp < best_t[:, None]) & \
            (r_sq <= (scene.dsk_r * scene.dsk_r)[None])
        ts = jnp.where(ok, tp, INF)
        k = jnp.argmin(ts, axis=1)
        tk = jnp.take_along_axis(ts, k[:, None], axis=1)[:, 0]
        got = tk < best_t
        best_t = jnp.where(got, tk, best_t)
        best_dsk = jnp.where(got, k.astype(jnp.int32), best_dsk)
        best_sph = jnp.where(got, -1, best_sph)

    cyl_r = getattr(scene, "cyl_r", None)
    Y = cyl_r.shape[0] if cyl_r is not None else 0
    if Y > 0:
        # local-space caps + quadric side (ref Cylinder.cpp:56-109).
        # pLocal = rot^T (o - pos); xz scaled by 1/r -> unit circle
        rel = o[:, None, :] - scene.cyl_pos[None]               # (R, Y, 3)
        pl = jnp.einsum("ryi,yij->ryj", rel, scene.cyl_rot)
        dl = jnp.einsum("ri,yij->ryj", d, scene.cyl_rot)
        inv_r = 1.0 / jnp.maximum(scene.cyl_r, 1e-20)[None]     # (1, Y)
        px, py, pz = pl[..., 0] * inv_r, pl[..., 1], pl[..., 2] * inv_r
        dx, dy, dz = dl[..., 0] * inv_r, dl[..., 1], dl[..., 2] * inv_r
        hh = scene.cyl_hh[None]
        tbest = jnp.broadcast_to(best_t[:, None], px.shape)
        found = jnp.zeros(px.shape, bool)
        # caps
        dy_s = jnp.where(jnp.abs(dy) < 1e-6,
                         jnp.where(dy >= 0, 1e-6, -1e-6), dy)
        for sign in (1.0, -1.0):
            tc = (sign * hh - py) / dy_s
            cx = px + tc * dx
            cz = pz + tc * dz
            okc = scene.cyl_capped[None] & (jnp.abs(dy) > 1e-6) & \
                (tc > t_min[:, None]) & (tc < tbest) & \
                (cx * cx + cz * cz < 1.0)
            tbest = jnp.where(okc, tc, tbest)
            found = found | okc
        # side quadric in the scaled xz plane
        A = dx * dx + dz * dz
        B = px * dx + pz * dz
        C = px * px + pz * pz - 1.0
        det_sq = B * B - A * C
        det = jnp.sqrt(jnp.maximum(det_sq, 0.0))
        A_s = jnp.maximum(A, 1e-20)
        for sign in (1.0, -1.0):
            tq = (-B - sign * det) / A_s
            h = py + dy * tq
            okq = (det_sq >= 0.0) & (tq > t_min[:, None]) & (tq < tbest) \
                & (h >= -hh) & (h <= hh)
            tbest = jnp.where(okq, tq, tbest)
            found = found | okq
        ts = jnp.where(found, tbest, INF)
        k = jnp.argmin(ts, axis=1)
        tk = jnp.take_along_axis(ts, k[:, None], axis=1)[:, 0]
        got = tk < best_t
        best_t = jnp.where(got, tk, best_t)
        best_cyl = jnp.where(got, k.astype(jnp.int32), best_cyl)
        best_sph = jnp.where(got, -1, best_sph)
        best_dsk = jnp.where(got, -1, best_dsk)

    return best_t, best_sph, best_dsk, best_cyl


def _tri_sph_intersect(scene, o, d, t_min, t_max, any_hit: bool = False,
                       presorted: bool = False):
    """Triangle-BVH + analytic-primitive traversal (no curves)."""
    R = o.shape[0]
    num_nodes = scene.bvh_meta.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20, jnp.where(d >= 0, 1e-20, -1e-20), d)
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    # --- analytic primitives first (dense; counts are tiny) ---
    best_t, best_sph, best_dsk, best_cyl = _analytic_prims(
        scene, o, d, t_min, t_max)

    if scene.tri_v0.shape[0] == 0:
        hit = (best_sph >= 0) | (best_dsk >= 0) | (best_cyl >= 0)
        return dict(t=best_t, tri=jnp.full((R,), -1, jnp.int32),
                    sph=best_sph, dsk=best_dsk, cyl=best_cyl,
                    u=jnp.zeros((R,)), v=jnp.zeros((R,)), hit=hit)

    if USE_PALLAS:
        return _wave_dispatch(scene, o, d, t_min, best_t,
                              (best_sph, best_dsk, best_cyl), any_hit,
                              presorted=presorted)

    # Several traversal steps are unrolled per while_loop iteration: this
    # backend has high fixed cost per loop iteration, so trading a few
    # speculative node visits for an 8x lower iteration count wins big.
    UNROLL = 8

    def step(state):
        node, t_best, tri_best, u_best, v_best, done = state
        nlo = scene.bvh_min[node]
        nhi = scene.bvh_max[node]
        meta = scene.bvh_meta[node]       # (R, 2)
        skip = scene.bvh_skip[node]

        box_hit, _ = ray_box(o, inv_d, nlo, nhi, t_best)
        is_leaf = meta[:, 1] > 0

        # Leaf: test up to MAX_LEAF triangles (static unroll).
        lt = t_best
        ltri = tri_best
        lu, lv = u_best, v_best
        test_leaf = box_hit & is_leaf
        for k in range(MAX_LEAF):
            tid = meta[:, 0] + k
            valid = test_leaf & (k < meta[:, 1])
            tid_c = jnp.clip(tid, 0, scene.tri_v0.shape[0] - 1)
            h, t, uu, vv = ray_tri(
                o, d, scene.tri_v0[tid_c], scene.tri_e1[tid_c],
                scene.tri_e2[tid_c], t_min, lt)
            h = h & valid
            lt = jnp.where(h, t, lt)
            ltri = jnp.where(h, tid_c.astype(jnp.int32), ltri)
            lu = jnp.where(h, uu, lu)
            lv = jnp.where(h, vv, lv)

        # Advance cursor: into subtree on interior box hit, else skip.
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, skip)
        if any_hit:
            done = done | (ltri >= 0)
            nxt = jnp.where(done, num_nodes, nxt)
        return nxt, lt, ltri, lu, lv, done

    def body(state):
        for _ in range(UNROLL):
            state = step(state)
        return state

    def cond(state):
        node = state[0]
        return jnp.any(node < num_nodes)

    node0 = jnp.zeros((R,), jnp.int32)
    tri0 = jnp.full((R,), -1, jnp.int32)
    state = (node0, best_t, tri0, jnp.zeros((R,)), jnp.zeros((R,)),
             jnp.zeros((R,), bool))
    _, t, tri, u, v, _ = jax.lax.while_loop(cond, body, state)

    got_tri = tri >= 0
    sph = jnp.where(got_tri, -1, best_sph)
    dsk = jnp.where(got_tri, -1, best_dsk)
    cyl = jnp.where(got_tri, -1, best_cyl)
    hit = got_tri | (sph >= 0) | (dsk >= 0) | (cyl >= 0)
    return dict(t=t, tri=tri, sph=sph, dsk=dsk, cyl=cyl, u=u, v=v,
                hit=hit)


def ray_sort_key(scene, o, d, dead):
    """The wave traversal's coherence sort key:
    (dead, direction octant, origin morton, direction morton) as one
    uint32.  Exposed so the path tracer's body-end state sort and the
    per-launch _sort_for_wave build IDENTICAL orders."""
    lo = scene.bvh_min[0]
    hi = scene.bvh_max[0]
    q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)

    def spread5(x):  # interleave up to 5 bits per axis
        x = (x | (x << 8)) & jnp.uint32(0x00F00F)
        x = (x | (x << 4)) & jnp.uint32(0x0C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x249249)
        return x

    if SORT_LAYOUT == "octant":
        qo = (q * 31).astype(jnp.uint32)
        morton = spread5(qo[:, 0]) | (spread5(qo[:, 1]) << 1) | \
            (spread5(qo[:, 2]) << 2)
        qd = ((jnp.clip(d, -1.0, 1.0) + 1.0) * 7.999).astype(jnp.uint32)
        dmorton = spread5(qd[:, 0]) | (spread5(qd[:, 1]) << 1) | \
            (spread5(qd[:, 2]) << 2)
        octant = ((d[:, 0] > 0).astype(jnp.uint32)
                  | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        key_live = (octant << 28) | (morton << 13) | \
            (dmorton & jnp.uint32(0xFFF))
    else:
        pos_bits, dir_bits = SORT_LAYOUT
        qo = (q * (2 ** pos_bits - 1)).astype(jnp.uint32)
        morton = spread5(qo[:, 0]) | (spread5(qo[:, 1]) << 1) | \
            (spread5(qo[:, 2]) << 2)
        dres = float(2 ** dir_bits) - 1e-3
        qd = ((jnp.clip(d, -1.0, 1.0) + 1.0) * 0.5 * dres) \
            .astype(jnp.uint32)
        dmorton = spread5(qd[:, 0]) | (spread5(qd[:, 1]) << 1) | \
            (spread5(qd[:, 2]) << 2)
        key_live = (morton << (3 * dir_bits)) | \
            (dmorton & jnp.uint32((1 << (3 * dir_bits)) - 1))
    return (dead.astype(jnp.uint32) << 31) | key_live


def _sort_for_wave(scene, o, d, t_min=None, t_max=None):
    """Sort rays by ray_sort_key so each 128-ray warp shares an origin
    region and a direction cone — the traversal's warp-interval cull
    tightness depends directly on this.  The direction bits break ties
    for shared-origin rays (primaries: all origins equal, so without
    them the unstable sort scrambles pixels within an octant).

    With t_min/t_max None returns (o_sorted, d_sorted) only (profiling
    helper); otherwise returns (o_s, d_s, tmin_s, tmax_s, order) with
    `order` the original ray index of each sorted slot."""
    R = o.shape[0]
    if t_min is None:
        sort_key = ray_sort_key(scene, o, d, jnp.zeros((R,), bool))
        _, ox, oy, oz, dx, dy, dz = jax.lax.sort(
            [sort_key, o[:, 0], o[:, 1], o[:, 2],
             d[:, 0], d[:, 1], d[:, 2]], num_keys=1, is_stable=True)
        return jnp.stack([ox, oy, oz], -1), jnp.stack([dx, dy, dz], -1)
    sort_key = ray_sort_key(scene, o, d, t_max <= 0.0)
    # one multi-operand sort moves all ray payloads with the key —
    # cheaper than argsort + 8 permutation gathers on TPU; stable
    # so equal-key rays keep raster/submission adjacency
    ridx = jnp.arange(R, dtype=jnp.int32)
    (_, ox_s, oy_s, oz_s, dx_s, dy_s, dz_s, tmin_v, tmax_v,
     order) = jax.lax.sort(
        [sort_key, o[:, 0], o[:, 1], o[:, 2],
         d[:, 0], d[:, 1], d[:, 2], t_min, t_max, ridx],
        num_keys=1, is_stable=True)
    o_srt = jnp.stack([ox_s, oy_s, oz_s], axis=-1)
    d_srt = jnp.stack([dx_s, dy_s, dz_s], axis=-1)
    return o_srt, d_srt, tmin_v, tmax_v, order


def _wave_dispatch(scene, o, d, t_min, best_t, best_ana, any_hit,
                   presorted: bool = False):
    """Sort + pad rays and run the Pallas wave-traversal kernel
    (ops/wave_trace.py), then scatter results back to submission
    order."""
    from tungsten_tpu.ops.wave_trace import (BLOCK, wave_intersect,
                                             wave_intersect_paged)
    R = o.shape[0]
    do_sort = SORT_RAYS and not presorted
    if do_sort:
        o_s, d_s, tmin_s, tmax_s, order = _sort_for_wave(
            scene, o, d, t_min, best_t)
    else:
        o_s, d_s, tmin_s, tmax_s = o, d, t_min, best_t

    pad = (-R) % BLOCK
    if pad:
        o_s = jnp.concatenate([o_s, jnp.zeros((pad, 3))], axis=0)
        d_s = jnp.concatenate(
            [d_s, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                   (pad, 3))], axis=0)
        tmin_s = jnp.concatenate([tmin_s, jnp.zeros((pad,))])
        tmax_s = jnp.concatenate([tmax_s, jnp.zeros((pad,))])
    # gradients never flow through the discrete traversal (detached
    # sampling, interior derivatives only) — cut the tape at the
    # kernel inputs so AD never tries to linearize pallas_call
    sg = jax.lax.stop_gradient
    kern = wave_intersect_paged if USE_PALLAS == "paged" \
        else wave_intersect
    t, tri, u, v = kern(
        sg(scene.wk_boxes), sg(scene.wk_cbox), sg(scene.wk_attr),
        scene.wk_remap, sg(scene.wk_sbox), sg(o_s), sg(d_s),
        sg(tmin_s), sg(tmax_s),
        ncp=scene.wk_boxes.shape[1], any_hit=any_hit,
        tri_v0=sg(scene.tri_v0), tri_e1=sg(scene.tri_e1),
        tri_e2=sg(scene.tri_e2))
    if do_sort:
        # un-permute by sorting results back on the original ray index;
        # occlusion queries only consume the winner id (t is returned
        # as best_t below), so their un-permute moves 2 operands not 5
        if any_hit:
            _, tri = jax.lax.sort([order, tri[:R]], num_keys=1,
                                  is_stable=False)
            t, u, v = best_t, jnp.zeros((R,)), jnp.zeros((R,))
        else:
            _, t, tri, u, v = jax.lax.sort(
                [order, t[:R], tri[:R], u[:R], v[:R]], num_keys=1,
                is_stable=False)
    else:
        t, tri, u, v = t[:R], tri[:R], u[:R], v[:R]
    best_sph, best_dsk, best_cyl = best_ana
    got_tri = tri >= 0
    sph = jnp.where(got_tri, -1, best_sph)
    dsk = jnp.where(got_tri, -1, best_dsk)
    cyl = jnp.where(got_tri, -1, best_cyl)
    hit = got_tri | (sph >= 0) | (dsk >= 0) | (cyl >= 0)
    if any_hit:
        # occlusion: a triangle hit anywhere on the segment counts;
        # t from the kernel is a sentinel, keep best_t for callers
        return dict(t=best_t, tri=tri, sph=sph, dsk=dsk, cyl=cyl,
                    u=u, v=v, hit=hit)
    return dict(t=jnp.where(got_tri, t, best_t), tri=tri, sph=sph,
                dsk=dsk, cyl=cyl, u=u, v=v, hit=hit)



def occluded(scene, o, d, t_min, t_max):
    """Binary occlusion along segments (t_min, t_max)."""
    res = bvh_intersect(scene, o, d, t_min, t_max, any_hit=True)
    return res["hit"]
