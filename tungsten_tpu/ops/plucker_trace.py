"""Pallas TPU ray traversal v3: warp-interval cull + MXU Plücker drain.

Successor to the v2 cluster kernel (ops/cluster_trace.py).  Two measured
bottlenecks in v2 (materialtest, 256k coherent rays, v5e):

  * cull: 7.6 ms — every warp slab-tests EVERY cluster AABB with all
    128 of its rays (23k VPU flops/ray).
  * drain: 67 ms — each cluster visit is a dense 128x128 VPU
    Möller-Trumbore (~1M flops/visit).

v3 keeps the host-built SAH clusters and the per-warp ordered drain but
replaces both phases:

  1. **Interval cull**: each 128-ray warp is summarized as an interval
     "ray" (o in [olo,ohi], d in [dlo,dhi]); one conservative interval
     slab test per (warp, cluster) replaces 128 exact tests.  This is
     classic packet/frustum culling (cf. embree's ray streams) adapted
     to VPU intervals: ~55 flops per warp-cluster, vectorized (8, NC).
     Conservative: never rejects a cluster any live ray could enter.
  2. **Plücker drain**: the 128-ray x 128-tri leaf test becomes two
     MXU matmuls.  Plücker side products are bilinear in (ray, edge),
     so with ray features F_e = [d, (o-cc) x d] (128, 8) and a
     per-cluster edge-coefficient table (8, 384), E = F_e @ edges gives
     all three signed edge volumes for every (ray, tri) pair; a second
     matmul with F_p = [o-cc, 1] gives the t numerator.  cc is the
     cluster box center — recentring keeps the f32 side products
     accurate for scenes far from the origin.

  Identities (verified numerically in tests/test_plucker.py):
    m = o x d; side(P,Q) = d . (P x Q) + m . (Q - P)
    s0 = side(A,B), s1 = side(B,C), s2 = side(C,A)
    s0 + s1 + s2 = d . n,  n = (B-A) x (C-A)
    inside <=> all s_i the same sign (two-sided test)
    t = (n.A - n.o) / (d.n),  u = s2/sum, v = s0/sum
      (u along e1 = B-A, v along e2 = C-A, matching Möller-Trumbore)

This is the embree replacement (ref src/thirdparty/embree rtcIntersect/
rtcOccluded, used via src/core/renderer/TraceableScene.hpp:112-134).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024        # rays per grid step: (8, 128)
CLUSTER = 128       # triangles per cluster (padded)
FEAT_COLS = 512     # 3*128 edge cols + 128 plane cols per cluster
KF = 8              # feature rows (6 used for edges, 4 for plane)
INF = 3.0e38
NPINF = np.float32(3.0e38)
BIGI = 1 << 30
# VMEM budget for the resident feature table; larger scenes fall back
# to the XLA traversal (ops/intersect.py)
VMEM_FEAT_BUDGET = 12 * 1024 * 1024


# --------------------------------------------------------------- host build

def build_plucker_tables(tri_v0, tri_e1, tri_e2):
    """Cluster partition + Plücker coefficient tables.

    Returns (boxes (16, NCp) f32, cents (NCp, 8) f32,
    feat (8, NCp*512) f32, remap (NCp*128,) i32).  boxes rows: 0-2 lo,
    3-5 hi, 9 valid flag.  cents rows are per-cluster centers cc
    (cluster-major so the drain's dynamic scalar loads index the
    sublane dimension).  feat per-cluster block (8, 512):
      cols [0:384]  rows 0-2 = (P x Q) in cc-local coords, rows 3-5 =
                    (Q - P), for (P,Q) = (A,B) | (B,C) | (C,A) in
                    128-column groups (s0 | s1 | s2).
      cols [384:512] rows 0-2 = -n, row 3 = n . (A - cc).
    Padding triangles are all-zero: s_i = 0 passes the sign test but
    den = 0 fails the |den| guard, so they can never hit.
    """
    from tungsten_tpu.scene.bvh import build_bvh

    T = tri_v0.shape[0]
    v1 = tri_v0 + tri_e1
    v2 = tri_v0 + tri_e2
    tlo = np.minimum(np.minimum(tri_v0, v1), v2)
    thi = np.maximum(np.maximum(tri_v0, v1), v2)

    clusters = []
    if T > 0:
        bvh = build_bvh(tlo, thi, max_leaf_size=4)
        for s in range(0, T, CLUSTER):
            clusters.append(bvh.order[s:s + CLUSTER].astype(np.int64))

    nc = len(clusters)
    ncp = -(-max(nc, 1) // 128) * 128
    boxes = np.zeros((16, ncp), np.float32)
    boxes[0:3, :] = NPINF
    boxes[3:6, :] = -NPINF
    cents = np.zeros((ncp, 8), np.float32)
    feat = np.zeros((KF, ncp * FEAT_COLS), np.float32)
    remap = np.full((ncp * CLUSTER,), -1, np.int32)

    for i, ids in enumerate(clusters):
        n = ids.shape[0]
        lo = tlo[ids].min(axis=0)
        hi = thi[ids].max(axis=0)
        cc = 0.5 * (lo + hi)
        boxes[0:3, i] = lo
        boxes[3:6, i] = hi
        cents[i, 0:3] = cc
        boxes[9, i] = 1.0
        A = tri_v0[ids] - cc
        B = A + tri_e1[ids]
        C = A + tri_e2[ids]
        nrm = np.cross(tri_e1[ids], tri_e2[ids])
        base = i * FEAT_COLS
        for b, (P, Q) in enumerate(((A, B), (B, C), (C, A))):
            feat[0:3, base + b * 128:base + b * 128 + n] = np.cross(P, Q).T
            feat[3:6, base + b * 128:base + b * 128 + n] = (Q - P).T
        feat[0:3, base + 384:base + 384 + n] = -nrm.T
        feat[3, base + 384:base + 384 + n] = np.sum(nrm * A, axis=-1)
        remap[i * CLUSTER:i * CLUSTER + n] = ids
    return boxes, cents, feat, remap


# ------------------------------------------------------------------ kernel

def _make_kernel(ncp: int, any_hit: bool, debug_phase: int = 2):

    def kernel(boxes_ref,                      # (16, NCp) VMEM
               cents_ref,                      # (NCp, 8) VMEM
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,             # (8,128) VMEM blocks
               feat_hbm,                       # (8, NCp*512) HBM (ANY)
               t_ref, tri_ref, u_ref, v_ref,   # (8,128) outputs
               entry_ref,                      # (8, NCp) f32 scratch
               feat_ref,                       # (8, NCp*512) VMEM scratch
               feat_sem):                      # DMA semaphore
        # the feature table is DMA'd into persistent VMEM scratch ONCE
        # (grid steps share scratch on TPU); declaring it as a normal
        # VMEM input would re-fetch all ~10 MB every grid step, which
        # measured 7.3 ms of pure IO per 256k rays
        @pl.when(pl.program_id(0) == 0)
        def _():
            dma = pltpu.make_async_copy(feat_hbm, feat_ref, feat_sem)
            dma.start()
            dma.wait()

        if debug_phase == 0:    # ablation: IO only (isolates DMA/launch)
            t_ref[:] = tmax_ref[:]
            tri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
            u_ref[:] = ox_ref[:]
            v_ref[:] = feat_ref[0:8, 0:128]
            entry_ref[:, :] = jnp.zeros((8, ncp), jnp.float32)
            return

        # native layout: row w of each (8, 128) block is warp w's rays
        live = tmax_ref[:] > 0.0

        # ------------- phase A: warp-interval cull -> entry_ref -------
        # Summarize each warp as an interval ray and run one
        # conservative slab test per (warp, cluster), all 8 warps
        # vectorized as (8, NCp) rows.  Lane-reduces in the native
        # layout produce the (8, 1) warp bounds without any transposes.
        def wmin(ref):
            return jnp.min(jnp.where(live, ref[:], INF), axis=1,
                           keepdims=True)         # (8, 1)

        def wmax(ref):
            return jnp.max(jnp.where(live, ref[:], -INF), axis=1,
                           keepdims=True)

        olo = (wmin(ox_ref), wmin(oy_ref), wmin(oz_ref))
        ohi = (wmax(ox_ref), wmax(oy_ref), wmax(oz_ref))
        dlo = (wmin(dx_ref), wmin(dy_ref), wmin(dz_ref))
        dhi = (wmax(dx_ref), wmax(dy_ref), wmax(dz_ref))
        tmin_lo = wmin(tmin_ref)
        tmax_hi = jnp.minimum(wmax(tmax_ref), 1e37)
        any_live = jnp.max(live.astype(jnp.float32), axis=1,
                           keepdims=True) > 0.0   # (8, 1)

        tn = jnp.broadcast_to(tmin_lo, (8, ncp))
        tf = jnp.broadcast_to(tmax_hi, (8, ncp))
        for ax in range(3):
            lo_row = boxes_ref[ax:ax + 1, :]          # (1, NCp)
            hi_row = boxes_ref[ax + 3:ax + 4, :]
            d0, d1 = dlo[ax], dhi[ax]                 # (8, 1)
            same_sign = (d0 > 0.0) | (d1 < 0.0)
            i0 = 1.0 / jnp.where(same_sign, d1, 1.0)  # [1/dhi, 1/dlo]
            i1 = 1.0 / jnp.where(same_sign, d0, 1.0)
            # numerator intervals for both slab planes
            n0_lo = lo_row - ohi[ax]                  # (8, NCp)
            n1_lo = lo_row - olo[ax]
            n0_hi = hi_row - ohi[ax]
            n1_hi = hi_row - olo[ax]

            def hull(n0, n1, i0=i0, i1=i1):
                p00 = n0 * i0
                p01 = n0 * i1
                p10 = n1 * i0
                p11 = n1 * i1
                return (jnp.minimum(jnp.minimum(p00, p01),
                                    jnp.minimum(p10, p11)),
                        jnp.maximum(jnp.maximum(p00, p01),
                                    jnp.maximum(p10, p11)))

            a0_lo, a1_lo = hull(n0_lo, n1_lo)
            a0_hi, a1_hi = hull(n0_hi, n1_hi)
            a0 = jnp.minimum(a0_lo, a0_hi)
            a1 = jnp.maximum(a1_lo, a1_hi)
            tn = jnp.maximum(tn, jnp.where(same_sign, a0, -INF))
            tf = jnp.minimum(tf, jnp.where(same_sign, a1, INF))

        valid_row = boxes_ref[9:10, :] > 0.0          # (1, NCp)
        pend = (tn <= tf * 1.00000024) & valid_row & any_live
        entry_ref[:, :] = jnp.where(pend, tn, INF)

        if debug_phase <= 1:    # ablation: cull only, no drain
            t_ref[:] = jnp.minimum(entry_ref[0:8, 0:128], tmax_ref[:])
            tri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
            u_ref[:] = jnp.zeros((8, 128), jnp.float32)
            v_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        # drain-side ray layout: column w = warp w's 128 rays on sublanes
        oxt = ox_ref[:].T                     # (128, 8)
        oyt = oy_ref[:].T
        ozt = oz_ref[:].T
        dxt = dx_ref[:].T
        dyt = dy_ref[:].T
        dzt = dz_ref[:].T
        tmint = tmin_ref[:].T
        tmaxt = jnp.minimum(tmax_ref[:].T, 1e37)

        lane_tri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        cid_row = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

        # ------------- phase B: per-warp ordered Plücker drain ---------
        # Sequential over warps (pending counts vary wildly); each warp
        # advances a lexicographic (entry, id) cursor and tests one
        # cluster per step via the two MXU matmuls.
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        cols8 = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        eye8 = (rows8 == cols8).astype(jnp.float32)

        def make_warp(w):
            e_row = entry_ref[w:w + 1, :]                 # (1, NCp)
            rox = oxt[:, w:w + 1]                         # (128, 1)
            roy = oyt[:, w:w + 1]
            roz = ozt[:, w:w + 1]
            rdx = dxt[:, w:w + 1]
            rdy = dyt[:, w:w + 1]
            rdz = dzt[:, w:w + 1]
            rtmin = tmint[:, w:w + 1]
            zcol = jnp.zeros((128, 1), jnp.float32)
            onecol = jnp.ones((128, 1), jnp.float32)
            # world-frame ray features, built once per warp; the drain
            # recenters them per cluster with a tiny (8,8) matmul
            mwx = roy * rdz - roz * rdy                   # m = o x d
            mwy = roz * rdx - rox * rdz
            mwz = rox * rdy - roy * rdx
            fe_base = jnp.concatenate(
                [rdx, rdy, rdz, mwx, mwy, mwz, zcol, zcol], axis=1)
            fp_base = jnp.concatenate(
                [rox, roy, roz, onecol, zcol, zcol, zcol, zcol], axis=1)

            def next_pending(cur_e, cur_id, e_row=e_row):
                mask = (e_row > cur_e) | ((e_row == cur_e)
                                          & (cid_row > cur_id))
                em = jnp.where(mask, e_row, INF)
                m = jnp.min(em)                           # scalar
                idx = jnp.min(jnp.where(em == m, cid_row, BIGI))
                return m, idx

            def leaf_once(s, rtmin=rtmin, fe_base=fe_base,
                          fp_base=fp_base, next_pending=next_pending):
                m, cw, tb_w, tr_b, uu_b, vv_b = s
                # clamp a past-the-end cursor to a real cluster: testing
                # extra triangles is wasteful but never wrong
                cw = jnp.minimum(cw, ncp - 1)
                blk = feat_ref[:, pl.ds(pl.multiple_of(cw * FEAT_COLS,
                                                       FEAT_COLS),
                                        FEAT_COLS)]

                ccx = cents_ref[cw, 0]
                ccy = cents_ref[cw, 1]
                ccz = cents_ref[cw, 2]
                # recentring matrix A: [d, m] -> [d, m - cc x d]
                # (m - cc x d = (o - cc) x d, keeping the f32 side
                # products accurate for clusters far from the origin)
                A = eye8
                for (r, c, s_val) in ((1, 3, ccz), (2, 3, -ccy),
                                      (2, 4, ccx), (0, 4, -ccz),
                                      (0, 5, ccy), (1, 5, -ccx)):
                    A = A + jnp.where((rows8 == r) & (cols8 == c),
                                      s_val, 0.0)
                fe = jnp.dot(fe_base, A,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
                E = jnp.dot(fe, blk[:, 0:384],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                # plane matmul with o recentered by scalar broadcast:
                # (o - cc) . (-n) + n.A'  =  fp_base @ blk_p - cc . (-n)
                P = jnp.dot(fp_base, blk[:, 384:512],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                P = P - (ccx * blk[0:1, 384:512] +
                         ccy * blk[1:2, 384:512] +
                         ccz * blk[2:3, 384:512])
                s0 = E[:, 0:128]
                s1 = E[:, 128:256]
                s2 = E[:, 256:384]
                den = s0 + s1 + s2
                inside = ((jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0)
                          | (jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0))
                nz = jnp.abs(den) > 1e-30
                rden = 1.0 / jnp.where(nz, den, 1.0)
                tt = P * rden
                ok = inside & nz & (tt > rtmin) & (tt < tb_w)
                tc = jnp.where(ok, tt, INF)
                tmin_r = jnp.min(tc, axis=1, keepdims=True)   # (128, 1)
                got = tmin_r < tb_w
                sel = (tc == tmin_r) & ok
                kidx = jnp.min(jnp.where(sel, lane_tri, BIGI),
                               axis=1, keepdims=True)
                pick = sel & (lane_tri == kidx)
                su = jnp.sum(jnp.where(pick, s2 * rden, 0.0), axis=1,
                             keepdims=True)
                sv = jnp.sum(jnp.where(pick, s0 * rden, 0.0), axis=1,
                             keepdims=True)
                sid = cw * CLUSTER + jnp.where(kidx == BIGI, 0, kidx)

                if any_hit:
                    tb2 = jnp.where(got, -INF, tb_w)
                else:
                    tb2 = jnp.where(got, tmin_r, tb_w)
                tr2 = jnp.where(got, sid, tr_b)
                uu2 = jnp.where(got, su, uu_b)
                vv2 = jnp.where(got, sv, vv_b)
                m2, cw2 = next_pending(m, cw)
                return m2, cw2, tb2, tr2, uu2, vv2

            tb0 = tmaxt[:, w:w + 1]                       # (128, 1)
            m0, c0 = next_pending(jnp.float32(-INF), jnp.int32(-1))
            init = (m0, c0, tb0,
                    jnp.full((128, 1), -1, jnp.int32),
                    jnp.zeros((128, 1), jnp.float32),
                    jnp.zeros((128, 1), jnp.float32))
            return init, leaf_once

        inits, leafs = zip(*[make_warp(w) for w in range(8)])
        finals = []
        for w in range(8):
            def wcond(s):
                return s[0] <= jnp.max(s[2])

            def wbody(s, leaf=leafs[w]):
                # two clusters per iteration amortize loop latching;
                # a past-the-end second leaf is a safe no-op
                return leaf(leaf(s))

            if debug_phase >= 2:
                finals.append(jax.lax.while_loop(wcond, wbody, inits[w]))
            else:
                finals.append(inits[w])

        t_ref[:] = jnp.concatenate([f[2] for f in finals], axis=1).T
        tri_ref[:] = jnp.concatenate([f[3] for f in finals], axis=1).T
        u_ref[:] = jnp.concatenate([f[4] for f in finals], axis=1).T
        v_ref[:] = jnp.concatenate([f[5] for f in finals], axis=1).T

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ncp", "any_hit", "interpret",
                                    "debug_phase"))
def plucker_intersect(boxes, cents, feat, remap, o, d, t_min, t_max,
                      ncp: int, any_hit: bool = False,
                      interpret: bool = False, debug_phase: int = 2):
    """Closest-hit (or any-hit) traversal.  o/d (R,3), R % BLOCK == 0.
    Returns (t, tri, u, v); tri is an ORIGINAL triangle id, -1 on miss.
    For any_hit a hit ray reports tri >= 0 (its t is not meaningful).
    """
    R = o.shape[0]
    G = R // BLOCK

    def comp(x):
        return x.reshape(G, 8, 128)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2])
    tmin = comp(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,)))
    tmax = comp(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,)))

    blk = pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
    ]
    t, tri, u, v = pl.pallas_call(
        _make_kernel(ncp, any_hit, debug_phase),
        grid=(G,),
        in_specs=[full, full, blk, blk, blk, blk, blk, blk, blk, blk,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[blk, blk, blk, blk],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, ncp), jnp.float32),
                        pltpu.VMEM((8, ncp * FEAT_COLS), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(boxes, cents, ox, oy, oz, dx, dy, dz, tmin, tmax, feat)

    t = t.reshape(R)
    tri = tri.reshape(R)
    u = u.reshape(R)
    v = v.reshape(R)
    if any_hit:
        hit_ok = t <= -1.0
    else:
        hit_ok = tri >= 0
    tri = jnp.where(hit_ok,
                    remap[jnp.clip(tri, 0, remap.shape[0] - 1)], -1)
    return t, tri, u, v
