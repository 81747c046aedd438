"""Pallas TPU ray traversal v6: hierarchical cull + per-warp MXU drain
with a lean winner-only leaf epilogue.

This is the embree replacement (ref src/thirdparty/embree rtcIntersect/
rtcOccluded, used via src/core/renderer/TraceableScene.hpp:112-134).

History (measured on the real v5e chip, materialtest 80k tris, 1M
coherent primary rays):
  v3  per-warp VPU drain                693 ms
  v4  block-level ordered MXU drain     845 ms  (4,275 ms incoherent)
  v5.1 super-cull + per-warp drain      153 ms  (  455 ms incoherent)
v5.1's cost profile (round-3 ablations): ~0.73 us per cluster visit
with the sweep logic ablated away, i.e. the LEAF dominates — and inside
the leaf, not the matmul but the per-visit bmat construction (cross
products + f32->bf16 hi/lo splitting, ~30 VPU tile-ops) and the full
hit-classification epilogue (~50 tile-ops over (128,128), including
one-hot u/v extraction and two divides).

v6 changes, in cost order:
  * PRECOMPUTED Moller-Trumbore rows: the per-triangle quantities
    [-n, -(e2 x v0), e1 x v0, e2, -e1, -(n.v0)] are computed on the
    host in float64 (build_wave_tables) and stored in the 16 attr rows;
    the leaf no longer computes cross products.
  * PRE-SPLIT bf16 tables: the wrapper derives attr_hi/attr_lo (bf16)
    once per call in XLA; the leaf copies bf16 rows straight into two
    (16, 512) scratches instead of splitting a f32 bmat per visit
    (~24 tile-ops saved per visit).  The f32 3-pass precision contract
    is unchanged: hi*hi + hi*lo + lo*hi, ~2^-21 relative.
  * WINNER-ONLY epilogue: the kernel resolves (t, winning tri slot)
    only; u/v (and a full-f32 t) are recomputed OUTSIDE the kernel for
    the single winning triangle per ray (wave_intersect finalize).
    This deletes the one-hot u/v sums + second divide from the loop.
  * Scalar-cond selection skip: most visits produce no accepted hit
    (measured 120 visits/block coherent vs ~1 winner per ray); the
    ordering/selection half of the epilogue runs under
    `pl.when(any(ok))` and is skipped entirely for hitless visits.
  * Divide-free any-hit: occlusion queries only need "some tri hit",
    so the any-hit epilogue skips the t-ordering divide altogether.
  * One-time scratch init: every visit writes the same bmat blocks, so
    the zero fill runs once per core, not once per visit.

Structure (unchanged from v5.1):
  * clusters (<=128 tris, SAH treelets) are grouped into SUPERS of 16
    consecutive clusters; supers get their own AABB table.
  * phase A (XLA): each 128-ray warp is summarized as 32-ray interval
    rays and culled against the super boxes -> per-warp entry-sorted
    pending lists in SMEM.
  * phase B drain, per warp: supers visited front-to-back with
    early-exit on the warp's max live t; per super, an EXACT per-ray
    slab test over the 16 member clusters; survivors visited
    nearest-entry-first with a (16,512)^T x (16,128) MXU leaf
    evaluating det/u*det/v*det/t*det for 128 rays x 128 tris (every
    Moller-Trumbore quantity is linear in the 16-dim ray feature).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024        # rays per grid step
WARP = 128          # rays per drain sweep
CLUSTER = 128       # triangles per cluster (padded)
SUP = 16            # clusters per super
ATTR_ROWS = 16      # rows per cluster attr block (all 16 used, see build)
FCOLS = 16          # ray feature columns: o d m 1 tmin tmax invd pad
INF = 3.0e38
NPINF = np.float32(3.0e38)
BIGI = 1 << 30
# VMEM budget for the resident tables; larger scenes fall back to the
# XLA traversal (ops/intersect.py)
VMEM_TABLE_BUDGET = 12 * 1024 * 1024


# --------------------------------------------------------------- host build

def build_wave_tables(tri_v0, tri_e1, tri_e2):
    """SAH cluster partition + kernel tables.

    Returns (boxes (16, NCp) f32 attr-major [rows 0-2 lo, 3-5 hi,
    9 valid], cbox (NCp, 8) f32 cluster-major [lox loy loz hix hiy hiz
    valid pad] for the drain's per-ray slab loads, attr (NCp*16, 128)
    f32 PRECOMPUTED Moller-Trumbore rows [see layout below], remap
    (NCp*128,) i32 (cluster*128+lane) -> original tri id, -1 padding,
    sbox (16, NSp) super-cluster AABBs in the boxes layout).

    attr row layout per cluster (lane = triangle), all products in
    float64 then rounded, signs chosen so the leaf only copies:
      rows  0:3   nnr   = -(e1 x e2)        (det columns; -n)
      rows  3:6   ne2v0 = -(e2 x v0)        (u columns)
      rows  6:9   e1v0  =  (e1 x v0)        (v columns)
      rows  9:12  e2                        (u columns)
      rows 12:15  ne1   = -e1               (v columns)
      row  15     nnv0  = -((e1 x e2).v0)   (t columns)
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
        # treelet decomposition: cut the BVH at the shallowest complete
        # subtrees holding <= 128 prims.  Each cluster is one subtree,
        # so its AABB is the SAH-tight node box.
        meta = bvh.meta
        num = meta.shape[0]
        start = np.zeros(num, np.int64)
        count = np.zeros(num, np.int64)
        # prim ranges per node: leaves are DFS-contiguous, an interior
        # node's range is [left.start, right.start + right.count)
        for node in range(num - 1, -1, -1):
            if meta[node, 1] > 0:
                start[node] = meta[node, 0]
                count[node] = meta[node, 1]
            else:
                right = meta[node, 0]
                start[node] = start[node + 1]
                count[node] = count[node + 1] + count[right]
        treelets = []
        stack = [0]
        while stack:
            node = stack.pop()
            if count[node] <= CLUSTER:
                treelets.append((int(start[node]), int(count[node])))
            else:
                stack.append(int(meta[node, 0]))   # right
                stack.append(node + 1)             # left (DFS order)
        treelets.sort()
        # greedy-pack ADJACENT treelets into full 128-slots: packing
        # keeps subtree-aligned boxes while restoring density (pure
        # treelets measured 953 clusters vs 632 packed on materialtest)
        run_start, run_count = treelets[0]
        for s, c in treelets[1:]:
            if run_count + c <= CLUSTER:
                run_count += c
            else:
                clusters.append(bvh.order[run_start:run_start +
                                          run_count].astype(np.int64))
                run_start, run_count = s, c
        clusters.append(bvh.order[run_start:run_start +
                                  run_count].astype(np.int64))

    nc = len(clusters)
    ncp = -(-max(nc, 1) // 128) * 128
    nsup = ncp // SUP
    nsp = -(-nsup // 128) * 128
    boxes = np.zeros((16, ncp), np.float32)
    boxes[0:3, :] = NPINF
    boxes[3:6, :] = -NPINF
    cbox = np.zeros((ncp, 8), np.float32)
    attr = np.zeros((ncp * ATTR_ROWS, 128), np.float32)
    remap = np.full((ncp * CLUSTER,), -1, np.int32)

    v0d = tri_v0.astype(np.float64)
    e1d = tri_e1.astype(np.float64)
    e2d = tri_e2.astype(np.float64)
    for i, ids in enumerate(clusters):
        n = ids.shape[0]
        lo = tlo[ids].min(axis=0)
        hi = thi[ids].max(axis=0)
        boxes[0:3, i] = lo
        boxes[3:6, i] = hi
        boxes[9, i] = 1.0
        cbox[i, 0:3] = lo
        cbox[i, 3:6] = hi
        cbox[i, 6] = 1.0
        nr = np.cross(e1d[ids], e2d[ids])
        base = i * ATTR_ROWS
        attr[base + 0:base + 3, :n] = (-nr).T
        attr[base + 3:base + 6, :n] = (-np.cross(e2d[ids], v0d[ids])).T
        attr[base + 6:base + 9, :n] = np.cross(e1d[ids], v0d[ids]).T
        attr[base + 9:base + 12, :n] = e2d[ids].T
        attr[base + 12:base + 15, :n] = (-e1d[ids]).T
        attr[base + 15, :n] = -np.sum(nr * v0d[ids], axis=-1)
        remap[i * CLUSTER:i * CLUSTER + n] = ids

    sbox = np.zeros((16, nsp), np.float32)
    sbox[0:3, :] = NPINF
    sbox[3:6, :] = -NPINF
    for s in range(nsup):
        sel = slice(s * SUP, (s + 1) * SUP)
        valid = cbox[sel, 6] > 0
        if valid.any():
            sbox[0:3, s] = cbox[sel, 0:3][valid].min(axis=0)
            sbox[3:6, s] = cbox[sel, 3:6][valid].max(axis=0)
            sbox[9, s] = 1.0
    return boxes, cbox, attr, remap, sbox


# ------------------------------------------------------------------ kernel

SUBWARP = 32        # rays per cull interval (XLA phase A)


def _cull_sorted_supers(o, d, tmin_c, tmax_c, sbox, G):
    """XLA phase A: subwarp-interval cull vs super boxes, unioned into
    per-warp pending lists SORTED by conservative entry.

    o/d (R,3); tmin_c/tmax_c (R,1); sbox (16, NSp).  Returns
    (sent (G, 8, NSp) f32 entries INF-padded, sids (G, 8, NSp) i32).

    Runs in XLA rather than in-kernel because (a) the subwarp
    reductions and the per-warp sort are awkward layouts on the VPU and
    (b) it removes the kernel's per-super ordered min-scan + scalar
    extraction, which profiling measured at ~0.9 us per super visit —
    the kernel now walks a precomputed SMEM list with scalar loads.
    32-ray intervals (vs 128) measured ~2x tighter warp lists on
    materialtest (tools_pending.py)."""
    nsp = sbox.shape[1]
    R = o.shape[0]
    ns = R // SUBWARP                    # subwarps total
    live = (tmax_c > 0.0).reshape(ns, SUBWARP, 1)
    od = jnp.concatenate([o, d], axis=1).reshape(ns, SUBWARP, 6)
    lo = jnp.min(jnp.where(live, od, INF), axis=1)      # (ns, 6)
    hi = jnp.max(jnp.where(live, od, -INF), axis=1)
    tmin_s = jnp.min(jnp.where(live[..., 0],
                               tmin_c.reshape(ns, SUBWARP), INF), axis=1)
    tmax_s = jnp.max(jnp.where(live[..., 0],
                               tmax_c.reshape(ns, SUBWARP), -INF), axis=1)
    any_live = jnp.any(live[..., 0], axis=1)

    tn = jnp.broadcast_to(tmin_s[:, None], (ns, nsp))
    tf = jnp.broadcast_to(jnp.minimum(tmax_s, 1e37)[:, None], (ns, nsp))
    for ax in range(3):
        lo_row = sbox[ax][None, :]                      # (1, nsp)
        hi_row = sbox[ax + 3][None, :]
        d0 = lo[:, 3 + ax][:, None]                     # (ns, 1)
        d1 = hi[:, 3 + ax][:, None]
        same = (d0 > 0.0) | (d1 < 0.0)
        i0 = 1.0 / jnp.where(same, d1, 1.0)
        i1 = 1.0 / jnp.where(same, d0, 1.0)
        n0_lo = lo_row - hi[:, ax][:, None]
        n1_lo = lo_row - lo[:, ax][:, None]
        n0_hi = hi_row - hi[:, ax][:, None]
        n1_hi = hi_row - lo[:, ax][:, None]

        def hull(n0, n1, i0=i0, i1=i1):
            p = (n0 * i0, n0 * i1, n1 * i0, n1 * i1)
            return (jnp.minimum(jnp.minimum(p[0], p[1]),
                                jnp.minimum(p[2], p[3])),
                    jnp.maximum(jnp.maximum(p[0], p[1]),
                                jnp.maximum(p[2], p[3])))

        a0_lo, a1_lo = hull(n0_lo, n1_lo)
        a0_hi, a1_hi = hull(n0_hi, n1_hi)
        a0 = jnp.minimum(a0_lo, a0_hi)
        a1 = jnp.maximum(a1_lo, a1_hi)
        tn = jnp.maximum(tn, jnp.where(same, a0, -INF))
        tf = jnp.minimum(tf, jnp.where(same, a1, INF))

    pend = (tn <= tf * 1.00000024) & (sbox[9][None, :] > 0.0) & \
        any_live[:, None]
    entry = jnp.where(pend, tn, INF)                    # (ns, nsp)
    # union subwarps into warps (4 subwarps per 128-ray warp)
    entry_w = entry.reshape(G, 8, WARP // SUBWARP, nsp).min(axis=2)
    ids = jnp.broadcast_to(
        jnp.arange(nsp, dtype=jnp.int32)[None, None, :], entry_w.shape)
    sent, sids = jax.lax.sort([entry_w, ids], num_keys=1)
    return sent, sids


def _make_kernel(ncp: int, nsp: int, any_hit: bool, debug_phase: int = 2,
                 count: bool = False):
    nsup = ncp // SUP

    def kernel(ft_ref,                         # (16, 1024) ray features^T
               sent_ref,                       # (8, NSp) SMEM f32 entries
               sids_ref,                       # (8, NSp) SMEM i32 ids
               cbox_ref,                       # (NCp, 8) VMEM
               attrh_ref,                      # (NCp*16, 128) bf16 hi
               attrl_ref,                      # (NCp*16, 128) bf16 lo
               res_ref,                        # (8, 1024) f32 rows
               tri_ref,                        # (8, 1024) i32 row 0
               b3_ref):                        # (48, 512) bf16 scratch
        # tables are full-array VMEM inputs with constant index maps:
        # fetched once, resident across the sequential grid steps.
        # RAYS LIVE ON LANES: every per-ray quantity is a (rows, W)
        # tile so the VPU runs at full lane width.
        if debug_phase == 0:    # ablation: IO only (isolates DMA/launch)
            res_ref[0:1, :] = jnp.minimum(ft_ref[11:12, :], 1e37)
            res_ref[1:2, :] = ft_ref[0:1, :]
            res_ref[2:3, :] = jnp.broadcast_to(
                attrh_ref[0:1, 0:1].astype(jnp.float32), (1, BLOCK))
            res_ref[3:8, :] = jnp.zeros((5, BLOCK), jnp.float32)
            tri_ref[:] = jnp.full((8, BLOCK), -1, jnp.int32)
            return

        tmax_all = jnp.minimum(ft_ref[11:12, :], 1e37)
        if debug_phase == 1:    # ablation: consume the cull lists only
            e0 = sent_ref[0, 0]
            res_ref[0:1, :] = jnp.minimum(e0, tmax_all)
            res_ref[1:8, :] = jnp.zeros((7, BLOCK), jnp.float32)
            tri_ref[:] = jnp.full((8, BLOCK), -1, jnp.int32)
            return

        # ------------- per-warp hierarchical drain --------------------
        res_ref[0:1, :] = tmax_all
        res_ref[1:8, :] = jnp.zeros((7, BLOCK), jnp.float32)
        tri_ref[:] = jnp.full((8, BLOCK), -1, jnp.int32)

        # the leaf writes the same bmat blocks every visit; zero the
        # never-written regions ONCE per core (scratch persists across
        # the sequential grid steps)
        @pl.when(pl.program_id(0) == 0)
        def _init_scratch():
            b3_ref[:, :] = jnp.zeros((48, 512), jnp.bfloat16)

        sub_tri = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, WARP), 0)
        k_col = jax.lax.broadcasted_iota(jnp.int32, (SUP, 1), 0)

        for w in range(8):
            col = slice(w * WARP, (w + 1) * WARP)
            ftw = ft_ref[:, col]                  # (16, 128)
            fth = ftw.astype(jnp.bfloat16)
            ftl = (ftw - fth.astype(jnp.float32)).astype(jnp.bfloat16)
            # K-stacked feature block: one K=48 matmul computes all
            # three split passes (hi*hi + hi*lo + lo*hi) — the MXU
            # streams M=512 output rows ONCE instead of three times
            f3 = jnp.concatenate([fth, ftl, fth], axis=0)  # (48, 128)
            rtmin = ftw[10:11, :]
            tmax_w = jnp.minimum(ftw[11:12, :], 1e37)
            live0 = tmax_w > 0.0
            ox, oy, oz = ftw[0:1, :], ftw[1:2, :], ftw[2:3, :]
            ix, iy, iz = ftw[12:13, :], ftw[13:14, :], ftw[14:15, :]

            def warp_bound(live0=live0, col=col):
                t = res_ref[0:1, col]
                if any_hit:
                    live = live0 & (t > -1e37)
                else:
                    live = live0
                return jnp.max(jnp.where(live, t, -INF))

            def leaf(cid, f3=f3, rtmin=rtmin, col=col):
                """One (128 rays) x (128 tris) visit on the MXU.

                B3 (48, 512): quantity-major column groups
                  [0:128]=det  [128:256]=u*det  [256:384]=v*det
                  [384:512]=t*det, feature rows o(0:3) d(3:6) m(6:9)
                  1(9); K rows 0:16 = hi table, 16:32 = hi again,
                  32:48 = lo — contracted against [fth; ftl; fth] this
                  yields the full 3-pass hi/lo split (~2^-21 relative)
                  in ONE K=48 MXU pass.  The nonzero blocks are
                  straight bf16 copies of the precomputed attr rows
                  (build_wave_tables layout)."""
                base = pl.multiple_of(cid * ATTR_ROWS, ATTR_ROWS)
                bh = attrh_ref[pl.ds(base, ATTR_ROWS), :]
                bl = attrl_ref[pl.ds(base, ATTR_ROWS), :]
                for ko, blk in ((0, bh), (16, bh), (32, bl)):
                    b3_ref[ko + 3:ko + 6, 0:128] = blk[0:3, :]    # det: -n
                    b3_ref[ko + 3:ko + 6, 128:256] = blk[3:6, :]  # u: -(e2xv0)
                    b3_ref[ko + 6:ko + 9, 128:256] = blk[9:12, :]   # u: +e2
                    b3_ref[ko + 3:ko + 6, 256:384] = blk[6:9, :]  # v: +(e1xv0)
                    b3_ref[ko + 6:ko + 9, 256:384] = blk[12:15, :]  # v: -e1
                    b3_ref[ko + 0:ko + 3, 384:512] = -blk[0:3, :]   # t: +n
                    b3_ref[ko + 9:ko + 10, 384:512] = blk[15:16, :]  # t: -n.v0

                s = jax.lax.dot_general(
                    b3_ref[:], f3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (512, 128)
                det = s[0:128, :]
                u_num = s[128:256, :]
                v_num = s[256:384, :]
                t_num = s[384:512, :]

                sg = jnp.where(det >= 0.0, 1.0, -1.0)
                ad = det * sg
                un = u_num * sg
                vn = v_num * sg
                tn_ = t_num * sg
                tb = res_ref[0:1, col]                  # (1, 128)
                ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                      & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                      & (ad > 1e-16))

                if any_hit:
                    # occlusion: no t ordering needed — any accepted
                    # hit ends the ray's participation
                    gotv = jnp.any(ok, axis=0, keepdims=True)  # (1,128)
                    kidx = jnp.min(jnp.where(ok, sub_tri, BIGI),
                                   axis=0, keepdims=True)
                    sid_t = cid * CLUSTER + \
                        jnp.where(kidx == BIGI, 0, kidx)
                    res_ref[0:1, col] = jnp.where(gotv, -INF, tb)
                    tri_ref[0:1, col] = jnp.where(gotv, sid_t,
                                                  tri_ref[0:1, col])
                    return

                # winner selection (t ordering + slot id); measured
                # round-4: guarding this under pl.when(any(ok)) was
                # 10% SLOWER — the scalar branch stalls the carried
                # sweep pipeline more than the skipped ops save
                tc = jnp.where(ok, tn_ / jnp.maximum(ad, 1e-30), INF)
                tmin_r = jnp.min(tc, axis=0, keepdims=True)  # (1,128)
                got = tmin_r < tb
                sel = (tc == tmin_r) & ok
                kidx = jnp.min(jnp.where(sel, sub_tri, BIGI),
                               axis=0, keepdims=True)
                sid_t = cid * CLUSTER + \
                    jnp.where(kidx == BIGI, 0, kidx)
                res_ref[0:1, col] = jnp.where(got, tmin_r, tb)
                tri_ref[0:1, col] = jnp.where(got, sid_t,
                                              tri_ref[0:1, col])

            def super_visit(sid, bound, live0=live0, rtmin=rtmin,
                            col=col):
                """Per-ray slab vs the 16 member clusters, then visit
                survivors nearest-entry-first.  Returns the updated
                warp bound (max live t)."""
                base = pl.multiple_of(sid * SUP, SUP)
                cb = cbox_ref[pl.ds(base, SUP), :]     # (16, 8)
                t = res_ref[0:1, col]                  # (1, 128)
                # slab per (cluster, ray): (16, 128), rays on lanes
                t0x = (cb[:, 0:1] - ox) * ix
                t1x = (cb[:, 3:4] - ox) * ix
                t0y = (cb[:, 1:2] - oy) * iy
                t1y = (cb[:, 4:5] - oy) * iy
                t0z = (cb[:, 2:3] - oz) * iz
                t1z = (cb[:, 5:6] - oz) * iz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.maximum(jnp.minimum(t0z, t1z), rtmin))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), t))
                hit = (tn <= tf * 1.00000024) & (cb[:, 6:7] > 0.0) & live0
                centry0 = jnp.min(jnp.where(hit, tn, INF), axis=1,
                                  keepdims=True)       # (16, 1)

                if debug_phase == 4:   # ablation: slab only, no leaves
                    res_ref[4:5, col] = res_ref[4:5, col] + \
                        jnp.sum((centry0 < INF).astype(jnp.float32))
                    return bound

                # refresh the warp bound after every leaf visit: a
                # round-4 A/B with a per-super-stale bound measured
                # SLOWER (127 vs 120 ms coherent) — the early t
                # propagation saves more visits than the scalar reduce
                # costs
                def mini_cond(s):
                    centry, bound = s
                    return jnp.min(centry) <= bound

                def mini_body(s):
                    centry, bound = s
                    me = jnp.min(centry)
                    kidx = jnp.min(jnp.where(centry == me, k_col, BIGI))
                    leaf(base + kidx)
                    if count:
                        res_ref[3:4, col] = res_ref[3:4, col] + 1.0
                    return (jnp.where(k_col == kidx, INF, centry),
                            warp_bound())

                _, bound = jax.lax.while_loop(mini_cond, mini_body,
                                              (centry0, bound))
                return bound

            if debug_phase == 3:
                # ablation: fixed 16-visit per-warp drain, no ordering —
                # isolates pure leaf throughput from sweep overhead
                def fixed_body(i, _, w=w):
                    leaf(jnp.minimum(i + w * 16, ncp - 1))
                    return 0
                jax.lax.fori_loop(0, 16, fixed_body, 0)
                continue

            # walk the precomputed entry-sorted super list: one scalar
            # SMEM load per super, early-exit on the carried bound
            def sup_cond(s, w=w):
                k, bound = s
                e = sent_ref[w, jnp.minimum(k, nsp - 1)]
                return (k < nsp) & (e <= bound)

            def sup_body(s, w=w, col=col):
                k, bound = s
                sid = sids_ref[w, jnp.minimum(k, nsp - 1)]
                bound = super_visit(jnp.minimum(sid, nsup - 1), bound)
                if count:
                    res_ref[5:6, col] = res_ref[5:6, col] + 1.0
                return k + 1, bound

            jax.lax.while_loop(sup_cond, sup_body,
                               (jnp.int32(0), warp_bound()))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ncp", "any_hit", "interpret",
                                    "debug_phase", "debug_rows"))
def wave_intersect(boxes, cbox, attr, remap, sbox, o, d, t_min, t_max,
                   ncp: int, any_hit: bool = False,
                   interpret: bool = False, debug_phase: int = 2,
                   debug_rows: bool = False,
                   tri_v0=None, tri_e1=None, tri_e2=None):
    """Closest-hit (or any-hit) traversal.  o/d (R,3), R % BLOCK == 0.
    Returns (t, tri, u, v); tri is an ORIGINAL triangle id, -1 on miss.
    For any_hit a hit ray reports tri >= 0 (its t is not meaningful).
    The kernel resolves winners only; when tri_v0/e1/e2 (the original
    (T,3) triangle arrays) are given, u/v and a full-f32 t are
    recomputed per winner OUTSIDE the kernel (closest-hit only) —
    without them u/v come back 0 (timing/occlusion callers).
    With debug_rows=True additionally returns per-block cluster-visit
    and super-visit counts."""
    R = o.shape[0]
    G = R // BLOCK
    nsp = sbox.shape[1]

    m = jnp.cross(o, d)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d >= 0, 1e-20, -1e-20), d)
    ones = jnp.ones((R, 1))
    tmin_c = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32),
                              (R,))[:, None]
    tmax_c = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              (R,))[:, None]
    # transposed feature layout (G, 16, 1024): rays on lanes — the
    # kernel's native layout (see kernel docstring)
    f = jnp.concatenate([
        o, d, m, ones, tmin_c, tmax_c, inv_d, jnp.zeros((R, 1)),
    ], axis=1).reshape(G, BLOCK, FCOLS).transpose(0, 2, 1)

    # pre-split bf16 tables (one XLA pass per call; the kernel never
    # splits per visit)
    attr_h = attr.astype(jnp.bfloat16)
    attr_l = (attr - attr_h.astype(jnp.float32)).astype(jnp.bfloat16)

    # phase A in XLA: per-warp entry-sorted pending super lists
    sent, sids = _cull_sorted_supers(o, d, tmin_c, tmax_c, sbox, G)

    f_spec = pl.BlockSpec((None, FCOLS, BLOCK), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sent_spec = pl.BlockSpec((None, 8, nsp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    sids_spec = pl.BlockSpec((None, 8, nsp), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM)
    res_spec = pl.BlockSpec((None, 8, BLOCK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((None, 8, BLOCK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    res, tri = pl.pallas_call(
        _make_kernel(ncp, nsp, any_hit, debug_phase, count=debug_rows),
        grid=(G,),
        in_specs=[f_spec, sent_spec, sids_spec, full, full, full],
        out_specs=[res_spec, tri_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((48, 512), jnp.bfloat16)],
        interpret=interpret,
    )(f, sent, sids, cbox, attr_h, attr_l)

    t = res[:, 0, :].reshape(R)
    tri = tri[:, 0, :].reshape(R)
    if any_hit:
        hit_ok = t <= -1.0
    else:
        hit_ok = tri >= 0
    tri = jnp.where(hit_ok,
                    remap[jnp.clip(tri, 0, remap.shape[0] - 1)], -1)

    u = jnp.zeros((R,))
    v = jnp.zeros((R,))
    if tri_v0 is not None and not any_hit and tri_v0.shape[0] > 0:
        # winner finalize: one full-f32 Moller-Trumbore per hit ray
        # (the kernel's 3-pass t is ~2^-21; this sharpens t and
        # produces the u/v the lean epilogue no longer computes)
        from tungsten_tpu.ops.intersect import ray_tri
        tid = jnp.clip(tri, 0, tri_v0.shape[0] - 1)
        _, tf, uf, vf = ray_tri(o, d, tri_v0[tid], tri_e1[tid],
                                tri_e2[tid], -INF, INF)
        fine = hit_ok & jnp.isfinite(tf)
        t = jnp.where(fine, tf, t)
        u = jnp.where(fine, uf, u)
        v = jnp.where(fine, vf, v)

    if debug_rows:
        visits = jnp.sum(res[:, 3, ::WARP], axis=1)     # (G,)
        supers = jnp.sum(res[:, 5, ::WARP], axis=1)
        return t, tri, u, v, visits, supers
    return t, tri, u, v
