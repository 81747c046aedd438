"""Pallas TPU ray traversal v7: hierarchical cull + per-warp MXU drain
with a 4-store leaf and a packed single-reduction winner epilogue.

This is the embree replacement (ref src/thirdparty/embree rtcIntersect/
rtcOccluded, used via src/core/renderer/TraceableScene.hpp:112-134).

History (measured on the real v5e chip, materialtest 80k tris, 1M
coherent primary rays):
  v3  per-warp VPU drain                693 ms
  v4  block-level ordered MXU drain     845 ms  (4,275 ms incoherent)
  v5.1 super-cull + per-warp drain      153 ms  (  455 ms incoherent)
  v6  K-stacked leaf + precomputed MT   119 ms  (  333 ms incoherent)

v6's per-visit cost was split between ~21 scratch row-copies (building
the (48, 512) B3 operand from the compact attr rows), the matmul, and
a divide + two-reduction winner epilogue.  v7 attacks all three:

  * 4-STORE LEAF: the ray-feature rows are reordered to
    [o(0:3), 1(3), d(4:7), m(7:10), tmin, tmax, invd(12:15), pad] and
    the stored attr rows to [-(e2xv0)(0:3), e2(3:6), e1xv0(6:9),
    -e1(9:12), n(12:15), -(n.v0)(15)] so that each of the four
    quantity column groups of the B operand is ONE contiguous
    (rows, 128) store from the attr block:
      u cols:   dest[4:10]  <- blk[0:6]    (d.-(e2xv0) + m.e2)
      v cols:   dest[4:10]  <- blk[6:12]   (d.(e1xv0) + m.(-e1))
      t cols:   dest[0:4]   <- blk[12:16]  (o.n + 1.(-n.v0))
      det cols: dest[4:7]   <- -blk[12:15] (d.(-n), negate fused)
    12 stores per visit ([hi; lo; hi] arrangements) vs v6's 21.
    A 2-matmul variant (K=32 + K=16 against an 8-store [hi; lo]
    scratch) measured SLOWER (phase3 90 vs 73 ms): the second MXU
    issue + accumulate outweighs the 4 saved stores — kept K=48,
    one matmul vs [fth; fth; ftl].
  * PACKED WINNER REDUCTION: t-candidates are bitcast to int32 (IEEE
    positives order as ints), the low 7 mantissa bits replaced by the
    triangle slot, and ONE min-reduction yields both the winning t
    (to ~2^-16, sharpened by the f32 finalize outside the kernel) and
    the slot.  Replaces divide + equality-select + two reductions.
  * Any-hit epilogue drops the slot reduction entirely (slot 0 of a
    visited cluster is always a real triangle).

Structure:
  * clusters (<=128 tris, SAH treelets) are grouped into SUPERS of 16
    consecutive clusters; supers get their own AABB table.
  * phase A (XLA): each 128-ray warp is summarized as 32-ray interval
    rays and culled against the super boxes -> per-warp entry-sorted
    pending lists in SMEM.
  * phase B drain, per warp: supers walked front-to-back two at a
    time with early-exit on the warp's max live t; per super pair, an
    EXACT per-ray slab test over the 32 member clusters -> survivor
    bitmask; survivors drained four clusters per (48,2048)^T x
    (48,128) MXU quad-leaf evaluating det/u*det/v*det/t*det for
    128 rays x 4x128 tris (every Moller-Trumbore quantity is linear
    in the 16-dim ray feature).

Measured v7 (same chip/fixture): coherent 96 ms closest / 61 any-hit,
incoherent 207 / 152 — 1.24x/1.6x over v6 end to end, with the leaf
itself 68 ns/cluster-visit in the fixed-drain ablation (phase 3) vs
350 ns in v6.  All kernel-only numbers include the ~25 ms/1M host
dispatch floor of this axon tunnel (phase 0); inside the fused render
jit that floor is amortized.
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
# clusters per MXU leaf pass in the resident kernel's drain: 4 = the
# v7 quad (M=2048), 8 = octo (M=4096) — the round-4 microbench showed
# the (M, 48, 128) matmul nearly flat in M, so wider leaves looked
# like they'd amortize the per-visit issue/store overhead — but the
# round-5 A/B measured Q=8 SLOWER on every case (coherent closest
# 113 vs 99 ms/1M, incoherent 222 vs 206, any-hit 73/161 vs 66/153):
# survivor sets are usually < 8, so the wider leaf pads with duplicate
# clusters whose epilogue work is pure waste.  Kept at the v7 quad.
LEAF_Q = 4
# Any-hit (occlusion) leaf precision mode: False = the full closest-hit
# K=48 [hi;lo;hi] x [fth;fth;ftl] 3-term split (~2^-21 rel);
# "k32" = [hi;lo] x [fth;fth] (drops only the attr_hi*ray_lo term,
# ~2^-9 rel, 8 scratch stores); "k16" = hi*hi only (~2^-8 rel, 4
# stores).  Both reduced modes were A/B'd and REJECTED: 1.5-2% (k16)
# and ~1% (k32) occlusion flips vs f32 brute force on the random-soup
# fixture (tests/test_wave.py gate: <=0.2%) — bounded shadow segments
# hit the ray-feature truncation error.  Keep False.
ANYHIT_LITE = False
# VMEM budget for the resident tables; larger scenes run the PAGED
# variant (cluster tables stream through VMEM page by page via
# scalar-prefetched block indices — see wave_intersect_paged)
VMEM_TABLE_BUDGET = 12 * 1024 * 1024
PAGE_SUP = 16                      # supers per streamed page
PAGE_CLUSTERS = PAGE_SUP * SUP     # 256 clusters = 2 MB bf16 attr pair


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
    float64 then rounded, ordered so each leaf quantity group is ONE
    contiguous copy (see module docstring):
      rows  0:3   ne2v0 = -(e2 x v0)        (u columns, with d)
      rows  3:6   e2                        (u columns, with m)
      rows  6:9   e1v0  =  (e1 x v0)        (v columns, with d)
      rows  9:12  ne1   = -e1               (v columns, with m)
      rows 12:15  n     =  (e1 x e2)        (t columns, with o)
      row  15     nnv0  = -(n . v0)         (t columns, with 1)
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
        attr[base + 0:base + 3, :n] = (-np.cross(e2d[ids], v0d[ids])).T
        attr[base + 3:base + 6, :n] = e2d[ids].T
        attr[base + 6:base + 9, :n] = np.cross(e1d[ids], v0d[ids]).T
        attr[base + 9:base + 12, :n] = (-e1d[ids]).T
        attr[base + 12:base + 15, :n] = nr.T
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
               b2_ref):                        # (48, 4096) bf16 scratch
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
            b2_ref[:, :] = jnp.zeros((48, 4096), jnp.bfloat16)

        sub_tri = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, WARP), 0)

        for w in range(8):
            col = slice(w * WARP, (w + 1) * WARP)
            ftw = ft_ref[:, col]                  # (16, 128)
            fth = ftw.astype(jnp.bfloat16)
            ftl = (ftw - fth.astype(jnp.float32)).astype(jnp.bfloat16)
            # K-stacked feature block: one K=48 matmul against the
            # [hi; lo; hi] arranged scratch computes hi*fth + lo*fth
            # + hi*ftl — the same term set as the 3-pass bf16 split
            # (~2^-21 rel).  A 2-matmul variant (K=32 + K=16, 8 stores)
            # measured SLOWER (phase3 90 vs 73 ms): the second MXU
            # issue + accumulate outweighs the 4 saved stores.
            f3 = jnp.concatenate([fth, fth, ftl], axis=0)  # (48, 128)
            rtmin = ftw[10:11, :]
            tmax_w = jnp.minimum(ftw[11:12, :], 1e37)
            live0 = tmax_w > 0.0
            ox, oy, oz = ftw[0:1, :], ftw[1:2, :], ftw[2:3, :]
            ix, iy, iz = ftw[12:13, :], ftw[13:14, :], ftw[14:15, :]

            def warp_bound(tb, live0=live0):
                if any_hit:
                    live = live0 & (tb > -1e37)
                else:
                    live = live0
                return jnp.max(jnp.where(live, tb, -INF))

            def quad_leaf(cids, tb, tri_v, f3=f3, fth=fth,
                          rtmin=rtmin, col=col):
                """FOUR (128 rays) x (128 tris) cluster visits in ONE
                MXU pass; returns the updated per-warp (best t, best
                packed tri slot) VALUES.  Round-4 microbench
                (tools_mxubench.py): the (M, 48, 128) matmul cost is
                nearly flat in M (137 ns at M=512, 99 at M=1024, 114
                at M=2048) — the MXU is issue/latency-bound at these
                widths, so batching 4 clusters into an M=2048 matmul
                quarters the dominant per-visit cost.  The per-ray
                best (t, tri) travel as LOOP-CARRIED VALUES, not
                res_ref loads/stores: the memory round-trip serialized
                every drain stage on read-after-write hazards
                (measured 0.86 us/quad for matmul+epilogue vs 0.20 in
                the unrolled phase-3 ablation).

                B2 (48, 2048): per cluster q a 512-column group
                [det | u*det | v*det | t*det]; K rows 0:16 and 32:48
                hold the hi arrangement, 16:32 the lo arrangement —
                contracted against [fth; fth; ftl] this yields
                hi*fth + lo*fth + hi*ftl, the same term set (~2^-21
                relative) as the 3-pass bf16 split.  Each arrangement
                is FOUR contiguous stores from the compact attr block
                (see module docstring); zeros elsewhere persist from
                the one-time scratch init.  Duplicate cluster ids (the
                tail of a drain) are idempotent: the strict t test
                rejects the second copy, and the q bits in the packed
                key break the tie deterministically."""
                lite = ANYHIT_LITE if any_hit else False
                arrangements = {False: ((0, "h"), (16, "l"), (32, "h")),
                                "k32": ((0, "h"), (16, "l")),
                                "k16": ((0, "h"),)}[lite]
                kk = 16 * len(arrangements)
                for qi, cid in enumerate(cids):
                    base = pl.multiple_of(cid * ATTR_ROWS, ATTR_ROWS)
                    bh = attrh_ref[pl.ds(base, ATTR_ROWS), :]
                    bl = None if lite == "k16" else \
                        attrl_ref[pl.ds(base, ATTR_ROWS), :]
                    c = qi * 512
                    for ko, which in arrangements:
                        blk = bh if which == "h" else bl
                        b2_ref[ko + 4:ko + 10, c + 128:c + 256] = blk[0:6, :]
                        b2_ref[ko + 4:ko + 10, c + 256:c + 384] = blk[6:12, :]
                        b2_ref[ko + 0:ko + 4, c + 384:c + 512] = blk[12:16, :]
                        b2_ref[ko + 4:ko + 7, c + 0:c + 128] = -blk[12:15, :]

                if debug_phase == 7:   # ablation: drain control + stores
                    res_ref[4:5, col] = res_ref[4:5, col] + \
                        jnp.broadcast_to(bh[0:1, 0:1].astype(jnp.float32),
                                         (1, WARP))
                    return tb, tri_v

                s = jax.lax.dot_general(
                    b2_ref[0:kk, 0:512 * LEAF_Q], f3[0:kk, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (512*Q, 128)

                if any_hit:
                    # occlusion: no t ordering or slot needed — slot 0
                    # of a visited cluster is always a real triangle
                    gotv = jnp.zeros((1, WARP), bool)
                    for qi in range(LEAF_Q):
                        q = qi * 512
                        det = s[q:q + 128, :]
                        sg = jnp.where(det >= 0.0, 1.0, -1.0)
                        ad = det * sg
                        un = s[q + 128:q + 256, :] * sg
                        vn = s[q + 256:q + 384, :] * sg
                        tn_ = s[q + 384:q + 512, :] * sg
                        ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                              & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                              & (ad > 1e-16))
                        gotv = gotv | jnp.any(ok, axis=0, keepdims=True)
                    return (jnp.where(gotv, -INF, tb),
                            jnp.where(gotv, cids[0] * CLUSTER, tri_v))

                # packed winner reduction across all Q clusters: bitcast
                # the positive t candidates to int32 (IEEE order),
                # replace the low 7+log2(Q) mantissa bits with
                # (q, slot), and resolve the winning (t, cluster, slot)
                # with min-reductions (t to ~2^-13 rel at Q=8;
                # sharpened by the f32 finalize outside the kernel).
                qbits = max((LEAF_Q - 1).bit_length(), 1)
                kmask = ~((1 << (7 + qbits)) - 1)
                tb_key = jax.lax.bitcast_convert_type(tb, jnp.int32)
                kmin = jnp.full((1, WARP), jnp.int32(0x7F800000))
                for qi in range(LEAF_Q):
                    q = qi * 512
                    det = s[q:q + 128, :]
                    sg = jnp.where(det >= 0.0, 1.0, -1.0)
                    ad = det * sg
                    un = s[q + 128:q + 256, :] * sg
                    vn = s[q + 256:q + 384, :] * sg
                    tn_ = s[q + 384:q + 512, :] * sg
                    ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                          & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                          & (ad > 1e-16))
                    tc = tn_ / jnp.maximum(ad, 1e-30)
                    key = jax.lax.bitcast_convert_type(tc, jnp.int32)
                    key = jnp.where(ok,
                                    (key & kmask) | (qi << 7) | sub_tri,
                                    jnp.int32(0x7F800000))
                    kmin = jnp.minimum(
                        kmin, jnp.min(key, axis=0, keepdims=True))
                got = kmin < tb_key
                qv = (kmin >> 7) & ((1 << qbits) - 1)
                csel = cids[0]
                for qi in range(1, LEAF_Q):
                    csel = jnp.where(qv == qi, cids[qi], csel)
                t_new = jax.lax.bitcast_convert_type(kmin & kmask,
                                                     jnp.float32)
                return (jnp.where(got, t_new, tb),
                        jnp.where(got, csel * CLUSTER + (kmin & 127),
                                  tri_v))

            def slab16(sid, valid, tb):
                """Exact per-ray slab of one super's 16 member clusters;
                returns (16, 1) bool: does any live ray enter the
                cluster before its current best t (False when `valid`
                is false)."""
                base = pl.multiple_of(sid * SUP, SUP)
                cb = cbox_ref[pl.ds(base, SUP), :]     # (16, 8)
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
                    jnp.minimum(jnp.maximum(t0z, t1z), tb))
                hit = (tn <= tf * 1.00000024) & (cb[:, 6:7] > 0.0) & live0
                return jnp.any(hit, axis=1, keepdims=True) & valid

            tb0 = tmax_w
            tri0 = jnp.full((1, WARP), -1, jnp.int32)

            if debug_phase in (3, 5, 6):
                # ablation: fixed 16-visit per-warp drain (4 quads), no
                # ordering — isolates pure leaf throughput from sweep
                # overhead (5 = stores only, 6 = stores + matmul)
                def fixed_body(i, s, w=w):
                    tb, tri_v = s
                    b = jnp.minimum(LEAF_Q * i + w * 16, ncp - LEAF_Q)
                    return quad_leaf([b + j for j in range(LEAF_Q)],
                                     tb, tri_v)
                tb, tri_v = jax.lax.fori_loop(0, 16 // LEAF_Q, fixed_body,
                                              (tb0, tri0))
                res_ref[0:1, col] = tb
                tri_ref[0:1, col] = tri_v
                continue

            # Walk the precomputed entry-sorted super list TWO supers
            # per sweep iteration.  The slab survivors of both supers
            # are packed into ONE int32 bitmask and each drain quad
            # extracts up to four set bits with scalar-unit tricks
            # (x & -x isolates the lowest bit, a branchless 5-step
            # binary search finds its index) — a round-4 A/B replaced
            # the previous entry-ordered pick chain (4 min+argmin
            # reductions per quad over a (64,1) candidate vector),
            # which measured SLOWER than v6 (156 vs 121 ms coherent).
            # Within a super visits run in slot order, not entry
            # order; across supers the phase-A sort keeps the walk
            # front-to-back.  int32 bitmask throughout (uint
            # reductions and uint->float casts are unsupported in the
            # Mosaic lowering); two's complement keeps every bit trick
            # exact, including bit 31 (see extract).
            pw32 = jnp.left_shift(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (2 * SUP, 1), 0))

            def extract(bits):
                """Pop the lowest set bit; returns (bits', slot) with
                slot = -1 when bits was empty.  INT32_MIN - 1 wraps to
                INT32_MAX so the clear step stays exact for bit 31."""
                lsb = bits & -bits
                slot = jnp.int32(0)
                for sh, mask in ((16, -65536),           # 0xFFFF0000
                                 (8, -16711936),         # 0xFF00FF00
                                 (4, -252645136),        # 0xF0F0F0F0
                                 (2, -858993460),        # 0xCCCCCCCC
                                 (1, -1431655766)):      # 0xAAAAAAAA
                    slot = slot + jnp.where(
                        (lsb & jnp.int32(mask)) != 0, sh, 0)
                slot = jnp.where(lsb == 0, -1, slot)
                return bits & (bits - 1), slot

            def sup_cond(s, w=w):
                k, bound, tb, tri_v = s
                e = sent_ref[w, jnp.minimum(k, nsp - 1)]
                return (k < nsp) & (e <= bound)

            def sup_body(s, w=w, col=col):
                k, bound, tb, tri_v = s
                masks = []
                cbases = []
                for i in range(2):
                    ki = jnp.minimum(k + i, nsp - 1)
                    e_i = sent_ref[w, ki]
                    sid = jnp.minimum(sids_ref[w, ki], nsup - 1)
                    ok_i = (k + i < nsp) & (e_i <= bound)
                    masks.append(slab16(sid, ok_i, tb))
                    cbases.append(sid * SUP)
                    if count:
                        res_ref[5:6, col] = res_ref[5:6, col] + \
                            jnp.where(ok_i, 1.0, 0.0)
                m = jnp.concatenate(masks, axis=0)         # (32, 1)
                bits0 = jnp.sum(jnp.where(m, pw32, 0))

                if debug_phase == 4:   # ablation: slab only, no leaves
                    res_ref[4:5, col] = res_ref[4:5, col] + \
                        jnp.sum(m.astype(jnp.float32))
                    return k + 2, bound, tb, tri_v

                b0, b1 = cbases

                def cid_of(slot, c0):
                    cid = jnp.where(slot >= SUP, b1 + (slot - SUP),
                                    b0 + slot)
                    return jnp.where(slot < 0, c0, cid)

                def mini_cond(s):
                    return s[0] != 0

                def mini_body(s, col=col):
                    bits, tb, tri_v = s
                    ss = []
                    for _ in range(LEAF_Q):
                        bits, sk = extract(bits)
                        ss.append(sk)
                    c0 = cid_of(ss[0], jnp.int32(0))
                    tb, tri_v = quad_leaf(
                        [c0] + [cid_of(s_, c0) for s_ in ss[1:]],
                        tb, tri_v)
                    if count:
                        n = 1.0 + sum(
                            jnp.where(s_ >= 0, 1.0, 0.0) for s_ in ss[1:])
                        res_ref[3:4, col] = res_ref[3:4, col] + n
                    return bits, tb, tri_v

                # the warp bound is only consumed by the OUTER walk's
                # early-exit check — refresh it once per super pair,
                # not once per quad
                _, tb, tri_v = jax.lax.while_loop(mini_cond, mini_body,
                                                  (bits0, tb, tri_v))
                return k + 2, warp_bound(tb), tb, tri_v

            _, _, tb, tri_v = jax.lax.while_loop(
                sup_cond, sup_body,
                (jnp.int32(0), warp_bound(tb0), tb0, tri0))
            res_ref[0:1, col] = tb
            tri_ref[0:1, col] = tri_v

    return kernel


# ----------------------------------------------------- paged (streaming)

def _cull_paged(o, d, tmin_c, tmax_c, sbox, G, n_pages):
    """Phase A for the PAGED kernel: the same subwarp-interval cull as
    _cull_sorted_supers, but per-warp pending lists sorted by
    (page, entry) plus per-(warp, page-slot) index ranges and a compact
    per-block page list.

    Returns (pages (G, S) i32 block page list — ascending, padded by
    repeating the last needed page so pad slots cost no DMA;
    sent (G, 8, NSp) f32; sids (G, 8, NSp) i32;
    offs/offe (G, 8, S) i32 slot ranges — empty on pad slots)."""
    nsp = sbox.shape[1]
    ns = o.shape[0] // SUBWARP
    # --- identical cull math to _cull_sorted_supers ---
    live = (tmax_c > 0.0).reshape(ns, SUBWARP, 1)
    od = jnp.concatenate([o, d], axis=1).reshape(ns, SUBWARP, 6)
    lo = jnp.min(jnp.where(live, od, INF), axis=1)
    hi = jnp.max(jnp.where(live, od, -INF), axis=1)
    tmin_s = jnp.min(jnp.where(live[..., 0],
                               tmin_c.reshape(ns, SUBWARP), INF), axis=1)
    tmax_s = jnp.max(jnp.where(live[..., 0],
                               tmax_c.reshape(ns, SUBWARP), -INF), axis=1)
    any_live = jnp.any(live[..., 0], axis=1)
    tn = jnp.broadcast_to(tmin_s[:, None], (ns, nsp))
    tf = jnp.broadcast_to(jnp.minimum(tmax_s, 1e37)[:, None], (ns, nsp))
    for ax in range(3):
        lo_row = sbox[ax][None, :]
        hi_row = sbox[ax + 3][None, :]
        d0 = lo[:, 3 + ax][:, None]
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
        tn = jnp.maximum(tn, jnp.where(same, jnp.minimum(a0_lo, a0_hi),
                                       -INF))
        tf = jnp.minimum(tf, jnp.where(same, jnp.maximum(a1_lo, a1_hi),
                                       INF))
    pend = (tn <= tf * 1.00000024) & (sbox[9][None, :] > 0.0) & \
        any_live[:, None]
    entry = jnp.where(pend, tn, INF)
    entry_w = entry.reshape(G, 8, WARP // SUBWARP, nsp).min(axis=2)
    # --- (page, entry) two-key sort ---
    page_col = (jnp.arange(nsp, dtype=jnp.int32) // PAGE_SUP)[None, None]
    page_w = jnp.where(entry_w < INF,
                       jnp.broadcast_to(page_col, entry_w.shape),
                       jnp.int32(n_pages))           # sentinel: sorts last
    ids = jnp.broadcast_to(
        jnp.arange(nsp, dtype=jnp.int32)[None, None, :], entry_w.shape)
    spage, sent, sids = jax.lax.sort([page_w, entry_w, ids], num_keys=2)
    # --- per-(warp, PAGE) offsets by batched binary search ---
    flat_pages = spage.reshape(G * 8, nsp)
    targets = jnp.arange(n_pages + 1, dtype=jnp.int32)
    off_pg = jax.vmap(
        lambda row: jnp.searchsorted(row, targets, side="left"))(
        flat_pages).reshape(G, 8, n_pages + 1).astype(jnp.int32)
    # --- block page list (union over warps), compacted ascending ---
    cnt = off_pg[:, :, 1:] - off_pg[:, :, :-1]       # (G, 8, P)
    present = jnp.any(cnt > 0, axis=1)               # (G, P)
    order = jnp.argsort(~present, axis=1, stable=True).astype(jnp.int32)
    npg = jnp.sum(present, axis=1).astype(jnp.int32)  # (G,)
    slot = jnp.arange(n_pages, dtype=jnp.int32)[None, :]
    last = jnp.take_along_axis(
        order, jnp.maximum(npg - 1, 0)[:, None], axis=1)
    pages = jnp.where(slot < npg[:, None], order, last)
    pages = jnp.where((npg == 0)[:, None], 0, pages)  # all-dead block
    # --- per-slot ranges (empty on pad slots) ---
    pages_b = jnp.repeat(pages[:, None, :], 8, axis=1)   # (G, 8, S)
    offs = jnp.take_along_axis(off_pg[:, :, :-1], pages_b, axis=2)
    offe = jnp.take_along_axis(off_pg[:, :, 1:], pages_b, axis=2)
    pad = slot[:, :] >= npg[:, None]                 # (G, S)
    offs = jnp.where(pad[:, None, :], 0, offs)
    offe = jnp.where(pad[:, None, :], 0, offe)
    return pages, sent, sids, offs, offe


def _make_kernel_paged(ncp: int, nsp: int, n_pages: int, any_hit: bool):
    nsup = ncp // SUP

    def kernel(pages_ref,                      # (G, S) SMEM (prefetched)
               ft_ref,                         # (16, 1024) ray features^T
               sent_ref,                       # (8, NSp) SMEM f32 entries
               sids_ref,                       # (8, NSp) SMEM i32 ids
               offs_ref,                       # (8, S) SMEM i32
               offe_ref,                       # (8, S) SMEM i32
               cbox_ref,                       # (PAGE_CLUSTERS, 8) VMEM
               attrh_ref,                      # (PAGE_CLUSTERS*16,128) bf16
               attrl_ref,
               res_ref,                        # (8, 1024) f32 rows
               tri_ref,                        # (8, 1024) i32 row 0
               b2_ref):                        # (48, 4096) bf16 scratch
        i = pl.program_id(0)
        p = pl.program_id(1)
        page0 = pages_ref[i, p]
        cl_base = page0 * PAGE_CLUSTERS        # first global cluster here

        tmax_all = jnp.minimum(ft_ref[11:12, :], 1e37)

        @pl.when(p == 0)
        def _init_out():
            res_ref[0:1, :] = tmax_all
            res_ref[1:8, :] = jnp.zeros((7, BLOCK), jnp.float32)
            tri_ref[:] = jnp.full((8, BLOCK), -1, jnp.int32)

        @pl.when((pl.program_id(0) == 0) & (p == 0))
        def _init_scratch():
            b2_ref[:, :] = jnp.zeros((48, 4096), jnp.bfloat16)

        sub_tri = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, WARP), 0)

        for w in range(8):
            col = slice(w * WARP, (w + 1) * WARP)
            ftw = ft_ref[:, col]
            fth = ftw.astype(jnp.bfloat16)
            ftl = (ftw - fth.astype(jnp.float32)).astype(jnp.bfloat16)
            f3 = jnp.concatenate([fth, fth, ftl], axis=0)
            rtmin = ftw[10:11, :]
            tmax_w = jnp.minimum(ftw[11:12, :], 1e37)
            live0 = tmax_w > 0.0
            ox, oy, oz = ftw[0:1, :], ftw[1:2, :], ftw[2:3, :]
            ix, iy, iz = ftw[12:13, :], ftw[13:14, :], ftw[14:15, :]

            # best-so-far carried ACROSS PAGES in the resident out block
            tb0 = res_ref[0:1, col]
            tri0 = tri_ref[0:1, col]

            def warp_bound(tb, live0=live0):
                if any_hit:
                    live = live0 & (tb > -1e37)
                else:
                    live = live0
                return jnp.max(jnp.where(live, tb, -INF))

            def quad_leaf(c0, c1, c2, c3, tb, tri_v, f3=f3,
                          rtmin=rtmin):
                """Same MXU quad leaf as the resident kernel, with
                PAGE-LOCAL attr indexing (c* are local cluster slots;
                packed winner keys carry GLOBAL cluster ids)."""
                for qi, cid in enumerate((c0, c1, c2, c3)):
                    base = pl.multiple_of(cid * ATTR_ROWS, ATTR_ROWS)
                    bh = attrh_ref[pl.ds(base, ATTR_ROWS), :]
                    bl = attrl_ref[pl.ds(base, ATTR_ROWS), :]
                    c = qi * 512
                    for ko, blk in ((0, bh), (16, bl), (32, bh)):
                        b2_ref[ko + 4:ko + 10, c + 128:c + 256] = blk[0:6, :]
                        b2_ref[ko + 4:ko + 10, c + 256:c + 384] = blk[6:12, :]
                        b2_ref[ko + 0:ko + 4, c + 384:c + 512] = blk[12:16, :]
                        b2_ref[ko + 4:ko + 7, c + 0:c + 128] = -blk[12:15, :]

                s = jax.lax.dot_general(
                    b2_ref[:, 0:2048], f3,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

                if any_hit:
                    gotv = jnp.zeros((1, WARP), bool)
                    for qi in range(4):
                        q = qi * 512
                        det = s[q:q + 128, :]
                        sg = jnp.where(det >= 0.0, 1.0, -1.0)
                        ad = det * sg
                        un = s[q + 128:q + 256, :] * sg
                        vn = s[q + 256:q + 384, :] * sg
                        tn_ = s[q + 384:q + 512, :] * sg
                        ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                              & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                              & (ad > 1e-16))
                        gotv = gotv | jnp.any(ok, axis=0, keepdims=True)
                    return (jnp.where(gotv, -INF, tb),
                            jnp.where(gotv, (cl_base + c0) * CLUSTER,
                                      tri_v))

                tb_key = jax.lax.bitcast_convert_type(tb, jnp.int32)
                kmin = jnp.full((1, WARP), jnp.int32(0x7F800000))
                for qi in range(4):
                    q = qi * 512
                    det = s[q:q + 128, :]
                    sg = jnp.where(det >= 0.0, 1.0, -1.0)
                    ad = det * sg
                    un = s[q + 128:q + 256, :] * sg
                    vn = s[q + 256:q + 384, :] * sg
                    tn_ = s[q + 384:q + 512, :] * sg
                    ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                          & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                          & (ad > 1e-16))
                    tc = tn_ / jnp.maximum(ad, 1e-30)
                    key = jax.lax.bitcast_convert_type(tc, jnp.int32)
                    key = jnp.where(ok, (key & ~511) | (qi << 7) | sub_tri,
                                    jnp.int32(0x7F800000))
                    kmin = jnp.minimum(
                        kmin, jnp.min(key, axis=0, keepdims=True))
                got = kmin < tb_key
                qv = (kmin >> 7) & 3
                csel = jnp.where(qv == 0, c0,
                                 jnp.where(qv == 1, c1,
                                           jnp.where(qv == 2, c2, c3)))
                t_new = jax.lax.bitcast_convert_type(kmin & ~511,
                                                     jnp.float32)
                return (jnp.where(got, t_new, tb),
                        jnp.where(got,
                                  (cl_base + csel) * CLUSTER
                                  + (kmin & 127), tri_v))

            def slab16(sid_local, valid, tb):
                base = pl.multiple_of(sid_local * SUP, SUP)
                cb = cbox_ref[pl.ds(base, SUP), :]
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
                    jnp.minimum(jnp.maximum(t0z, t1z), tb))
                hit = (tn <= tf * 1.00000024) & (cb[:, 6:7] > 0.0) & live0
                return jnp.any(hit, axis=1, keepdims=True) & valid

            pw32 = jnp.left_shift(
                jnp.int32(1),
                jax.lax.broadcasted_iota(jnp.int32, (2 * SUP, 1), 0))

            def extract(bits):
                lsb = bits & -bits
                slot = jnp.int32(0)
                for sh, mask in ((16, -65536), (8, -16711936),
                                 (4, -252645136), (2, -858993460),
                                 (1, -1431655766)):
                    slot = slot + jnp.where(
                        (lsb & jnp.int32(mask)) != 0, sh, 0)
                slot = jnp.where(lsb == 0, -1, slot)
                return bits & (bits - 1), slot

            ks = offs_ref[w, p]
            ke = offe_ref[w, p]

            def sup_cond(s, w=w):
                k, bound, tb, tri_v = s
                e = sent_ref[w, jnp.minimum(k, nsp - 1)]
                return (k < ke) & (e <= bound)

            def sup_body(s, w=w, col=col):
                k, bound, tb, tri_v = s
                masks = []
                lbases = []
                for j in range(2):
                    kj = jnp.minimum(k + j, nsp - 1)
                    e_j = sent_ref[w, kj]
                    sid = jnp.minimum(sids_ref[w, kj], nsup - 1)
                    sid_local = jnp.clip(sid - page0 * PAGE_SUP, 0,
                                         PAGE_SUP - 1)
                    ok_j = (k + j < ke) & (e_j <= bound)
                    masks.append(slab16(sid_local, ok_j, tb))
                    lbases.append(sid_local * SUP)
                m = jnp.concatenate(masks, axis=0)
                bits0 = jnp.sum(jnp.where(m, pw32, 0))
                b0, b1 = lbases

                def cid_of(slot, c0):
                    cid = jnp.where(slot >= SUP, b1 + (slot - SUP),
                                    b0 + slot)
                    return jnp.where(slot < 0, c0, cid)

                def mini_cond(s):
                    return s[0] != 0

                def mini_body(s):
                    bits, tb, tri_v = s
                    ss = []
                    for _ in range(4):
                        bits, sk = extract(bits)
                        ss.append(sk)
                    c0 = cid_of(ss[0], jnp.int32(0))
                    tb, tri_v = quad_leaf(
                        c0, *[cid_of(s_, c0) for s_ in ss[1:]], tb, tri_v)
                    return bits, tb, tri_v

                _, tb, tri_v = jax.lax.while_loop(mini_cond, mini_body,
                                                  (bits0, tb, tri_v))
                return k + 2, warp_bound(tb), tb, tri_v

            _, _, tb, tri_v = jax.lax.while_loop(
                sup_cond, sup_body, (ks, warp_bound(tb0), tb0, tri0))
            res_ref[0:1, col] = tb
            tri_ref[0:1, col] = tri_v

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("ncp", "any_hit", "interpret"))
def wave_intersect_paged(boxes, cbox, attr, remap, sbox, o, d, t_min,
                         t_max, ncp: int, any_hit: bool = False,
                         interpret: bool = False,
                         tri_v0=None, tri_e1=None, tri_e2=None):
    """PAGED traversal for scenes whose cluster tables exceed the VMEM
    budget: grid (ray blocks x page slots); the attr/cbox tables live in
    HBM and stream through VMEM one 256-cluster page at a time, with the
    per-block page list SCALAR-PREFETCHED so Pallas's block pipeline
    fetches exactly the pages a block needs (pad slots repeat the last
    page id — a repeated block index costs no DMA).  Per-warp walk
    order stays (page, entry)-sorted with the same early-exit bound;
    front-to-back ordering holds within a page, so the paged kernel
    visits somewhat more clusters than the resident kernel but never
    falls back to the XLA gather loop."""
    R = o.shape[0]
    G = R // BLOCK
    # pad cluster tables to a page multiple
    ncp_pg = -(-ncp // PAGE_CLUSTERS) * PAGE_CLUSTERS
    if ncp_pg != ncp:
        pad_c = ncp_pg - ncp
        cbox = jnp.concatenate(
            [cbox, jnp.zeros((pad_c, 8), cbox.dtype)], axis=0)
        attr = jnp.concatenate(
            [attr, jnp.zeros((pad_c * ATTR_ROWS, 128), attr.dtype)],
            axis=0)
    nsp = sbox.shape[1]
    n_pages = ncp_pg // PAGE_CLUSTERS

    m = jnp.cross(o, d)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-20,
                            jnp.where(d >= 0, 1e-20, -1e-20), d)
    ones = jnp.ones((R, 1))
    tmin_c = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32),
                              (R,))[:, None]
    tmax_c = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                              (R,))[:, None]
    f = jnp.concatenate([
        o, ones, d, m, tmin_c, tmax_c, inv_d, jnp.zeros((R, 1)),
    ], axis=1).reshape(G, BLOCK, FCOLS).transpose(0, 2, 1)

    attr_h = attr.astype(jnp.bfloat16)
    attr_l = (attr - attr_h.astype(jnp.float32)).astype(jnp.bfloat16)

    pages, sent, sids, offs, offe = _cull_paged(
        o, d, tmin_c, tmax_c, sbox, G, n_pages)
    S = pages.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, S),
        in_specs=[
            pl.BlockSpec((None, FCOLS, BLOCK),
                         lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, nsp), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 8, nsp), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 8, S), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 8, S), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PAGE_CLUSTERS, 8),
                         lambda i, p, pg: (pg[i, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGE_CLUSTERS * ATTR_ROWS, 128),
                         lambda i, p, pg: (pg[i, p], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PAGE_CLUSTERS * ATTR_ROWS, 128),
                         lambda i, p, pg: (pg[i, p], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, 8, BLOCK), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, BLOCK), lambda i, p, pg: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((48, 4096), jnp.bfloat16)],
    )
    res, tri = pl.pallas_call(
        _make_kernel_paged(ncp_pg, nsp, n_pages, any_hit),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(pages, f, sent, sids, offs, offe, cbox, attr_h, attr_l)

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
        from tungsten_tpu.ops.intersect import ray_tri
        # v0/e1/e2 fetch as ONE packed (T, 9) row gather; misses tap
        # row 0 (tri = -1 clips there) so dead lanes ride the cache
        fin = jnp.concatenate([tri_v0, tri_e1, tri_e2], axis=1)
        tid = jnp.clip(tri, 0, tri_v0.shape[0] - 1)
        rows_f = fin[tid]
        _, tf, uf, vf = ray_tri(o, d, rows_f[:, 0:3], rows_f[:, 3:6],
                                rows_f[:, 6:9], -INF, INF)
        fine = hit_ok & jnp.isfinite(tf)
        t = jnp.where(fine, tf, t)
        u = jnp.where(fine, uf, u)
        v = jnp.where(fine, vf, v)
    return t, tri, u, v


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
    # kernel's native layout [o(0:3) 1(3) d(4:7) m(7:10) tmin tmax
    # invd(12:15) pad] (see module docstring)
    f = jnp.concatenate([
        o, ones, d, m, tmin_c, tmax_c, inv_d, jnp.zeros((R, 1)),
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
        scratch_shapes=[pltpu.VMEM((48, 4096), jnp.bfloat16)],
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
        # v0/e1/e2 fetch as ONE packed (T, 9) row gather; misses tap
        # row 0 (tri = -1 clips there) so dead lanes ride the cache
        fin = jnp.concatenate([tri_v0, tri_e1, tri_e2], axis=1)
        tid = jnp.clip(tri, 0, tri_v0.shape[0] - 1)
        rows_f = fin[tid]
        _, tf, uf, vf = ray_tri(o, d, rows_f[:, 0:3], rows_f[:, 3:6],
                                rows_f[:, 6:9], -INF, INF)
        fine = hit_ok & jnp.isfinite(tf)
        t = jnp.where(fine, tf, t)
        u = jnp.where(fine, uf, u)
        v = jnp.where(fine, vf, v)

    if debug_rows:
        visits = jnp.sum(res[:, 3, ::WARP], axis=1)     # (G,)
        supers = jnp.sum(res[:, 5, ::WARP], axis=1)
        return t, tri, u, v, visits, supers
    return t, tri, u, v
