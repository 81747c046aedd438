"""Pallas TPU ray traversal v5: hierarchical cull + per-warp MXU drain.

This is the embree replacement (ref src/thirdparty/embree rtcIntersect/
rtcOccluded, used via src/core/renderer/TraceableScene.hpp:112-134).

History (measured on the real v5e chip, materialtest 80k tris, 1M
coherent primary rays):
  v3  per-warp VPU drain                693 ms
  v4  block-level ordered MXU drain     845 ms  (4,275 ms incoherent)
v4's failure mode (round-2 VERDICT): the drain was one block-wide
ordered sweep — every visit paid a (16,512)x(16,1024) HIGHEST-precision
matmul against the union of all 8 warps' pending clusters, and the
early-exit waited on the max t over all 1024 rays.  Measured pending
sets (tools_pending.py): block union 466 clusters vs 87 per 128-ray
warp vs ~14 per 32-ray group — the work was 5-30x inflated before the
first triangle was ever tested.

v5 structure:
  * clusters (<=128 tris, SAH treelets) are grouped into SUPERS of 16
    consecutive clusters; supers get their own AABB table.
  * phase A: each 128-ray warp is summarized as an interval ray and
    culled against the ~64 super boxes only -> (8, NSp) entry table.
  * phase B drain, per warp (8 sequential sweeps):
      - supers visited front-to-back by conservative entry; exit when
        entry > max current-t over the warp's live rays.
      - per super, all 16 member clusters get an EXACT per-ray slab
        test ((16,128) VPU, rays on lanes): clusters no ray touches are
        skipped entirely — this removes the interval cull's fat-hull
        false positives, which the measurement above shows are ~85% of
        all pending entries.
      - surviving clusters are visited nearest-entry-first with a
        (16,512)^T x (16,128) MXU leaf per visit: one matmul evaluates
        det/u*det/v*det/t*det for 128 rays x 128 tris (every
        Moller-Trumbore quantity is linear in the 16-dim ray feature
        F = [o, d, o x d, 1, ...]).  Precision HIGH (3-pass f32)
        instead of v4's HIGHEST (6-pass): ~22-bit products are ample
        for hit classification at these scales, and it halves MXU time.
      - early-exit re-checks after every visit, so a warp whose rays
        all resolve stops paying matmuls immediately (v4 waited on the
        slowest of 1024).
Hit classification is division-free except one (128,128) quotient for
the per-visit t ordering and one (1,128) finalize.
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
ATTR_ROWS = 16      # rows per cluster attr block (9 used: v0,e1,e2)
FCOLS = 16          # ray feature columns: o d m 1 tmin tmax invd pad
INF = 3.0e38
NPINF = np.float32(3.0e38)
BIGI = 1 << 30
# VMEM budget for the resident tables; larger scenes fall back to the
# XLA traversal (ops/intersect.py)
VMEM_TABLE_BUDGET = 12 * 1024 * 1024
# leaf matmul mode: True = 3-pass bf16-split f32 (2x faster, ~2^-21
# relative error), False = HIGHEST (6-pass, f32-faithful)
SPLIT3 = True


# --------------------------------------------------------------- host build

def build_wave_tables(tri_v0, tri_e1, tri_e2):
    """SAH cluster partition + kernel tables.

    Returns (boxes (16, NCp) f32 attr-major [rows 0-2 lo, 3-5 hi,
    9 valid], cbox (NCp, 8) f32 cluster-major [lox loy loz hix hiy hiz
    valid pad] for the drain's per-ray slab loads, attr (NCp*16, 128)
    f32 SoA triangle blocks [v0 e1 e2 rows, lane = tri], remap
    (NCp*128,) i32 (cluster*128+lane) -> original tri id, -1 padding,
    sbox (16, NSp) super-cluster AABBs in the boxes layout)."""
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
        base = i * ATTR_ROWS
        attr[base + 0:base + 3, :n] = tri_v0[ids].T
        attr[base + 3:base + 6, :n] = tri_e1[ids].T
        attr[base + 6:base + 9, :n] = tri_e2[ids].T
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
               attr_ref,                       # (NCp*16, 128) VMEM
               res_ref,                        # (8, 1024) f32 rows
               tri_ref,                        # (8, 1024) i32 row 0
               bmat_ref):                      # (16, 512) scratch
        # tables are full-array VMEM inputs with constant index maps:
        # fetched once, resident across the sequential grid steps.
        # RAYS LIVE ON LANES: every per-ray quantity is a (rows, W)
        # tile so the VPU runs at full lane width.
        if debug_phase == 0:    # ablation: IO only (isolates DMA/launch)
            res_ref[0:1, :] = jnp.minimum(ft_ref[11:12, :], 1e37)
            res_ref[1:2, :] = ft_ref[0:1, :]
            res_ref[2:3, :] = jnp.broadcast_to(attr_ref[0:1, 0:1],
                                               (1, BLOCK))
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

        sub_tri = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, WARP), 0)
        k_col = jax.lax.broadcasted_iota(jnp.int32, (SUP, 1), 0)

        for w in range(8):
            col = slice(w * WARP, (w + 1) * WARP)
            ftw = ft_ref[:, col]                  # (16, 128)
            fth = ftw.astype(jnp.bfloat16)
            ftl = (ftw - fth.astype(jnp.float32)).astype(jnp.bfloat16)
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

            def leaf(cid, ftw=ftw, fth=fth, ftl=ftl, rtmin=rtmin,
                     col=col):
                """One (128 rays) x (128 tris) visit on the MXU."""
                blk = attr_ref[pl.ds(pl.multiple_of(cid * ATTR_ROWS,
                                                    ATTR_ROWS),
                                     ATTR_ROWS), :]
                v0r = blk[0:3, :]                 # (3, 128)
                e1r = blk[3:6, :]
                e2r = blk[6:9, :]

                def cross_rows(a, b):
                    return jnp.concatenate([
                        a[1:2] * b[2:3] - a[2:3] * b[1:2],
                        a[2:3] * b[0:1] - a[0:1] * b[2:3],
                        a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

                nr = cross_rows(e1r, e2r)         # n = e1 x e2
                e2v0 = cross_rows(e2r, v0r)       # e2 x v0
                e1v0 = cross_rows(e1r, v0r)       # e1 x v0
                nv0 = jnp.sum(nr * v0r, axis=0, keepdims=True)  # (1,128)

                # B (16, 512): quantity-major column groups
                #   [0:128]=det  [128:256]=u*det  [256:384]=v*det
                #   [384:512]=t*det, feature rows o(0:3) d(3:6) m(6:9)
                #   1(9)
                bmat_ref[:, :] = jnp.zeros((16, 512), jnp.float32)
                bmat_ref[3:6, 0:128] = -nr              # det = -n.d
                bmat_ref[3:6, 128:256] = -e2v0          # u: -(e2 x v0).d
                bmat_ref[6:9, 128:256] = e2r            # u: +e2.m
                bmat_ref[3:6, 256:384] = e1v0           # v: +(e1 x v0).d
                bmat_ref[6:9, 256:384] = -e1r           # v: -e1.m
                bmat_ref[0:3, 384:512] = nr             # t: +n.o
                bmat_ref[9:10, 384:512] = -nv0          # t: -n.v0

                tb = res_ref[0:1, col]                  # (1, 128)
                if SPLIT3:
                    # 3-pass f32 matmul via bf16 hi/lo splitting (Mosaic
                    # has no Precision.HIGH in-kernel): hi*hi + hi*lo +
                    # lo*hi keeps ~2^-21 relative error at half the
                    # cost of HIGHEST (6-pass).
                    bm = bmat_ref[:]
                    bh = bm.astype(jnp.bfloat16)
                    bl = (bm - bh.astype(jnp.float32)).astype(jnp.bfloat16)

                    def mm(a, b):
                        return jax.lax.dot_general(
                            a, b,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    s = (mm(bh, fth) + mm(bh, ftl)
                         + mm(bl, fth))                  # (512, 128)
                else:
                    s = jax.lax.dot_general(
                        bmat_ref[:], ftw,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                det = s[0:128, :]
                u_num = s[128:256, :]
                v_num = s[256:384, :]
                t_num = s[384:512, :]

                sg = jnp.where(det >= 0.0, 1.0, -1.0)
                ad = det * sg
                un = u_num * sg
                vn = v_num * sg
                tn_ = t_num * sg
                ok = ((un >= 0.0) & (vn >= 0.0) & (un + vn <= ad)
                      & (tn_ > rtmin * ad) & (tn_ < tb * ad)
                      & (ad > 1e-16))
                tc = jnp.where(ok, tn_ / jnp.maximum(ad, 1e-30), INF)
                tmin_r = jnp.min(tc, axis=0, keepdims=True)   # (1, 128)
                got = tmin_r < tb
                sel = (tc == tmin_r) & ok
                kidx = jnp.min(jnp.where(sel, sub_tri, BIGI),
                               axis=0, keepdims=True)
                pick = sel & (sub_tri == kidx)
                # u, v via one-hot sums + a single (1, 128) divide
                ad_s = jnp.sum(jnp.where(pick, ad, 0.0), axis=0,
                               keepdims=True)
                un_s = jnp.sum(jnp.where(pick, un, 0.0), axis=0,
                               keepdims=True)
                vn_s = jnp.sum(jnp.where(pick, vn, 0.0), axis=0,
                               keepdims=True)
                inv_s = 1.0 / jnp.maximum(ad_s, 1e-30)
                sid_t = cid * CLUSTER + jnp.where(kidx == BIGI, 0, kidx)

                if any_hit:
                    # occluded rays stop participating entirely
                    res_ref[0:1, col] = jnp.where(got, -INF, tb)
                else:
                    res_ref[0:1, col] = jnp.where(got, tmin_r, tb)
                res_ref[1:2, col] = jnp.where(got, un_s * inv_s,
                                              res_ref[1:2, col])
                res_ref[2:3, col] = jnp.where(got, vn_s * inv_s,
                                              res_ref[2:3, col])
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
                   debug_rows: bool = False):
    """Closest-hit (or any-hit) traversal.  o/d (R,3), R % BLOCK == 0.
    Returns (t, tri, u, v); tri is an ORIGINAL triangle id, -1 on miss.
    For any_hit a hit ray reports tri >= 0 (its t is not meaningful).
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
        in_specs=[f_spec, sent_spec, sids_spec, full, full],
        out_specs=[res_spec, tri_spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32)],
        interpret=interpret,
    )(f, sent, sids, cbox, attr)

    t = res[:, 0, :].reshape(R)
    u = res[:, 1, :].reshape(R)
    v = res[:, 2, :].reshape(R)
    tri = tri[:, 0, :].reshape(R)
    if any_hit:
        hit_ok = t <= -1.0
    else:
        hit_ok = tri >= 0
    tri = jnp.where(hit_ok,
                    remap[jnp.clip(tri, 0, remap.shape[0] - 1)], -1)
    if debug_rows:
        visits = jnp.sum(res[:, 3, ::WARP], axis=1)     # (G,)
        supers = jnp.sum(res[:, 5, ::WARP], axis=1)
        return t, tri, u, v, visits, supers
    return t, tri, u, v
