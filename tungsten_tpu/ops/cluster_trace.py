"""Pallas TPU ray traversal v2: dense cluster cull + per-warp ordered drain.

Replaces the shared-cursor BVH kernel (ops/pallas_trace.py), whose
block-wide speculative traversal degenerated to near-full-tree scans for
incoherent ray blocks.  This design has NO tree and NO pointer chasing —
both phases are dense, statically scheduled vector work, so throughput
is flat in ray coherence for the cull and degrades only linearly (more
clusters per warp) in the drain:

  * Host: triangles are partitioned into NC spatial clusters of <= 128
    tris (recursive longest-axis median split on centroids), padded with
    degenerate tris.  Per cluster: an AABB column in an attribute-major
    (8, NC) table and a 16x128 VMEM block of SoA triangle attributes
    (v0/e1/e2 rows, lane = tri).
  * Phase A (cull): fully static unrolled slab tests on (128 rays x 128
    clusters) grids — per 128-ray warp the min entry distance per
    cluster lands in an (8, NC) lane-major scratch table.  No scalar
    loads, no dynamic slices.
  * Phase B (drain): each warp sweeps its pending clusters in ascending
    (entry, id) order — a monotone lexicographic advance, so no scratch
    mutation — and runs a dense Moeller-Trumbore test of its 128 rays x
    the cluster's 128 tris on (128,128) grids (rays on sublanes, tris
    on lanes).  A warp stops when its nearest pending entry exceeds
    every ray's current best hit (or every ray is occluded, for
    any-hit), giving BVH-style early termination without a BVH.

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
# One lockstep drain loop per block (lax.cond-gated warps) vs 8
# sequential per-warp loops.  Measured on v5e: lockstep loses ~15-30%
# (Mosaic's cond costs more than the saved loop latching), so per-warp
# stays the default; the flag is kept for future hardware.
LOCKSTEP = False
CLUSTER = 128       # triangles per cluster (padded)
ATTR_ROWS = 16      # rows per cluster attr block (9 used: v0,e1,e2)
MAX_NCP = 2048      # lane-chunk unroll cap (== 256k tris at CLUSTER=128)
INF = 3.0e38
NPINF = np.float32(3.0e38)
BIGI = 1 << 30


# --------------------------------------------------------------- host build

def build_clusters(tri_v0, tri_e1, tri_e2):
    """Partition triangles into spatial clusters of <= CLUSTER tris.

    Recursive longest-axis median split on centroids (the role of the
    reference's BVH leaf collection, ref src/core/bvh/BvhBuilder.cpp
    MidpointSplitter, stopped at cluster granularity).  Returns
    (boxes (8, NCp) f32 attr-major [lox,loy,loz,hix,hiy,hiz,-,-],
    attr (NCp*16, 128) f32, remap (NCp*128,) i32) with NCp padded to a
    multiple of 128.  remap maps (cluster*128+lane) -> original tri id
    (-1 for padding).
    """
    T = tri_v0.shape[0]
    v1 = tri_v0 + tri_e1
    v2 = tri_v0 + tri_e2
    tlo = np.minimum(np.minimum(tri_v0, v1), v2)
    thi = np.maximum(np.maximum(tri_v0, v1), v2)

    # Clusters = binned-SAH BVH subtrees of <= CLUSTER tris, in DFS
    # order: SAH boxes are far tighter than median splits (less box
    # overlap -> fewer clusters per warp in the drain, and chunk-level
    # skipping in the cull actually fires), and DFS order keeps
    # consecutive clusters spatially coherent for the superboxes.
    clusters = []
    if T > 0:
        from tungsten_tpu.scene.bvh import build_bvh
        bvh = build_bvh(tlo, thi, max_leaf_size=4)
        # bvh.order is the DFS concatenation of leaf prim ranges, so
        # consecutive 128-slices of it are exactly DFS-adjacent SAH
        # subtrees
        for s in range(0, T, CLUSTER):
            clusters.append(bvh.order[s:s + CLUSTER].astype(np.int64))

    nc = len(clusters)
    ncp = -(-max(nc, 1) // 128) * 128
    boxes = np.zeros((8, ncp), np.float32)
    boxes[0:3, :] = NPINF       # empty boxes: lo > hi => never hit
    boxes[3:6, :] = -NPINF
    attr = np.zeros((ncp * ATTR_ROWS, 128), np.float32)
    remap = np.full((ncp * CLUSTER,), -1, np.int32)

    for i, ids in enumerate(clusters):
        n = ids.shape[0]
        boxes[0:3, i] = tlo[ids].min(axis=0)
        boxes[3:6, i] = thi[ids].max(axis=0)
        base = i * ATTR_ROWS
        attr[base + 0:base + 3, :n] = tri_v0[ids].T
        attr[base + 3:base + 6, :n] = tri_e1[ids].T
        attr[base + 6:base + 9, :n] = tri_e2[ids].T
        remap[i * CLUSTER:i * CLUSTER + n] = ids

    # supercluster AABBs: one box per 128-cluster chunk, so the kernel's
    # cull phase can skip whole chunks per warp (the clusters come out of
    # a DFS median split, so consecutive clusters are spatially tight)
    sboxes = np.zeros((8, 128), np.float32)
    sboxes[0:3, :] = NPINF
    sboxes[3:6, :] = -NPINF
    for s in range(ncp // 128):
        chunk_lo = boxes[0:3, s * 128:(s + 1) * 128]
        chunk_hi = boxes[3:6, s * 128:(s + 1) * 128]
        valid = chunk_lo[0] <= chunk_hi[0]
        if valid.any():
            sboxes[0:3, s] = chunk_lo[:, valid].min(axis=1)
            sboxes[3:6, s] = chunk_hi[:, valid].max(axis=1)
    return boxes, attr, remap, sboxes


# ------------------------------------------------------------------ kernel

def _safe_inv(x):
    return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                           jnp.where(x >= 0, 1e-20, -1e-20), x)


def _make_kernel(ncp: int, any_hit: bool, debug_phase: int = 2):

    def kernel(boxes_ref,                      # (8, NCp) VMEM attr-major
               sboxes_ref,                     # (8, 128) supercluster AABBs
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,             # (8,128) VMEM blocks
               attr_ref,                       # (NCp*16, 128) VMEM
               t_ref, tri_ref, u_ref, v_ref,   # (8,128) outputs
               entry_ref,                      # (8, NCp) f32 scratch
               sentry_ref):                    # (8, 128) f32 scratch
        # rays transposed once: column w = warp w's 128 rays on sublanes
        oxt = ox_ref[:].T                     # (128, 8)
        oyt = oy_ref[:].T
        ozt = oz_ref[:].T
        dxt = dx_ref[:].T
        dyt = dy_ref[:].T
        dzt = dz_ref[:].T
        tmint = tmin_ref[:].T
        # clamp below the INF miss sentinel so an exhausted warp's
        # pending-minimum (INF) can never satisfy `pending <= bound`
        tmaxt = jnp.minimum(tmax_ref[:].T, 1e37)

        ixt = _safe_inv(dxt)
        iyt = _safe_inv(dyt)
        izt = _safe_inv(dzt)

        def slab_entries(box_ref, s, w, rlive):
            """(1,128) per-cluster min entry over warp w's live rays."""
            rox = oxt[:, w:w + 1]             # (128,1)
            roy = oyt[:, w:w + 1]
            roz = ozt[:, w:w + 1]
            rix = ixt[:, w:w + 1]
            riy = iyt[:, w:w + 1]
            riz = izt[:, w:w + 1]
            rtmin = tmint[:, w:w + 1]
            rtmax = tmaxt[:, w:w + 1]
            lox = box_ref[0:1, s:s + 128]     # (1,128) boxes
            loy = box_ref[1:2, s:s + 128]
            loz = box_ref[2:3, s:s + 128]
            hix = box_ref[3:4, s:s + 128]
            hiy = box_ref[4:5, s:s + 128]
            hiz = box_ref[5:6, s:s + 128]
            t0x = (lox - rox) * rix           # (128,128)
            t1x = (hix - rox) * rix
            t0y = (loy - roy) * riy
            t1y = (hiy - roy) * riy
            t0z = (loz - roz) * riz
            t1z = (hiz - roz) * riz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), rtmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), rtmax))
            hit = (tn <= tf * 1.00000024) & rlive
            return jnp.min(jnp.where(hit, tn, INF), axis=0, keepdims=True)

        # ---------------- phase A: hierarchical dense cull --------------
        # A0: each warp tests the <=128 supercluster boxes (one chunk of
        # 128 clusters each); A1 runs the per-cluster slab tests only for
        # chunks the warp's rays can touch.  entry_ref[w, c] = min over
        # warp w's live rays of the slab entry to cluster c's AABB.
        livet = tmaxt > 0.0
        n_chunks = ncp // 128
        for w in range(8):
            rlive = livet[:, w:w + 1]
            sentry_ref[w:w + 1, :] = slab_entries(sboxes_ref, 0, w, rlive)
        for w in range(8):
            rlive = livet[:, w:w + 1]
            for cl in range(n_chunks):
                s = cl * 128
                entry_ref[w:w + 1, s:s + 128] = jnp.full(
                    (1, 128), INF, jnp.float32)

                @pl.when(sentry_ref[w, cl] < INF)
                def _(w=w, s=s, rlive=rlive):
                    entry_ref[w:w + 1, s:s + 128] = slab_entries(
                        boxes_ref, s, w, rlive)

        if debug_phase == 1:    # ablation: no drain machinery at all
            t_ref[:] = jnp.minimum(entry_ref[0:8, 0:128], tmax_ref[:])
            tri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
            u_ref[:] = jnp.zeros((8, 128), jnp.float32)
            v_ref[:] = jnp.zeros((8, 128), jnp.float32)
            return

        lane_tri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        cid_row = jax.lax.broadcasted_iota(jnp.int32, (1, ncp), 1)

        # Per-warp INDEPENDENT drains (sequential over warps): warps have
        # wildly different pending counts (p50 ~0, p90 ~70 on diffuse
        # wavefronts), so a lockstep step loop wastes its fixed cost on
        # idle warps.  Each warp's while body processes exactly one
        # pending cluster and advances a lexicographic (entry, id)
        # cursor — no conds, no scratch mutation, scalar cursor carry.
        def make_warp(w):
            e_row = entry_ref[w:w + 1, :]                 # (1, NCp)
            rox = oxt[:, w:w + 1]                         # (128,1)
            roy = oyt[:, w:w + 1]
            roz = ozt[:, w:w + 1]
            rdx = dxt[:, w:w + 1]
            rdy = dyt[:, w:w + 1]
            rdz = dzt[:, w:w + 1]
            rtmin = tmint[:, w:w + 1]

            def next_pending(cur_e, cur_id, e_row=e_row):
                mask = (e_row > cur_e) | ((e_row == cur_e)
                                          & (cid_row > cur_id))
                em = jnp.where(mask, e_row, INF)
                m = jnp.min(em)                           # scalar
                idx = jnp.min(jnp.where(em == m, cid_row, BIGI))
                return m, idx

            def leaf_once(s, rox=rox, roy=roy, roz=roz, rdx=rdx, rdy=rdy,
                          rdz=rdz, rtmin=rtmin, next_pending=next_pending):
                m, cw, tb_w, tr_b, uu_b, vv_b = s
                # clamp a past-the-end cursor to a real cluster: testing
                # extra triangles is wasteful but never wrong (a box that
                # failed the slab test cannot contain a closer hit)
                cw = jnp.minimum(cw, ncp - 1)
                blk = attr_ref[pl.ds(cw * ATTR_ROWS, ATTR_ROWS), :]

                v0x = blk[0:1, :]                         # (1,128) tris
                v0y = blk[1:2, :]
                v0z = blk[2:3, :]
                e1x = blk[3:4, :]
                e1y = blk[4:5, :]
                e1z = blk[5:6, :]
                e2x = blk[6:7, :]
                e2y = blk[7:8, :]
                e2z = blk[8:9, :]

                px = rdy * e2z - rdz * e2y                # (128,128)
                py = rdz * e2x - rdx * e2z
                pz = rdx * e2y - rdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = jnp.where(jnp.abs(det) > 1e-16, 1.0 / det, 0.0)
                tx = rox - v0x
                ty = roy - v0y
                tz = roz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (rdx * qx + rdy * qy + rdz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0)
                      & (tt > rtmin) & (tt < tb_w) & (inv != 0.0))
                tc = jnp.where(ok, tt, INF)
                tmin_r = jnp.min(tc, axis=1, keepdims=True)   # (128,1)
                got = tmin_r < tb_w
                sel = (tc == tmin_r) & ok
                kidx = jnp.min(jnp.where(sel, lane_tri, BIGI),
                               axis=1, keepdims=True)
                pick = sel & (lane_tri == kidx)
                su = jnp.sum(jnp.where(pick, uu, 0.0), axis=1,
                             keepdims=True)
                sv = jnp.sum(jnp.where(pick, vv, 0.0), axis=1,
                             keepdims=True)
                sid = cw * CLUSTER + jnp.where(kidx == BIGI, 0, kidx)

                if any_hit:
                    # occluded rays stop participating entirely
                    tb2 = jnp.where(got, -INF, tb_w)
                else:
                    tb2 = jnp.where(got, tmin_r, tb_w)
                tr2 = jnp.where(got, sid, tr_b)
                uu2 = jnp.where(got, su, uu_b)
                vv2 = jnp.where(got, sv, vv_b)
                m2, cw2 = next_pending(m, cw)
                return m2, cw2, tb2, tr2, uu2, vv2

            tb0 = tmaxt[:, w:w + 1]                       # (128,1)
            m0, c0 = next_pending(jnp.float32(-INF), jnp.int32(-1))
            init = (m0, c0, tb0,
                    jnp.full((128, 1), -1, jnp.int32),
                    jnp.zeros((128, 1), jnp.float32),
                    jnp.zeros((128, 1), jnp.float32))
            return init, leaf_once

        inits, leafs = zip(*[make_warp(w) for w in range(8)])

        if LOCKSTEP:
            # ONE while loop per block: every iteration advances each
            # still-pending warp by one cluster under a lax.cond, so the
            # loop count is max(V_w), not sum(V_w) — incoherent blocks
            # (deep-bounce wavefronts) were paying 8x the loop latching.
            def pending(s):
                return s[0] <= jnp.max(s[2])

            def cond(carry):
                live = pending(carry[0])
                for w in range(1, 8):
                    live = live | pending(carry[w])
                return live

            def body(carry):
                out = []
                for w in range(8):
                    s2 = jax.lax.cond(pending(carry[w]), leafs[w],
                                      lambda s: s, carry[w])
                    out.append(s2)
                return tuple(out)

            if debug_phase >= 2:
                finals = jax.lax.while_loop(cond, body, tuple(inits))
            else:
                finals = tuple(inits)
        else:
            finals = []
            for w in range(8):
                def wcond(s):
                    return s[0] <= jnp.max(s[2])

                def wbody(s, leaf=leafs[w]):
                    # two clusters per iteration amortize loop latching;
                    # a past-the-end second leaf is a safe no-op
                    return leaf(leaf(s))

                if debug_phase >= 2:
                    finals.append(jax.lax.while_loop(wcond, wbody,
                                                     inits[w]))
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
def cluster_intersect(boxes, sboxes, attr, remap, o, d, t_min, t_max,
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
                  full],
        out_specs=[blk, blk, blk, blk],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, ncp), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(boxes, sboxes, ox, oy, oz, dx, dy, dz, tmin, tmax, attr)

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
