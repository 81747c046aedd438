"""Pallas TPU BVH traversal: coherent speculative traversal.

The XLA-gather traversal (ops/intersect.py) is bound by per-ray gathers
(~1 element/cycle on the VPU), capping it far below target.  This kernel
removes every per-ray gather: a whole ray block (8x128 = 1024 rays)
shares one DFS cursor into the flattened BVH; node/triangle data is
fetched as (1, 128) rows (dynamic-sublane loads, which Mosaic supports,
unlike dynamic-lane scalar loads) and tested across the block with pure
vector ops.  A subtree is skipped only when *no* ray in the block wants
it — speculative traversal over the skip-pointer DFS, the TPU analog of
coherent packet traversal (replaces embree's rtcIntersect, ref
src/core/renderer/TraceableScene.hpp:112-134).

Scene packing (host, once):
  nodes (ceil(N/16), 128) f32 — 16 nodes/row, 8 floats each:
        [lo.xyz, hi.xyz, meta(= first*8+count or 0), skip]
        node fields are extracted with masked reductions (lane-mask dot).
  tris  (ceil(T4/8), 128) f32 — 8 tris/row, 16 slots each; leaf starts
        are re-aligned to multiples of 4 so a leaf's triangles sit at a
        static lane offset (0 or 64) within one row.
Counts are exact in f32 (< 2^24).  The whole scene lives in VMEM, so
this path is gated to scenes that fit; larger scenes fall back to the
XLA traversal.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 1024          # rays per program: (8, 128)
NODES_PER_ROW = 16    # 8 floats each
TRIS_PER_ROW = 8      # 16 slots each
INF = 3.0e38
MAX_LEAF = 4


def pack_scene(bvh_min, bvh_max, bvh_meta, bvh_skip,
               tri_v0, tri_e1, tri_e2):
    """Host-side packing into the kernel's VMEM layout.

    Leaf triangle ranges are copied into a 4-aligned triangle array so
    the kernel can extract them with static lane offsets.  Returns
    (nodes, tris, num_nodes, tri_remap) — tri_remap maps aligned ids
    back to original triangle ids.
    """
    n = bvh_min.shape[0]
    meta = bvh_meta.astype(np.int64)
    leaf = meta[:, 1] > 0

    # --- re-align leaf triangles ---
    num_leaves = int(leaf.sum())
    aligned_first = np.zeros(n, np.int64)
    aligned_first[leaf] = np.arange(num_leaves) * MAX_LEAF
    t4 = max(num_leaves * MAX_LEAF, 1)
    remap = np.zeros(t4, np.int64)
    av0 = np.zeros((t4, 3), np.float32)
    ae1 = np.zeros((t4, 3), np.float32)
    ae2 = np.zeros((t4, 3), np.float32)
    li = np.nonzero(leaf)[0]
    for k in range(MAX_LEAF):
        sel = meta[li, 1] > k
        src = meta[li[sel], 0] + k
        dst = aligned_first[li[sel]] + k
        av0[dst] = tri_v0[src]
        ae1[dst] = tri_e1[src]
        ae2[dst] = tri_e2[src]
        remap[dst] = src

    nodes = np.zeros((-(-n // NODES_PER_ROW) * NODES_PER_ROW, 8), np.float32)
    nodes[:n, 0:3] = bvh_min
    nodes[:n, 3:6] = bvh_max
    packed_meta = np.where(leaf, aligned_first * 8 + meta[:, 1], 0)
    nodes[:n, 6] = packed_meta.astype(np.float32)
    nodes[:n, 7] = bvh_skip.astype(np.float32)
    nodes[n:, 0:3] = 1.0
    nodes[n:, 3:6] = -1.0
    nodes[n:, 7] = n
    nodes = nodes.reshape(-1, NODES_PER_ROW * 8)

    trows = -(-t4 // TRIS_PER_ROW)
    tris = np.zeros((trows * TRIS_PER_ROW, 16), np.float32)
    tris[:t4, 0:3] = av0
    tris[:t4, 3:6] = ae1
    tris[:t4, 6:9] = ae2
    tris = tris.reshape(trows, TRIS_PER_ROW * 16)
    return (jnp.asarray(nodes), jnp.asarray(tris), n,
            jnp.asarray(remap, jnp.int32))


def _trace_kernel(num_nodes_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tmax_ref,
                  nodes_ref, tris_ref,
                  t_ref, tri_ref, u_ref, v_ref):
    num_nodes = num_nodes_ref[0]

    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    t_min = tmin_ref[:]

    def safe_inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                               jnp.where(x >= 0, 1e-20, -1e-20), x)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def extract(rowvec, base_lane, k):
        """Scalar = rowvec at lane base_lane + k (dynamic) via mask-reduce."""
        return jnp.sum(jnp.where(lane == base_lane + k, rowvec, 0.0))

    def tri_quad_test(tvals, t_best, tri_best, u_best, v_best,
                      tri_base, count, active):
        """Test the 4 triangles stored in tvals (64 floats as (1,64) slice
        laid out [tri0(16) tri1(16) tri2(16) tri3(16)])."""
        for k in range(MAX_LEAF):
            off = k * 16
            v0x = tvals[0, off + 0]
            v0y = tvals[0, off + 1]
            v0z = tvals[0, off + 2]
            e1x = tvals[0, off + 3]
            e1y = tvals[0, off + 4]
            e1z = tvals[0, off + 5]
            e2x = tvals[0, off + 6]
            e2y = tvals[0, off + 7]
            e2z = tvals[0, off + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-16, 1.0 / det, 0.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            uu = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = ((jnp.abs(det) > 1e-16) & (uu >= 0.0) & (vv >= 0.0)
                   & (uu + vv <= 1.0) & (tt > t_min) & (tt < t_best)
                   & active & (k < count))
            t_best = jnp.where(hit, tt, t_best)
            tri_best = jnp.where(hit, tri_base + k, tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)
        return t_best, tri_best, u_best, v_best

    def body(state):
        node, t_best, tri_best, u_best, v_best = state
        row = node // NODES_PER_ROW
        base = (node % NODES_PER_ROW) * 8
        rowvec = nodes_ref[pl.ds(row, 1), :]

        lox = extract(rowvec, base, 0)
        loy = extract(rowvec, base, 1)
        loz = extract(rowvec, base, 2)
        hix = extract(rowvec, base, 3)
        hiy = extract(rowvec, base, 4)
        hiz = extract(rowvec, base, 5)
        meta = extract(rowvec, base, 6).astype(jnp.int32)
        skip = extract(rowvec, base, 7).astype(jnp.int32)

        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        box_hit = tn <= tf * 1.00000024

        count = meta % 8
        first = meta // 8
        is_leaf = count > 0
        hit_any = jnp.max(jnp.where(box_hit, 1, 0)) > 0

        def do_leaf(carry):
            t_b, tri_b, u_b, v_b = carry
            trow = first // TRIS_PER_ROW
            in_hi = (first % TRIS_PER_ROW) >= 4
            trowvec = tris_ref[pl.ds(trow, 1), :]

            def lo_half(c):
                return tri_quad_test(trowvec[:, 0:64], *c,
                                     tri_base=first, count=count,
                                     active=box_hit)

            def hi_half(c):
                return tri_quad_test(trowvec[:, 64:128], *c,
                                     tri_base=first, count=count,
                                     active=box_hit)

            return jax.lax.cond(in_hi, hi_half, lo_half,
                                (t_b, tri_b, u_b, v_b))

        t_best, tri_best, u_best, v_best = jax.lax.cond(
            hit_any & is_leaf, do_leaf,
            lambda c: c, (t_best, tri_best, u_best, v_best))

        descend = hit_any & jnp.logical_not(is_leaf)
        node = jnp.where(descend, node + 1, skip)
        return node, t_best, tri_best, u_best, v_best

    def cond(state):
        return state[0] < num_nodes

    t0 = tmax_ref[:]
    init = (jnp.int32(0), t0,
            jnp.full(t0.shape, -1, jnp.int32),
            jnp.zeros(t0.shape, jnp.float32),
            jnp.zeros(t0.shape, jnp.float32))
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(cond, body, init)

    t_ref[:] = t_best
    tri_ref[:] = tri_best
    u_ref[:] = u_best
    v_ref[:] = v_best




def _trace_kernel_rows(num_nodes_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmin_ref, tmax_ref,
                       nodes_ref, tris_ref,
                       t_ref, tri_ref, u_ref, v_ref):
    """Row-chunk variant: one (1,128) node-row load per outer iteration;
    the 16 nodes inside are processed with STATIC lane extracts, each
    gated by a scalar cond on the shared cursor (skip pointers only move
    forward through the DFS, so a row is consumed left-to-right)."""
    num_nodes = num_nodes_ref[0]

    ox = ox_ref[:]
    oy = oy_ref[:]
    oz = oz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    t_min = tmin_ref[:]

    def safe_inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                               jnp.where(x >= 0, 1e-20, -1e-20), x)

    ix = safe_inv(dx)
    iy = safe_inv(dy)
    iz = safe_inv(dz)

    def tri_quad_test(tvals, t_best, tri_best, u_best, v_best,
                      tri_base, count, active):
        for k in range(MAX_LEAF):
            off = k * 16
            v0x = tvals[0, off + 0]
            v0y = tvals[0, off + 1]
            v0z = tvals[0, off + 2]
            e1x = tvals[0, off + 3]
            e1y = tvals[0, off + 4]
            e1z = tvals[0, off + 5]
            e2x = tvals[0, off + 6]
            e2y = tvals[0, off + 7]
            e2z = tvals[0, off + 8]
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-16, 1.0 / det, 0.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            uu = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hit = ((jnp.abs(det) > 1e-16) & (uu >= 0.0) & (vv >= 0.0)
                   & (uu + vv <= 1.0) & (tt > t_min) & (tt < t_best)
                   & active & (k < count))
            t_best = jnp.where(hit, tt, t_best)
            tri_best = jnp.where(hit, tri_base + k, tri_best)
            u_best = jnp.where(hit, uu, u_best)
            v_best = jnp.where(hit, vv, v_best)
        return t_best, tri_best, u_best, v_best

    def body(state):
        cursor, t_best, tri_best, u_best, v_best = state
        row = cursor // NODES_PER_ROW
        rowvec = nodes_ref[pl.ds(row, 1), :]
        row_base = row * NODES_PER_ROW

        carry = (cursor, t_best, tri_best, u_best, v_best)
        for k in range(NODES_PER_ROW):
            b = k * 8

            def visit(c, b=b, k=k):
                cur, t_b, tri_b, u_b, v_b = c
                lox = rowvec[0, b + 0]
                loy = rowvec[0, b + 1]
                loz = rowvec[0, b + 2]
                hix = rowvec[0, b + 3]
                hiy = rowvec[0, b + 4]
                hiz = rowvec[0, b + 5]
                meta = rowvec[0, b + 6].astype(jnp.int32)
                skip = rowvec[0, b + 7].astype(jnp.int32)

                t0x = (lox - ox) * ix
                t1x = (hix - ox) * ix
                t0y = (loy - oy) * iy
                t1y = (hiy - oy) * iy
                t0z = (loz - oz) * iz
                t1z = (hiz - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.minimum(jnp.maximum(t0z, t1z), t_b))
                box_hit = tn <= tf * 1.00000024

                count = meta % 8
                first = meta // 8
                is_leaf = count > 0
                hit_any = jnp.max(jnp.where(box_hit, 1, 0)) > 0

                def do_leaf(cc):
                    tb, trb, ub, vb = cc
                    trow = first // TRIS_PER_ROW
                    in_hi = (first % TRIS_PER_ROW) >= 4
                    trowvec = tris_ref[pl.ds(trow, 1), :]

                    def lo_half(c2):
                        return tri_quad_test(trowvec[:, 0:64], *c2,
                                             tri_base=first, count=count,
                                             active=box_hit)

                    def hi_half(c2):
                        return tri_quad_test(trowvec[:, 64:128], *c2,
                                             tri_base=first, count=count,
                                             active=box_hit)

                    return jax.lax.cond(in_hi, hi_half, lo_half, cc)

                t_b, tri_b, u_b, v_b = jax.lax.cond(
                    hit_any & is_leaf, do_leaf, lambda cc: cc,
                    (t_b, tri_b, u_b, v_b))

                descend = hit_any & jnp.logical_not(is_leaf)
                cur = jnp.where(descend, cur + 1, skip)
                return cur, t_b, tri_b, u_b, v_b

            carry = jax.lax.cond(carry[0] == row_base + k, visit,
                                 lambda c: c, carry)
        return carry

    def cond(state):
        return state[0] < num_nodes

    t0 = tmax_ref[:]
    init = (jnp.int32(0), t0,
            jnp.full(t0.shape, -1, jnp.int32),
            jnp.zeros(t0.shape, jnp.float32),
            jnp.zeros(t0.shape, jnp.float32))
    _, t_best, tri_best, u_best, v_best = jax.lax.while_loop(cond, body, init)

    t_ref[:] = t_best
    tri_ref[:] = tri_best
    u_ref[:] = u_best
    v_ref[:] = v_best


KERNEL_VARIANT = "rows"  # "rows" | "nodes"


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bvh_intersect(nodes, tris, num_nodes, tri_remap, o, d,
                         t_min, t_max, interpret=False):
    """Closest-hit traversal; o/d (R,3) with R a multiple of BLOCK.
    Returns (t, tri, u, v) with tri == -1 on miss (tri in ORIGINAL ids)."""
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
    full_n = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shape = [
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
    ]
    kern = _trace_kernel_rows if KERNEL_VARIANT == "rows" else _trace_kernel
    t, tri, u, v = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[smem1,
                  blk, blk, blk, blk, blk, blk, blk, blk,
                  full_n, full_n],
        out_specs=[blk, blk, blk, blk],
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([num_nodes], jnp.int32),
      ox, oy, oz, dx, dy, dz, tmin, tmax, nodes, tris)

    t = t.reshape(R)
    tri = tri.reshape(R)
    u = u.reshape(R)
    v = v.reshape(R)
    # aligned ids -> original triangle ids
    tri = jnp.where(tri >= 0, tri_remap[jnp.clip(tri, 0, tri_remap.shape[0] - 1)],
                    -1)
    return t, tri, u, v
