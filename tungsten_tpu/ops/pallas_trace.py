"""Pallas TPU BVH traversal: coherent speculative traversal.

The XLA-gather traversal (ops/intersect.py) is bound by per-ray gathers
(~1 element/cycle on the VPU), capping it far below target.  This kernel
removes every per-ray gather: a whole ray block (8x128 = 1024 rays)
shares one DFS cursor into the flattened BVH; node/triangle data is
fetched with *scalar* loads (shared by all lanes) and tested across the
block with pure vector ops.  A subtree is skipped only when *no* ray in
the block wants it (speculative traversal over the skip-pointer DFS,
the TPU analog of coherent packet traversal — replaces embree's
rtcIntersect, ref src/core/renderer/TraceableScene.hpp:112-134).

Scene packing (host, once):
  nodes  (ceil(N/16), 128) f32 — 16 nodes/row, 8 floats each:
         [lo.xyz, hi.xyz, meta(= first*8+count or 0), skip]
  tris   (ceil(T/8), 128) f32 — 8 tris/row, 16 slots each:
         [v0.xyz, e1.xyz, e2.xyz, pad...]
Counts are exact in f32 (< 2^24).  Whole scene lives in VMEM, so this
path is gated to scenes that fit (~100k tris); larger scenes fall back
to the XLA traversal.
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


def pack_scene(bvh_min, bvh_max, bvh_meta, bvh_skip, tri_v0, tri_e1, tri_e2):
    """Host-side packing into the kernel's VMEM layout (numpy in, jnp out)."""
    n = bvh_min.shape[0]
    rows = -(-n // NODES_PER_ROW)
    nodes = np.zeros((rows * NODES_PER_ROW, 8), np.float32)
    nodes[:n, 0:3] = bvh_min
    nodes[:n, 3:6] = bvh_max
    meta = bvh_meta.astype(np.int64)
    nodes[:n, 6] = (meta[:, 0] * 8 + meta[:, 1]).astype(np.float32)
    nodes[:n, 7] = bvh_skip.astype(np.float32)
    # out-of-range rows: skip to the end, never hit
    nodes[n:, 0:3] = 1.0
    nodes[n:, 3:6] = -1.0
    nodes[n:, 7] = n
    nodes = nodes.reshape(rows, NODES_PER_ROW * 8)

    t = tri_v0.shape[0]
    trows = -(-max(t, 1) // TRIS_PER_ROW)
    tris = np.zeros((trows * TRIS_PER_ROW, 16), np.float32)
    if t:
        tris[:t, 0:3] = tri_v0
        tris[:t, 3:6] = tri_e1
        tris[:t, 6:9] = tri_e2
    tris = tris.reshape(trows, TRIS_PER_ROW * 16)
    return jnp.asarray(nodes), jnp.asarray(tris), n


def _node_scalar(nodes_ref, node, k):
    """Scalar load of float k of node `node` from the packed node table."""
    row = node // NODES_PER_ROW
    col = (node % NODES_PER_ROW) * 8 + k
    return nodes_ref[row, col]


def _tri_scalar(tris_ref, tri, k):
    row = tri // TRIS_PER_ROW
    col = (tri % TRIS_PER_ROW) * 16 + k
    return tris_ref[row, col]


def _trace_kernel(num_nodes_ref, any_hit_ref,
                  ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  tmin_ref, tmax_ref,
                  nodes_ref, tris_ref,
                  t_ref, tri_ref, u_ref, v_ref):
    num_nodes = num_nodes_ref[0]
    any_hit = any_hit_ref[0]

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

    def tri_test(tri_id, t_best, tri_best, u_best, v_best, active):
        v0x = _tri_scalar(tris_ref, tri_id, 0)
        v0y = _tri_scalar(tris_ref, tri_id, 1)
        v0z = _tri_scalar(tris_ref, tri_id, 2)
        e1x = _tri_scalar(tris_ref, tri_id, 3)
        e1y = _tri_scalar(tris_ref, tri_id, 4)
        e1z = _tri_scalar(tris_ref, tri_id, 5)
        e2x = _tri_scalar(tris_ref, tri_id, 6)
        e2y = _tri_scalar(tris_ref, tri_id, 7)
        e2z = _tri_scalar(tris_ref, tri_id, 8)
        # Moller-Trumbore, scalars broadcast over the block
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) > 1e-16, 1.0 / det, 0.0)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        hit = ((jnp.abs(det) > 1e-16) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > t_min) & (t < t_best) & active)
        t_best = jnp.where(hit, t, t_best)
        tri_best = jnp.where(hit, tri_id, tri_best)
        u_best = jnp.where(hit, u, u_best)
        v_best = jnp.where(hit, v, v_best)
        return t_best, tri_best, u_best, v_best

    def body(state):
        node, t_best, tri_best, u_best, v_best = state
        lox = _node_scalar(nodes_ref, node, 0)
        loy = _node_scalar(nodes_ref, node, 1)
        loz = _node_scalar(nodes_ref, node, 2)
        hix = _node_scalar(nodes_ref, node, 3)
        hiy = _node_scalar(nodes_ref, node, 4)
        hiz = _node_scalar(nodes_ref, node, 5)
        meta = _node_scalar(nodes_ref, node, 6)
        skip = _node_scalar(nodes_ref, node, 7).astype(jnp.int32)

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

        meta_i = meta.astype(jnp.int32)
        count = meta_i % 8
        first = meta_i // 8
        is_leaf = count > 0

        hit_any = jnp.max(jnp.where(box_hit, 1, 0)) > 0

        def do_leaf(carry):
            t_b, tri_b, u_b, v_b = carry
            for k in range(MAX_LEAF):
                do = is_leaf & (k < count)
                tid = first + jnp.where(k < count, k, 0)
                res = tri_test(tid, t_b, tri_b, u_b, v_b, box_hit & do)
                t_b, tri_b, u_b, v_b = res
            return t_b, tri_b, u_b, v_b

        t_best, tri_best, u_best, v_best = jax.lax.cond(
            hit_any & is_leaf, do_leaf,
            lambda c: c, (t_best, tri_best, u_best, v_best))

        descend = hit_any & jnp.logical_not(is_leaf)
        node = jnp.where(descend, node + 1, skip)
        if False:
            pass
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_bvh_intersect(nodes, tris, num_nodes, o, d, t_min, t_max,
                         interpret=False):
    """Closest-hit traversal; o/d (R,3) with R a multiple of BLOCK.
    Returns (t, tri, u, v) with tri == -1 on miss."""
    R = o.shape[0]
    G = R // BLOCK

    def comp(x):
        return x.reshape(G, 8, 128)

    ox, oy, oz = comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2])
    dx, dy, dz = comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2])
    tmin = comp(jnp.broadcast_to(t_min, (R,)))
    tmax = comp(jnp.broadcast_to(t_max, (R,)))

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
    t, tri, u, v = pl.pallas_call(
        _trace_kernel,
        grid=(G,),
        in_specs=[smem1, smem1,
                  blk, blk, blk, blk, blk, blk, blk, blk,
                  full_n, full_n],
        out_specs=[blk, blk, blk, blk],
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray([num_nodes], jnp.int32), jnp.asarray([0], jnp.int32),
      ox, oy, oz, dx, dy, dz, tmin, tmax, nodes, tris)

    return (t.reshape(R), tri.reshape(R), u.reshape(R), v.reshape(R))
