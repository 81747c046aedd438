"""Pallas TPU ray traversal v3: per-ray cluster binning + MXU Plücker jobs.

The v2 kernel (ops/cluster_trace.py) drains the *warp union* of culled
clusters: 128 incoherent rays share one drain list, so a diffuse-bounce
warp tests nearly every cluster (measured ~640/640 on materialtest)
while each individual ray only overlaps ~11 cluster AABBs.  v3 removes
the warp coupling entirely:

  1. **Cull (XLA, dense):** slab-test all rays against all cluster
     AABBs -> boolean mask (NC, R).  Fully fused elementwise work.
  2. **Bin (XLA):** `nonzero` over the mask yields cluster-major
     (cluster, ray) pairs; each cluster's pair segment is padded to a
     multiple of 128 and scattered into job slots.  A *job* is one
     cluster x 128 rays.
  3. **Leaf test (Pallas, MXU):** per job, the Möller-Trumbore test is
     rewritten in Plücker coordinates so it becomes two small matmuls:
     ray features [d, o x d] and [o, 1] against per-triangle feature
     tables.  Crucially the `dot_general` contracts over the sublane
     axis, so the output lands (tris on sublanes) x (rays on lanes) —
     the per-ray min-reduce is a sublane reduce and the per-job result
     row writes with a cheap dynamic *sublane* store.  No transposes,
     no dynamic lane indexing anywhere.
  4. **Merge (XLA):** scatter-min per ray over job slots, deterministic
     tie-break on the global triangle id.

Early termination is gone (every ray tests all its slab-hit clusters,
~2x the visits of an ordered traversal) but the work is per-ray, not
per-warp-union: ~50x less leaf work on incoherent wavefronts.

Plücker identities used (verified in tests/test_binned.py):
  ray (o, d), m = o x d; triangle A, B=A+e1, C=A+e2; n = e1 x e2.
  side(P,Q)  = d . (P x Q) + m . (Q - P)
  s0=side(A,B), s1=side(B,C), s2=side(C,A);  sum = d . n
  inside     = all s_i same sign (two-sided);  t = (n.A - n.o) / sum
  u = s2/sum, v = s0/sum   (matches MT's  P = A + u e1 + v e2)

This replaces embree rtcIntersect/rtcOccluded (ref
src/thirdparty/embree, used via src/core/renderer/TraceableScene.hpp:
112-134) for triangle geometry.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLUSTER = 128        # triangles per cluster (same tables as v2)
JR = 128             # rays per job
J_STEP = 64          # jobs per pallas grid step
KF = 8               # feature rows per matmul (padded)
INF = 3.0e38
BIGI = 1 << 30


# --------------------------------------------------------------- host build

def build_trifeat(tri_v0, tri_e1, tri_e2, remap):
    """Per-cluster Plücker feature tables from the v2 cluster remap.

    remap: (NCp*128,) original tri id per (cluster, lane), -1 padding.
    Returns (s_feat (NCp*8, 3*128) f32, t_feat (NCp*8, 128) f32).
    s_feat columns are [s0 | s1 | s2] blocks; rows are the K=8 ray
    feature slots [dx,dy,dz,mx,my,mz,0,0].  t_feat rows pair with
    [ox,oy,oz,1,0,0,0,0].  Padding tris are all-zero -> s=0, sum=0,
    rejected by the sum!=0 guard in the kernel.
    """
    ncp = remap.shape[0] // CLUSTER
    ids = remap.reshape(ncp, CLUSTER)
    valid = ids >= 0
    safe = np.clip(ids, 0, max(tri_v0.shape[0] - 1, 0))
    A = np.where(valid[..., None], tri_v0[safe], 0.0)
    e1 = np.where(valid[..., None], tri_e1[safe], 0.0)
    e2 = np.where(valid[..., None], tri_e2[safe], 0.0)
    B = A + e1
    C = A + e2
    n = np.cross(e1, e2)

    def pl6(P, Q):
        # column features for side(P,Q): rows 0-2 = P x Q, rows 3-5 = Q-P
        return np.concatenate([np.cross(P, Q), Q - P], axis=-1)  # (..,6)

    s_feat = np.zeros((ncp * KF, 3 * CLUSTER), np.float32)
    for b, (P, Q) in enumerate(((A, B), (B, C), (C, A))):
        f = pl6(P, Q)                                   # (ncp, 128, 6)
        s_feat[:, b * CLUSTER:(b + 1) * CLUSTER] = (
            np.pad(f, ((0, 0), (0, 0), (0, KF - 6)))
            .transpose(0, 2, 1).reshape(ncp * KF, CLUSTER))

    tf = np.concatenate([-n, np.sum(n * A, axis=-1, keepdims=True)],
                        axis=-1)                        # (ncp, 128, 4)
    t_feat = (np.pad(tf, ((0, 0), (0, 0), (0, KF - 4)))
              .transpose(0, 2, 1).reshape(ncp * KF, CLUSTER)
              .astype(np.float32))
    return s_feat, t_feat


# ------------------------------------------------------------------ kernel

def _make_jobs_kernel(tmin_in_smem: bool):
    def kernel(jc_ref,                  # (J_STEP, 1) SMEM: cluster per job
               tmin_ref,                # (1, 1) SMEM scalar t_min
               rf_ref,                  # (J_STEP*16, 128) VMEM ray features
               sfeat_ref,               # (NCp*8, 384) VMEM
               tfeat_ref,               # (NCp*8, 128) VMEM
               t_ref, k_ref, u_ref, v_ref):   # (J_STEP, 128) outputs
        row128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER, JR), 0)
        tmin = tmin_ref[0, 0]

        def job(j, _):
            cid = jc_ref[j, 0]

            @pl.when(cid >= 0)
            def _(j=j, cid=cid):
                rf = rf_ref[pl.ds(j * 16, 16), :]       # (16, 128)
                sf = sfeat_ref[pl.ds(cid * KF, KF), :]  # (8, 384)
                tf = tfeat_ref[pl.ds(cid * KF, KF), :]  # (8, 128)
                # contract over the K (sublane) axis: output rows are
                # feature-table columns (tris), lanes are rays.
                s = jax.lax.dot_general(
                    sf, rf[0:KF, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (384, 128)
                tnum = jax.lax.dot_general(
                    tf, rf[KF:2 * KF, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, 128)
                s0 = s[0:CLUSTER, :]
                s1 = s[CLUSTER:2 * CLUSTER, :]
                s2 = s[2 * CLUSTER:3 * CLUSTER, :]
                den = s0 + s1 + s2
                inside = ((jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0)
                          | (jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0))
                nz = jnp.abs(den) > 1e-24
                rden = jnp.where(nz, 1.0 / jnp.where(nz, den, 1.0), 0.0)
                t = tnum * rden
                okay = inside & nz & (t > tmin)
                tc = jnp.where(okay, t, INF)
                tb = jnp.min(tc, axis=0, keepdims=True)       # (1, 128)
                got = tb < INF
                sel = (tc == tb) & okay
                kidx = jnp.min(jnp.where(sel, row128, BIGI), axis=0,
                               keepdims=True)
                pick = sel & (row128 == kidx)
                uu = jnp.sum(jnp.where(pick, s2 * rden, 0.0), axis=0,
                             keepdims=True)
                vv = jnp.sum(jnp.where(pick, s0 * rden, 0.0), axis=0,
                             keepdims=True)
                t_ref[pl.ds(j, 1), :] = tb
                k_ref[pl.ds(j, 1), :] = jnp.where(
                    got, cid * CLUSTER + kidx, -1)
                u_ref[pl.ds(j, 1), :] = uu
                v_ref[pl.ds(j, 1), :] = vv

            @pl.when(cid < 0)
            def _(j=j):
                t_ref[pl.ds(j, 1), :] = jnp.full((1, JR), INF, jnp.float32)
                k_ref[pl.ds(j, 1), :] = jnp.full((1, JR), -1, jnp.int32)
                u_ref[pl.ds(j, 1), :] = jnp.zeros((1, JR), jnp.float32)
                v_ref[pl.ds(j, 1), :] = jnp.zeros((1, JR), jnp.float32)
            return 0

        jax.lax.fori_loop(0, J_STEP, job, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("njobs", "interpret"))
def _run_jobs(job_cid, t_min, rayfeat, s_feat, t_feat, njobs: int,
              interpret: bool = False):
    """job_cid (njobs,1) i32, rayfeat (njobs*16, 128).  Returns per-slot
    (t, ktri, u, v) each (njobs, 128); ktri = cluster*128+lane or -1."""
    grid = njobs // J_STEP
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_jobs_kernel(True),
        grid=(grid,),
        in_specs=[
            smem((J_STEP, 1), lambda i: (i, 0)),
            smem((1, 1), lambda i: (0, 0)),
            vmem((J_STEP * 16, 128), lambda i: (i, 0)),
            vmem(memory_space=pltpu.VMEM),
            vmem(memory_space=pltpu.VMEM),
        ],
        out_specs=[vmem((J_STEP, 128), lambda i: (i, 0)) for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((njobs, 128), jnp.float32),
            jax.ShapeDtypeStruct((njobs, 128), jnp.int32),
            jax.ShapeDtypeStruct((njobs, 128), jnp.float32),
            jax.ShapeDtypeStruct((njobs, 128), jnp.float32),
        ],
        interpret=interpret,
    )(job_cid, jnp.asarray(t_min, jnp.float32).reshape(1, 1), rayfeat,
      s_feat, t_feat)
    return out


# ------------------------------------------------------------------ driver

def _round_up(x, m):
    return -(-x // m) * m


def binned_intersect(boxes, s_feat, t_feat, remap, o, d, t_min, t_max,
                     ncp: int, any_hit: bool = False,
                     pairs_per_ray: int = 32, interpret: bool = False):
    """Closest-hit (or any-hit) traversal via cluster binning.

    o/d (R,3); t_min scalar (shared epsilon); t_max (R,) per-ray far
    clip.  Returns (t (R,), tri (R,) original id or -1, u, v).  For
    any_hit, tri >= 0 marks occlusion (its t is the real hit distance).
    Rays with t_max <= 0 are dead and never intersect.

    pairs_per_ray bounds the (ray, cluster) pair pool; overflow drops
    the *trailing clusters'* pairs (detectable: see returned ov flag).
    """
    R = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_min_s = jnp.float32(t_min)

    # ---- 1. dense cull: mask (NC, R), fused componentwise
    def inv(x):
        return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                               jnp.where(x >= 0, 1e-20, -1e-20), x)

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    ix, iy, iz = inv(d[:, 0]), inv(d[:, 1]), inv(d[:, 2])
    live = t_max > 0.0
    tmx = jnp.where(live, t_max, -1.0)

    def axis_slabs(lo_c, hi_c, oc, ic):
        a = (lo_c[:, None] - oc[None, :]) * ic[None, :]     # (NC, R)
        b = (hi_c[:, None] - oc[None, :]) * ic[None, :]
        return jnp.minimum(a, b), jnp.maximum(a, b)
    n0x, f0x = axis_slabs(boxes[0], boxes[3], ox, ix)
    n0y, f0y = axis_slabs(boxes[1], boxes[4], oy, iy)
    n0z, f0z = axis_slabs(boxes[2], boxes[5], oz, iz)
    tn = jnp.maximum(jnp.maximum(n0x, n0y),
                     jnp.maximum(n0z, t_min_s))
    tf = jnp.minimum(jnp.minimum(f0x, f0y),
                     jnp.minimum(f0z, tmx[None, :]))
    # padding clusters have inverted (lo > hi) boxes; without the
    # validity column they'd pass the slab test for EVERY ray
    box_ok = boxes[0] <= boxes[3]
    mask = (tn <= tf * 1.00000024) & box_ok[:, None]        # (NC, R)

    # ---- 2. bin into padded 128-ray jobs, cluster-major
    MAXP = _round_up(R * pairs_per_ray, 1024)
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)          # (NC,)
    n_pairs = jnp.sum(counts)
    flat = mask.reshape(-1)
    pos = jnp.nonzero(flat, size=MAXP, fill_value=ncp * R)[0]
    valid_p = pos < ncp * R
    cid = (pos // R).astype(jnp.int32)
    ray = (pos % R).astype(jnp.int32)
    seg_start = jnp.cumsum(counts) - counts                  # (NC,)
    padded = _round_up(counts, JR)
    offs = jnp.cumsum(padded) - padded
    cid_c = jnp.clip(cid, 0, ncp - 1)
    rank = jnp.arange(MAXP, dtype=jnp.int32) - seg_start[cid_c]
    dest = offs[cid_c] + rank
    PAD_MAX = _round_up(MAXP + ncp * (JR - 1), JR * J_STEP)
    njobs = PAD_MAX // JR
    dest = jnp.where(valid_p, dest, PAD_MAX)
    pr = jnp.full((PAD_MAX,), -1, jnp.int32).at[dest].set(
        ray, mode="drop")
    job_cid = jnp.full((njobs,), -1, jnp.int32).at[dest // JR].set(
        cid_c, mode="drop")

    # ---- 3. ray features per padded slot
    alive_slot = pr >= 0
    safe_r = jnp.clip(pr, 0, R - 1)
    go = jnp.where(alive_slot[:, None], o[safe_r], 0.0)      # (P,3)
    gd = jnp.where(alive_slot[:, None], d[safe_r], 0.0)
    gm = jnp.cross(go, gd)
    one = alive_slot.astype(jnp.float32)
    zero = jnp.zeros_like(one)
    # rows [dx,dy,dz,mx,my,mz,0,0, ox,oy,oz,1,0,0,0,0] per slot;
    # stacked feature-major so the job-major relayout keeps the minor
    # (lane) axis intact — a cheap leading-dim transpose, not a 2D one
    feat = jnp.stack([gd[:, 0], gd[:, 1], gd[:, 2],
                      gm[:, 0], gm[:, 1], gm[:, 2], zero, zero,
                      go[:, 0], go[:, 1], go[:, 2], one, zero, zero,
                      zero, zero], axis=0)                   # (16, P)
    rayfeat = (feat.reshape(16, njobs, JR).transpose(1, 0, 2)
               .reshape(njobs * 16, JR))

    ts, ks, us, vs = _run_jobs(job_cid.reshape(njobs, 1), t_min_s,
                               rayfeat, s_feat, t_feat, njobs=njobs,
                               interpret=interpret)

    # ---- 4. merge per ray (deterministic: min t, ties -> min tri id)
    t_slot = ts.reshape(-1)
    k_slot = ks.reshape(-1)
    u_slot = us.reshape(-1)
    v_slot = vs.reshape(-1)
    ok = alive_slot & (k_slot >= 0) & (t_slot < t_max[safe_r])
    ridx = jnp.where(ok, pr, R)
    tb = jnp.full((R + 1,), INF, jnp.float32).at[ridx].min(
        jnp.where(ok, t_slot, INF))
    win = ok & (t_slot == tb[safe_r])
    kglob = jnp.where(win, remap[jnp.clip(k_slot, 0,
                                          remap.shape[0] - 1)], BIGI)
    kb = jnp.full((R + 1,), BIGI, jnp.int32).at[
        jnp.where(win, pr, R)].min(kglob)
    final = win & (kglob == kb[safe_r])
    fidx = jnp.where(final, pr, R)
    ub = jnp.zeros((R + 1,), jnp.float32).at[fidx].set(u_slot, mode="drop")
    vb = jnp.zeros((R + 1,), jnp.float32).at[fidx].set(v_slot, mode="drop")

    t_out = tb[:R]
    tri_out = jnp.where(kb[:R] == BIGI, -1, kb[:R])
    ov = n_pairs > MAXP
    return t_out, tri_out, ub[:R], vb[:R], ov
