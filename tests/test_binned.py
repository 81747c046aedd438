"""Binned Plücker traversal (ops/binned_trace.py) vs brute-force MT."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.ops.binned_trace import (binned_intersect, build_trifeat)
from tungsten_tpu.ops.cluster_trace import build_clusters
from tungsten_tpu.ops.intersect import ray_tri


def _scene(num_tris=700, seed=0):
    rs = np.random.RandomState(seed)
    v0 = rs.rand(num_tris, 3).astype(np.float32) * 4 - 2
    e1 = (rs.rand(num_tris, 3).astype(np.float32) - 0.5) * 0.8
    e2 = (rs.rand(num_tris, 3).astype(np.float32) - 0.5) * 0.8
    boxes, attr, remap, sboxes = build_clusters(v0, e1, e2)
    s_feat, t_feat = build_trifeat(v0, e1, e2, remap)
    return v0, e1, e2, boxes, remap, s_feat, t_feat


def _brute(v0, e1, e2, o, d, t_min, t_max):
    """Reference closest hit via the jnp MT test, min-t / min-id ties."""
    h, t, u, v = ray_tri(o[:, None], d[:, None], v0[None], e1[None],
                         e2[None], t_min, t_max[:, None])
    tc = np.where(np.asarray(h), np.asarray(t), np.inf)
    order = np.lexsort((np.arange(tc.shape[1])[None].repeat(
        tc.shape[0], 0), tc), axis=1)
    best = order[:, 0]
    tb = tc[np.arange(tc.shape[0]), best]
    hit = np.isfinite(tb)
    tri = np.where(hit, best, -1)
    return tb, tri, hit


def test_binned_matches_bruteforce():
    v0, e1, e2, boxes, remap, s_feat, t_feat = _scene()
    R = 512
    rs = np.random.RandomState(7)
    o = rs.rand(R, 3).astype(np.float32) * 6 - 3
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = np.full((R,), 1e30, np.float32)
    # a few dead rays must never hit
    t_max[::17] = 0.0

    t, tri, u, v, ov = binned_intersect(
        jnp.asarray(boxes), jnp.asarray(s_feat), jnp.asarray(t_feat),
        jnp.asarray(remap), jnp.asarray(o), jnp.asarray(d), 1e-4,
        jnp.asarray(t_max), ncp=boxes.shape[1], pairs_per_ray=64,
        interpret=True)
    assert not bool(ov)

    tb, trib, hitb = _brute(jnp.asarray(v0), jnp.asarray(e1),
                            jnp.asarray(e2), jnp.asarray(o),
                            jnp.asarray(d), 1e-4, jnp.asarray(t_max))
    t, tri, u, v = map(np.asarray, (t, tri, u, v))

    agree = (tri >= 0) == hitb
    assert agree.mean() > 0.995, f"hit mask mismatch {1 - agree.mean():.4f}"
    both = (tri >= 0) & hitb & agree
    assert np.allclose(t[both], tb[both], rtol=2e-4, atol=2e-5)
    # u/v: spot check via re-evaluated hit point on the reported tri
    idx = np.nonzero(both)[0][:64]
    for i in idx:
        k = tri[i]
        p_plucker = v0[k] + u[i] * e1[k] + v[i] * e2[k]
        p_ray = o[i] + t[i] * d[i]
        assert np.allclose(p_plucker, p_ray, atol=2e-3), (i, k)


def test_binned_anyhit_and_tmax():
    v0, e1, e2, boxes, remap, s_feat, t_feat = _scene(seed=3)
    R = 256
    rs = np.random.RandomState(11)
    o = rs.rand(R, 3).astype(np.float32) * 6 - 3
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # shadow-style segments: t_max clipped at 1.5
    t_max = np.full((R,), 1.5, np.float32)
    t, tri, u, v, ov = binned_intersect(
        jnp.asarray(boxes), jnp.asarray(s_feat), jnp.asarray(t_feat),
        jnp.asarray(remap), jnp.asarray(o), jnp.asarray(d), 1e-4,
        jnp.asarray(t_max), ncp=boxes.shape[1], pairs_per_ray=64,
        any_hit=True, interpret=True)
    tb, trib, hitb = _brute(jnp.asarray(v0), jnp.asarray(e1),
                            jnp.asarray(e2), jnp.asarray(o),
                            jnp.asarray(d), 1e-4,
                            jnp.asarray(t_max))
    t, tri = np.asarray(t), np.asarray(tri)
    agree = (tri >= 0) == hitb
    assert agree.mean() > 0.995
    assert np.all(t[tri >= 0] < 1.5 + 1e-5)


def test_binned_deterministic():
    v0, e1, e2, boxes, remap, s_feat, t_feat = _scene(seed=5)
    R = 256
    rs = np.random.RandomState(2)
    o = rs.rand(R, 3).astype(np.float32) * 6 - 3
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_max = jnp.full((R,), 1e30)
    args = (jnp.asarray(boxes), jnp.asarray(s_feat), jnp.asarray(t_feat),
            jnp.asarray(remap), jnp.asarray(o), jnp.asarray(d), 1e-4,
            t_max)
    a = binned_intersect(*args, ncp=boxes.shape[1], interpret=True)
    b = binned_intersect(*args, ncp=boxes.shape[1], interpret=True)
    for x, y in zip(a[:4], b[:4]):
        assert np.array_equal(np.asarray(x), np.asarray(y))
