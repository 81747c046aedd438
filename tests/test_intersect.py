"""BVH traversal correctness vs brute-force triangle intersection."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.ops.intersect import bvh_intersect, ray_tri, occluded
from tungsten_tpu.scene.bvh import build_bvh


def _random_scene(num_tris=300, seed=0):
    """Build a minimal FlatScene-like namespace with random triangles."""
    rs = np.random.RandomState(seed)
    v0 = rs.rand(num_tris, 3).astype(np.float32) * 4 - 2
    e1 = (rs.rand(num_tris, 3).astype(np.float32) - 0.5) * 0.7
    e2 = (rs.rand(num_tris, 3).astype(np.float32) - 0.5) * 0.7
    pmin = np.minimum(v0, np.minimum(v0 + e1, v0 + e2))
    pmax = np.maximum(v0, np.maximum(v0 + e1, v0 + e2))
    bvh = build_bvh(pmin, pmax)
    v0, e1, e2 = v0[bvh.order], e1[bvh.order], e2[bvh.order]

    class S:
        tri_v0 = jnp.asarray(v0)
        tri_e1 = jnp.asarray(e1)
        tri_e2 = jnp.asarray(e2)
        bvh_min = jnp.asarray(bvh.bounds_min)
        bvh_max = jnp.asarray(bvh.bounds_max)
        bvh_meta = jnp.asarray(bvh.meta)
        bvh_skip = jnp.asarray(bvh.skip)
        sph_center = jnp.zeros((0, 3))
        sph_radius = jnp.zeros((0,))
        sph_prim = jnp.zeros((0,), jnp.int32)

    return S, v0, e1, e2


def test_bvh_matches_bruteforce():
    S, v0, e1, e2 = _random_scene()
    rs = np.random.RandomState(1)
    R = 500
    o = jnp.asarray(rs.rand(R, 3).astype(np.float32) * 6 - 3)
    d = rs.randn(R, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    res = bvh_intersect(S, o, d, 1e-4, 3.0e38)

    # brute force
    h, t, u, v = ray_tri(
        o[:, None], d[:, None], v0[None], e1[None], e2[None], 1e-4, 3.0e38)
    t = np.where(np.asarray(h), np.asarray(t), np.inf)
    bf_t = t.min(axis=1)
    bf_hit = np.isfinite(bf_t)

    assert np.array_equal(np.asarray(res["hit"]), bf_hit)
    np.testing.assert_allclose(
        np.asarray(res["t"])[bf_hit], bf_t[bf_hit], rtol=1e-4)


def test_occlusion_matches():
    S, v0, e1, e2 = _random_scene(seed=2)
    rs = np.random.RandomState(3)
    R = 300
    o = jnp.asarray(rs.rand(R, 3).astype(np.float32) * 6 - 3)
    d = rs.randn(R, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    far = 2.0

    occ = np.asarray(occluded(S, o, d, 1e-4, far))

    h, t, _, _ = ray_tri(
        o[:, None], d[:, None], v0[None], e1[None], e2[None], 1e-4, far)
    bf = np.asarray(h).any(axis=1)
    assert np.array_equal(occ, bf)
