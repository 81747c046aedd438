"""Wave traversal kernel (ops/wave_trace.py) vs brute-force MT, in
Pallas interpret mode (runs on CPU; the same kernel compiles for TPU)."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.ops.wave_trace import (BLOCK, build_wave_tables,
                                         wave_intersect)


def _scene(num_tris=700, seed=3):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (num_tris, 3)).astype(np.float32) * 2
    e1 = rng.normal(size=(num_tris, 3)).astype(np.float32) * 0.3
    e2 = rng.normal(size=(num_tris, 3)).astype(np.float32) * 0.3
    return v0, e1, e2, build_wave_tables(v0, e1, e2)


def _brute(v0, e1, e2, o, d, t_min, t_max):
    pv = np.cross(d[:, None, :], e2[None])
    det = np.sum(e1[None] * pv, -1)
    inv = np.where(np.abs(det) > 1e-16, 1 / det, 0)
    tv = o[:, None, :] - v0[None]
    uu = np.sum(tv * pv, -1) * inv
    qv = np.cross(tv, e1[None])
    vv = np.sum(d[:, None, :] * qv, -1) * inv
    tt = np.sum(e2[None] * qv, -1) * inv
    hit = ((np.abs(det) > 1e-16) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1)
           & (tt > t_min) & (tt < t_max[:, None]))
    tc = np.where(hit, tt, 3e38)
    bt = tc.min(1)
    bi = np.where(bt < 3e38, tc.argmin(1), -1)
    return bt, bi, uu, vv


def _rays(R, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-3, 3, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_wave_matches_bruteforce():
    v0, e1, e2, (boxes, cbox, attr, remap, sbox) = _scene()
    R = BLOCK * 2
    o, d = _rays(R)
    tmin = np.full((R,), 1e-4, np.float32)
    tmax = np.full((R,), 3e38, np.float32)
    tmax[::7] = 0.0  # dead rays must never hit

    t, tri, u, v = wave_intersect(
        jnp.asarray(boxes), jnp.asarray(cbox), jnp.asarray(attr),
        jnp.asarray(remap), jnp.asarray(sbox), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tmin), jnp.asarray(tmax), ncp=boxes.shape[1],
        interpret=True, tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2))
    t, tri, u, v = map(np.asarray, (t, tri, u, v))

    bt, bi, uu, vv = _brute(v0, e1, e2, o, d, 1e-4, tmax)
    live = tmax > 0
    # the leaf matmul is 3-pass bf16-split f32 (~2^-21 relative): a
    # grazing hit within that margin of an edge may classify
    # differently than the f32 brute force — allow <=0.2% flips
    agree = ((tri >= 0) == (bi >= 0))[live]
    assert agree.mean() > 0.998, f"hit-set agreement {agree.mean()}"
    both = live & (bi >= 0) & (tri >= 0)
    assert np.isclose(t[both], bt[both], rtol=2e-3).mean() > 0.999
    assert (tri[both] == bi[both]).mean() > 0.999  # coplanar ties aside
    same = both & (tri == bi)
    rows = np.where(same)[0]
    assert np.isclose(u[same], uu[rows, tri[same]], atol=2e-3).all()
    assert np.isclose(v[same], vv[rows, tri[same]], atol=2e-3).all()
    assert (tri[~live] == -1).all()


def test_wave_anyhit_and_tmax():
    v0, e1, e2, (boxes, cbox, attr, remap, sbox) = _scene(seed=5)
    R = BLOCK
    o, d = _rays(R, seed=5)
    tmin = np.full((R,), 1e-4, np.float32)
    # bounded segments: occlusion must respect t_max
    tmax = np.full((R,), 1.25, np.float32)

    _, tri_c, _, _ = wave_intersect(
        jnp.asarray(boxes), jnp.asarray(cbox), jnp.asarray(attr),
        jnp.asarray(remap), jnp.asarray(sbox), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tmin), jnp.asarray(tmax), ncp=boxes.shape[1],
        interpret=True)
    _, tri_a, _, _ = wave_intersect(
        jnp.asarray(boxes), jnp.asarray(cbox), jnp.asarray(attr),
        jnp.asarray(remap), jnp.asarray(sbox), jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(tmin), jnp.asarray(tmax), ncp=boxes.shape[1],
        interpret=True, any_hit=True)
    bt, bi, _, _ = _brute(v0, e1, e2, o, d, 1e-4, tmax)
    assert ((np.asarray(tri_c) >= 0) == (bi >= 0)).mean() > 0.998
    assert ((np.asarray(tri_a) >= 0) == (bi >= 0)).mean() > 0.998
    # closest-hit and any-hit must agree with each other exactly
    assert ((np.asarray(tri_c) >= 0) == (np.asarray(tri_a) >= 0)).all()


def test_wave_deterministic():
    v0, e1, e2, (boxes, cbox, attr, remap, sbox) = _scene(seed=9)
    R = BLOCK
    o, d = _rays(R, seed=9)
    tmin = np.full((R,), 1e-4, np.float32)
    tmax = np.full((R,), 3e38, np.float32)
    outs = [wave_intersect(jnp.asarray(boxes), jnp.asarray(cbox),
                           jnp.asarray(attr), jnp.asarray(remap),
                           jnp.asarray(sbox), jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(tmin), jnp.asarray(tmax),
                           ncp=boxes.shape[1], interpret=True)
            for _ in range(2)]
    for a, b in zip(outs[0], outs[1]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
