"""Paged (streaming) wave traversal vs brute force + vs the resident
kernel, interpret mode.  The page size is shrunk so a ~700-tri fixture
spans multiple pages and the scalar-prefetched page walk is exercised."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.ops import wave_trace as wt
from tests.test_wave import _brute, _rays, _scene


def _paged(monkeypatch_vals, fn):
    """Run fn with PAGE_SUP/PAGE_CLUSTERS shrunk (trace-time module
    constants; the jit cache is keyed by shapes unique to this test)."""
    old = (wt.PAGE_SUP, wt.PAGE_CLUSTERS)
    wt.PAGE_SUP, wt.PAGE_CLUSTERS = monkeypatch_vals
    try:
        return fn()
    finally:
        wt.PAGE_SUP, wt.PAGE_CLUSTERS = old


def test_paged_matches_bruteforce():
    v0, e1, e2, (boxes, cbox, attr, remap, sbox) = _scene(num_tris=5000,
                                                          seed=5)
    nc = int((cbox[:, 6] > 0).sum())
    R = wt.BLOCK
    o, d = _rays(R, seed=6)
    tmin = np.full((R,), 1e-4, np.float32)
    tmax = np.full((R,), 3e38, np.float32)
    tmax[::5] = 0.0

    def run():
        return wt.wave_intersect_paged(
            jnp.asarray(boxes), jnp.asarray(cbox), jnp.asarray(attr),
            jnp.asarray(remap), jnp.asarray(sbox), jnp.asarray(o),
            jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
            ncp=boxes.shape[1], interpret=True,
            tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1),
            tri_e2=jnp.asarray(e2))

    # 1 super (16 clusters) per page -> the fixture spans >= 3 pages
    t, tri, u, v = _paged((1, wt.SUP), run)
    assert nc > 2 * wt.SUP, f"fixture too small to page ({nc} clusters)"
    t, tri = np.asarray(t), np.asarray(tri)

    bt, bi, uu, vv = _brute(v0, e1, e2, o, d, 1e-4, tmax)
    live = tmax > 0
    hit_ref = (bi >= 0) & live
    hit_got = tri >= 0
    agree = hit_got == hit_ref
    assert agree.mean() > 0.998, agree.mean()
    both = hit_ref & hit_got
    np.testing.assert_allclose(t[both], bt[both], rtol=1e-4)
    # winner ids match where the hit agrees (modulo grazing t ties)
    same = tri[both] == bi[both]
    assert same.mean() > 0.99, same.mean()


def test_paged_anyhit():
    v0, e1, e2, (boxes, cbox, attr, remap, sbox) = _scene(num_tris=5000,
                                                          seed=7)
    R = wt.BLOCK
    o, d = _rays(R, seed=8)
    tmin = np.full((R,), 1e-4, np.float32)
    tmax = np.full((R,), 3e38, np.float32)

    def run():
        return wt.wave_intersect_paged(
            jnp.asarray(boxes), jnp.asarray(cbox), jnp.asarray(attr),
            jnp.asarray(remap), jnp.asarray(sbox), jnp.asarray(o),
            jnp.asarray(d), jnp.asarray(tmin), jnp.asarray(tmax),
            ncp=boxes.shape[1], interpret=True, any_hit=True)

    t, tri, u, v = _paged((1, wt.SUP), run)
    tri = np.asarray(tri)
    bt, bi, _, _ = _brute(v0, e1, e2, o, d, 1e-4, tmax)
    assert ((tri >= 0) == (bi >= 0)).mean() > 0.998
