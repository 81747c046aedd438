"""Native C++ runtime (BVH builder + OBJ parser): equivalence with the
Python fallbacks.  Skipped when g++/the library is unavailable."""
import os

import numpy as np
import pytest

from tungsten_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _walk_leaves(bm, bM, mt, sk, order, o, d):
    hits = set()
    node = 0
    num = len(mt)
    invd = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    while node < num:
        t0s = (bm[node] - o) * invd
        t1s = (bM[node] - o) * invd
        tn = max(np.minimum(t0s, t1s).max(), 0.0)
        tf = np.maximum(t0s, t1s).min()
        if tn <= tf:
            if mt[node, 1] > 0:
                for k in range(mt[node, 1]):
                    hits.add(int(order[mt[node, 0] + k]))
                node = sk[node]
            else:
                node += 1
        else:
            node = sk[node]
    return hits


def test_native_bvh_complete():
    rng = np.random.default_rng(1)
    n = 5000
    c = rng.random((n, 3)).astype(np.float32) * 10
    e = rng.random((n, 3)).astype(np.float32) * 0.2
    pmin, pmax = c - e, c + e
    res = native.build_bvh_native(pmin, pmax, 4)
    assert res is not None
    bmin, bmax, meta, skip, order = res
    assert sorted(order.tolist()) == list(range(n))
    assert np.allclose(bmin[0], pmin.min(0), atol=1e-5)
    assert np.allclose(bmax[0], pmax.max(0), atol=1e-5)
    for i in range(10):
        o = rng.random(3).astype(np.float32) * 10
        d = rng.standard_normal(3).astype(np.float32)
        d /= np.linalg.norm(d)
        invd = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t0s = (pmin - o) * invd
        t1s = (pmax - o) * invd
        tn = np.maximum(np.minimum(t0s, t1s).max(1), 0)
        tf = np.maximum(t0s, t1s).min(1)
        truth = set(np.nonzero(tn <= tf)[0].tolist())
        visited = _walk_leaves(bmin, bmax, meta, skip, order, o, d)
        assert truth <= visited


def test_native_obj_matches_python(tmp_path):
    obj = tmp_path / "q.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vn 0 0 1\nvt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/1 4/4/1\n"
        "f -4 -3 -2\n")
    res = native.load_obj_native(str(obj))
    assert res is not None
    pos, nrm, uv, idx = res
    assert idx.shape[0] == 3  # quad fan (2) + tri (1)
    # python fallback comparison
    os.environ["TUNGSTEN_TPU_NO_NATIVE"] = "1"
    native._lib = None
    native._tried = False
    try:
        from tungsten_tpu.io.mesh import load_obj
        mesh = load_obj(str(obj))
        assert mesh.indices.shape[0] == 3
        # same triangle positions regardless of vertex unification order
        a = np.sort(pos[idx].reshape(-1, 9), axis=0)
        b = np.sort(mesh.pos[mesh.indices].reshape(-1, 9), axis=0)
        assert np.allclose(a, b, atol=1e-6)
    finally:
        os.environ.pop("TUNGSTEN_TPU_NO_NATIVE")
        native._lib = None
        native._tried = False
