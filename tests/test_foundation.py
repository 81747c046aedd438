"""Foundation tests: vec math, RNG, transforms, mesh IO, BVH build."""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.utils import vecmath as vm
from tungsten_tpu.utils import rng
from tungsten_tpu.scene import transform as xform
from tungsten_tpu.scene.bvh import build_bvh


def test_ortho_frame_orthonormal():
    rs = np.random.RandomState(0)
    n = rs.randn(100, 3)
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    t, b = vm.ortho_frame(jnp.asarray(n, jnp.float32))
    t, b = np.asarray(t), np.asarray(b)
    assert np.abs(np.sum(t * n, -1)).max() < 1e-5
    assert np.abs(np.sum(b * n, -1)).max() < 1e-5
    assert np.abs(np.sum(t * b, -1)).max() < 1e-5
    assert np.abs(np.linalg.norm(t, axis=-1) - 1).max() < 1e-5
    # right-handed: t x b = n
    assert np.abs(np.cross(t, b) - n).max() < 1e-5


def test_local_global_roundtrip():
    rs = np.random.RandomState(1)
    n = rs.randn(50, 3)
    n = jnp.asarray(n / np.linalg.norm(n, axis=1, keepdims=True), jnp.float32)
    w = rs.randn(50, 3)
    w = jnp.asarray(w / np.linalg.norm(w, axis=1, keepdims=True), jnp.float32)
    t, b = vm.ortho_frame(n)
    local = vm.to_local(t, b, n, w)
    back = vm.to_global(t, b, n, local)
    assert np.abs(np.asarray(back) - np.asarray(w)).max() < 1e-5


def test_rng_uniform_and_deterministic():
    pix = jnp.arange(100000, dtype=jnp.uint32)
    u = np.asarray(rng.random_1d(0, pix, 0, 0))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    # histogram roughly uniform
    h, _ = np.histogram(u, bins=16, range=(0, 1))
    assert h.min() > 100000 / 16 * 0.9
    # deterministic
    u2 = np.asarray(rng.random_1d(0, pix, 0, 0))
    assert np.array_equal(u, u2)
    # different dims decorrelated
    v = np.asarray(rng.random_1d(0, pix, 0, 1))
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.01


def test_transform_trs():
    # scale then rotate then translate, matching Tungsten order
    m = xform.parse_transform({
        "position": [1, 2, 3],
        "scale": [2, 2, 2],
        "rotation": [0, 90, 0],
    })
    # unit x axis scaled to 2, rotated 90 deg about Y: x -> +z (Tungsten rotYXZ)
    p = xform.transform_point(m, [1, 0, 0])
    assert np.allclose(p, [1, 2, 5], atol=1e-6), p


def test_transform_lookat():
    m = xform.parse_transform({
        "position": [0, 1, 6.8], "look_at": [0, 1, 0], "up": [0, 1, 0]})
    # camera forward (z column) points from pos toward look_at = -z world
    fwd = m[:3, 2]
    assert np.allclose(fwd, [0, 0, -1], atol=1e-6)
    # right-handed with up y: x column should be (-1,0,0) or (1,0,0)
    assert abs(abs(m[2, 2]) - 1) < 1e-6


def test_bvh_build_and_contains():
    rs = np.random.RandomState(2)
    n = 1000
    centers = rs.rand(n, 3) * 10
    half = rs.rand(n, 3) * 0.1
    pmin, pmax = centers - half, centers + half
    bvh = build_bvh(pmin, pmax)
    # every primitive appears exactly once
    assert np.array_equal(np.sort(bvh.order), np.arange(n))
    # leaf ranges cover all prims; node bounds contain their prims
    leaf = bvh.meta[:, 1] > 0
    covered = np.zeros(n, bool)
    for i in np.nonzero(leaf)[0]:
        s, c = bvh.meta[i]
        ids = bvh.order[s:s + c]
        covered[ids] = True
        assert (bvh.bounds_min[i] <= pmin[ids].min(0) + 1e-6).all()
        assert (bvh.bounds_max[i] >= pmax[ids].max(0) - 1e-6).all()
    assert covered.all()
    # skip pointers: root skip == num nodes; child skips stay in range
    assert bvh.skip[0] == bvh.num_nodes
    assert (bvh.skip[1:] <= bvh.num_nodes).all()


def test_wo3_roundtrip(tmp_path):
    from tungsten_tpu.io import mesh as mio
    rs = np.random.RandomState(3)
    mesh = mio.Mesh(
        pos=rs.rand(10, 3).astype(np.float32),
        normal=rs.rand(10, 3).astype(np.float32),
        uv=rs.rand(10, 2).astype(np.float32),
        indices=rs.randint(0, 10, (5, 3)).astype(np.int32),
        material=np.full(5, -1, np.int32),
    )
    p = tmp_path / "test.wo3"
    mio.save_wo3(p, mesh)
    m2 = mio.load_wo3(p)
    assert np.allclose(m2.pos, mesh.pos)
    assert np.array_equal(m2.indices, mesh.indices)


def test_rgbe_reader_matches_cv2():
    import cv2
    path = "/root/reference/data/materialtest/envmap.hdr"
    from tungsten_tpu.io.image import _load_rgbe
    mine = _load_rgbe(path)
    ref = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)[..., ::-1]
    rel = np.abs(mine - ref).mean() / max(ref.mean(), 1e-9)
    assert rel < 0.01


def test_scene_parse_error_carries_location(tmp_path):
    """ref io/JsonDocument.cpp: parse errors carry file + offset."""
    import pytest
    from tungsten_tpu.scene.parse import SceneParseError, load_scene
    bad = tmp_path / "broken.json"
    bad.write_text('{\n  "bsdfs": [\n    {"type": "lambert",}\n  ]\n}')
    with pytest.raises(SceneParseError) as ei:
        load_scene(str(bad))
    msg = str(ei.value)
    assert "broken.json:3" in msg and "offset" in msg
