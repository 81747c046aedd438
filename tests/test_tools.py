"""Tool + app layer tests: hdrmanip, scenemanip, obj2json, checkpoint,
CLI duration parsing, HTTP server endpoints."""
import json
import os
import zipfile

import numpy as np
import pytest


def test_hdrmanip_merge_and_metrics(tmp_path):
    from tungsten_tpu.tools import hdrmanip as hm
    from tungsten_tpu.io.image import save_hdr
    rs = np.random.RandomState(0)
    a = rs.rand(8, 8, 3).astype(np.float32)
    b = rs.rand(8, 8, 3).astype(np.float32)
    m = hm.merge([a, b])
    assert np.allclose(m, (a + b) / 2)
    m2 = hm.merge([a, b], [3.0, 1.0])
    assert np.allclose(m2, (3 * a + b) / 4)
    assert hm.mse(a, a) == 0.0
    assert hm.mse(a, b) > 0
    assert hm.variance([a, b]) > 0
    # CLI round trip
    pa, pb = str(tmp_path / "a.pfm"), str(tmp_path / "b.pfm")
    save_hdr(pa, a)
    save_hdr(pb, b)
    out = str(tmp_path / "m.pfm")
    hm.main([pa, pb, "-m", "-o", out])
    from tungsten_tpu.io.image import _load_pfm
    assert np.allclose(_load_pfm(out), (a + b) / 2, atol=1e-6)


def test_scenemanip_package(tmp_path):
    from tungsten_tpu.tools import scenemanip as sm
    from tungsten_tpu.io.mesh import save_wo3, Mesh
    mesh = Mesh(pos=np.zeros((3, 3), np.float32),
                normal=np.zeros((3, 3), np.float32),
                uv=np.zeros((3, 2), np.float32),
                indices=np.array([[0, 1, 2]], np.int32),
                material=np.array([-1], np.int32))
    save_wo3(tmp_path / "m.wo3", mesh)
    scene = {"bsdfs": [{"name": "a", "type": "lambert"}],
             "primitives": [{"type": "mesh", "file": "m.wo3", "bsdf": "a"}],
             "camera": {}, "integrator": {}, "renderer": {}}
    sp = tmp_path / "scene.json"
    sp.write_text(json.dumps(scene))
    assert sm.list_resources(str(sp)) == ["m.wo3"]
    out = sm.package(str(sp))
    with zipfile.ZipFile(out) as zf:
        assert set(zf.namelist()) == {"scene.json", "m.wo3"}
    # and the packaged zip loads as a scene
    from tungsten_tpu.scene.parse import load_scene
    desc = load_scene(out)
    assert len(desc.primitives) == 1


def test_obj2json(tmp_path):
    from tungsten_tpu.tools import obj2json
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    out = obj2json.convert(str(obj))
    data = json.loads(open(out).read())
    assert data["primitives"][0]["type"] == "mesh"
    from tungsten_tpu.io.mesh import load_wo3
    m = load_wo3(tmp_path / "tri.wo3")
    assert m.num_tris == 1


def test_checkpoint_roundtrip(tmp_path):
    from tungsten_tpu.integrators.checkpoint import (
        save_resume_state, load_resume_state, scene_hash)
    fb = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    h = scene_hash({"bsdfs": [], "renderer": {"spp": 9}})
    p = str(tmp_path / "state.dat")
    save_resume_state(p, h, fb, 24)
    st = load_resume_state(p, h)
    assert st["current_spp"] == 24
    assert np.array_equal(st["framebuffer"], fb)
    # renderer block must not affect the hash; other blocks must
    assert h == scene_hash({"bsdfs": [], "renderer": {"spp": 1}})
    assert load_resume_state(p, scene_hash({"bsdfs": [1]})) is None


def test_parse_duration():
    from tungsten_tpu.cli import parse_duration
    assert parse_duration("0") == 0
    assert parse_duration("90s") == 90
    assert parse_duration("15m") == 900
    assert parse_duration("1h30m") == 5400


def test_server_endpoints():
    import urllib.request
    from tungsten_tpu import server as srv
    httpd = srv.serve(18723)
    try:
        srv.STATUS.framebuffer = np.ones((4, 4, 3), np.float32) * 0.5
        srv.STATUS.log("hello")
        srv.STATUS.record_round(1_000_000, 0.5)
        st = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18723/status").read())
        assert "state" in st
        assert st["mrays_per_s"] == 2.0
        assert st["mrays_per_s_per_chip"] > 0
        assert st["rays_total"] == 1_000_000
        png = urllib.request.urlopen("http://127.0.0.1:18723/render").read()
        assert png[:4] == b"\x89PNG"
        log = urllib.request.urlopen("http://127.0.0.1:18723/log").read()
        assert b"hello" in log
    finally:
        httpd.shutdown()


def test_exr_roundtrip(tmp_path):
    """Pure-python EXR codec (ZIPS float32): write/read bit-exact."""
    import numpy as np
    from tungsten_tpu.io.image import load_hdr, save_hdr
    img = (np.random.RandomState(7).rand(21, 34, 3) * 8).astype(np.float32)
    p = str(tmp_path / "x.exr")
    save_hdr(p, img)
    np.testing.assert_array_equal(load_hdr(p), img)
