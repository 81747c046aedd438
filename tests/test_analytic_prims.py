"""Analytic disk / cylinder primitives (ref Disk.cpp, Cylinder.cpp):
exact intersection tests, transform decomposition, and NEE-vs-brute
estimator consistency for the new LIGHT_DISK / LIGHT_CYLINDER types."""
import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.ops.intersect import bvh_intersect


def _scene(prims, bsdfs=None, integrator=None):
    d = tempfile.mkdtemp()
    desc = SceneDesc(
        path=os.path.join(d, "scene.json"), json={},
        bsdfs=bsdfs or [{"name": "b", "type": "lambert", "albedo": 0.8}],
        primitives=prims, media=[],
        camera={"resolution": [16, 16],
                "transform": {"position": [0, 1, 3],
                              "look_at": [0, 1, 0], "up": [0, 1, 0]}},
        integrator=integrator or {}, renderer={})
    return flatten_scene(desc)


def test_disk_intersection_exact():
    # disk at origin in the xz plane, radius 2 (scale 2, ref
    # Disk.cpp:315-318: radius = max xz scale of a UNIT-radius disk)
    scene, _ = _scene([{
        "type": "disk", "bsdf_index": 0,
        "transform": {"position": [0.0, 1.0, 0.0], "scale": 2.0},
    }])
    assert scene.dsk_r.shape[0] == 1
    np.testing.assert_allclose(np.asarray(scene.dsk_r), [2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.dsk_c[0]), [0, 1, 0],
                               atol=1e-6)

    rs = np.random.RandomState(0)
    o = np.array([[0.5, 3.0, 0.2]] * 64, np.float32)
    d = rs.randn(64, 3).astype(np.float32)
    d[:, 1] = -np.abs(d[:, 1]) - 0.2       # downward
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    res = bvh_intersect(scene, jnp.asarray(o), jnp.asarray(d), 0.0, 3e38)
    # analytic expectation
    t_exp = (1.0 - o[:, 1]) / d[:, 1]
    q = o + t_exp[:, None] * d
    inside = np.sum((q - [0, 1, 0]) ** 2, -1) <= 4.0
    hit = np.asarray(res["hit"])
    assert (hit == inside).all()
    np.testing.assert_allclose(np.asarray(res["t"])[inside],
                               t_exp[inside], rtol=1e-5)
    assert (np.asarray(res["dsk"])[inside] == 0).all()


def test_cylinder_intersection_exact():
    # unit cylinder scaled: radius = 0.5 * xz scale, halfHeight =
    # 0.5 * y scale (ref Cylinder.cpp:288-298)
    scene, _ = _scene([{
        "type": "cylinder", "bsdf_index": 0,
        "transform": {"position": [0.0, 1.0, 0.0],
                      "scale": [2.0, 4.0, 2.0]},
    }])
    np.testing.assert_allclose(np.asarray(scene.cyl_r), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.cyl_hh), [2.0], atol=1e-6)

    # horizontal rays through the axis: side hits at x = +-1
    o = np.array([[3.0, 1.5, 0.0]] * 3, np.float32)
    d = np.array([[-1, 0, 0]] * 3, np.float32)
    res = bvh_intersect(scene, jnp.asarray(o), jnp.asarray(d), 0.0, 3e38)
    assert bool(np.asarray(res["hit"]).all())
    np.testing.assert_allclose(np.asarray(res["t"]), [2.0] * 3, rtol=1e-5)
    assert (np.asarray(res["cyl"]) == 0).all()

    # vertical ray: cap hit at y = 3
    o2 = np.array([[0.3, 5.0, 0.1]], np.float32)
    d2 = np.array([[0, -1, 0]], np.float32)
    res2 = bvh_intersect(scene, jnp.asarray(o2), jnp.asarray(d2), 0.0, 3e38)
    assert bool(np.asarray(res2["hit"])[0])
    np.testing.assert_allclose(np.asarray(res2["t"]), [2.0], rtol=1e-5)

    # uncapped: the same vertical ray passes through
    scene3, _ = _scene([{
        "type": "cylinder", "bsdf_index": 0, "capped": False,
        "transform": {"position": [0.0, 1.0, 0.0],
                      "scale": [2.0, 4.0, 2.0]},
    }])
    res3 = bvh_intersect(scene3, jnp.asarray(o2), jnp.asarray(d2), 0.0, 3e38)
    assert not bool(np.asarray(res3["hit"])[0])


def test_disk_normal_and_prim():
    from tungsten_tpu.integrators.path_tracer import _expand_hit
    scene, _ = _scene([
        {"type": "disk", "bsdf_index": 0,
         "transform": {"position": [0, 1, 0], "scale": 2.0}},
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, 0, 0], "scale": 50.0}},
    ])
    o = jnp.asarray([[0.5, 3.0, 0.2], [4.0, 3.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0, -1, 0], [0, -1, 0]], jnp.float32)
    res = bvh_intersect(scene, o, d, 0.0, 3e38)
    info = _expand_hit(scene, o, d, res)
    ng = np.asarray(info["ng"])
    prim = np.asarray(info["prim"])
    # first ray hits the disk (normal +y), second falls to the floor
    assert np.asarray(res["dsk"])[0] == 0 and np.asarray(res["dsk"])[1] < 0
    np.testing.assert_allclose(ng[0], [0, 1, 0], atol=1e-5)
    assert prim[0] == 0 and prim[1] == 1


def _render_direct(scene, settings, spp, light_sampling):
    """Mean image of a tiny frame with/without NEE."""
    from dataclasses import replace
    from tungsten_tpu.render import render
    s = replace(settings, enable_light_sampling=light_sampling,
                max_bounces=2, adaptive_sampling=False)
    return render(scene, s, spp=spp, spp_chunk=spp, seed=7)


def test_disk_light_nee_consistency():
    # lambert floor lit by a small disk emitter: the NEE estimator and
    # the brute-force (emitter-hit only) estimator must agree
    scene, settings = _scene([
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, 0, 0], "scale": 20.0}},
        {"type": "disk", "bsdf_index": 0, "emission": [14.0, 10.0, 6.0],
         "transform": {"position": [0.0, 2.5, 0.0], "scale": 1.2,
                       "rotation": [180.0, 0.0, 0.0]}},
    ])
    assert settings.has_disk_lights and settings.num_lights == 1
    nee = _render_direct(scene, settings, 48, True)
    brute = _render_direct(scene, settings, 768, False)
    m_n, m_b = nee.mean(axis=(0, 1)), brute.mean(axis=(0, 1))
    assert m_b.mean() > 1e-4, "brute estimator saw no light"
    np.testing.assert_allclose(m_n, m_b, rtol=0.08)


def test_sphere_light_nee_consistency():
    # cone-sampled sphere emitter (ref Sphere::sampleDirect): NEE vs
    # brute-force emitter-hit estimator must agree
    scene, settings = _scene([
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, 0, 0], "scale": 20.0}},
        {"type": "sphere", "bsdf_index": 0, "emission": [20.0, 16.0, 12.0],
         "transform": {"position": [0.4, 2.2, 0.3], "scale": 0.5}},
    ])
    assert settings.has_sphere_lights and settings.num_lights == 1
    nee = _render_direct(scene, settings, 48, True)
    brute = _render_direct(scene, settings, 768, False)
    m_n, m_b = nee.mean(axis=(0, 1)), brute.mean(axis=(0, 1))
    assert m_b.mean() > 1e-4
    np.testing.assert_allclose(m_n, m_b, rtol=0.08)


def test_cylinder_light_nee_consistency():
    scene, settings = _scene([
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, 0, 0], "scale": 20.0}},
        {"type": "cylinder", "bsdf_index": 0,
         "emission": [9.0, 9.0, 9.0],
         "transform": {"position": [0.0, 2.0, 0.0],
                       "scale": [0.8, 1.6, 0.8]}},
    ])
    assert settings.has_cyl_lights
    nee = _render_direct(scene, settings, 48, True)
    brute = _render_direct(scene, settings, 1024, False)
    m_n, m_b = nee.mean(axis=(0, 1)), brute.mean(axis=(0, 1))
    assert m_b.mean() > 1e-4
    np.testing.assert_allclose(m_n, m_b, rtol=0.1)
