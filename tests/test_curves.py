"""Curves: IO roundtrips, analytic intersection, render integration.

Reference behavior: src/core/io/CurveIO.cpp (formats),
src/core/primitives/Curves.cpp (intersection modes).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.io import curves as cio
from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.ops.intersect import bvh_intersect


def _wavy_curves(n_curves=20, n_nodes=8, width=0.02, seed=0):
    rng = np.random.default_rng(seed)
    nodes_l, ends, tot = [], [], 0
    for _ in range(n_curves):
        base = np.array([rng.uniform(-0.5, 0.5), 0.0, rng.uniform(-0.5, 0.5)])
        step = 0.12 * np.stack([rng.normal(0, 0.2, n_nodes),
                                np.ones(n_nodes),
                                rng.normal(0, 0.2, n_nodes)], 1)
        pts = base[None] + np.cumsum(step, 0)
        n4 = np.concatenate([pts, np.full((n_nodes, 1), width)],
                            1).astype(np.float32)
        nodes_l.append(n4)
        tot += n_nodes
        ends.append(tot)
    nodes = np.concatenate(nodes_l)
    ce = np.asarray(ends, np.uint32)
    return cio.CurveData(ce, nodes, cio.init_normals(ce, nodes))


def test_fiber_roundtrip(tmp_path):
    data = _wavy_curves()
    fp = str(tmp_path / "t.fiber")
    cio.save_fiber(fp, data)
    back = cio.load_fiber(fp)
    assert np.allclose(back.nodes, data.nodes)
    assert np.array_equal(back.curve_ends, data.curve_ends)


def test_hair_roundtrip(tmp_path):
    data = _wavy_curves()
    fp = str(tmp_path / "t.hair")
    cio.save_hair(fp, data)
    back = cio.load_hair(fp)
    assert np.allclose(back.nodes[:, :3], data.nodes[:, :3], atol=1e-6)
    assert np.allclose(back.nodes[:, 3], data.nodes[:, 3], atol=1e-6)
    assert np.array_equal(back.curve_ends, data.curve_ends)


def test_normals_orthogonal_to_tangent():
    data = _wavy_curves(n_curves=5)
    starts = np.concatenate([[0], data.curve_ends[:-1]])
    for s, e in zip(starts, data.curve_ends):
        p = data.nodes[s:e, :3]
        n = data.normals[s:e]
        t = p[1:] - p[:-1]
        t = t / np.linalg.norm(t, axis=1, keepdims=True)
        # node i's normal is transported orthogonal to segment i -> i+1
        dots = np.abs(np.sum(n[1:-1] * t[1:], axis=1))
        assert dots.max() < 1e-4
        assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def _scene_with_curve(tmp_path, nodes, curve_ends, mode, width=None,
                      extra=None):
    data = cio.CurveData(np.asarray(curve_ends, np.uint32),
                         np.asarray(nodes, np.float32),
                         cio.init_normals(np.asarray(curve_ends, np.uint32),
                                          np.asarray(nodes, np.float32)))
    fp = str(tmp_path / "c.fiber")
    cio.save_fiber(fp, data)
    prim = {"type": "curves", "file": "c.fiber", "bsdf_index": 0,
            "mode": mode}
    if width is not None:
        prim["curve_thickness"] = width
    desc = SceneDesc(
        path=str(tmp_path / "s.json"), json={},
        bsdfs=[{"name": "l", "type": "lambert", "albedo": 0.8}],
        primitives=[prim] + (extra or []),
        media=[], camera={"type": "pinhole", "resolution": [16, 16]},
        integrator={"max_bounces": 3}, renderer={"spp": 2})
    return flatten_scene(desc)


def test_straight_cylinder_hit(tmp_path):
    # straight curve along x at y=0, radius 0.05: a vertical ray from
    # (0, 2, 0) hits the cylinder surface at t = 2 - 0.05
    w = 0.05
    nodes = [[-2, 0, 0, w], [-1, 0, 0, w], [0, 0, 0, w],
             [1, 0, 0, w], [2, 0, 0, w]]
    scene, _ = _scene_with_curve(tmp_path, nodes, [5], "half_cylinder")
    o = jnp.asarray([[0.0, 2.0, 0.0], [0.0, 2.0, 0.0], [5.0, 2.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    res = bvh_intersect(scene, o, d, 0.0, 3e38)
    hit = np.asarray(res["hit"])
    t = np.asarray(res["t"])
    assert hit[0] and not hit[1] and not hit[2]
    assert abs(t[0] - (2.0 - w)) < 2e-3
    assert np.asarray(res["crv"])[0] >= 0
    # v coordinate: dead-center hit -> distance 0 -> v = 0.5
    assert abs(np.asarray(res["v"])[0] - 0.5) < 0.05


def test_curve_expand_normal_modes(tmp_path):
    from tungsten_tpu.integrators.path_tracer import _expand_hit
    w = 0.05
    nodes = [[-2, 0, 0, w], [-1, 0, 0, w], [0, 0, 0, w],
             [1, 0, 0, w], [2, 0, 0, w]]
    for mode, expect_n in [("half_cylinder", [0, 1, 0]),
                           ("bcsdf_cylinder", [0, 1, 0])]:
        scene, _ = _scene_with_curve(tmp_path, nodes, [5], mode)
        o = jnp.asarray([[0.0, 2.0, 0.0]])
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        res = bvh_intersect(scene, o, d, 0.0, 3e38)
        info = _expand_hit(scene, o, d, res)
        ng = np.asarray(info["ng"])[0]
        assert np.allclose(ng, expect_n, atol=0.05), (mode, ng)
        tang = np.asarray(info["crv_tangent"])[0]
        assert abs(abs(tang[0]) - 1.0) < 1e-3  # tangent along x


def test_curve_occlusion(tmp_path):
    # dense brush of parallel curves fully occludes a straight ray
    w = 0.06
    nodes, ends, tot = [], [], 0
    for x in np.linspace(-0.5, 0.5, 11):
        for k in range(5):
            nodes.append([x, -2 + k, 0, w])
        tot += 5
        ends.append(tot)
    scene, _ = _scene_with_curve(tmp_path, nodes, ends, "half_cylinder")
    from tungsten_tpu.ops.intersect import occluded
    o = jnp.asarray([[0.0, 0.0, -2.0], [0.0, 5.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    occ = np.asarray(occluded(scene, o, d, 0.0, 3e38))
    assert occ[0] and not occ[1]


def test_curves_render_finite(tmp_path):
    from tungsten_tpu.render import render
    data = _wavy_curves(n_curves=10)
    fp = str(tmp_path / "c.fiber")
    cio.save_fiber(fp, data)
    desc = SceneDesc(
        path=str(tmp_path / "s.json"), json={},
        bsdfs=[{"name": "l", "type": "lambert", "albedo": 0.8}],
        primitives=[
            {"type": "curves", "file": "c.fiber", "bsdf_index": 0,
             "mode": "half_cylinder"},
            {"type": "quad", "bsdf_index": 0, "emission": 8.0,
             "transform": {"position": [0, 3, 0], "scale": 4.0,
                           "rotation": [180, 0, 0]}},
            {"type": "quad", "bsdf_index": 0,
             "transform": {"scale": 10.0}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [24, 24],
                "transform": {"position": [0, 0.7, -2.5],
                              "look_at": [0, 0.5, 0], "up": [0, 1, 0]}},
        integrator={"max_bounces": 4}, renderer={"spp": 2})
    flat, settings = flatten_scene(desc)
    img = np.asarray(render(flat, settings, spp=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
