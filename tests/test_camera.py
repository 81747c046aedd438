"""Reconstruction filters, adaptive sampling, camera projections.

References: src/core/cameras/ReconstructionFilter.{hpp,cpp},
PathTraceIntegrator.cpp:44-134 (adaptive), EquirectangularCamera.cpp,
CubemapCamera.cpp.
"""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from tungsten_tpu.cameras.camera import (
    FILTER_WIDTHS, filter_eval, filter_sample, generate_rays)
from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene


def test_filter_sampling_matches_profile():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(100000, dtype=np.float32))
    for name in ("gaussian", "mitchell_netravali", "catmull_rom",
                 "lanczos", "tent"):
        s = np.asarray(filter_sample(name, u))
        w = FILTER_WIDTHS[name]
        assert (np.abs(s) <= w + 1e-4).all()
        H, edges = np.histogram(s, bins=32, range=(-w, w), density=True)
        centers = 0.5 * (edges[:-1] + edges[1:])
        f = np.maximum(filter_eval(name, centers), 0.0)
        f = f / (f.sum() * (edges[1] - edges[0]))
        assert np.abs(H - f).max() < 0.06, name


def _simple_scene(camera, integ=None, renderer=None):
    return SceneDesc(
        path="/tmp/cam.json", json={},
        bsdfs=[{"name": "w", "type": "lambert", "albedo": 0.7}],
        primitives=[
            {"type": "quad", "bsdf_index": 0, "transform": {"scale": 4.0}},
            {"type": "quad", "bsdf_index": 0, "emission": 10.0,
             "transform": {"position": [0, 3.0, 0], "scale": 1.0,
                           "rotation": [180, 0, 0]}},
        ],
        media=[], camera=camera, integrator=integ or {"max_bounces": 4},
        renderer=renderer or {})


def test_adaptive_matches_uniform():
    from tungsten_tpu.render import render
    desc = _simple_scene(
        {"type": "pinhole", "resolution": [24, 24],
         "transform": {"position": [0, 1.5, -4], "look_at": [0, 1, 0],
                       "up": [0, 1, 0]}},
        renderer={"spp": 32, "spp_step": 8, "adaptive_sampling": True})
    flat, settings = flatten_scene(desc)
    img_a = np.asarray(render(flat, settings, spp=32))
    img_u = np.asarray(render(flat, replace(settings,
                                            adaptive_sampling=False),
                              spp=32))
    assert np.isfinite(img_a).all()
    assert abs(img_a.mean() - img_u.mean()) / max(img_u.mean(), 1e-6) < 0.05


def test_equirect_covers_sphere():
    desc = _simple_scene({"type": "equirectangular",
                          "resolution": [64, 32]})
    flat, settings = flatten_scene(desc)
    n = settings.width * settings.height
    _, d = generate_rays(flat, settings, jnp.arange(n, dtype=jnp.uint32),
                         jnp.zeros(n, jnp.uint32), jnp.uint32(1))
    d = np.asarray(d)
    assert np.abs(np.linalg.norm(d, axis=1) - 1).max() < 1e-4
    # all octants covered
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                assert ((np.sign(d[:, 0]) == sx) & (np.sign(d[:, 1]) == sy)
                        & (np.sign(d[:, 2]) == sz)).any()


def test_cubemap_faces():
    desc = _simple_scene({"type": "cubemap", "mode": "row",
                          "resolution": [96, 16]})
    flat, settings = flatten_scene(desc)
    n = settings.width * settings.height
    _, d = generate_rays(flat, settings, jnp.arange(n, dtype=jnp.uint32),
                         jnp.zeros(n, jnp.uint32), jnp.uint32(1))
    d = np.asarray(d).reshape(16, 96, 3)
    # row mode: 6 faces left->right in +x -x +y -y +z -z order; the
    # center pixel of each face points along its axis.  The camera
    # world x axis is mirrored (ref Camera::fromJson flips the right
    # vector), so the local +x face looks along world -x.
    centers = d[8, 8::16]
    expect = np.array([[-1, 0, 0], [1, 0, 0], [0, 1, 0],
                       [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    assert np.abs(centers - expect).max() < 0.15, centers
