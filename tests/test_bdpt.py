"""BDPT correctness: the strategy-summed, MIS-weighted bidirectional
estimator must agree with the forward path tracer (same transport, same
path-length truncation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from tungsten_tpu.scene.flatten import load_flat_scene
from tungsten_tpu.integrators.bdpt import trace_bdpt
from tungsten_tpu.render import render

SCENE = "/root/reference/data/example-scenes/cornell-box/scene.json"


def _bdpt_image(scene, s, spp, nv, me, seed=123):
    n = s.width * s.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    f = jax.jit(lambda p, si: trace_bdpt(scene, s, p, si, jnp.uint32(seed),
                                         max_vertices=nv, max_edges=me))
    acc = np.zeros((n, 3))
    splat = np.zeros((n, 3))
    for k in range(spp):
        rad, spix, sval, _ = f(pixel, jnp.full(n, k, jnp.uint32))
        acc += np.where(np.isfinite(rad), np.asarray(rad), 0)
        np.add.at(splat, np.asarray(spix),
                  np.where(np.isfinite(sval), np.asarray(sval), 0))
    return ((acc + splat) / spp).reshape(s.height, s.width, 3)


@pytest.mark.parametrize("me", [2, 3])
def test_bdpt_matches_pt(me):
    scene, settings = load_flat_scene(SCENE)
    s = replace(settings, width=32, height=18, max_bounces=me)
    pt = render(scene, s, spp=384, spp_chunk=128)
    bd = _bdpt_image(scene, s, 192, me + 1, me)
    rel = np.abs(bd.mean((0, 1)) - pt.mean((0, 1))) / pt.mean((0, 1))
    assert rel.max() < 0.05, (bd.mean((0, 1)), pt.mean((0, 1)))


def test_light_tracer_matches_pt():
    """The adjoint particle tracer (splat-only) estimates the same
    transport as the forward PT (ref light_tracer integrator)."""
    scene, settings = load_flat_scene(SCENE)
    me = 3
    s_pt = replace(settings, width=32, height=18, max_bounces=me)
    s_lt = replace(s_pt, integrator_type="light_tracer",
                   bdpt_vertices=me + 1)
    pt = render(scene, s_pt, spp=256, spp_chunk=128)
    lt = render(scene, s_lt, spp=512, spp_chunk=128)
    rel = np.abs(lt.mean((0, 1)) - pt.mean((0, 1))) / pt.mean((0, 1))
    assert rel.max() < 0.08, (lt.mean((0, 1)), pt.mean((0, 1)))


def test_bdpt_through_driver():
    """render() dispatches bdpt by integrator_type and merges splats."""
    scene, settings = load_flat_scene(SCENE)
    s = replace(settings, width=16, height=9, max_bounces=2,
                integrator_type="bidirectional_path_tracer",
                bdpt_vertices=3)
    img = render(scene, s, spp=8, spp_chunk=8)
    assert np.isfinite(img).all() and img.mean() > 0


VOLCAUSTIC = ("/root/reference/data/example-scenes/volumetric-caustic/"
              "scene.json")


@pytest.mark.parametrize("me", [2, 3])
def test_bdpt_media_matches_pt(me):
    """Medium path vertices: the BDPT estimator with medium vertices,
    edge medium pdfs in MIS, forward-wall collapse and generalized-shadow
    connections agrees with the forward volumetric PT on the
    volumetric-caustic fixture (homogeneous isotropic medium + dielectric
    sphere + forward front wall)."""
    scene, settings = load_flat_scene(VOLCAUSTIC)
    s = replace(settings, width=24, height=14, max_bounces=me)
    pt = render(scene, s, spp=256, spp_chunk=64)
    bd = _bdpt_image_scene(scene, s, 64, me + 1, me)
    rel = np.abs(bd.mean((0, 1)) - pt.mean((0, 1))) / pt.mean((0, 1))
    assert rel.max() < 0.06, (bd.mean((0, 1)), pt.mean((0, 1)))


def _bdpt_image_scene(scene, s, spp, nv, me, seed=7):
    n = s.width * s.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    f = jax.jit(lambda p, si: trace_bdpt(scene, s, p, si, jnp.uint32(seed),
                                         max_vertices=nv, max_edges=me))
    acc = np.zeros((n, 3))
    splat = np.zeros((n, 3))
    for k in range(spp):
        rad, spix, sval, _ = f(pixel, jnp.full(n, k, jnp.uint32))
        acc += np.where(np.isfinite(rad), np.asarray(rad), 0)
        np.add.at(splat, np.asarray(spix),
                  np.where(np.isfinite(sval), np.asarray(sval), 0))
    return ((acc + splat) / spp).reshape(s.height, s.width, 3)


def test_bdpt_env_escape_matches_pt():
    """A lambert floor under an environment map: BDPT's camera-side env
    escape (s'=0 strategy at weight 1 — light subpaths never root on
    the env, so no strategy overlaps it) must agree with the path
    tracer on the same scene."""
    import tempfile
    import os
    from dataclasses import replace
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.render import render
    from tungsten_tpu.io.image import save_hdr

    d = tempfile.mkdtemp()
    img = np.full((16, 32, 3), 0.6, np.float32)
    img[:4] = [3.0, 2.0, 1.0]      # bright "sky" band
    save_hdr(os.path.join(d, "env.pfm"), img)
    desc = SceneDesc(
        path=os.path.join(d, "scene.json"), json={},
        bsdfs=[{"type": "lambert", "albedo": 0.6}],
        primitives=[
            {"type": "infinite_sphere", "emission": "env.pfm",
             "sample": True, "bsdf_index": 0},
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, -0.5, 0], "scale": [4, 1, 4]}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [16, 12], "fov": 70,
                "transform": {"position": [0, 0.6, 2.5],
                              "look_at": [0, 0, 0]}},
        integrator={"type": "bidirectional_path_tracer",
                    "max_bounces": 4},
        renderer={"spp": 1})
    scene, settings = flatten_scene(desc)
    img_bdpt = np.asarray(render(scene, settings, spp=24))
    s_pt = replace(settings, integrator_type="path_tracer")
    img_pt = np.asarray(render(scene, s_pt, spp=24))
    assert np.isfinite(img_bdpt).all()
    ratio = img_bdpt.mean() / max(img_pt.mean(), 1e-9)
    assert 0.85 < ratio < 1.18, f"bdpt/pt env ratio {ratio}"


def test_bdpt_heterogeneous_media_matches_pt():
    """Heterogeneous (exponential falloff) medium: BDPT's subpath
    distance sampling inverts the unit optical depth and connection
    edges integrate tau along the density field — must agree with the
    forward volumetric PT on the same scene."""
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    desc = SceneDesc(
        path="/tmp/het_bdpt.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.6}],
        primitives=[
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, -1.0, 0], "scale": 6.0}},
            {"type": "quad", "bsdf_index": 0, "emission": [8.0] * 3,
             "transform": {"position": [0, 2.5, 0], "scale": 1.5,
                           "rotation": [0, 0, 180]}},
        ],
        media=[{"type": "exponential", "falloff_scale": 1.1,
                "unit_point": [0.0, -1.0, 0.0],
                "falloff_direction": [0.0, 1.0, 0.0],
                "sigma_a": 0.1, "sigma_s": 0.45}],
        camera={"type": "pinhole", "resolution": [24, 16], "fov": 70,
                "medium": 0,
                "transform": {"position": [0, 0.4, 3.2],
                              "look_at": [0, 0.2, 0]}},
        integrator={"type": "path_tracer", "max_bounces": 3},
        renderer={"spp": 1})
    scene, settings = flatten_scene(desc)
    me = 3
    s = replace(settings, width=24, height=16, max_bounces=me)
    pt = render(scene, s, spp=192, spp_chunk=64)
    bd = _bdpt_image_scene(scene, s, 64, me + 1, me)
    rel = np.abs(bd.mean((0, 1)) - pt.mean((0, 1))) / pt.mean((0, 1))
    assert rel.max() < 0.07, (bd.mean((0, 1)), pt.mean((0, 1)))
