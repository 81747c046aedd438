"""Thinlens camera extras (ref ThinlensCamera.cpp): aperture bitmap
sampling, cat-eye diaphragm vignetting, focus_pivot, and the
light-tracer's sampled lens connections."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.cameras.camera import generate_rays_w


def _scene(cam_extra=None, prims=None, integrator=None):
    d = tempfile.mkdtemp()
    cam = {"type": "thinlens", "resolution": [32, 32], "fov": 45,
           "focus_distance": 3.0, "aperture_size": 0.25,
           "transform": {"position": [0, 1, 4], "look_at": [0, 1, 0],
                         "up": [0, 1, 0]}}
    if cam_extra:
        cam.update(cam_extra)
    desc = SceneDesc(
        path=os.path.join(d, "scene.json"), json={},
        bsdfs=[{"name": "b", "type": "lambert", "albedo": 0.75}],
        primitives=prims or [
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, 0, 0], "scale": 30}}],
        media=[], camera=cam, integrator=integrator or {}, renderer={})
    return d, flatten_scene(desc)


def _lens_local(scene, o):
    rot = np.asarray(scene.cam_mat[:3, :3])
    pos = np.asarray(scene.cam_mat[:3, 3])
    return (np.asarray(o) - pos) @ rot  # R^T (o - pos)


def test_aperture_bitmap_sampling():
    # half-bright / half-dark aperture: lens samples must land ~2:1
    from tungsten_tpu.io.image import save_hdr
    d = tempfile.mkdtemp()
    img = np.ones((8, 8, 3), np.float32)
    img[:, :4] = 2.0  # left half twice as bright
    ap_path = os.path.join(d, "ap.pfm")
    save_hdr(ap_path, img)

    _, (scene, settings) = _scene(cam_extra={"aperture": ap_path})
    assert settings.aperture_tex

    R = 20000
    pixel = jnp.zeros((R,), jnp.uint32)
    sample = jnp.arange(R, dtype=jnp.uint32)
    o, _, w = generate_rays_w(scene, settings, pixel, sample,
                              jnp.uint32(3))
    lens = _lens_local(scene, o)
    a = settings.aperture_size
    assert np.abs(lens[:, 0]).max() <= a + 1e-5
    assert np.abs(lens[:, 1]).max() <= a + 1e-5
    left = (lens[:, 0] < 0).mean()
    assert 0.62 < left < 0.71, left  # expect 2/3
    assert np.asarray(w).min() == 1.0  # importance-sampled: weight 1


def test_cat_eye_vignettes_corners():
    _, (scene, settings) = _scene(cam_extra={"cateye": 0.8})
    assert settings.cat_eye == 0.8
    R = 4096
    # center pixel vs corner pixel of the 32x32 frame
    center = jnp.full((R,), 16 * 32 + 16, jnp.uint32)
    corner = jnp.full((R,), 0, jnp.uint32)
    sample = jnp.arange(R, dtype=jnp.uint32)
    _, _, w_c = generate_rays_w(scene, settings, center, sample,
                                jnp.uint32(5))
    _, _, w_k = generate_rays_w(scene, settings, corner, sample,
                                jnp.uint32(5))
    live_c = float(np.asarray(w_c).mean())
    live_k = float(np.asarray(w_k).mean())
    # cat-eye shrinks the effective aperture everywhere (for the center
    # pixel analytically to (a / (a*(1 + ce*planeDist/focus)))^2 ~ 0.37
    # at these settings) and clips corners asymmetrically harder
    assert 0.2 < live_c < 0.6, live_c
    assert live_k < live_c * 0.9, (live_k, live_c)


def test_focus_pivot():
    _, (scene, settings) = _scene(
        cam_extra={"focus_pivot": "target", "focus_distance": 1.0},
        prims=[
            {"type": "quad", "name": "target", "bsdf_index": 0,
             "transform": {"position": [0, 1, -2], "scale": 1}},
        ])
    # camera at (0,1,4), pivot at (0,1,-2) -> distance 6
    np.testing.assert_allclose(settings.focus_distance, 6.0, rtol=1e-5)


def test_light_tracer_thinlens_matches_pt():
    # thinlens + quad emitter: light-tracer splats through sampled lens
    # points must agree with the forward path tracer
    from dataclasses import replace
    from tungsten_tpu.render import render
    prims = [
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, 0, 0], "scale": 20}},
        {"type": "quad", "bsdf_index": 0, "emission": [30, 30, 30],
         "transform": {"position": [0, 3, 0], "scale": 2,
                       "rotation": [180, 0, 0]}},
    ]
    _, (scene, settings) = _scene(prims=prims)
    s_pt = replace(settings, integrator_type="path_tracer",
                   max_bounces=3, adaptive_sampling=False)
    s_lt = replace(settings, integrator_type="light_tracer",
                   max_bounces=3, adaptive_sampling=False)
    img_pt = render(scene, s_pt, spp=64, spp_chunk=64, seed=11)
    img_lt = render(scene, s_lt, spp=64, spp_chunk=64, seed=12)
    m_pt = img_pt.mean()
    m_lt = img_lt.mean()
    assert m_pt > 1e-4
    np.testing.assert_allclose(m_lt, m_pt, rtol=0.12)
