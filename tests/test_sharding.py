"""Multi-device sharding: determinism across mesh shapes + gradient psum.

The (pixel, sample)-keyed RNG means any sharding of the same pixels must
produce bitwise-identical images (SURVEY §4 point 5).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from tungsten_tpu.scene.flatten import load_flat_scene
from tungsten_tpu.parallel.sharded import (
    make_mesh, render_pass_sharded, train_step_sharded)

SCENE_PATH = "/root/reference/data/example-scenes/cornell-box/scene.json"


@pytest.fixture(scope="module")
def cornell():
    scene, settings = load_flat_scene(SCENE_PATH)
    return scene, replace(settings, width=32, height=16, max_bounces=3)


def test_bitwise_deterministic_across_mesh_shapes(cornell):
    scene, settings = cornell
    imgs = []
    for ndev in (1, 2, 8):
        mesh = make_mesh(ndev)
        img, rays = render_pass_sharded(scene, settings, mesh, spp_chunk=2)
        imgs.append(np.asarray(img))
    assert np.array_equal(imgs[0], imgs[1])
    assert np.array_equal(imgs[0], imgs[2])


def test_sharded_matches_single_device(cornell):
    scene, settings = cornell
    from tungsten_tpu.integrators.path_tracer import trace_wave
    n = settings.width * settings.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    ref = np.asarray(trace_wave(scene, settings, pixel,
                                jnp.zeros(n, jnp.uint32), jnp.uint32(0)))
    ref = np.where(np.isfinite(ref), ref, 0.0)
    mesh = make_mesh(8)
    img, _ = render_pass_sharded(scene, settings, mesh, sample_start=0,
                                 seed=0, spp_chunk=1)
    assert np.allclose(np.asarray(img).reshape(-1, 3), ref, atol=1e-6)


def test_gradient_psum(cornell):
    scene, settings = cornell
    mesh = make_mesh(8)
    params = {"light_emission": scene.light_emission}
    loss, grads = train_step_sharded(
        scene, settings, mesh,
        lambda sc, p: sc.replace(**p),
        lambda rad, pix: jnp.sum(rad) / rad.shape[0],
        params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = np.asarray(grads["light_emission"])
    assert np.isfinite(g).all() and g[0].max() > 0
