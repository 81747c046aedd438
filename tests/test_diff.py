"""Differentiable rendering: gradients vs finite differences.

BASELINE config[2]: pixel gradients w.r.t. albedo/emission via the
detached-sampling estimator must match finite differences of the same
(deterministic, seeded) estimator.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from tungsten_tpu.scene.flatten import load_flat_scene
from tungsten_tpu.integrators.path_tracer import trace_wave_diff

SCENE_PATH = "/root/reference/data/example-scenes/cornell-box/scene.json"


@pytest.fixture(scope="module")
def cornell():
    scene, settings = load_flat_scene(SCENE_PATH)
    # small and shallow: keeps FD stable (no russian roulette at <=3 bounces)
    settings = replace(settings, width=32, height=18, max_bounces=3)
    return scene, settings


from functools import partial


@partial(jax.jit, static_argnums=(1, 2))
def _loss(scene, settings, n_pixels):
    pixel = jnp.arange(n_pixels, dtype=jnp.uint32)
    rad = trace_wave_diff(scene, settings, pixel,
                          jnp.zeros(n_pixels, jnp.uint32), jnp.uint32(42))
    return jnp.mean(rad)


def test_grad_matches_fd_albedo(cornell):
    scene, settings = cornell
    n = settings.width * settings.height

    def loss_fn(tex_const):
        sc = scene.replace(tex_const=tex_const)
        return _loss(sc, settings, n)

    g = jax.grad(loss_fn)(scene.tex_const)
    g = np.asarray(g)

    # FD on the two biggest-gradient entries
    flat_idx = np.argsort(-np.abs(g).ravel())[:2]
    base = np.asarray(scene.tex_const)
    eps = 1e-3
    for fi in flat_idx:
        i, c = divmod(int(fi), 3)
        tp = base.copy()
        tp[i, c] += eps
        tm = base.copy()
        tm[i, c] -= eps
        fd = (float(loss_fn(jnp.asarray(tp))) -
              float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
        assert np.isfinite(fd)
        rel = abs(fd - g[i, c]) / max(abs(fd), 1e-6)
        assert rel < 5e-2, f"albedo grad[{i},{c}]: ad={g[i, c]} fd={fd}"


def test_grad_matches_fd_emission(cornell):
    scene, settings = cornell
    n = settings.width * settings.height

    def loss_fn(emission):
        sc = scene.replace(light_emission=emission)
        return _loss(sc, settings, n)

    g = np.asarray(jax.grad(loss_fn)(scene.light_emission))
    base = np.asarray(scene.light_emission)
    eps = 1e-2
    tp = base.copy()
    tp[0, 0] += eps
    tm = base.copy()
    tm[0, 0] -= eps
    fd = (float(loss_fn(jnp.asarray(tp))) -
          float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
    rel = abs(fd - g[0, 0]) / max(abs(fd), 1e-9)
    assert rel < 2e-2, f"emission grad: ad={g[0, 0]} fd={fd}"
    # emission enters linearly: gradient must be > 0
    assert g[0, 0] > 0


def test_replay_deep_bounces_flat_memory():
    """Path replay must handle reference-scale depth (the round-1 tape
    OOM'd past 3 bounces; replay is O(1) memory in bounce count).
    FD-checks an albedo gradient at max_bounces=16 on a 64x36 wavefront
    with russian roulette active (decisions detached, replay-exact)."""
    scene, settings = load_flat_scene(SCENE_PATH)
    settings = replace(settings, width=64, height=36, max_bounces=16)
    n = settings.width * settings.height

    def loss_fn(tex_const):
        sc = scene.replace(tex_const=tex_const)
        return _loss(sc, settings, n)

    g = np.asarray(jax.grad(loss_fn)(scene.tex_const))
    assert np.isfinite(g).all()
    base = np.asarray(scene.tex_const)
    fi = int(np.argsort(-np.abs(g).ravel())[0])
    i, c = divmod(fi, 3)
    eps = 1e-3
    tp = base.copy(); tp[i, c] += eps
    tm = base.copy(); tm[i, c] -= eps
    fd = (float(loss_fn(jnp.asarray(tp))) -
          float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
    rel = abs(fd - g[i, c]) / max(abs(fd), 1e-6)
    assert rel < 5e-2, f"deep replay grad: ad={g[i, c]} fd={fd}"


def test_replay_emission_deep():
    scene, settings = load_flat_scene(SCENE_PATH)
    settings = replace(settings, width=48, height=27, max_bounces=16)
    n = settings.width * settings.height

    def loss_fn(emission):
        sc = scene.replace(light_emission=emission)
        return _loss(sc, settings, n)

    g = np.asarray(jax.grad(loss_fn)(scene.light_emission))
    base = np.asarray(scene.light_emission)
    eps = 1e-2
    tp = base.copy(); tp[0, 0] += eps
    tm = base.copy(); tm[0, 0] -= eps
    fd = (float(loss_fn(jnp.asarray(tp))) -
          float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
    rel = abs(fd - g[0, 0]) / max(abs(fd), 1e-6)
    assert rel < 5e-2, f"emission grad: ad={g[0, 0]} fd={fd}"


def _rough_bitmap_scene():
    """A rough_conductor floor + bitmap-textured lambert back wall under
    a quad light: FD targets for roughness + a bitmap texel (the two
    parameter classes round-2's VERDICT asked to prove beyond
    albedo/emission)."""
    import os
    import tempfile
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.io.image import save_hdr
    d = tempfile.mkdtemp()
    tex = np.full((8, 8, 3), 0.4, np.float32)
    tex[2:6, 2:6] = [0.8, 0.3, 0.2]
    save_hdr(os.path.join(d, "wall.pfm"), tex)
    desc = SceneDesc(
        path=os.path.join(d, "scene.json"), json={},
        bsdfs=[
            {"type": "rough_conductor", "material": "Cu",
             "roughness": 0.25, "distribution": "ggx"},
            {"type": "lambert", "albedo": "wall.pfm"},
        ],
        primitives=[
            {"type": "quad", "bsdf_index": 0,
             "transform": {"position": [0, 0, 0], "scale": [4, 1, 4]}},
            {"type": "quad", "bsdf_index": 1,
             "transform": {"position": [0, 1, -1.5], "scale": [4, 1, 2],
                           "rotation": [90, 0, 0]}},
            {"type": "quad", "bsdf_index": 1, "emission": [8.0] * 3,
             "transform": {"position": [0, 2.5, 0],
                           "scale": 1.5, "rotation": [0, 0, 180]}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [24, 16], "fov": 60,
                "transform": {"position": [0, 1.2, 3.2],
                              "look_at": [0, 0.8, 0]}},
        integrator={"type": "path_tracer", "max_bounces": 3},
        renderer={"spp": 1})
    return flatten_scene(desc)


def test_grad_matches_fd_roughness():
    scene, settings = _rough_bitmap_scene()
    n = settings.width * settings.height

    def loss_fn(bsdf_params):
        sc = scene.replace(bsdf_params=bsdf_params)
        return _loss(sc, settings, n)

    from tungsten_tpu.bsdf.types import P
    g = np.asarray(jax.grad(loss_fn)(scene.bsdf_params))
    gr = g[0, P.ROUGHNESS]
    assert np.isfinite(g).all()
    assert abs(gr) > 1e-5, "roughness gradient vanished"
    base = np.asarray(scene.bsdf_params)
    eps = 5e-3
    tp = base.copy()
    tp[0, P.ROUGHNESS] += eps
    tm = base.copy()
    tm[0, P.ROUGHNESS] -= eps
    fd = (float(loss_fn(jnp.asarray(tp))) -
          float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
    rel = abs(fd - gr) / max(abs(fd), 1e-6)
    # FD perturbs the microfacet warp too (stop_gradient only cuts the
    # AD tape), so FD approximates the ATTACHED derivative while AD is
    # the detached estimator — they differ by the sampling score term
    # (~9% measured here).  The gate checks sign + magnitude agreement.
    assert rel < 0.2, f"roughness grad: ad={gr} fd={fd}"


def test_grad_matches_fd_bitmap_texel():
    scene, settings = _rough_bitmap_scene()
    n = settings.width * settings.height
    assert len(scene.bitmaps) >= 1

    def loss_fn(bitmap0):
        sc = scene.replace(bitmaps=(bitmap0,) + scene.bitmaps[1:])
        return _loss(sc, settings, n)

    g = np.asarray(jax.grad(loss_fn)(scene.bitmaps[0]))
    assert np.isfinite(g).all()
    fi = int(np.argmax(np.abs(g)))
    iy, ix, c = np.unravel_index(fi, g.shape)
    assert abs(g[iy, ix, c]) > 1e-6, "bitmap gradient vanished"
    base = np.asarray(scene.bitmaps[0])
    eps = 1e-2
    tp = base.copy()
    tp[iy, ix, c] += eps
    tm = base.copy()
    tm[iy, ix, c] -= eps
    fd = (float(loss_fn(jnp.asarray(tp))) -
          float(loss_fn(jnp.asarray(tm)))) / (2 * eps)
    rel = abs(fd - g[iy, ix, c]) / max(abs(fd), 1e-6)
    assert rel < 8e-2, f"bitmap texel grad: ad={g[iy, ix, c]} fd={fd}"
