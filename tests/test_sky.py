"""Skydome: analytic sky bake + envmap integration.

Reference behavior: src/core/primitives/Skydome.cpp (Hosek bake -> env
texture; this build evaluates Hosek-Wilkie from the published RGB
dataset with a Preetham fallback, see scene/sky.py).
"""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.scene.sky import generate_sky


def test_sky_basic_shape():
    sun = np.array([0.3, 0.8, 0.1])
    img = generate_sky(sun, turbidity=3.0, intensity=2.0, width=128,
                       height=64)
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    # rows 0..h/2-1 are above the horizon (row 0 = zenith)
    assert img[:32].mean() > 0.1
    # below-horizon rows are black except the two smoothing rows
    assert img[35:].max() == 0.0
    assert img[32].max() > 0.0  # smoothing rows copied from the horizon


def test_sky_sun_region_brightest():
    # Hosek has a strong horizon glow, so the global peak may sit at
    # the horizon UNDER the sun rather than in the aureole; assert
    # (a) the peak shares the sun's azimuth and (b) the circumsolar
    # direction clearly outshines the anti-solar direction at the same
    # elevation (forward-scattering mie lobe)
    sun = np.array([0.0, 0.5, 0.866])
    img = generate_sky(sun, turbidity=2.5, width=256, height=128)
    lum = img.mean(axis=-1)
    iy, ix = np.unravel_index(np.argmax(lum[:63]), lum[:63].shape)
    phi = ((ix + 0.5) / 256 - 0.5) * 2 * np.pi
    sun_phi = np.arctan2(sun[2], sun[0])
    dphi = abs((phi - sun_phi + np.pi) % (2 * np.pi) - np.pi)
    assert dphi < 0.2, f"peak azimuth off by {dphi}"

    # sun row: theta (from down) = arccos(-sun_y), v = theta/pi,
    # row = (1 - v) * H (generate_sky's grid convention)
    v = np.arccos(-sun[1]) / np.pi
    iy_sun = int((1.0 - v) * 128)
    ix_sun = int((sun_phi / (2 * np.pi) + 0.5) * 256) % 256
    ix_anti = (ix_sun + 128) % 256
    assert lum[iy_sun, ix_sun] > 2.0 * lum[iy_sun, ix_anti]


def test_skydome_scene_escape_radiance():
    """A skydome-only scene: escaped rays see the sky when
    min_bounces == 0, and a higher sun yields a brighter sky."""
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.integrators import lights as L
    desc = SceneDesc(
        path="/tmp/sky.json", json={},
        bsdfs=[{"name": "l", "type": "lambert"}],
        primitives=[{"type": "skydome", "temperature": 5777.0,
                     "turbidity": 3.0, "intensity": 2.0, "sample": False,
                     "transform": {"rotation": [40, 0, 20]}}],
        media=[], camera={"resolution": [8, 8]},
        integrator={"min_bounces": 0}, renderer={})
    scene, settings = flatten_scene(desc)
    assert settings.has_env
    d = jnp.asarray([[0.0, 0.9, 0.44], [0.9, 0.44, 0.0]])
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rad = np.asarray(L.env_eval(scene, d))
    assert (rad > 0.01).all()
