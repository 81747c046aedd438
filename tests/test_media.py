"""Heterogeneous media tests (SURVEY §7 phase 6 gate).

Strategy: (a) unit tests of the grid math (trilinear, optical depth,
inverse optical depth round trip, analytic exponential forms) and
(b) an end-to-end equivalence render — a constant-density voxel grid
covering the whole scene must reproduce the homogeneous medium's image
(the inversion is exact for constant density, and both paths consume
identical RNG dims), per the reference semantics in
src/core/media/VoxelMedium.cpp and ExponentialMedium.cpp.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.media import grid as GR
from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene


def _desc(media, prim_medium_kwargs, w=24, h=16, spp=8):
    """A fog-filled room: the camera sits inside the medium (the same
    binding style as the volumetric-caustic fixture, where `int_medium`/
    `ext_medium`/camera-medium fill the room with gas)."""
    prims = [
        # emissive quad overhead
        {"type": "quad", "bsdf_index": 0, "emission": [6.0, 6.0, 6.0],
         "transform": {"position": [0, 2.4, 0], "scale": [1.5, 1.0, 1.5],
                       "rotation": [0, 0, 180]}},
        # floor
        {"type": "quad", "bsdf_index": 0,
         "transform": {"position": [0, -1, 0], "scale": [8, 1, 8]}},
        # a diffuse ball in the middle
        {"type": "sphere", "bsdf_index": 0, "radius": 0.8,
         "transform": {"position": [0, 0.2, 0]},
         **prim_medium_kwargs},
    ]
    cam = {"type": "pinhole", "resolution": [w, h], "fov": 60,
           "transform": {"position": [0, 0.4, 3.2],
                         "look_at": [0, 0.2, 0]}}
    if media:
        cam["medium_index"] = 0
    return SceneDesc(
        path="/tmp/dummy.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.7}],
        primitives=prims,
        media=media,
        camera=cam,
        integrator={"max_bounces": 8},
        renderer={"spp": spp})


def _render(desc, spp=8):
    from tungsten_tpu.render import render
    scene, settings = flatten_scene(desc)
    from dataclasses import replace
    settings = replace(settings, spp=spp)
    return np.asarray(render(scene, settings))


CONST_GRID = {
    "type": "dense",
    "data": np.full((4, 4, 4), 2.0).tolist(),
    # a big box that swallows the whole test scene
    "transform": {"position": [0, 0.5, 0], "scale": [40.0, 40.0, 40.0]},
}


class TestGridMath:
    def _flat(self, media):
        desc = _desc(media, {"int_medium_index": 0})
        return flatten_scene(desc)

    def test_trilinear_constant(self):
        g = jnp.full((5, 6, 7), 3.0)
        p = jnp.asarray([[1.2, 2.7, 3.3], [0.0, 0.0, 0.0], [4.0, 5.0, 6.0]])
        out = GR.trilinear(g, p)
        np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)

    def test_trilinear_linear_ramp(self):
        # trilinear interpolation reproduces a linear function exactly
        x = np.arange(5, dtype=np.float32)
        g = jnp.asarray(np.broadcast_to(x[:, None, None], (5, 4, 4)).copy())
        p = jnp.asarray([[2.25, 1.5, 1.5], [3.75, 0.2, 2.9]])
        out = GR.trilinear(g, p)
        np.testing.assert_allclose(np.asarray(out), [2.25, 3.75], rtol=1e-5)

    def test_unit_tau_constant_grid(self):
        scene, settings = self._flat([
            {"type": "voxel", "sigma_a": 0.5, "sigma_s": 1.0,
             "grid": CONST_GRID}])
        mi = jnp.zeros((3,), jnp.int32)
        o = jnp.asarray([[0.0, 0.5, 0.0]] * 3)
        d = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0],
                         [0.577350, 0.577350, 0.577350]])
        t_max = jnp.asarray([5.0, 3.0, 4.0])
        tau = GR.unit_tau(scene, settings, mi, o, d, t_max)
        # constant density 2.0 inside a huge grid: tau = 2 * t
        np.testing.assert_allclose(np.asarray(tau),
                                   2.0 * np.asarray(t_max), rtol=2e-2)

    def test_inverse_unit_tau_round_trip(self):
        # a non-trivial ramp grid: invert(integrate(t)) == t
        x = np.linspace(0.5, 3.0, 16, dtype=np.float32)
        data = np.broadcast_to(x[:, None, None], (16, 16, 16)).copy()
        g = {"type": "dense", "data": data.tolist(),
             "transform": {"scale": [10.0, 10.0, 10.0]}}
        scene, settings = self._flat([
            {"type": "voxel", "sigma_a": 0.0, "sigma_s": 1.0, "grid": g}])
        mi = jnp.zeros((4,), jnp.int32)
        o = jnp.asarray([[-2.0, 0.0, 0.0]] * 4)
        d = jnp.asarray([[1.0, 0.0, 0.0]] * 4)
        t_star = jnp.asarray([1.0, 2.0, 3.0, 3.5])
        tau_at = GR.unit_tau(scene, settings, mi, o, d, t_star)
        t_rec, rho, _ = GR.inverse_unit_tau(
            scene, settings, mi, o, d, jnp.full((4,), 4.0), tau_at)
        np.testing.assert_allclose(np.asarray(t_rec), np.asarray(t_star),
                                   atol=0.03)
        assert np.all(np.asarray(rho) > 0)

    def test_exponential_analytic(self):
        scene, settings = self._flat([
            {"type": "exponential", "sigma_a": 0.2, "sigma_s": 0.8,
             "falloff_scale": 1.5, "unit_point": [0, 0.5, 0],
             "falloff_direction": [0, 1, 0]}])
        mi = jnp.zeros((2,), jnp.int32)
        o = jnp.asarray([[0.0, 0.5, 0.0], [0.0, 1.5, 0.0]])
        d = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        t_max = jnp.asarray([2.0, 3.0])
        tau = np.asarray(GR.unit_tau(scene, settings, mi, o, d, t_max))
        # ray 0: rho(t) = exp(-1.5 t); integral = (1-exp(-3))/1.5
        np.testing.assert_allclose(tau[0], (1 - np.exp(-3.0)) / 1.5,
                                   rtol=1e-4)
        # ray 1: constant rho = exp(-1.5) along a horizontal ray
        np.testing.assert_allclose(tau[1], 3.0 * np.exp(-1.5), rtol=1e-4)
        # inversion round trip
        t_rec, rho, _ = GR.inverse_unit_tau(
            scene, settings, mi, o, d, t_max, jnp.asarray(tau) * 0.7)
        tau_rec = np.asarray(GR.unit_tau(scene, settings, mi, o, d, t_rec))
        np.testing.assert_allclose(tau_rec, tau * 0.7, rtol=1e-3)


class TestVoxelRender:
    def test_constant_voxel_matches_homogeneous(self):
        # sigma scaled so voxel grid density 2.0 * material sigma equals
        # the homogeneous medium's effective sigma
        hom = _desc([{"type": "homogeneous", "sigma_a": 0.4,
                      "sigma_s": 1.6}], {"int_medium_index": 0})
        vox = _desc([{"type": "voxel", "sigma_a": 0.2, "sigma_s": 0.8,
                      "grid": CONST_GRID}], {"int_medium_index": 0})
        img_h = _render(hom)
        img_v = _render(vox)
        assert np.isfinite(img_v).all()
        np.testing.assert_allclose(img_v, img_h, atol=0.02)

    def test_emission_grid_glows(self):
        g = dict(CONST_GRID)
        g["emission_data"] = np.full((4, 4, 4, 3), 1.0).tolist()
        g["emission_scale"] = 2.0
        vox = _desc([{"type": "voxel", "sigma_a": 0.2, "sigma_s": 0.8,
                      "grid": g}], {"int_medium_index": 0})
        base = _desc([{"type": "voxel", "sigma_a": 0.2, "sigma_s": 0.8,
                       "grid": CONST_GRID}], {"int_medium_index": 0})
        img_e = _render(vox)
        img_b = _render(base)
        assert np.isfinite(img_e).all()
        assert img_e.mean() > img_b.mean() + 0.01
