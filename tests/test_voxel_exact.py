"""Exact voxel integration/sampling modes (ref VdbGrid ExactNearest /
ExactLinear: opticalDepth VdbGrid.cpp:308-331, inverseOpticalDepth
:382-430) — the batched voxel-boundary DDA in media/grid._dda_grid."""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from tests.test_majorant import _scene_with_grid, _smoke


def _rays(R, seed=3):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-0.8, 0.8, R), rng.uniform(-0.8, 0.8, R),
                  np.full(R, -1.4)], -1).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_exact_linear_matches_dense_quadrature():
    from tungsten_tpu.media import grid as GR
    dens = _smoke()
    scene, settings = _scene_with_grid(dens)
    R = 128
    o, d = _rays(R)
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 2.8)
    s_ex = replace(settings, voxel_integration="exact_linear")
    s_q = replace(settings, voxel_integration="raymarching",
                  grid_steps=2048)
    tau_ex = np.asarray(GR.unit_tau(scene, s_ex, mi, o, d, t_max))
    tau_q = np.asarray(GR.unit_tau(scene, s_q, mi, o, d, t_max))
    # trapezoid-between-boundaries vs midpoint quadrature: both
    # converge to the line integral of the trilinear field
    assert np.allclose(tau_ex, tau_q, rtol=0.02, atol=5e-3), \
        np.abs(tau_ex - tau_q).max()


def test_exact_nearest_on_blocky_grid():
    """For a grid whose density is constant on each voxel's Voronoi
    cell, exact_nearest integrates the piecewise-constant field
    exactly along an axis ray."""
    from tungsten_tpu.media import grid as GR
    n = 17
    dens = np.zeros((n, n, n), np.float32)
    vals = (np.arange(n) % 4).astype(np.float32) * 0.3
    dens[:] = vals[None, None, :]
    scene, settings = _scene_with_grid(dens)
    s_ex = replace(settings, voxel_integration="exact_nearest")
    R = 8
    o = np.tile(np.asarray([[0.0, 0.0, -1.4]], np.float32), (R, 1))
    o[:, 0] = np.linspace(-0.5, 0.5, R)
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 2.8)
    tau = np.asarray(GR.unit_tau(scene, s_ex, jnp.asarray(mi),
                                 jnp.asarray(o), jnp.asarray(d), t_max))
    # world z in [-1, 1] maps to index z in [0, 16]; nearest-neighbor
    # field: voxel k owns index range [k-0.5, k+0.5] (half cells at the
    # ends), each 2/16 world units wide
    w = 2.0 / (n - 1)
    expect = (0.5 * vals[0] + vals[1:-1].sum() + 0.5 * vals[-1]) * w
    assert np.allclose(tau, expect, rtol=0.02), (tau, expect)


def test_exact_sampling_round_trip():
    """inverse(tau * frac) lands at a t where the accumulated tau is
    tau * frac, for both exact modes."""
    from tungsten_tpu.media import grid as GR
    dens = _smoke(seed=11)
    scene, settings = _scene_with_grid(dens)
    R = 64
    o, d = _rays(R, seed=12)
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 2.8)
    for mode in ("exact_linear", "exact_nearest"):
        s = replace(settings, voxel_integration=mode,
                    voxel_sampling=mode)
        tau_full = np.asarray(GR.unit_tau(scene, s, mi, o, d, t_max))
        target = jnp.asarray(tau_full * 0.5)
        t_s, rho_s, tau_tot = GR.inverse_unit_tau(
            scene, s, mi, o, d, t_max, target)
        t_s = np.asarray(t_s)
        ok = tau_full > 1e-3
        assert (t_s[ok] < 2.8).all(), mode
        # re-integrate up to the sampled distance: should equal target
        tau_at = np.asarray(GR.unit_tau(scene, s, mi, o, d,
                                        jnp.asarray(t_s)))
        err = np.abs(tau_at[ok] - tau_full[ok] * 0.5)
        assert np.quantile(err, 0.9) < 2e-2, (mode, err.max())
        # unreachable targets return INF + the full-segment tau
        t_inf, _, tau_tot2 = GR.inverse_unit_tau(
            scene, s, mi, o, d, t_max, jnp.asarray(tau_full + 1.0))
        assert (np.asarray(t_inf)[ok] >= 1e30).all(), mode
        assert np.allclose(np.asarray(tau_tot2)[ok], tau_full[ok],
                           rtol=0.02, atol=1e-3), mode


def test_scene_json_selects_methods():
    """integration_method / sampling_method from the grid JSON reach
    the settings (ref VdbGrid::fromJson, VdbGrid.cpp:41-63)."""
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    dens = np.ones((9, 9, 9), np.float32)
    desc = SceneDesc(
        path="/tmp/g.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.5}],
        primitives=[],
        media=[{"type": "voxel", "sigma_a": 0.5, "sigma_s": 1.0,
                "grid": {"type": "dense", "data": dens.tolist(),
                         "integration_method": "exact_linear",
                         "sampling_method": "exact_nearest",
                         "transform": {"scale": 2.0}}}],
        camera={"type": "pinhole", "resolution": [8, 8], "fov": 60,
                "transform": {"position": [0, 0, 3],
                              "look_at": [0, 0, 0]}},
        integrator={"type": "path_tracer", "max_bounces": 4},
        renderer={"spp": 1})
    _, settings = flatten_scene(desc)
    assert settings.voxel_integration == "exact_linear"
    assert settings.voxel_sampling == "exact_nearest"
