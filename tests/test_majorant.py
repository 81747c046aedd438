"""Majorant supergrid + residual-ratio tracking (ref
VdbGrid::generateSuperGrid / opticalDepth ResidualRatio,
src/core/grids/VdbGrid.cpp:87-134,332-361)."""
import numpy as np
import jax.numpy as jnp
from dataclasses import replace

from tungsten_tpu.scene.flatten import SUPERGRID_SUB, build_supergrid


def _smoke(n=33, seed=5):
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    base = np.exp(-3.0 * (x * x + y * y + z * z)).astype(np.float32)
    noise = rng.random((n, n, n)).astype(np.float32)
    return (base * (0.5 + 0.5 * noise) * 4.0).astype(np.float32)


def test_supergrid_bounds_cover_voxels():
    dens = _smoke()
    sup = build_supergrid(dens)
    S = SUPERGRID_SUB
    for cx in range(sup.shape[0]):
        for cy in range(sup.shape[1]):
            for cz in range(sup.shape[2]):
                # dilated by one voxel: the bound must cover the block
                # plus its border (trilinear support)
                blk = dens[max(cx * S - 1, 0):(cx + 1) * S + 1,
                           max(cy * S - 1, 0):(cy + 1) * S + 1,
                           max(cz * S - 1, 0):(cz + 1) * S + 1]
                mu_c, mu_r = sup[cx, cy, cz]
                assert np.abs(blk - mu_c).max() <= mu_r + 1e-5


def _scene_with_grid(dens):
    from tungsten_tpu.scene.parse import SceneDesc
    from tungsten_tpu.scene.flatten import flatten_scene
    desc = SceneDesc(
        path="/tmp/g.json", json={},
        bsdfs=[{"type": "lambert", "albedo": 0.5}],
        primitives=[
            {"type": "quad", "bsdf_index": 0, "emission": [4.0] * 3,
             "transform": {"position": [0, 2, 0], "rotation": [0, 0, 180]}},
        ],
        media=[{"type": "voxel", "sigma_a": 0.5, "sigma_s": 1.0,
                "grid": {"type": "dense", "data": dens.tolist(),
                         "transform": {"scale": 2.0}}}],
        camera={"type": "pinhole", "resolution": [8, 8], "fov": 60,
                "transform": {"position": [0, 0, 3],
                              "look_at": [0, 0, 0]}},
        integrator={"type": "path_tracer", "max_bounces": 4},
        renderer={"spp": 1})
    return flatten_scene(desc)


def test_rr_exact_on_uniform_interior():
    """Rays confined to supercells of uniform density (muR = 0): the
    estimate is the pure control integral — exact, no randomness.
    (Cells touching the zero-pad border have muR > 0 and give
    stochastic — occasionally zero-transmittance — samples; those are
    covered by the expectation test below.)"""
    from tungsten_tpu.media import grid as GR
    dens = np.full((17, 17, 17), 0.7, np.float32)
    scene, settings = _scene_with_grid(dens)
    settings = replace(settings, voxel_integration="residual_ratio")
    R = 64
    rng = np.random.default_rng(0)
    # index coords stay within supercell 1 (voxels 8..15) on every axis
    o = np.stack([rng.uniform(0.05, 0.45, R),
                  rng.uniform(0.05, 0.45, R),
                  np.full(R, 0.0)], -1).astype(np.float32)
    d = np.zeros((R, 3), np.float32)
    d[:, 2] = 1.0
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 0.4)
    tau = np.asarray(GR.unit_tau(scene, settings, mi,
                                 jnp.asarray(o), jnp.asarray(d), t_max))
    assert np.allclose(tau, 0.7 * 0.4, rtol=0.02), tau


def test_rr_matches_quadrature_in_expectation():
    from tungsten_tpu.media import grid as GR
    dens = _smoke()
    scene, settings = _scene_with_grid(dens)
    R = 512
    rng = np.random.default_rng(1)
    o = jnp.asarray(
        np.stack([rng.uniform(-0.8, 0.8, R), rng.uniform(-0.8, 0.8, R),
                  np.full(R, -1.4)], -1), jnp.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (R, 1)), jnp.float32)
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 2.8)

    s_rr = replace(settings, voxel_integration="residual_ratio")
    s_q = replace(settings, voxel_integration="raymarching",
                  grid_steps=256)
    tau_rr = np.asarray(GR.unit_tau(scene, s_rr, mi, o, d, t_max))
    tau_q = np.asarray(GR.unit_tau(scene, s_q, mi, o, d, t_max))
    tr_rr = np.exp(-tau_rr)
    tr_q = np.exp(-tau_q)
    assert np.isfinite(tau_rr).all()
    # unbiased in transmittance: population means agree
    assert abs(tr_rr.mean() - tr_q.mean()) < 0.02, \
        (tr_rr.mean(), tr_q.mean())
    # and per-ray estimates track the true profile (the 50%%
    # per-voxel noise in the fixture makes single-sample ratio
    # tracking noisy; the mean test above is the unbiasedness gate)
    c = np.corrcoef(tr_rr, tr_q)[0, 1]
    assert c > 0.7, c


def test_rr_deterministic_per_query():
    from tungsten_tpu.media import grid as GR
    dens = _smoke(seed=9)
    scene, settings = _scene_with_grid(dens)
    settings = replace(settings, voxel_integration="residual_ratio")
    R = 32
    rng = np.random.default_rng(3)
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (R, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    mi = jnp.zeros((R,), jnp.int32)
    t_max = jnp.full((R,), 1.5)
    a = np.asarray(GR.unit_tau(scene, settings, mi, o, d, t_max))
    b = np.asarray(GR.unit_tau(scene, settings, mi, o, d, t_max))
    assert np.array_equal(a, b)
