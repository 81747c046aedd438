"""MLT family: PSS machinery units + convergence to the PT estimate.

Reference: src/core/integrators/{kelemen_mlt,multiplexed_mlt,
reversible_jump_mlt}/ — see integrators/mlt.py docstring for the
parity/delta notes.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from dataclasses import replace

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.render import render
from tungsten_tpu.integrators import mlt


def test_mutation_kernel():
    rng = np.random.default_rng(0)
    tape = jnp.asarray(rng.random((512, 8), dtype=np.float32))
    u = jnp.asarray(rng.random((512, 8), dtype=np.float32))
    out = np.asarray(mlt._mutate(tape, u))
    assert ((out >= 0.0) & (out < 1.0)).all()
    d = np.abs(out - np.asarray(tape))
    d = np.minimum(d, 1.0 - d)  # wrapped distance
    # Kelemen kernel: perturbations within (S1*s, S2]
    assert d.max() <= mlt.S2 + 1e-6
    assert d.min() >= mlt.S1 * np.exp(mlt.FACTOR * (1.0 / 512)) * 0.5
    # symmetric-ish: mean signed displacement near zero
    signed = out - np.asarray(tape)
    signed = np.where(signed > 0.5, signed - 1.0,
                      np.where(signed < -0.5, signed + 1.0, signed))
    assert abs(signed.mean()) < 2e-3


def _scene(integ):
    return SceneDesc(
        path="/tmp/mlt.json", json={},
        bsdfs=[{"name": "w", "type": "lambert", "albedo": 0.7},
               {"name": "r", "type": "lambert", "albedo": [0.7, 0.2, 0.2]}],
        primitives=[
            {"type": "quad", "bsdf_index": 0, "transform": {"scale": 4.0}},
            {"type": "quad", "bsdf_index": 1,
             "transform": {"position": [-2, 1, 0], "rotation": [0, 0, -90],
                           "scale": 4.0}},
            {"type": "quad", "bsdf_index": 0, "emission": 10.0,
             "transform": {"position": [0, 3.0, 0], "scale": 1.5,
                           "rotation": [180, 0, 0]}},
            {"type": "cube", "bsdf_index": 0,
             "transform": {"position": [0.5, 0.5, 0], "scale": 1.0}},
        ],
        media=[],
        camera={"type": "pinhole", "resolution": [24, 24],
                "transform": {"position": [0, 1.5, -4], "look_at": [0, 1, 0],
                              "up": [0, 1, 0]}},
        integrator=dict(integ), renderer={"spp": 4})


def test_trace_tape_matches_image_position():
    flat, s = flatten_scene(_scene({"type": "path_tracer",
                                    "max_bounces": 3}))
    R = 64
    rng = np.random.default_rng(1)
    tape = jnp.asarray(rng.random((R, mlt.tape_dims(s)),
                                  dtype=np.float32))
    rad, pixel, lum = mlt.trace_tape(flat, s, tape, 7)
    pixel = np.asarray(pixel)
    t = np.asarray(tape)
    px = np.minimum((t[:, 0] * s.width).astype(int), s.width - 1)
    py = np.minimum((t[:, 1] * s.height).astype(int), s.height - 1)
    assert (pixel == py * s.width + px).all()
    assert np.isfinite(np.asarray(rad)).all()
    assert (np.asarray(lum) >= 0).all()


@pytest.mark.parametrize("integ", ["kelemen_mlt", "reversible_jump_mlt",
                                   "multiplexed_mlt"])
def test_mlt_converges_to_pt(integ):
    flat, s_pt = flatten_scene(_scene({"type": "path_tracer",
                                       "max_bounces": 4}))
    img_pt = np.asarray(render(flat, s_pt, spp=16))
    flat2, s = flatten_scene(_scene({"type": integ, "max_bounces": 4,
                                     "initial_sample_pool": 1024}))
    s = replace(s, mlt_chains=512)
    img = np.asarray(render(flat2, s, spp=16))
    assert np.isfinite(img).all()
    # overall integral agreement (MLT is noisy per pixel at tiny budgets)
    assert abs(img.mean() - img_pt.mean()) / img_pt.mean() < 0.12


CONT_SLOTS = [mlt.rng.BounceDims.BSDF_LOBE, mlt.rng.BounceDims.BSDF_SAMPLE,
              mlt.rng.BounceDims.BSDF_SAMPLE + 1,
              mlt.rng.BounceDims.BSDF_LOBE2]
NEE_SLOTS = [mlt.rng.BounceDims.LIGHT_SELECT, mlt.rng.BounceDims.LIGHT_SAMPLE,
             mlt.rng.BounceDims.LIGHT_SAMPLE + 1,
             mlt.rng.BounceDims.LIGHT_TRI]


def _apply_swap(tape, rj_dims, rj_nee, ok):
    t2 = np.asarray(tape).copy()
    dim0 = mlt.rng.DIMS_CAMERA
    for j, sl in enumerate(CONT_SLOTS):
        t2[ok, dim0 + sl] = np.asarray(rj_dims)[ok, j]
    for j, sl in enumerate(NEE_SLOTS):
        t2[ok, dim0 + sl] = np.asarray(rj_nee)[ok, j]
    return t2


def test_rj_inversion_jump_machinery():
    # trace_tape_rj must produce valid inverted dims on a lambert scene
    # and the swap-proposed tape must re-trace to a light-carrying path
    flat, s = flatten_scene(_scene({"type": "reversible_jump_mlt",
                                    "max_bounces": 4}))
    from dataclasses import replace as rep
    s = rep(s, integrator_type="reversible_jump_mlt")
    R = 64
    D = mlt.tape_dims(s)
    tape = mlt._uniform_tape(np.uint32(11), 0, 0, R, D)
    b_pick = jnp.zeros((R,), jnp.int32)  # invert at the first bounce
    rj_dims, rj_valid, rj_nee, rj_rev = mlt.trace_tape_rj(
        flat, s, tape, b_pick, 11)
    rj_dims = np.asarray(rj_dims)
    rj_valid = np.asarray(rj_valid)
    rj_rev = np.asarray(rj_rev)
    # forward inversion succeeds wherever a visible NEE connection
    # exists at the bounce (~40% of uniform-tape paths on this scene);
    # the reverse side needs the continuation ray to hit the lamp
    # front face (much rarer on uniform tapes)
    assert rj_valid.mean() > 0.3
    assert ((rj_dims[rj_valid] >= 0.0) & (rj_dims[rj_valid] < 1.0)).all()
    ok = rj_valid & rj_rev
    assert ok.any()  # some chains admit the full exchange

    # exchange both technique blocks at bounce 0 and re-trace: the
    # proposed paths must be finite and carry light (both techniques
    # aim at the lamp)
    t2 = _apply_swap(tape, rj_dims, rj_nee, ok)
    rad, pixel, lum = mlt.trace_tape(flat, s, jnp.asarray(t2), 11)
    lum = np.asarray(lum)
    assert np.isfinite(lum).all()
    assert (lum[ok] > 0).all()


def test_rj_exchange_is_involution():
    """Applying the technique exchange twice recovers the original
    deterministic slot values (the self-inverse property the RJ
    acceptance relies on; lambert inversions are exact)."""
    flat, s = flatten_scene(_scene({"type": "reversible_jump_mlt",
                                    "max_bounces": 4}))
    from dataclasses import replace as rep
    s = rep(s, integrator_type="reversible_jump_mlt")
    R = 128
    D = mlt.tape_dims(s)
    tape = mlt._uniform_tape(np.uint32(13), 0, 0, R, D)
    b_pick = jnp.zeros((R,), jnp.int32)
    d1, v1, n1, r1 = mlt.trace_tape_rj(flat, s, tape, b_pick, 13)
    ok1 = np.asarray(v1) & np.asarray(r1)
    t_y = _apply_swap(tape, d1, n1, ok1)
    d2, v2, n2, r2 = mlt.trace_tape_rj(flat, s, jnp.asarray(t_y),
                                       b_pick, 13)
    ok2 = np.asarray(v2) & np.asarray(r2)
    both = ok1 & ok2
    assert both.any()
    t_x2 = _apply_swap(t_y, d2, n2, both)
    dim0 = mlt.rng.DIMS_CAMERA
    x = np.asarray(tape)
    # continuous slots recovered: continuation sample coords and the
    # light position coords (discrete picks — lobe ids, alias bins,
    # light-select bins — may land elsewhere in the same preimage
    # cell, which regenerates the identical path)
    for sl in (mlt.rng.BounceDims.BSDF_SAMPLE,
               mlt.rng.BounceDims.BSDF_SAMPLE + 1,
               mlt.rng.BounceDims.LIGHT_SAMPLE,
               mlt.rng.BounceDims.LIGHT_SAMPLE + 1):
        err = np.abs(t_x2[both, dim0 + sl] - x[both, dim0 + sl])
        assert err.max() < 5e-3, (sl, err.max())


def test_rj_render_finite_and_converges():
    # end-to-end RJ render with the inversion jump active stays a valid
    # estimator (close to the PT image on a simple scene)
    flat_pt, s_pt = flatten_scene(_scene({"type": "path_tracer",
                                          "max_bounces": 4}))
    img_pt = np.asarray(render(flat_pt, s_pt, spp=64))
    flat, s = flatten_scene(_scene({"type": "reversible_jump_mlt",
                                    "max_bounces": 4}))
    from dataclasses import replace as rep
    s = rep(s, mlt_strategy_prob=0.3, mlt_chains=1024)
    img = np.asarray(render(flat, s, spp=32))
    assert np.isfinite(img).all()
    # global brightness must agree (MLT normalizes by bootstrap b)
    assert abs(img.mean() - img_pt.mean()) / max(img_pt.mean(), 1e-9) < 0.35
