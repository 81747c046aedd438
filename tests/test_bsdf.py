"""BSDF consistency tests: sample/pdf/eval agreement, furnace checks.

Strategy per SURVEY §4: for every non-Dirac BSDF type, verify that
(a) the pdf returned by sample() matches pdf() at the sampled direction,
(b) the weight returned by sample() matches eval()/pdf(), and
(c) lambert with albedo 1 passes a white-furnace test.
"""
import json

import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.scene.parse import SceneDesc
from tungsten_tpu.scene.flatten import flatten_scene
from tungsten_tpu.bsdf.eval import (
    FLAG_SPECULAR, FLAG_VALID, ShadePoint, bsdf_eval, bsdf_pdf, bsdf_sample)
from tungsten_tpu.utils import rng


BSDF_DEFS = [
    {"name": "b_lambert", "type": "lambert", "albedo": [0.8, 0.6, 0.4]},
    {"name": "b_oren", "type": "oren_nayar", "albedo": 0.7, "roughness": 0.3},
    {"name": "b_phong", "type": "phong", "albedo": 0.9, "exponent": 30.0,
     "diffuse_ratio": 0.3},
    {"name": "b_rcond", "type": "rough_conductor", "albedo": 1.0,
     "material": "Cu", "distribution": "beckmann", "roughness": 0.3},
    {"name": "b_rcond_ggx", "type": "rough_conductor", "albedo": 1.0,
     "material": "Au", "distribution": "ggx", "roughness": 0.2},
    {"name": "b_rdiel", "type": "rough_dielectric", "albedo": 1.0,
     "ior": 1.5, "distribution": "ggx", "roughness": 0.3},
    {"name": "b_plastic", "type": "plastic", "albedo": 0.6, "ior": 1.5,
     "thickness": 1.0, "sigma_a": 0.1},
    {"name": "b_rplastic", "type": "rough_plastic", "albedo": 0.6,
     "ior": 1.5, "roughness": 0.3, "distribution": "ggx"},
    {"name": "b_dtrans", "type": "diffuse_transmission", "albedo": 0.8,
     "transmittance": 0.4},
    {"name": "b_coat", "type": "smooth_coat", "ior": 1.3, "thickness": 1.0,
     "sigma_a": [0.1, 0.2, 0.1], "substrate": "b_rcond"},
    {"name": "b_mixed", "type": "mixed", "albedo": 1.0, "ratio": 0.4,
     "bsdf0": "b_lambert", "bsdf1": "b_rcond"},
]


def _scene_with_bsdfs():
    desc = SceneDesc(
        path="/tmp/dummy.json", json={},
        bsdfs=[dict(b) for b in BSDF_DEFS],
        primitives=[{"type": "quad", "bsdf_index": 0}],
        media=[], camera={"type": "pinhole", "resolution": [16, 16]},
        integrator={}, renderer={})
    # resolve nested refs like parse.load_scene does
    by_name = {b["name"]: i for i, b in enumerate(desc.bsdfs)}
    for b in desc.bsdfs:
        for k in ("substrate", "bsdf0", "bsdf1", "base"):
            if k in b:
                b[k + "_index"] = by_name[b[k]]
    return flatten_scene(desc)


SCENE, SETTINGS = _scene_with_bsdfs()
TYPES = SETTINGS.present_bsdf_types


def _random_wi(n, seed=0, both_sides=False):
    rs = np.random.RandomState(seed)
    wi = rs.randn(n, 3)
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    if not both_sides:
        wi[:, 2] = np.abs(wi[:, 2])
    wi[:, 2] = np.clip(wi[:, 2], 0.05, None) * np.sign(wi[:, 2] + 1e-9)
    return jnp.asarray(wi / np.linalg.norm(wi, axis=1, keepdims=True),
                       jnp.float32)


@pytest.mark.parametrize("bidx,name", [
    (i, b["name"]) for i, b in enumerate(BSDF_DEFS)])
def test_sample_pdf_eval_consistency(bidx, name):
    n = 2048
    wi = _random_wi(n, seed=bidx)
    uv = jnp.full((n, 2), 0.5)
    sp = ShadePoint(SCENE, jnp.full((n,), bidx, jnp.int32), uv)
    u1 = np.asarray(rng.random_1d(1, jnp.arange(n), 0, 0))
    u2 = np.asarray(rng.random_1d(1, jnp.arange(n), 0, 1))
    ul = np.asarray(rng.random_1d(1, jnp.arange(n), 0, 2))
    ul2 = np.asarray(rng.random_1d(1, jnp.arange(n), 0, 3))

    wo, weight, pdf, flags = bsdf_sample(
        sp, wi, jnp.asarray(ul), jnp.asarray(u1), jnp.asarray(u2), TYPES,
        u_lobe2=jnp.asarray(ul2))
    wo, weight, pdf, flags = map(np.asarray, (wo, weight, pdf, flags))

    valid = (flags & FLAG_VALID) != 0
    spec = (flags & FLAG_SPECULAR) != 0
    assert valid.mean() > 0.5, f"{name}: too many failed samples"

    sel = valid & ~spec & (pdf > 1e-4)
    if sel.sum() == 0:
        return  # pure specular type
    pdf2 = np.asarray(bsdf_pdf(sp, wi, jnp.asarray(wo), TYPES))
    f = np.asarray(bsdf_eval(sp, wi, jnp.asarray(wo), TYPES))

    # weight * pdf == eval holds on every non-Dirac sampled branch
    w_pdf = weight[sel] * pdf[sel][:, None]
    rel_w = np.abs(w_pdf - f[sel]) / np.maximum(np.abs(f[sel]), 1e-3)
    assert np.percentile(rel_w, 95) < 3e-2, \
        f"{name}: weight*pdf != eval p95={np.percentile(rel_w, 95)}"

    # For BSDFs with no Dirac lobe, the AllButSpecular pdf() must agree
    # with the pdf the sampler reports (plastic/coat mix Dirac lobes in,
    # so their all-lobe sample pdf legitimately differs).
    if name not in ("b_plastic", "b_coat"):
        rel_pdf = np.abs(pdf2[sel] - pdf[sel]) / np.maximum(pdf[sel], 1e-4)
        assert np.percentile(rel_pdf, 95) < 2e-2, \
            f"{name}: pdf mismatch p95={np.percentile(rel_pdf, 95)}"


def test_lambert_furnace():
    """E[weight] over cosine sampling should equal albedo exactly."""
    n = 4096
    wi = _random_wi(n, seed=42)
    sp = ShadePoint(SCENE, jnp.zeros((n,), jnp.int32), jnp.full((n, 2), 0.5))
    u1 = np.random.RandomState(0).rand(n).astype(np.float32)
    u2 = np.random.RandomState(1).rand(n).astype(np.float32)
    wo, weight, pdf, flags = bsdf_sample(
        sp, wi, jnp.asarray(u1), jnp.asarray(u1), jnp.asarray(u2), TYPES)
    w = np.asarray(weight)
    assert np.allclose(w.mean(axis=0), [0.8, 0.6, 0.4], atol=1e-3)


def test_rough_conductor_energy_bounded():
    """Directional albedo (mean sampled weight at fixed wi) must stay <= 1
    for a conductor (energy conservation in expectation; single weights
    can exceed 1 with non-VNDF microfacet sampling, as in the reference)."""
    n = 16384
    bidx = [i for i, b in enumerate(BSDF_DEFS) if b["name"] == "b_rcond"][0]
    wi = jnp.broadcast_to(jnp.asarray([0.3, 0.0, np.sqrt(1 - 0.09)],
                                      jnp.float32), (n, 3))
    sp = ShadePoint(SCENE, jnp.full((n,), bidx, jnp.int32),
                    jnp.full((n, 2), 0.5))
    u1 = np.random.RandomState(2).rand(n).astype(np.float32)
    u2 = np.random.RandomState(3).rand(n).astype(np.float32)
    wo, weight, pdf, flags = bsdf_sample(
        sp, wi, jnp.asarray(u1), jnp.asarray(u1), jnp.asarray(u2), TYPES)
    w = np.asarray(weight)
    valid = (np.asarray(flags) & FLAG_VALID) != 0
    # failed samples count as zero contribution
    w = np.where(valid[:, None], w, 0.0)
    assert w.mean(axis=0).max() <= 1.0 + 1e-3
