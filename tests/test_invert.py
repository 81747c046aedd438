"""Bsdf::invert parity tests (ref src/core/bsdfs/Bsdf.hpp:66-104 and
per-BSDF invert implementations): for every invertible BSDF,
sample(invert(sample(u))) must reproduce the same direction — the
round-trip contract reversible-jump MLT's technique swaps rely on
(ReversibleJumpMltTracer.cpp:128-196).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tungsten_tpu.bsdf import types as bt
from tungsten_tpu.bsdf.eval import bsdf_sample, FLAG_VALID
from tungsten_tpu.bsdf.invert import bsdf_invert

N = 256


class FakeSP:
    """Minimal ShadePoint stand-in: constant material over N rays."""

    def __init__(self, type_id, albedo=0.8, roughness=0.3,
                 dist=bt.DIST_GGX, params=None):
        self.type = jnp.full((N,), type_id, jnp.int32)
        p = np.zeros((N, 16), np.float32)
        if params:
            for k, v in params.items():
                p[:, k] = v
        self.params = jnp.asarray(p)
        self.aux = jnp.zeros((N, 8))
        self.albedo = jnp.full((N, 3), albedo)
        self.roughness = jnp.full((N,), roughness)
        self.dist = jnp.full((N,), dist, jnp.int32)


def _wi(seed=0, hemi=True):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(N, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    if hemi:
        w[:, 2] = np.abs(w[:, 2]) + 1e-2
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
    return jnp.asarray(w)


def _uniforms(seed=1):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.random(N, dtype=np.float32))
            for _ in range(4)]


def roundtrip(type_id, sp, hemi=True, atol=2e-3, min_frac=0.95,
              mu_seed=9):
    """sample -> invert -> re-sample must land on the same wo."""
    wi = _wi(hemi=hemi)
    ul, u1, u2, ul2 = _uniforms()
    types = (int(type_id),)
    wo, w, pdf, flags = bsdf_sample(sp, wi, ul, u1, u2, types,
                                    u_lobe2=ul2)
    ok0 = np.asarray((flags & FLAG_VALID) != 0)

    mu = jnp.asarray(
        np.random.default_rng(mu_seed).random((N, 4), dtype=np.float32))
    inv = bsdf_invert(sp, wi, wo, types, mu)
    ok1 = np.asarray(inv["valid"])
    frac = (ok1 & ok0).sum() / max(ok0.sum(), 1)
    assert frac >= min_frac, f"invert valid on {frac:.2%} of samples"

    wo2, w2, pdf2, flags2 = bsdf_sample(
        sp, wi, inv["lobe"], inv["u1"], inv["u2"], types,
        u_lobe2=inv["lobe2"])
    use = ok0 & ok1
    err = np.abs(np.asarray(wo2) - np.asarray(wo)).max(axis=-1)
    assert np.quantile(err[use], 0.98) < atol, \
        f"round-trip direction error {np.quantile(err[use], 0.98)}"
    # the re-sample must be valid wherever the inversion claimed valid
    assert (np.asarray((flags2 & FLAG_VALID) != 0) | ~use).all()


def test_lambert():
    roundtrip(bt.LAMBERT, FakeSP(bt.LAMBERT))


def test_lambert_exact_uniform_recovery():
    # lambert's (u1, u2) must invert EXACTLY (no discrete ambiguity)
    sp = FakeSP(bt.LAMBERT)
    wi = _wi()
    ul, u1, u2, ul2 = _uniforms()
    wo, _, _, _ = bsdf_sample(sp, wi, ul, u1, u2, (bt.LAMBERT,),
                              u_lobe2=ul2)
    mu = jnp.zeros((N, 4))
    inv = bsdf_invert(sp, wi, wo, (bt.LAMBERT,), mu)
    np.testing.assert_allclose(np.asarray(inv["u1"]), np.asarray(u1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(inv["u2"]), np.asarray(u2),
                               atol=1e-5)


def test_mirror():
    roundtrip(bt.MIRROR, FakeSP(bt.MIRROR))


def test_conductor():
    sp = FakeSP(bt.CONDUCTOR, params={bt.P.ETA_R: 0.2, bt.P.ETA_G: 0.92,
                                      bt.P.ETA_B: 1.1, bt.P.K_R: 3.9,
                                      bt.P.K_G: 2.45, bt.P.K_B: 2.14})
    roundtrip(bt.CONDUCTOR, sp)


@pytest.mark.parametrize("dist", [bt.DIST_BECKMANN, bt.DIST_PHONG,
                                  bt.DIST_GGX])
def test_rough_conductor(dist):
    sp = FakeSP(bt.ROUGH_CONDUCTOR, roughness=0.3, dist=dist,
                params={bt.P.ETA_R: 0.2, bt.P.ETA_G: 0.92,
                        bt.P.ETA_B: 1.1, bt.P.K_R: 3.9, bt.P.K_G: 2.45,
                        bt.P.K_B: 2.14})
    roundtrip(bt.ROUGH_CONDUCTOR, sp)


def test_dielectric():
    sp = FakeSP(bt.DIELECTRIC,
                params={bt.P.IOR: 1.5, bt.P.EXTRA0: 1.0})
    roundtrip(bt.DIELECTRIC, sp, hemi=False)


def test_rough_dielectric():
    sp = FakeSP(bt.ROUGH_DIELECTRIC, roughness=0.35,
                params={bt.P.IOR: 1.5, bt.P.EXTRA0: 1.0})
    # the ok-set is smaller (sampled wo can fail the side test)
    roundtrip(bt.ROUGH_DIELECTRIC, sp, hemi=False, min_frac=0.85,
              atol=5e-3)


def test_plastic():
    sp = FakeSP(bt.PLASTIC,
                params={bt.P.IOR: 1.5, bt.P.EXTRA1: 0.8})
    roundtrip(bt.PLASTIC, sp)


def test_rough_plastic():
    sp = FakeSP(bt.ROUGH_PLASTIC, roughness=0.4,
                params={bt.P.IOR: 1.5, bt.P.EXTRA1: 0.8,
                        bt.P.EXTRA2: 1.0})
    # the discrete branch is chosen stochastically by pdf share: a few
    # samples flip branch and land on a different (valid) direction
    roundtrip(bt.ROUGH_PLASTIC, sp, min_frac=0.9, atol=5e-3)


def test_oren_nayar():
    sp = FakeSP(bt.OREN_NAYAR, roughness=0.4)
    roundtrip(bt.OREN_NAYAR, sp)


def test_phong():
    sp = FakeSP(bt.PHONG, params={bt.P.EXTRA0: 30.0, bt.P.EXTRA1: 0.4})
    roundtrip(bt.PHONG, sp, atol=5e-3)


def test_diffuse_transmission():
    sp = FakeSP(bt.DIFFUSE_TRANSMISSION, params={bt.P.EXTRA0: 0.5})
    roundtrip(bt.DIFFUSE_TRANSMISSION, sp)


def test_uninvertible_types_report_invalid():
    sp = FakeSP(bt.SMOOTH_COAT, params={bt.P.IOR: 1.3})
    wi = _wi()
    mu = jnp.zeros((N, 4))
    inv = bsdf_invert(sp, wi, wi, (bt.SMOOTH_COAT,), mu)
    assert not np.asarray(inv["valid"]).any()
