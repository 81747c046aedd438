"""Sobol' sampler: generated direction numbers, stratification,
sampler-mode integration (ref src/core/sampling/SobolPathSampler.hpp).
"""
import numpy as np
import jax.numpy as jnp

from tungsten_tpu.utils import rng, sobol


def test_direction_matrix_valid():
    assert sobol.validate_matrix(num_dims=16, n=256)


def test_2d_projection_stratified():
    idx = jnp.arange(1024, dtype=jnp.uint32)
    x = np.asarray(sobol.sobol_uint(idx, jnp.uint32(1))) / 2 ** 32
    y = np.asarray(sobol.sobol_uint(idx, jnp.uint32(2))) / 2 ** 32
    H = np.histogram2d(x, y, bins=16)[0]
    assert H.min() == H.max() == 4  # perfect (0,2)-sequence projection


def test_sampler_mode_switch():
    pix = jnp.arange(256, dtype=jnp.uint32)
    try:
        rng.set_sampler(False)
        a = np.asarray(rng.random_1d(1, pix, 0, 5))
        rng.set_sampler(True)
        b = np.asarray(rng.random_1d(1, pix, 0, 5))
    finally:
        rng.set_sampler(False)
    assert not np.allclose(a, b)
    assert ((b >= 0) & (b < 1)).all()


def test_sobol_stratifies_per_pixel():
    """For one pixel, the first 16 samples of one dim cover distinct
    sixteenths of [0,1) — the variance-reduction property the
    stratified_sampler flag buys."""
    try:
        rng.set_sampler(True)
        pix = jnp.zeros((16,), jnp.uint32) + 7
        smp = jnp.arange(16, dtype=jnp.uint32)
        v = np.asarray(rng.random_1d(3, pix, smp, 9))
    finally:
        rng.set_sampler(False)
    cells = np.sort((v * 16).astype(int))
    assert (cells == np.arange(16)).all(), cells


def test_sobol_deterministic_addressing():
    """Same (seed, pixel, sample, dim) -> same value regardless of batch
    shape (the sharding-determinism invariant)."""
    try:
        rng.set_sampler(True)
        full = np.asarray(rng.random_1d(
            5, jnp.arange(64, dtype=jnp.uint32),
            jnp.full((64,), 3, jnp.uint32), 12))
        half = np.asarray(rng.random_1d(
            5, jnp.arange(32, 64, dtype=jnp.uint32),
            jnp.full((32,), 3, jnp.uint32), 12))
    finally:
        rng.set_sampler(False)
    assert np.array_equal(full[32:], half)
