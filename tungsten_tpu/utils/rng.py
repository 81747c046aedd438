"""Stateless, replay-exact counter RNG.

Design rule (the single choice underlying differentiable replay, resume,
and sharding determinism): every random number in the renderer is
addressed by the static tuple (seed, pixel_id, sample_index, dim).
No mutable state travels with a ray — any pass (forward render, backward
path replay, a resumed render, or any device sharding of the same pixels)
regenerates identical decisions.

This replaces the reference's stateful PCG32 per-tile samplers
(ref: src/core/sampling/UniformSampler.hpp:37-45,
src/core/sampling/SobolPathSampler.hpp:20-54) with the pcg4d hash
(Jarzynski & Olano, JCGT 2020), a standard public-domain construction for
exactly this counter-based usage in renderers.

Dimension layout (static, so replay can re-address every decision):
  dims 0..3            camera: pixel jitter / filter (2) + lens (2)
  dims 4 + b*DIMS_PER_BOUNCE ...  per-bounce block, see `BounceDims`.
"""
from __future__ import annotations

import jax.numpy as jnp

# Per-bounce random-dimension slots (offsets within a bounce's dim block).
DIM_CAMERA = 0           # 4 dims reserved
DIMS_CAMERA = 4
DIMS_PER_BOUNCE = 20


class BounceDims:
    """Offsets of each per-bounce random decision inside its dim block.

    NEE uses an *independent* BSDF sample for its MIS counterpart — the
    reference samples the BSDF twice per bounce (TraceBase::bsdfSample for
    NEE vs handleSurface's continuation sample), so both get own slots.
    The *_LOBE2 slots feed nested lobe decisions (coat substrates, mixed
    children, rough-dielectric reflect/refract choice).
    """
    LIGHT_SELECT = 0      # 1D: which light
    LIGHT_SAMPLE = 1      # 2D: point/direction on light
    LIGHT_TRI = 3         # 1D: triangle pick within an area light
    NEE_BSDF_LOBE = 4     # 1D: lobe select for the NEE bsdf-MIS sample
    NEE_BSDF_SAMPLE = 5   # 2D
    NEE_BSDF_LOBE2 = 7    # 1D: nested lobe decision
    BSDF_LOBE = 8         # 1D: continuation lobe / transparency selection
    BSDF_SAMPLE = 9       # 2D: continuation direction sample
    BSDF_LOBE2 = 11       # 1D: nested lobe decision
    ROULETTE = 12         # 1D: russian roulette
    MEDIUM = 13           # 3D: distance sampling / channel select / phase
    FORWARD = 16          # 1D: transparency / forward-lobe passthrough


def bounce_dim(bounce, slot):
    return DIMS_CAMERA + bounce * DIMS_PER_BOUNCE + slot


# ---------------------------------------------------------------- tape mode
#
# MLT integrators drive the tracer from an explicit primary-sample-space
# vector per ray ("tape", (R, D) float32) instead of the counter hash —
# the TPU analog of the reference's MetropolisSampler supplying next1D()
# from a mutated sample vector (kelemen_mlt/MetropolisSampler.hpp:106-164).
# While a tape is pushed, random_{1,2,3}d read tape[:, dim] (dims wrap
# mod D) and ignore (seed, pixel, sample).

_TAPE = None
_TAPE_LIGHT_COLS = None


class tape_mode:
    """Context manager activating tape-driven randomness during tracing.

    light_cols: for bidirectional tapes, the tape column where the
    light-walk dim region starts — dims >= 4096 (the bdpt
    LIGHT_WALK_DIM_OFFSET) map to column (dim - 4096 + light_cols)
    instead of wrapping mod D (which would alias camera- and
    light-walk coordinates onto the same mutation slots)."""

    def __init__(self, tape, light_cols=None):
        self.tape = tape
        self.light_cols = light_cols

    def __enter__(self):
        global _TAPE, _TAPE_LIGHT_COLS
        self._prev = (_TAPE, _TAPE_LIGHT_COLS)
        _TAPE = self.tape
        _TAPE_LIGHT_COLS = self.light_cols
        return self

    def __exit__(self, *exc):
        global _TAPE, _TAPE_LIGHT_COLS
        _TAPE, _TAPE_LIGHT_COLS = self._prev
        return False


_LIGHT_DIM_OFFSET = 4096  # == integrators.bdpt.LIGHT_WALK_DIM_OFFSET


def _tape_read(dim):
    d = _TAPE.shape[1]
    dim = jnp.asarray(dim)
    if _TAPE_LIGHT_COLS is not None:
        dim = jnp.where(dim >= _LIGHT_DIM_OFFSET,
                        dim - _LIGHT_DIM_OFFSET + _TAPE_LIGHT_COLS, dim)
    return _TAPE[:, dim % d]


# ------------------------------------------------------------ sampler mode
#
# "uniform" = the pcg4d counter hash; "sobol" = generated scrambled
# Sobol' (ref SobolPathSampler: per-pixel value scramble + index
# permutation within runs of 256, SobolPathSampler.hpp:47-71).  The mode
# is latched at trace time by the render entry points from
# RenderSettings.stratified_sampler; it keeps the same (seed, pixel,
# sample, dim) addressing, so replay/resume/sharding determinism holds.

SAMPLER_UNIFORM = 0
SAMPLER_SOBOL = 1
_SAMPLER = SAMPLER_UNIFORM


def set_sampler(stratified: bool) -> None:
    global _SAMPLER
    _SAMPLER = SAMPLER_SOBOL if stratified else SAMPLER_UNIFORM


def _sobol_value(seed, pixel, sample_idx, dim):
    from tungsten_tpu.utils import sobol
    pix = jnp.asarray(pixel).astype(jnp.uint32)
    smp = jnp.asarray(sample_idx).astype(jnp.uint32)
    dim = jnp.asarray(dim).astype(jnp.uint32)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    # per-pixel scramble + index permutation in runs of 256
    h, h2, _, _ = _pcg4d(pix, dim, jnp.uint32(0x50B0), seed)
    idx = smp ^ (h2 & jnp.uint32(0xFF))
    v = sobol.sobol_uint(idx, dim)
    return _to_unit_float(v ^ h)


def _pcg4d(v0, v1, v2, v3):
    """pcg4d mixing of four uint32 words; returns four uint32 words."""
    M = jnp.uint32(1664525)
    A = jnp.uint32(1013904223)
    x = v0 * M + A
    y = v1 * M + A
    z = v2 * M + A
    w = v3 * M + A
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    w = w ^ (w >> 16)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_unit_float(u):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (u >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def random_1d(seed, pixel, sample_idx, dim):
    """One uniform float in [0,1) addressed by (seed, pixel, sample, dim).

    All args broadcastable uint32/int32 arrays.
    """
    if _TAPE is not None:
        return _tape_read(dim)
    if _SAMPLER == SAMPLER_SOBOL:
        return _sobol_value(seed, pixel, sample_idx, dim)
    x, _, _, _ = _pcg4d(
        jnp.asarray(pixel).astype(jnp.uint32),
        jnp.asarray(sample_idx).astype(jnp.uint32),
        jnp.asarray(dim).astype(jnp.uint32),
        jnp.asarray(seed).astype(jnp.uint32),
    )
    return _to_unit_float(x)


def untracked_4d(seed, pixel, sample_idx, dim):
    """Four uniforms that BYPASS tape mode — the reference's
    WritablePathSampleGenerator::untracked1D analog: helper randomness
    for inversion (discrete-branch choices, free dims) that must not
    consume or disturb the primary-sample-space tape."""
    x, y, z, w = _pcg4d(
        jnp.asarray(pixel).astype(jnp.uint32),
        jnp.asarray(sample_idx).astype(jnp.uint32),
        jnp.asarray(dim).astype(jnp.uint32),
        jnp.asarray(seed).astype(jnp.uint32),
    )
    return (_to_unit_float(x), _to_unit_float(y),
            _to_unit_float(z), _to_unit_float(w))


def random_2d(seed, pixel, sample_idx, dim):
    """Two uniform floats; consumes dims [dim, dim+1] in the static layout."""
    if _TAPE is not None:
        return _tape_read(dim), _tape_read(dim + 1)
    if _SAMPLER == SAMPLER_SOBOL:
        return (_sobol_value(seed, pixel, sample_idx, dim),
                _sobol_value(seed, pixel, sample_idx, dim + 1))
    x, y, _, _ = _pcg4d(
        jnp.asarray(pixel).astype(jnp.uint32),
        jnp.asarray(sample_idx).astype(jnp.uint32),
        jnp.asarray(dim).astype(jnp.uint32),
        jnp.asarray(seed).astype(jnp.uint32),
    )
    return _to_unit_float(x), _to_unit_float(y)


def random_3d(seed, pixel, sample_idx, dim):
    if _TAPE is not None:
        return _tape_read(dim), _tape_read(dim + 1), _tape_read(dim + 2)
    if _SAMPLER == SAMPLER_SOBOL:
        return (_sobol_value(seed, pixel, sample_idx, dim),
                _sobol_value(seed, pixel, sample_idx, dim + 1),
                _sobol_value(seed, pixel, sample_idx, dim + 2))
    x, y, z, _ = _pcg4d(
        jnp.asarray(pixel).astype(jnp.uint32),
        jnp.asarray(sample_idx).astype(jnp.uint32),
        jnp.asarray(dim).astype(jnp.uint32),
        jnp.asarray(seed).astype(jnp.uint32),
    )
    return _to_unit_float(x), _to_unit_float(y), _to_unit_float(z)
