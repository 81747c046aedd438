"""Metropolis light transport family: kelemen_mlt, multiplexed_mlt,
reversible_jump_mlt — primary-sample-space MCMC over the wavefront path
tracer, chains-per-lane (SURVEY §2.9: "MLT chains map naturally to a
chains-per-core vmap").

Reference parity (and deliberate deltas):
  * kelemen_mlt — ref src/core/integrators/kelemen_mlt/: lazy
    MetropolisSampler with the Kelemen exponential mutation
    (MetropolisSampler.hpp:43-66), large steps, luminance-scaled
    acceptance, bootstrap seeding (KelemenMltTracer.cpp:97-131).  The
    reference mutates a *bidirectional* base sampler by default
    ("bidirectional": true); this build's base sampler is the wavefront
    unidirectional PT with NEE (the "bidirectional": false mode), which
    keeps the whole chain state in one (R, D) tape on device.
  * multiplexed_mlt — ref multiplexed_mlt/: chains specialize to a
    single path length; per-length normalization constants b_k from the
    bootstrap pool and chain budgets proportional to b_k
    (MultiplexedMltIntegrator.cpp:88-125).  Here the "technique" axis of
    MMLT collapses to the path length (the PT base sampler has one
    strategy family), selected per chain group.
  * reversible_jump_mlt — ref reversible_jump_mlt/: strategy
    perturbations between sampling techniques via path inversion
    (ReversibleJumpMltTracer.cpp:128-196).  The jump re-traces the
    current path, inverts its bounce-b NEE connection direction into
    the continuation sampler's primary-sample coordinates
    (bsdf/invert.py — the Bsdf::invert machinery), and proposes the
    tape that re-expresses the same geometric connection as a bsdf-hit
    path.  Vertices whose BSDF lacks an inversion (coats, mixed,
    fibers) fall back to re-randomizing the bounce's dim block.
    Acceptance stays the Kelemen luminance ratio: the inverted warps
    are the measure-preserving inverses of the sampling warps, so the
    PSS proposal density is symmetric up to the discrete
    technique-choice probabilities (approximated symmetric here).

Estimator: for a batch of S = chains x steps mutations with bootstrap
normalization b (mean path luminance over uniform PSS), every step
splats both states:  current += (1-a) rad/lum, proposed += a rad/lum,
image = b * n_pixels / S * splats.  Large-step samples double as an
independent-MC estimate folded in through the same formula.
"""
from __future__ import annotations

from dataclasses import replace
import functools

import numpy as np
import jax
import jax.numpy as jnp

from tungsten_tpu.integrators.path_tracer import trace_wave, trace_wave_rj
from tungsten_tpu.utils import rng

LUM = jnp.asarray([0.2126, 0.7152, 0.0722])

# Kelemen mutation constants (ref MetropolisSampler.hpp:45-47)
S1 = 1.0 / 1024.0
S2 = 1.0 / 64.0
FACTOR = -np.log(S2 / S1)


def tape_dims(settings) -> int:
    return rng.DIMS_CAMERA + settings.max_bounces * rng.DIMS_PER_BOUNCE


def _uniform_tape(seed, batch, step, R, D):
    """Fresh uniform tape addressed by (seed, batch, step) — replayable."""
    rows = jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(batch) * R
    dims = jnp.arange(D, dtype=jnp.uint32)
    return rng.random_1d(seed, rows[:, None], step, dims[None, :])


def _mutate(tape, u):
    """Kelemen exponential small-step on every coordinate
    (ref MetropolisSampler.hpp:43-66); u uniform (R, D)."""
    negative = u < 0.5
    r = jnp.where(negative, u * 2.0, (u - 0.5) * 2.0)
    delta = S2 * jnp.exp(FACTOR * r)
    v = jnp.where(negative, tape - delta, tape + delta)
    v = jnp.where(v < 0.0, v + 1.0, v)
    v = jnp.where(v >= 1.0, v - 1.0, v)
    return v


def trace_tape_rj(scene, settings, tape, b_pick, seed):
    """Trace the CURRENT chain state while inverting, at each chain's
    chosen bounce, the NEE connection direction back to continuation-
    sampler coordinates (Bsdf::invert via trace_wave_rj).  Returns
    (rj_dims (R,4), rj_valid (R,))."""
    R = tape.shape[0]
    w, h = settings.width, settings.height
    x = jnp.minimum((tape[:, 0] * w), w - 1e-3)
    y = jnp.minimum((tape[:, 1] * h), h - 1e-3)
    px = x.astype(jnp.int32)
    py = y.astype(jnp.int32)
    pixel = (py * w + px).astype(jnp.uint32)
    t2 = tape.at[:, 0].set(x - px).at[:, 1].set(y - py)
    mlt_settings = replace(settings, filter="box",
                           integrator_type="path_tracer")
    with rng.tape_mode(t2):
        _, rj_dims, rj_valid = trace_wave_rj(
            scene, mlt_settings, pixel, jnp.zeros((R,), jnp.uint32),
            jnp.uint32(seed), b_pick)
    return rj_dims, rj_valid


def trace_tape(scene, settings, tape, seed):
    """Evaluate the path integrand at PSS point `tape` (R, D).

    Dims 0,1 are the full-image position; the tracer sees their
    fractional parts as the (box-)filter jitter.  Returns
    (radiance (R,3), pixel (R,) int32, luminance (R,)).
    """
    R = tape.shape[0]
    w, h = settings.width, settings.height
    x = jnp.minimum((tape[:, 0] * w), w - 1e-3)
    y = jnp.minimum((tape[:, 1] * h), h - 1e-3)
    px = x.astype(jnp.int32)
    py = y.astype(jnp.int32)
    pixel = (py * w + px).astype(jnp.uint32)
    t2 = tape.at[:, 0].set(x - px).at[:, 1].set(y - py)
    mlt_settings = replace(settings, filter="box",
                           integrator_type="path_tracer")
    with rng.tape_mode(t2):
        rad = trace_wave(scene, mlt_settings, pixel,
                         jnp.zeros((R,), jnp.uint32), jnp.uint32(seed))
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
    lum = rad @ LUM
    return rad, pixel, lum


@functools.partial(jax.jit, static_argnames=("settings", "R", "n_steps",
                                             "strategy_prob"))
def _mlt_batch(scene, settings, seed, batch, R: int, n_steps: int,
               init_tape, init_rad, init_pixel, init_lum,
               strategy_prob: float = 0.0):
    """Run n_steps of Metropolis mutations for R chains; returns the
    accumulated splat framebuffer (n_pixels, 3) and the final chain
    state.  Helper randomness (mutations, acceptance) comes from the
    counter RNG keyed on (chain row, step) — independent of the tape."""
    n = settings.width * settings.height
    D = init_tape.shape[1]
    rows = jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(batch) * R
    hseed = jnp.uint32(seed) ^ jnp.uint32(0x9E3779B9)

    def splat(fb, pixel, contrib):
        return fb.at[jnp.clip(pixel, 0, n - 1)].add(contrib)

    def step(carry, i):
        tape, rad, pixel, lum, fb = carry
        u_large = rng.random_1d(hseed, rows, i, 0)
        u_acc = rng.random_1d(hseed, rows, i, 1)
        u_strat = rng.random_1d(hseed, rows, i, 2)
        u_bounce = rng.random_1d(hseed, rows, i, 3)
        u_mut = rng.random_1d(hseed, rows[:, None], i,
                              jnp.arange(4, 4 + D, dtype=jnp.uint32)[None])

        large = u_large < settings.mlt_large_step_prob
        fresh = u_mut  # a large step IS a fresh uniform tape
        small = _mutate(tape, u_mut)
        if strategy_prob > 0.0:
            # reversible-jump technique swap (ref ReversibleJumpMlt-
            # Tracer.cpp:128-196): re-trace the current path while
            # inverting its bounce-b NEE connection direction into the
            # CONTINUATION sampler's coordinates (Bsdf::invert), then
            # propose the tape whose bsdf-sample slots aim the
            # continuation ray at that light point — the same geometric
            # path re-expressed under the bsdf-hit technique.  Chains
            # whose vertex BSDF has no inversion (coats/fibers) fall
            # back to re-randomizing the bounce block.
            strat = (~large) & (u_strat < strategy_prob)
            b_pick = jnp.minimum(
                (u_bounce * settings.max_bounces).astype(jnp.int32),
                settings.max_bounces - 1)
            rj_dims, rj_valid = trace_tape_rj(scene, settings, tape,
                                              b_pick, seed)
            dim0 = rng.DIMS_CAMERA + b_pick * rng.DIMS_PER_BOUNCE
            dcol = jnp.arange(D, dtype=jnp.int32)[None, :]
            in_block = (dcol >= dim0[:, None]) & \
                (dcol < dim0[:, None] + rng.DIMS_PER_BOUNCE)
            swap_tape = tape
            for j, slot in enumerate((rng.BounceDims.BSDF_LOBE,
                                      rng.BounceDims.BSDF_SAMPLE,
                                      rng.BounceDims.BSDF_SAMPLE + 1,
                                      rng.BounceDims.BSDF_LOBE2)):
                swap_tape = jnp.where(dcol == (dim0 + slot)[:, None],
                                      rj_dims[:, j:j + 1], swap_tape)
            rerand = jnp.where(in_block, u_mut, tape)
            strat_tape = jnp.where(rj_valid[:, None], swap_tape, rerand)
            small = jnp.where(strat[:, None], strat_tape, small)
        prop_tape = jnp.where(large[:, None], fresh, small)

        prop_rad, prop_pixel, prop_lum = trace_tape(
            scene, settings, prop_tape, seed)

        a = jnp.clip(prop_lum / jnp.maximum(lum, 1e-20), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, 1.0, a)

        # two-sided splat (Kelemen): both states contribute each step
        w_cur = (1.0 - a) / jnp.maximum(lum, 1e-20)
        w_prop = a / jnp.maximum(prop_lum, 1e-20)
        fb = splat(fb, pixel,
                   rad * jnp.where(lum > 0, w_cur, 0.0)[:, None])
        fb = splat(fb, prop_pixel,
                   prop_rad * jnp.where(prop_lum > 0, w_prop, 0.0)[:, None])

        accept = u_acc < a
        tape = jnp.where(accept[:, None], prop_tape, tape)
        rad = jnp.where(accept[:, None], prop_rad, rad)
        pixel = jnp.where(accept, prop_pixel, pixel)
        lum = jnp.where(accept, prop_lum, lum)
        return (tape, rad, pixel, lum, fb), None

    fb0 = jnp.zeros((n, 3))
    carry = (init_tape, init_rad, init_pixel, init_lum, fb0)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
    tape, rad, pixel, lum, fb = carry
    return fb, tape, rad, pixel, lum


@functools.partial(jax.jit, static_argnames=("settings", "R", "D"))
def _bootstrap_batch(scene, settings, seed, batch, R: int, D: int):
    tape = _uniform_tape(jnp.uint32(seed) ^ jnp.uint32(0xB007), batch,
                         0, R, D)
    rad, pixel, lum = trace_tape(scene, settings, tape, seed)
    return tape, rad, pixel, lum


def render_pass_mlt(scene, settings, sample_start, seed, spp_chunk: int = 1):
    """One MLT batch worth `spp_chunk` average mutations per pixel.
    Returns (framebuffer sum scaled for spp averaging, ray estimate)."""
    n = settings.width * settings.height
    R = min(getattr(settings, "mlt_chains", 8192), max(n, 256))
    D = tape_dims(settings)
    batch = int(sample_start)

    strategy_prob = settings.mlt_strategy_prob \
        if settings.integrator_type == "reversible_jump_mlt" else 0.0

    # ---- bootstrap pool: estimate b and resample chain seeds ----
    # (ref KelemenMltTracer.cpp:97-131 / MultiplexedMltIntegrator.cpp:98-125)
    pool_batches = max(1, min(settings.mlt_sample_pool, 4 * R) // R)
    tapes, rads, pixels, lums = [], [], [], []
    for pb in range(pool_batches):
        t, r, p, l = _bootstrap_batch(scene, settings,
                                      np.uint32(seed),
                                      np.uint32(batch * 97 + pb), R, D)
        tapes.append(t)
        rads.append(r)
        pixels.append(p)
        lums.append(l)
    pool_lum = jnp.concatenate(lums)
    b = float(jnp.mean(pool_lum))
    if b <= 0.0:
        return jnp.zeros((settings.height, settings.width, 3)), R
    cdf = jnp.cumsum(pool_lum)
    cdf = cdf / cdf[-1]
    u = rng.random_1d(np.uint32(seed) ^ np.uint32(0x5EED),
                      jnp.arange(R, dtype=jnp.uint32), np.uint32(batch), 0)
    idx = jnp.searchsorted(cdf, u)
    idx = jnp.clip(idx, 0, pool_lum.shape[0] - 1)
    pool_tape = jnp.concatenate(tapes)
    pool_rad = jnp.concatenate(rads)
    pool_pixel = jnp.concatenate(pixels)
    init = (pool_tape[idx], pool_rad[idx], pool_pixel[idx], pool_lum[idx])

    # ---- chains ----
    total_samples = spp_chunk * n
    n_steps = max(1, total_samples // R)
    fb, *_ = _mlt_batch(scene, settings, np.uint32(seed), np.uint32(batch),
                        R, n_steps, *init, strategy_prob=strategy_prob)

    scale = b * n / (R * n_steps)
    # rays: 1 path + 2 NEE rays per bounce estimate, per mutation
    rays = R * n_steps * min(settings.max_bounces, 8)
    # scaled so render()'s division by total spp recovers the estimate
    out = fb.reshape(settings.height, settings.width, 3) * scale * spp_chunk
    return out, rays


def render_pass_mmlt(scene, settings, sample_start, seed,
                     spp_chunk: int = 1):
    """Multiplexed MLT: chains specialize to one path length k with
    budgets proportional to the per-length bootstrap luminance b_k
    (ref MultiplexedMltIntegrator.cpp:88-125)."""
    n = settings.width * settings.height
    R = min(getattr(settings, "mlt_chains", 8192), max(n, 256))
    max_len = min(settings.max_bounces, 8)
    D = None  # computed per length below
    batch = int(sample_start)

    # bootstrap per length: b_k over uniform tapes restricted to length k
    fb_total = jnp.zeros((n, 3))
    rays = 0
    b_ks = []
    inits = []
    length_settings = []
    for k in range(1, max_len + 1):
        s_k = replace(settings, mlt_path_length=k)
        Dk = tape_dims(s_k)
        t, r, p, l = _bootstrap_batch(scene, s_k, np.uint32(seed),
                                      np.uint32(batch * 131 + k), R, Dk)
        b_ks.append(float(jnp.mean(l)))
        inits.append((t, r, p, l))
        length_settings.append(s_k)
    b_sum = sum(b_ks)
    if b_sum <= 0.0:
        return jnp.zeros((settings.height, settings.width, 3)), R

    total_samples = spp_chunk * n
    for k, (b_k, init, s_k) in enumerate(zip(b_ks, inits, length_settings),
                                         start=1):
        if b_k <= 0.0:
            continue
        # chain budget proportional to b_k
        n_steps = max(1, int(total_samples * (b_k / b_sum)) // R)
        lum_k = init[3]
        cdf = jnp.cumsum(lum_k)
        good = float(cdf[-1]) > 0
        if not good:
            continue
        cdf = cdf / cdf[-1]
        u = rng.random_1d(np.uint32(seed) ^ np.uint32(0x5EED + k),
                          jnp.arange(R, dtype=jnp.uint32),
                          np.uint32(batch), 0)
        idx = jnp.clip(jnp.searchsorted(cdf, u), 0, R - 1)
        init_k = (init[0][idx], init[1][idx], init[2][idx], init[3][idx])
        fb, *_ = _mlt_batch(scene, s_k, np.uint32(seed),
                            np.uint32(batch * 131 + k), R, n_steps, *init_k)
        fb_total = fb_total + fb * (b_k * n / (R * n_steps))
        rays += R * n_steps * k
    out = fb_total.reshape(settings.height, settings.width, 3) * spp_chunk
    return out, rays
