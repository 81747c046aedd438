"""Metropolis light transport family: kelemen_mlt, multiplexed_mlt,
reversible_jump_mlt — primary-sample-space MCMC over the wavefront path
tracer, chains-per-lane (SURVEY §2.9: "MLT chains map naturally to a
chains-per-core vmap").

Reference parity (and deliberate deltas):
  * kelemen_mlt — ref src/core/integrators/kelemen_mlt/: lazy
    MetropolisSampler with the Kelemen exponential mutation
    (MetropolisSampler.hpp:43-66), large steps, luminance-scaled
    acceptance, bootstrap seeding (KelemenMltTracer.cpp:97-131).
    Like the reference's default ("bidirectional": true,
    KelemenMltSettings.hpp:19) the chains mutate a BIDIRECTIONAL tape:
    camera-walk dims in the low columns, light-root/walk dims mapped
    past them (rng.tape_mode light_cols), evaluated by the BDPT
    integrator with acceptance on the total splat luminance.
    "bidirectional": false selects the unidirectional PT tape.
  * multiplexed_mlt — ref multiplexed_mlt/: chains specialize to a
    single path length; per-length normalization constants b_k from the
    bootstrap pool and chain budgets proportional to b_k
    (MultiplexedMltIntegrator.cpp:88-125).  With the bidirectional
    base the per-length BDPT strategy loops restrict statically to
    s + t - 1 = k, so the technique axis is the (s, t) family; with
    "bidirectional": false it collapses to path length over PT.
  * reversible_jump_mlt — ref reversible_jump_mlt/: strategy
    perturbations between sampling techniques via path inversion
    (ReversibleJumpMltTracer.cpp:128-196, LightPath::invert).  The
    jump re-traces the current path and inverts BOTH techniques at a
    chosen bounce b: the NEE connection direction into the
    continuation sampler's coordinates (bsdf/invert.py — the
    Bsdf::invert machinery) AND the continuation ray's area-light hit
    into the NEE sampler's coordinates (integrators/invert_path.py —
    the Primitive::invertPosition/chooseLight machinery).  The
    proposal EXCHANGES the two blocks at once, which makes the map
    self-inverse on the swapped slots; the warps are the
    measure-preserving inverses of the sampling warps and both jump
    events are drawn identically in either state, so the PSS proposal
    is symmetric and acceptance stays the Kelemen luminance ratio.
    Chains where either inversion fails auto-reject (proposalWeight 0,
    the reference's failed-inversion behavior).  Residual asymmetry is
    confined to discrete-preimage ties (an inversion that regenerates
    the same geometry through a different lobe/alias branch than the
    incumbent tape); test_mlt.py bounds the end-to-end bias against
    the PT estimate with the jump probability cranked up.

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


def tape_dims_bdpt(settings):
    """(camera-region columns, total columns) of a bidirectional tape:
    the camera walk occupies [0, cam_cols) and the light root + walk
    (dims LIGHT_WALK_DIM_OFFSET..) map to [cam_cols, D) via
    rng.tape_mode(light_cols=cam_cols)."""
    NV = settings.bdpt_vertices
    cam_cols = rng.DIMS_CAMERA + NV * rng.DIMS_PER_BOUNCE
    return cam_cols, cam_cols + 16 + NV * rng.DIMS_PER_BOUNCE


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
    chosen bounce, BOTH techniques' coordinates (Bsdf::invert for the
    NEE connection direction, invert_choose_light +
    invert_area_light_point for the continuation ray's light hit — via
    trace_wave_rj).  Returns (rj_dims (R,4), rj_valid (R,),
    rj_nee (R,4), rj_rev_valid (R,))."""
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
        _, rj_dims, rj_valid, rj_nee, rj_rev_valid = trace_wave_rj(
            scene, mlt_settings, pixel, jnp.zeros((R,), jnp.uint32),
            jnp.uint32(seed), b_pick)
    return rj_dims, rj_valid, rj_nee, rj_rev_valid


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


def trace_tape_bdpt(scene, settings, tape, seed):
    """Evaluate the BDPT measurement at PSS point `tape` (R, D): the
    bidirectional base sampler of kelemen_mlt/multiplexed_mlt (ref
    KelemenMltSettings.hpp:19 bidirectional=true;
    KelemenMltTracer::traceSample's LightPath pair).  Camera-walk dims
    read columns [0, cam_cols); light-root/walk dims map past them.
    Returns (radiance (R,3), pixel (R,), splat_pix (R,NS),
    splat_val (R,NS,3), total luminance (R,)) — the luminance of the
    ENTIRE splat vector drives acceptance, like the reference's
    splats.totalLuminance()."""
    from tungsten_tpu.integrators.bdpt import trace_bdpt
    R = tape.shape[0]
    w, h = settings.width, settings.height
    x = jnp.minimum((tape[:, 0] * w), w - 1e-3)
    y = jnp.minimum((tape[:, 1] * h), h - 1e-3)
    px = x.astype(jnp.int32)
    py = y.astype(jnp.int32)
    pixel = (py * w + px).astype(jnp.uint32)
    t2 = tape.at[:, 0].set(x - px).at[:, 1].set(y - py)
    cam_cols, _ = tape_dims_bdpt(settings)
    mlt_settings = replace(settings, filter="box",
                           integrator_type="bidirectional_path_tracer")
    with rng.tape_mode(t2, light_cols=cam_cols):
        rad, spix, sval, _ = trace_bdpt(
            scene, mlt_settings, pixel, jnp.zeros((R,), jnp.uint32),
            jnp.uint32(seed), max_vertices=settings.bdpt_vertices,
            max_edges=settings.max_bounces)
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
    ns = spix.shape[0] // R
    if ns == 0:
        spix2 = jnp.zeros((R, 0), jnp.int32)
        sval2 = jnp.zeros((R, 0, 3))
    else:
        sval = jnp.where(jnp.isfinite(sval), sval, 0.0)
        spix2 = spix.reshape(ns, R).T
        sval2 = sval.reshape(ns, R, 3).transpose(1, 0, 2)
    lum = rad @ LUM + jnp.sum(sval2 @ LUM, axis=-1)
    return rad, pixel, spix2, sval2, lum


@functools.partial(jax.jit, static_argnames=("settings", "R", "n_steps"))
def _mlt_batch_bdpt(scene, settings, seed, batch, R: int, n_steps: int,
                    init_tape, init_rad, init_pixel, init_spix,
                    init_sval, init_lum):
    """Metropolis mutations over the bidirectional tape.  Each state's
    measurement is (own-pixel radiance + NS lens splats); both sides of
    every step splat their full vector scaled by the Kelemen weights."""
    n = settings.width * settings.height
    D = init_tape.shape[1]
    rows = jnp.arange(R, dtype=jnp.uint32) + jnp.uint32(batch) * R
    hseed = jnp.uint32(seed) ^ jnp.uint32(0x9E3779B9)

    def splat_all(fb, pixel, rad, spix, sval, wgt):
        fb = fb.at[jnp.clip(pixel, 0, n - 1)].add(rad * wgt[:, None])
        if spix.shape[1]:
            fb = fb.at[jnp.clip(spix.reshape(-1), 0, n - 1)].add(
                (sval * wgt[:, None, None]).reshape(-1, 3))
        return fb

    def step(carry, i):
        tape, rad, pixel, spix, sval, lum, fb = carry
        u_large = rng.random_1d(hseed, rows, i, 0)
        u_acc = rng.random_1d(hseed, rows, i, 1)
        u_mut = rng.random_1d(hseed, rows[:, None], i,
                              jnp.arange(4, 4 + D, dtype=jnp.uint32)[None])
        large = u_large < settings.mlt_large_step_prob
        prop_tape = jnp.where(large[:, None], u_mut,
                              _mutate(tape, u_mut))
        (prop_rad, prop_pixel, prop_spix, prop_sval,
         prop_lum) = trace_tape_bdpt(scene, settings, prop_tape, seed)

        a = jnp.clip(prop_lum / jnp.maximum(lum, 1e-20), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, 1.0, a)
        w_cur = jnp.where(lum > 0, (1.0 - a) / jnp.maximum(lum, 1e-20),
                          0.0)
        w_prop = jnp.where(prop_lum > 0,
                           a / jnp.maximum(prop_lum, 1e-20), 0.0)
        fb = splat_all(fb, pixel, rad, spix, sval, w_cur)
        fb = splat_all(fb, prop_pixel, prop_rad, prop_spix, prop_sval,
                       w_prop)

        accept = u_acc < a
        tape = jnp.where(accept[:, None], prop_tape, tape)
        rad = jnp.where(accept[:, None], prop_rad, rad)
        pixel = jnp.where(accept, prop_pixel, pixel)
        spix = jnp.where(accept[:, None], prop_spix, spix)
        sval = jnp.where(accept[:, None, None], prop_sval, sval)
        lum = jnp.where(accept, prop_lum, lum)
        return (tape, rad, pixel, spix, sval, lum, fb), None

    fb0 = jnp.zeros((n, 3))
    carry = (init_tape, init_rad, init_pixel, init_spix, init_sval,
             init_lum, fb0)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(n_steps))
    return carry[-1], carry[0], carry[5]


@functools.partial(jax.jit, static_argnames=("settings", "R", "D"))
def _bootstrap_batch_bdpt(scene, settings, seed, batch, R: int, D: int):
    tape = _uniform_tape(jnp.uint32(seed) ^ jnp.uint32(0xB007), batch,
                         0, R, D)
    rad, pixel, spix, sval, lum = trace_tape_bdpt(scene, settings, tape,
                                                  seed)
    return tape, rad, pixel, spix, sval, lum


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
        pw = jnp.ones((R,))
        if strategy_prob > 0.0:
            # reversible-jump technique EXCHANGE (ref ReversibleJumpMlt-
            # Tracer.cpp:128-196, LightPath::invert): re-trace the
            # current path inverting BOTH techniques at bounce b, then
            # propose the tape that simultaneously (a) aims the
            # continuation sample at the current NEE light point
            # (Bsdf::invert) and (b) makes the NEE sampler reproduce
            # the current continuation ray's light hit
            # (invert_choose_light + invert_area_light_point).  With
            # both halves written at once the map is SELF-INVERSE on
            # the swapped slots (applying it to the proposal recovers
            # the original deterministic coordinates) and the warps are
            # measure-preserving, so the PSS proposal is symmetric and
            # the acceptance stays the Kelemen luminance ratio.  Chains
            # where either inversion fails (no visible NEE connection,
            # continuation misses a samplable area light, or the vertex
            # BSDF lacks an inverse) AUTO-REJECT the proposal
            # (proposalWeight = 0, the reference's failed-inversion
            # behavior, ReversibleJumpMltTracer.cpp:193-196).
            strat = (~large) & (u_strat < strategy_prob)
            b_pick = jnp.minimum(
                (u_bounce * settings.max_bounces).astype(jnp.int32),
                settings.max_bounces - 1)
            rj_dims, rj_valid, rj_nee, rj_rev_valid = trace_tape_rj(
                scene, settings, tape, b_pick, seed)
            dim0 = rng.DIMS_CAMERA + b_pick * rng.DIMS_PER_BOUNCE
            dcol = jnp.arange(D, dtype=jnp.int32)[None, :]
            swap_tape = tape
            for j, slot in enumerate((rng.BounceDims.BSDF_LOBE,
                                      rng.BounceDims.BSDF_SAMPLE,
                                      rng.BounceDims.BSDF_SAMPLE + 1,
                                      rng.BounceDims.BSDF_LOBE2)):
                swap_tape = jnp.where(dcol == (dim0 + slot)[:, None],
                                      rj_dims[:, j:j + 1], swap_tape)
            for j, slot in enumerate((rng.BounceDims.LIGHT_SELECT,
                                      rng.BounceDims.LIGHT_SAMPLE,
                                      rng.BounceDims.LIGHT_SAMPLE + 1,
                                      rng.BounceDims.LIGHT_TRI)):
                swap_tape = jnp.where(dcol == (dim0 + slot)[:, None],
                                      rj_nee[:, j:j + 1], swap_tape)
            ok_swap = rj_valid & rj_rev_valid
            small = jnp.where(strat[:, None], swap_tape, small)
            pw = jnp.where(strat & ~ok_swap, 0.0, pw)
        prop_tape = jnp.where(large[:, None], fresh, small)

        prop_rad, prop_pixel, prop_lum = trace_tape(
            scene, settings, prop_tape, seed)

        a = jnp.clip(pw * prop_lum / jnp.maximum(lum, 1e-20), 0.0, 1.0)
        a = jnp.where(lum <= 0.0, pw, a)

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
    batch = int(sample_start)

    strategy_prob = settings.mlt_strategy_prob \
        if settings.integrator_type == "reversible_jump_mlt" else 0.0
    # kelemen's reference default mutates a bidirectional base sampler
    # (KelemenMltSettings.hpp:19); the RJ technique-exchange machinery
    # is PT-specific, so reversible_jump_mlt stays on the PT tape
    use_bdpt = settings.mlt_bidirectional and \
        settings.integrator_type == "kelemen_mlt"
    D = tape_dims_bdpt(settings)[1] if use_bdpt else tape_dims(settings)

    # ---- bootstrap pool: estimate b and resample chain seeds ----
    # (ref KelemenMltTracer.cpp:97-131 / MultiplexedMltIntegrator.cpp:98-125)
    pool_batches = max(1, min(settings.mlt_sample_pool, 4 * R) // R)
    pools = []
    for pb in range(pool_batches):
        if use_bdpt:
            pools.append(_bootstrap_batch_bdpt(
                scene, settings, np.uint32(seed),
                np.uint32(batch * 97 + pb), R, D))
        else:
            pools.append(_bootstrap_batch(scene, settings,
                                          np.uint32(seed),
                                          np.uint32(batch * 97 + pb),
                                          R, D))
    pool_lum = jnp.concatenate([p[-1] for p in pools])
    b = float(jnp.mean(pool_lum))
    if b <= 0.0:
        return jnp.zeros((settings.height, settings.width, 3)), R
    cdf = jnp.cumsum(pool_lum)
    cdf = cdf / cdf[-1]
    u = rng.random_1d(np.uint32(seed) ^ np.uint32(0x5EED),
                      jnp.arange(R, dtype=jnp.uint32), np.uint32(batch), 0)
    idx = jnp.searchsorted(cdf, u)
    idx = jnp.clip(idx, 0, pool_lum.shape[0] - 1)
    init = tuple(jnp.concatenate([p[k] for p in pools])[idx]
                 for k in range(len(pools[0])))

    # ---- chains ----
    total_samples = spp_chunk * n
    n_steps = max(1, total_samples // R)
    if use_bdpt:
        fb, *_ = _mlt_batch_bdpt(scene, settings, np.uint32(seed),
                                 np.uint32(batch), R, n_steps, *init)
    else:
        fb, *_ = _mlt_batch(scene, settings, np.uint32(seed),
                            np.uint32(batch), R, n_steps, *init,
                            strategy_prob=strategy_prob)

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

    # bootstrap per length: b_k over uniform tapes restricted to
    # length k.  With mlt_bidirectional (the reference MMLT's native
    # form) the per-length chains mutate a BDPT tape whose strategy
    # loops are statically restricted to s + t - 1 = k, so the
    # technique axis is the (s, t) family rather than path length over
    # the PT sampler alone (ref MultiplexedMltIntegrator.cpp:88-125).
    use_bdpt = settings.mlt_bidirectional
    fb_total = jnp.zeros((n, 3))
    rays = 0
    b_ks = []
    inits = []
    length_settings = []
    for k in range(1, max_len + 1):
        s_k = replace(settings, mlt_path_length=k)
        if use_bdpt:
            Dk = tape_dims_bdpt(s_k)[1]
            init = _bootstrap_batch_bdpt(scene, s_k, np.uint32(seed),
                                         np.uint32(batch * 131 + k),
                                         R, Dk)
        else:
            Dk = tape_dims(s_k)
            init = _bootstrap_batch(scene, s_k, np.uint32(seed),
                                    np.uint32(batch * 131 + k), R, Dk)
        b_ks.append(float(jnp.mean(init[-1])))
        inits.append(init)
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
        lum_k = init[-1]
        cdf = jnp.cumsum(lum_k)
        good = float(cdf[-1]) > 0
        if not good:
            continue
        cdf = cdf / cdf[-1]
        u = rng.random_1d(np.uint32(seed) ^ np.uint32(0x5EED + k),
                          jnp.arange(R, dtype=jnp.uint32),
                          np.uint32(batch), 0)
        idx = jnp.clip(jnp.searchsorted(cdf, u), 0, R - 1)
        init_k = tuple(v[idx] for v in init)
        if use_bdpt:
            fb, *_ = _mlt_batch_bdpt(scene, s_k, np.uint32(seed),
                                     np.uint32(batch * 131 + k), R,
                                     n_steps, *init_k)
        else:
            fb, *_ = _mlt_batch(scene, s_k, np.uint32(seed),
                                np.uint32(batch * 131 + k), R, n_steps,
                                *init_k)
        fb_total = fb_total + fb * (b_k * n / (R * n_steps))
        rays += R * n_steps * k
    out = fb_total.reshape(settings.height, settings.width, 3) * spp_chunk
    return out, rays
