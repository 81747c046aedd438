"""Top-level render driver: the analog of the reference's standalone
renderer loop (ref: src/tungsten/Shared.hpp:191-337) — spp rounds over a
jitted wavefront step, accumulation into a framebuffer, tonemap + save.
"""
from __future__ import annotations

import functools
import time
from dataclasses import replace

import jax
import jax.numpy as jnp

from tungsten_tpu.utils import jaxcfg

jaxcfg.setup()
import numpy as np

from tungsten_tpu.cameras.camera import tonemap
from tungsten_tpu.integrators.path_tracer import trace_wave
from tungsten_tpu.scene.flatten import FlatScene, RenderSettings, load_flat_scene


# Wavefront chunk size: the TPU backend in this environment kills
# long-running device programs, so each device call traces one bounded
# chunk of rays for one sample index; the spp/chunk loops run host-side.
WAVEFRONT_CHUNK = 262144


@functools.partial(jax.jit, static_argnames=("settings",))
def _trace_chunk(scene: FlatScene, settings: RenderSettings, pixel,
                 sample_idx, seed):
    rad, r = trace_wave(scene, settings, pixel,
                        jnp.full(pixel.shape, sample_idx, jnp.uint32),
                        jnp.uint32(seed), with_stats=True)
    # NaN guard (ref PathTracer returns diagnostic colors on NaN)
    return jnp.where(jnp.isfinite(rad), rad, 0.0), r


# ------------------------- staged wavefront with compaction ------------
# Late bounces have few survivors; running them at full wavefront width
# wastes both traversal and shading.  Host-side width schedule: after
# EVERY bounce, if the alive count fits in width/4, bank dead rays'
# radiance into the framebuffer and compact.  (Round-4 measurement: a
# bounce at full width costs ~140 ms at 262k wide whether 208k or 4k
# rays are alive — sort/cull/traversal/shading all scale with the
# static width — so the round-3 every-4-bounces schedule left 2-3
# nearly-empty full-width bounces on the table, tools_bprof.py.)

BOUNCE_SEGMENT = 1
# round-5b A/B: 1024 beats 4096 (587 vs 595 ms staged wave) — mirror
# paths survive to max_bounces, so the tail runs ~50 bounces at the
# final width and narrower is cheaper; step=4 measured worse (602)
MIN_WAVE = 1024
WIDTH_STEP = 2


def _schedule_params():
    """(initial segment, width divisor): fine-grained on TPU (every
    bounce, /2 widths); coarse on CPU (every 4 bounces, /4 widths) so
    the CPU test suite doesn't pay 2x the jit-compile variants for a
    schedule whose wins are TPU-specific."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "cpu":
        return 4, 4
    return BOUNCE_SEGMENT, WIDTH_STEP


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_init(scene, settings, pixel, sample_idx, seed):
    from tungsten_tpu.integrators.path_tracer import init_wave
    return init_wave(scene, settings, pixel,
                     jnp.broadcast_to(jnp.asarray(sample_idx, jnp.uint32),
                                      pixel.shape),
                     jnp.uint32(seed))


@functools.partial(jax.jit, static_argnames=("settings",))
def _jit_run(scene, settings, seed, state, bounce_end):
    from tungsten_tpu.integrators.path_tracer import run_bounces
    return run_bounces(scene, settings, jnp.uint32(seed), state, bounce_end)


@functools.partial(jax.jit, static_argnames=("n_total",))
def _jit_bank(state, n_total: int):
    from tungsten_tpu.integrators.path_tracer import bank_emission
    return bank_emission(state, n_total)


@functools.partial(jax.jit, static_argnames=("new_r",))
def _jit_compact(state, new_r: int):
    from tungsten_tpu.integrators.path_tracer import compact_wave
    return compact_wave(state, new_r)


@functools.partial(jax.jit, static_argnames=("settings", "n_total",
                                             "min_wave", "step"))
def _jit_staged(scene, settings, pixel, sample_idx, seed, n_total: int,
                min_wave: int, step: int):
    from tungsten_tpu.integrators.path_tracer import trace_wave_staged
    return trace_wave_staged(scene, settings, pixel, sample_idx,
                             jnp.uint32(seed), n_total,
                             min_wave=min_wave, step=step)


def _trace_chunk_staged(scene, settings, pixel, sample_idx, seed, n_total):
    """One pixel chunk, one spp batch: the full width-staged bounce
    schedule fused into one device program (path_tracer.py
    trace_wave_staged) — zero mid-render host syncs.  Returns
    ((n_total, 3) radiance sum, rays)."""
    _, step = _schedule_params()
    fb, rays = _jit_staged(scene, settings, pixel, sample_idx, seed,
                           n_total, MIN_WAVE, step)
    return fb, int(rays)


@functools.partial(jax.jit, static_argnames=("settings", "n_total"))
def _trace_chunk_splat(scene: FlatScene, settings: RenderSettings, pixel,
                       sample_idx, seed, n_total):
    """One chunk of a splat-capable integrator (bdpt / light_tracer):
    returns (per-pixel radiance (R,3), full-frame splat sum (n_total,3),
    rays).  Splats scatter-add on device — the functional counterpart of
    the reference's AtomicFramebuffer CAS loop
    (src/core/cameras/AtomicFramebuffer.hpp:26-89)."""
    from tungsten_tpu.integrators.bdpt import trace_bdpt, trace_light

    R = pixel.shape[0]
    sample = jnp.full((R,), sample_idx, jnp.uint32)
    if settings.integrator_type == "light_tracer":
        rad = jnp.zeros((R, 3))
        spix, sval, rays = trace_light(
            scene, settings, pixel, sample, jnp.uint32(seed),
            max_vertices=settings.bdpt_vertices,
            max_edges=settings.max_bounces)
    else:
        rad, spix, sval, rays = trace_bdpt(
            scene, settings, pixel, sample, jnp.uint32(seed),
            max_vertices=settings.bdpt_vertices,
            max_edges=settings.max_bounces)
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
    sval = jnp.where(jnp.isfinite(sval), sval, 0.0)
    # chunk padding: entries with pixel >= n_total are duplicates that
    # must not emit light paths (their per-pixel radiance rows are
    # sliced off by the caller, but splats land in-frame)
    if spix.shape[0] > 0:
        reps = spix.shape[0] // R
        valid = jnp.tile(pixel < n_total, reps)
        sval = jnp.where(valid[..., None], sval, 0.0)
    splat = jnp.zeros((n_total, 3)).at[
        jnp.clip(spix, 0, n_total - 1)].add(sval)
    return rad, splat, jnp.int32(rays)


# photon paths traced per device call (photon_map integrators)
PHOTON_CHUNK = 1 << 16


def _render_pass_photon(scene: FlatScene, settings: RenderSettings,
                        sample_start, seed, spp_chunk: int):
    """Photon-map / PPM spp rounds (ref PhotonMapIntegrator::renderSegment
    + ProgressivePhotonMapIntegrator's per-iteration radius shrink):
    each spp round re-traces the photon map (seed offset by iteration)
    and runs a gather pass per pixel chunk."""
    from tungsten_tpu.integrators.photon_map import (
        beam_pass, build_photon_grid, gather_pass, ppm_gamma,
        trace_photons)

    w, h = settings.width, settings.height
    n = w * h
    C = min(WAVEFRONT_CHUNK, n)
    pad = (-n) % C
    pixels = np.arange(n + pad, dtype=np.uint32).reshape(-1, C)
    progressive = settings.integrator_type == "progressive_photon_map"
    if settings.vol_photon_type in ("beams", "planes") and \
            settings.has_media:
        from tungsten_tpu.media.grid import MED_HOMOGENEOUS
        if any(k != MED_HOMOGENEOUS for k in settings.med_kinds):
            # beams'/planes' analytic transmittance covers homogeneous
            # exponential media; fall back to the points estimator
            settings = replace(settings, vol_photon_type="points")

    acc = jnp.zeros((n + pad, 3))
    rays = 0
    B = max(settings.max_bounces - 1, 1)
    for i in range(spp_chunk):
        it = int(sample_start) + i
        # ---- photon pass (fresh photons each iteration) ----
        n_paths = max(settings.photon_count // B, PHOTON_CHUNK)
        chunks = []
        for off in range(0, n_paths, PHOTON_CHUNK):
            cnt = min(PHOTON_CHUNK, n_paths - off)
            ph = trace_photons(scene, settings, cnt,
                               np.uint32((int(seed) + 0x9E3779B9 * it)
                                         & 0xFFFFFFFF),
                               np.uint32(off))
            chunks.append(ph)
        # measured photon-walk ray counts (alive bounces, not the
        # n_paths * B upper bound)
        rays += sum(int(c.pop("rays")) for c in chunks)
        photons = {k: jnp.concatenate([c[k] for c in chunks])
                   for k in chunks[0]}
        photons["power"] = photons["power"] / n_paths

        gamma = ppm_gamma(it, settings.ppm_alpha) if progressive else 1.0
        radius = settings.gather_radius * float(np.sqrt(gamma))
        surf = dict(photons)
        surf["valid"] = photons["valid"] & ~photons["vol"]
        grid = build_photon_grid(surf, radius)
        vgrid = None
        vradius = None
        if settings.has_media:
            # volume photon map: separate accel at the volume gather
            # radius (ref PhotonMapIntegrator volume maps); "beams"
            # builds the 1D beam grid, "points" the 0D point grid.
            # Beams currently assume homogeneous exponential media for
            # their analytic transmittance — heterogeneous or
            # non-exponential scenes fall back to points.
            from tungsten_tpu.integrators.photon_map import (
                build_beam_grid, build_plane_grid, plane_pass)
            vradius = settings.vol_gather_radius * float(np.sqrt(gamma))
            use_beams = settings.vol_photon_type == "beams"
            use_planes = settings.vol_photon_type == "planes"
            if use_beams or use_planes:
                # the beam/plane maps subsample volume_photon_count
                # paths (ref PhotonMapSettings volumePhotonCount):
                # beams/planes are long 1D/2D primitives — a full
                # photon population overflows any per-cell candidate
                # cap in dense media
                n_vb = min(settings.vol_photon_count, n_paths)
                nb = n_vb * B
                sub = {k: v[:nb] for k, v in photons.items()}
                sub["b_pow"] = sub["b_pow"] / n_vb
                if use_beams:
                    vgrid = build_beam_grid(sub, vradius)
                else:
                    # planes mode: planes for interior volume-volume
                    # segments + LOW-ORDER beams for segments rooted on
                    # the light/surfaces (ref lowOrderScattering default
                    # true, PhotonMapIntegrator::buildPlaneGrid)
                    sub["pl_pow"] = sub["pl_pow"] / n_vb
                    vgrid = (build_beam_grid(sub, vradius),
                             build_plane_grid(sub, vradius))
            else:
                vol = dict(photons)
                vol["valid"] = photons["valid"] & photons["vol"]
                vgrid = build_photon_grid(vol, vradius)
            vradius = np.float32(vradius)

        # ---- camera gather pass ----
        use_1d = vgrid is not None and (use_beams or use_planes)
        for ci in range(pixels.shape[0]):
            rad, gr = gather_pass(scene, settings, grid,
                                  np.float32(radius),
                                  jnp.asarray(pixels[ci]), np.uint32(it),
                                  np.uint32(seed),
                                  vgrid=None if use_1d else vgrid,
                                  vradius=vradius)
            rays += int(gr)  # measured camera-walk rays
            if use_1d:
                if use_beams:
                    rad = rad + beam_pass(scene, settings, vgrid, vradius,
                                          jnp.asarray(pixels[ci]),
                                          np.uint32(it), np.uint32(seed))
                else:
                    bgrid, pgrid = vgrid
                    rad = rad + beam_pass(scene, settings, bgrid, vradius,
                                          jnp.asarray(pixels[ci]),
                                          np.uint32(it), np.uint32(seed))
                    rad = rad + plane_pass(scene, settings, pgrid,
                                           jnp.asarray(pixels[ci]),
                                           np.uint32(it), np.uint32(seed))
                rays += C  # beam/plane pass re-traces the primaries
            rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
            acc = acc.at[ci * C:(ci + 1) * C].add(rad)
    return acc[:n].reshape(h, w, 3), rays


def render_pass(scene: FlatScene, settings: RenderSettings, sample_start,
                seed, spp_chunk: int = 1):
    """Render spp_chunk samples per pixel; returns ((H, W, 3) sum, rays)."""
    # spp/seed are runtime inputs, not program shape: normalize them in
    # the static settings so jit/compile-cache keys don't fragment per
    # CLI override (compiles are minutes via the remote service here)
    settings = replace(settings, spp=0, seed=0)
    from tungsten_tpu.utils import rng as _rng
    _rng.set_sampler(settings.stratified_sampler and
                     "mlt" not in settings.integrator_type)
    if settings.integrator_type in ("photon_map", "progressive_photon_map"):
        return _render_pass_photon(scene, settings, sample_start, seed,
                                   spp_chunk)
    if settings.integrator_type in ("kelemen_mlt", "reversible_jump_mlt"):
        from tungsten_tpu.integrators.mlt import render_pass_mlt
        return render_pass_mlt(scene, settings, sample_start, seed,
                               spp_chunk)
    if settings.integrator_type == "multiplexed_mlt":
        from tungsten_tpu.integrators.mlt import render_pass_mmlt
        return render_pass_mmlt(scene, settings, sample_start, seed,
                                spp_chunk)
    w, h = settings.width, settings.height
    n = w * h
    C = min(WAVEFRONT_CHUNK, n)
    pad = (-n) % C
    pixels = np.arange(n + pad, dtype=np.uint32).reshape(-1, C)
    splatting = settings.integrator_type in (
        "bidirectional_path_tracer", "light_tracer")

    acc = jnp.zeros((n + pad, 3))
    rays = 0
    if not splatting:
        # path tracer: staged wavefronts with host-driven compaction.
        # Small frames batch several spp into one wide wave — kernel
        # throughput rises steeply with wavefront width (the cluster
        # traversal is ~1.7x faster at 256k rays than at 64k).
        fb = jnp.zeros((n, 3))
        spp_batch = max(1, min(WAVEFRONT_CHUNK * 4 // max(C, 1), spp_chunk))
        i = 0
        while i < spp_chunk:
            k = min(spp_batch, spp_chunk - i)
            for ci in range(pixels.shape[0]):
                # build the (pixel, sample) ids ON DEVICE: the host-
                # numpy form uploaded ~8 MB per 1M-wide batch through
                # the remote-TPU tunnel (~190 ms — round-5b bench vs
                # staged-jit gap)
                pix = jnp.tile(jnp.arange(ci * C, (ci + 1) * C,
                                          dtype=jnp.uint32), k)
                smp = jnp.repeat(
                    jnp.arange(int(sample_start) + i,
                               int(sample_start) + i + k,
                               dtype=jnp.uint32), C)
                part, r = _trace_chunk_staged(
                    scene, settings, pix, smp, np.uint32(seed), n)
                fb = fb + part
                rays += r
            i += k
        return fb.reshape(h, w, 3), rays
    outs = []
    for i in range(spp_chunk):
        for ci in range(pixels.shape[0]):
            rad, splat, r = _trace_chunk_splat(
                scene, settings, jnp.asarray(pixels[ci]),
                np.uint32(int(sample_start) + i), np.uint32(seed), n)
            outs.append((ci, rad, r, splat))
    for ci, rad, r, splat in outs:
        acc = acc.at[ci * C:(ci + 1) * C].add(rad)
        if splat is not None:
            acc = acc.at[:n].add(splat)
        rays = rays + r
    return acc[:n].reshape(h, w, 3), rays


# --------------------------- adaptive sampling -------------------------
# ref PathTraceIntegrator.cpp:44-134: per-4x4-tile Welford error
# estimates, 95th-percentile clamp, one-texel weight dilation, and
# stochastic per-tile budget allocation after 16 uniform spp.

VARIANCE_TILE = 4
ADAPTIVE_THRESHOLD = 16


@functools.partial(jax.jit, static_argnames=("settings", "n_total", "vt_w",
                                             "n_tiles"))
def _trace_adaptive_chunk(scene, settings, pixel, sample_idx, seed,
                          n_total: int, vt_w: int, n_tiles: int):
    """Trace a wavefront with per-ray sample indices; returns the
    radiance framebuffer part + per-variance-tile (sum, sumsq, count)
    luminance statistics."""
    from tungsten_tpu.integrators.path_tracer import trace_wave
    rad, nrays = trace_wave(scene, settings, pixel, sample_idx,
                            jnp.uint32(seed), with_stats=True)
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
    ok = pixel < n_total
    rad = jnp.where(ok[..., None], rad, 0.0)
    pix = jnp.clip(pixel.astype(jnp.int32), 0, n_total - 1)
    fb = jnp.zeros((n_total, 3)).at[pix].add(rad)
    lum = rad @ jnp.asarray([0.2126, 0.7152, 0.0722])
    px = pix % settings.width
    py = pix // settings.width
    tile = jnp.clip(px // VARIANCE_TILE + (py // VARIANCE_TILE) * vt_w,
                    0, n_tiles - 1)
    zt = jnp.zeros((n_tiles,))
    t_sum = zt.at[tile].add(lum)
    t_sumsq = zt.at[tile].add(lum * lum)
    t_cnt = zt.at[tile].add(ok.astype(jnp.float32))
    return fb, t_sum, t_sumsq, t_cnt, nrays


def adaptive_state_buffers(state: dict) -> dict:
    """The adaptive-sampling state as named checkpoint buffers (ref
    PathTraceIntegrator serializes its SampleRecords + tile samplers,
    PathTraceIntegrator.cpp:158-172; here the tile statistics + sample
    cursors ARE that state — the RNG is counter-based)."""
    return {f"adaptive_{k}": v for k, v in state.items()
            if k != "done"} | {"adaptive_done":
                               np.asarray([state["done"]], np.int64)}


def adaptive_state_from_buffers(buffers: dict) -> dict | None:
    keys = ("fb", "px_count", "t_sum", "t_sumsq", "t_cnt",
            "tile_next_index")
    if not all(f"adaptive_{k}" in buffers for k in keys) or \
            "adaptive_done" not in buffers:
        return None
    st = {k: buffers[f"adaptive_{k}"].copy() for k in keys}
    st["done"] = int(buffers["adaptive_done"][0])
    return st


def render_adaptive(scene: FlatScene, settings: RenderSettings, spp: int,
                    seed: int, verbose: bool = False, state: dict = None,
                    round_cb=None):
    """Adaptive path tracing: uniform warmup then per-tile budget
    redistribution each spp_step round.  Returns (hdr, rays, seconds,
    state); pass a previous `state` to resume, and `round_cb(state)`
    fires after every round (checkpointing hook)."""
    t_start = time.time()
    w, h = settings.width, settings.height
    n = w * h
    vt_w = -(-w // VARIANCE_TILE)
    vt_h = -(-h // VARIANCE_TILE)
    nt = vt_w * vt_h
    settings = replace(settings, spp=0, seed=0)
    from tungsten_tpu.utils import rng as _rng
    _rng.set_sampler(settings.stratified_sampler)

    if state is not None:
        fb = state["fb"].reshape(n, 3).astype(np.float32)
        px_count = state["px_count"].astype(np.float64)
        t_sum = state["t_sum"].copy()
        t_sumsq = state["t_sumsq"].copy()
        t_cnt = state["t_cnt"].copy()
        tile_next_index = state["tile_next_index"].astype(np.int64)
        resume_done = int(state["done"])
    else:
        fb = np.zeros((n, 3), np.float32)
        px_count = np.zeros(n, np.float64)
        t_sum = np.zeros(nt)
        t_sumsq = np.zeros(nt)
        t_cnt = np.zeros(nt)
        tile_next_index = np.zeros(nt, np.int64)  # per-tile cursor
        resume_done = 0

    pix_all = np.arange(n, dtype=np.uint32)
    px_of_tile = None  # lazy: pixel ids grouped by variance tile
    rays = 0

    def snapshot(done):
        return dict(fb=fb, px_count=px_count, t_sum=t_sum,
                    t_sumsq=t_sumsq, t_cnt=t_cnt,
                    tile_next_index=tile_next_index, done=done)

    def run_wave(pixels, samples):
        nonlocal fb, t_sum, t_sumsq, t_cnt, rays
        C = WAVEFRONT_CHUNK
        for off in range(0, len(pixels), C):
            p = pixels[off:off + C]
            s = samples[off:off + C]
            pad = (-len(p)) % min(C, max(len(p), 1))
            if pad:
                p = np.concatenate([p, np.full(pad, n, np.uint32)])
                s = np.concatenate([s, np.zeros(pad, np.uint32)])
            part, ts, tq, tc, nrays = _trace_adaptive_chunk(
                scene, settings, jnp.asarray(p), jnp.asarray(s),
                np.uint32(seed), n, vt_w, nt)
            fb += np.asarray(part)
            t_sum += np.asarray(ts)
            t_sumsq += np.asarray(tq)
            t_cnt += np.asarray(tc)
            rays += int(nrays)

    # ---- uniform warmup ----
    warm = min(ADAPTIVE_THRESHOLD, spp)
    if resume_done < warm:
        for i in range(resume_done, warm):
            run_wave(pix_all, np.full(n, i, np.uint32))
        px_count += warm - resume_done
        tile_next_index += warm - resume_done
        done = warm
    else:
        done = resume_done
    if round_cb is not None:
        round_cb(snapshot(done))

    # ---- adaptive rounds ----
    # NOTE: the round RNG restarts its sequence on resume; per-tile
    # budget draws after a resume differ from the uninterrupted run
    # (sample indices stay collision-free via tile_next_index, so the
    # estimate remains unbiased — only the budget shuffle differs)
    rng_host = np.random.default_rng(seed ^ 0xADA7 ^ done)
    while done < spp:
        step = min(settings.spp_step, spp - done)
        cnt = np.maximum(t_cnt, 2.0)
        mean = t_sum / cnt
        var = np.maximum(t_sumsq - t_sum * mean, 0.0) / (cnt - 1.0)
        err = var / (cnt * np.maximum(mean * mean, 1e-3))
        pos = err[err > 0.0]
        if pos.size == 0:
            break
        max_err = np.sort(pos)[(pos.size * 95) // 100]
        wgt = np.minimum(err, max_err).reshape(vt_h, vt_w)
        # one-texel max dilation (dilateAdaptiveWeights)
        wgt = np.maximum(wgt, np.roll(wgt, -1, 0))
        wgt = np.maximum(wgt, np.roll(wgt, -1, 1))
        wgt = np.maximum(wgt, np.roll(wgt, 1, 0))
        wgt = np.maximum(wgt, np.roll(wgt, 1, 1))
        wgt = wgt.reshape(-1)
        budget = (step - 1) * n // (VARIANCE_TILE * VARIANCE_TILE)
        factor = budget / max(wgt.sum(), 1e-30)
        frac = wgt * factor
        extra = np.floor(frac).astype(np.int64)
        # stochastic rounding of the fractional remainders
        extra += (rng_host.random(nt) < (frac - extra)).astype(np.int64)
        counts = extra + 1  # every tile gets >= 1 sample

        if px_of_tile is None:
            px = pix_all % w
            py = pix_all // w
            tid = px // VARIANCE_TILE + (py // VARIANCE_TILE) * vt_w
            order = np.argsort(tid, kind="stable")
            px_of_tile = (pix_all[order],
                          np.searchsorted(tid[order], np.arange(nt + 1)))
        sorted_pix, starts = px_of_tile
        pixels_l, samples_l = [], []
        for k in range(nt):
            c = int(counts[k])
            tp = sorted_pix[starts[k]:starts[k + 1]]
            if c <= 0 or len(tp) == 0:
                continue
            reps = np.tile(tp, c)
            sidx = np.repeat(tile_next_index[k] + np.arange(c), len(tp))
            pixels_l.append(reps)
            samples_l.append(sidx.astype(np.uint32))
            px_count[tp] += c
        tile_next_index += counts
        run_wave(np.concatenate(pixels_l), np.concatenate(samples_l))
        done += step
        if round_cb is not None:
            round_cb(snapshot(done))
        if verbose:
            print(f"adaptive round done~{done}/{spp} "
                  f"(tile spp {counts.min()}..{counts.max()})")

    img = fb / np.maximum(px_count[:, None], 1.0)
    return (img.reshape(h, w, 3).astype(np.float32), rays,
            time.time() - t_start, snapshot(done))


def render(scene: FlatScene, settings: RenderSettings, spp: int | None = None,
           seed: int | None = None, spp_chunk: int = 1, verbose: bool = False,
           return_stats: bool = False):
    """Render `spp` samples per pixel; returns linear HDR (H, W, 3) numpy."""
    spp = spp if spp is not None else settings.spp
    seed = seed if seed is not None else settings.seed
    if settings.adaptive_sampling and \
            settings.integrator_type == "path_tracer" and \
            spp > ADAPTIVE_THRESHOLD:
        img, rays, secs, _ = render_adaptive(scene, settings, spp, seed,
                                             verbose=verbose)
        if return_stats:
            return img, {"rays": rays, "time": secs,
                         "mrays_per_s": rays / max(secs, 1e-9) / 1e6}
        return img
    acc = None
    done = 0
    total_rays = 0
    elapsed = 0.0
    while done < spp:
        chunk = min(spp_chunk, spp - done)
        t0 = time.time()
        out, rays = render_pass(scene, settings, np.uint32(done),
                                np.uint32(seed), spp_chunk=chunk)
        out.block_until_ready()
        dt = time.time() - t0
        elapsed += dt
        total_rays += int(rays)
        acc = out if acc is None else acc + out
        done += chunk
        if verbose:
            print(f"spp {done}/{spp}  ({dt:.2f}s, "
                  f"{int(rays) / dt / 1e6:.1f} Mrays/s)")
    img = np.asarray(acc) / spp
    if return_stats:
        return img, {"rays": total_rays, "time": elapsed,
                     "mrays_per_s": total_rays / max(elapsed, 1e-9) / 1e6}
    return img


def render_denoise_buffers(scene: FlatScene, settings: RenderSettings,
                           spp: int | None = None, seed: int | None = None):
    """Two-buffer outputs for the NFOR denoiser (ref OutputBuffer's
    two_buffer_variance: half buffers split by sample parity,
    Camera::colorBuffer A/B + feature AOVs, OutputBuffer.hpp:88-130).

    Returns dict(color_a, color_b, color_var, feat_a, feat_b, feat_var)
    with features = [albedo rgb, normal xyz, depth].
    """
    spp = spp if spp is not None else settings.spp
    seed = seed if seed is not None else settings.seed
    # A/B half buffers split by sample parity + Welford variance, from
    # one pass (ref OutputBuffer::addSample two-buffer path)
    bufs, _ = render_with_aovs(scene, settings, spp=max(spp, 2), seed=seed)
    color_a, color_b = bufs["color_a"], bufs["color_b"]
    color_var = bufs["color_variance"]

    def feats(sd):
        aov = render_aovs(scene, settings, seed=np.uint32(sd))
        alb = np.asarray(aov["albedo"])
        nrm = np.asarray(aov["normal"])
        dep = np.asarray(aov["depth"])[..., None]
        return np.concatenate([alb, nrm, dep], axis=-1)

    fa = feats(int(seed) + 2)
    fb = feats(int(seed) + 3)
    fv = (fb - fa) ** 2 * 0.25
    return dict(color_a=color_a, color_b=color_b, color_var=color_var,
                feat_a=fa, feat_b=fb, feat_var=fv)


def render_file(scene_path, output=None, spp=None, resolution=None,
                seed=None, verbose=False):
    """Load a Tungsten scene file, render, tonemap, save; returns HDR."""
    scene, settings = load_flat_scene(scene_path)
    if resolution is not None:
        settings = replace(settings, width=resolution[0], height=resolution[1])
    hdr = render(scene, settings, spp=spp, seed=seed, verbose=verbose)
    if output:
        from tungsten_tpu.io import image as im
        if im.is_hdr(output):
            im.save_hdr(output, hdr)
        else:
            ldr = np.asarray(tonemap(settings.tonemap, jnp.asarray(hdr)))
            im.save_ldr(output, np.clip(ldr, 0, 1))
    return hdr


# ------------------------- output buffers (AOVs + variance) -----------
# ref OutputBuffer<T> (src/core/cameras/OutputBuffer.hpp:88-130): per-AOV
# sample counting, Welford sample_variance (saved as M2/(n*max(n-1,1))),
# two-buffer A/B split by sample parity.  AOVs are captured inside the
# path-trace bounce loop at the first non-specular vertex
# (integrators/path_tracer.py trace_wave_aovs).

@functools.partial(jax.jit, static_argnames=("settings", "n_total"))
def _trace_chunk_aov(scene, settings, pixel, sample_idx, seed,
                     n_total: int):
    from tungsten_tpu.integrators.path_tracer import trace_wave_aovs
    rad, aovs = trace_wave_aovs(scene, settings, pixel, sample_idx,
                                jnp.uint32(seed))
    rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
    ok = pixel < n_total
    rad = jnp.where(ok[..., None], rad, 0.0)
    pix = jnp.clip(pixel.astype(jnp.int32), 0, n_total - 1)
    parity = (sample_idx % 2) == 1
    zc = jnp.zeros((n_total, 3))
    out = {
        "color_sum": zc.at[pix].add(rad),
        "color_sumsq": zc.at[pix].add(rad * rad),
        "color_a": zc.at[pix].add(
            jnp.where(parity[..., None], 0.0, rad)),
        "color_b": zc.at[pix].add(
            jnp.where(parity[..., None], rad, 0.0)),
        "color_n": jnp.zeros((n_total,)).at[pix].add(
            ok.astype(jnp.float32)),
    }
    for k, v in aovs.items():
        v = jnp.where(ok[..., None], v, 0.0)
        val, cnt = v[..., :-1], v[..., -1]
        c = val.shape[-1]
        out[k + "_sum"] = jnp.zeros((n_total, c)).at[pix].add(val)
        # count is 0/1 per sample so val*val == raw^2 * count
        out[k + "_sumsq"] = jnp.zeros((n_total, c)).at[pix].add(val * val)
        out[k + "_n"] = jnp.zeros((n_total,)).at[pix].add(cnt)
    return out


def _finalize_buffers(acc, spp, w, h):
    """Raw accumulators -> mean / A / B / variance-of-the-mean images."""
    def vom(s, sq, n):
        n = np.maximum(n, 1.0)[..., None]
        m2 = np.maximum(sq - s * s / n, 0.0)
        return m2 / (n * np.maximum(n - 1.0, 1.0))

    n_color = np.maximum(acc["color_n"], 1.0)[..., None]
    out = {
        "color": acc["color_sum"] / n_color,
        "color_a": acc["color_a"] / np.maximum((spp + 1) // 2, 1),
        "color_b": acc["color_b"] / np.maximum(spp // 2, 1),
        "color_variance": vom(acc["color_sum"], acc["color_sumsq"],
                              acc["color_n"]),
    }
    for k in ("depth", "normal", "albedo", "visibility"):
        n = np.maximum(acc[k + "_n"], 1.0)[..., None]
        out[k] = acc[k + "_sum"] / n
        out[k + "_variance"] = vom(acc[k + "_sum"], acc[k + "_sumsq"],
                                   acc[k + "_n"])
        out[k + "_n"] = acc[k + "_n"]

    def shape(img):
        if img.shape[-1] == 1:
            return img.reshape(h, w)
        return img.reshape(h, w, img.shape[-1])

    return {k: shape(np.asarray(v, np.float32)) if v.ndim == 2
            else np.asarray(v, np.float32).reshape(h, w)
            for k, v in out.items()}


def render_with_aovs(scene: FlatScene, settings: RenderSettings,
                     spp: int | None = None, seed: int | None = None,
                     acc: dict | None = None, sample_start: int = 0):
    """Render with the full output-buffer set: color (+ A/B half
    buffers by sample parity + Welford variance) and depth/normal/
    albedo/visibility AOVs captured at the first non-specular vertex
    (+ per-AOV variance and sample counts).  Returns (buffers, raw_acc);
    raw_acc round-trips through checkpoint save/load for resume."""
    spp = spp if spp is not None else settings.spp
    seed = seed if seed is not None else settings.seed
    settings = replace(settings, spp=0, seed=0, track_aovs=True)
    from tungsten_tpu.utils import rng as _rng
    _rng.set_sampler(settings.stratified_sampler)
    w, h = settings.width, settings.height
    n = w * h
    C = min(WAVEFRONT_CHUNK, n)
    pad = (-n) % C
    pixels = np.arange(n + pad, dtype=np.uint32).reshape(-1, C)
    for i in range(sample_start, spp):
        for ci in range(pixels.shape[0]):
            part = _trace_chunk_aov(scene, settings,
                                    jnp.asarray(pixels[ci]),
                                    jnp.full((C,), i, jnp.uint32),
                                    np.uint32(seed), n)
            part = {k: np.asarray(v, np.float64) for k, v in part.items()}
            if acc is None:
                acc = part
            else:
                acc = {k: acc[k] + part[k] for k in acc}
    return _finalize_buffers(acc, spp, w, h), acc


def render_aovs(scene: FlatScene, settings: RenderSettings, seed=0,
                spp: int = 4):
    """AOV means only (depth / normal / albedo), captured at the first
    non-specular vertex (ref PathTracer.cpp:78-96).  Thin wrapper over
    render_with_aovs for callers that just want feature buffers."""
    bufs, _ = render_with_aovs(scene, settings, spp=spp, seed=seed)
    return {"depth": bufs["depth"], "normal": bufs["normal"],
            "albedo": bufs["albedo"], "visibility": bufs["visibility"]}
