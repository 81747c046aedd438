#!/usr/bin/env python
"""Differentiable-mode benchmark: forward+backward path-replay
throughput (BASELINE north star "path-replay backprop for pixel
gradients").

Two configs, printed as one JSON line each:
  * materialtest 256x256, the SAME scene/resolution as bench.py's
    forward headline so fwd and fwd+bwd are directly comparable
    (round-3 verdict: "benchmarks aren't comparable across modes").
  * cornell-box 128x72 @ max_bounces 16 (the round-3 metric, kept for
    round-over-round continuity).

Gradients w.r.t. material albedos + emitter radiance through
trace_wave_replay (custom_vjp around the bounce loop, O(1) memory in
depth).  Ray counts are MEASURED: the forward tracer's per-bounce alive
census (trace_wave with_stats) counted once for the forward pass and
once for the backward replay (the replay re-traces the identical path
set bit-exactly).
"""
import json
import time


def run_config(name, scene, settings, pixel, sample, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tungsten_tpu.integrators.path_tracer import (
        trace_wave, trace_wave_replay)

    params = {"tex_const": scene.tex_const,
              "light_emission": scene.light_emission}

    @jax.jit
    def measured_rays():
        _, r = trace_wave(scene, settings, pixel, sample,
                          jnp.uint32(seed), with_stats=True)
        return r

    @jax.jit
    def loss_and_grad(params):
        sc = scene.replace(**params)

        def loss(params2):
            sc2 = sc.replace(**params2)
            rad = trace_wave_replay(sc2, settings, pixel, sample,
                                    jnp.uint32(seed))
            return jnp.mean(rad)

        return jax.value_and_grad(loss)(params)

    value = 0.0
    try:
        rays_fwd = int(measured_rays())
        l, g = loss_and_grad(params)          # compile + warm
        jax.block_until_ready(g)
        reps = 4
        t0 = time.time()
        for _ in range(reps):
            l, g = loss_and_grad(params)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / reps
        ok = bool(np.isfinite(float(l))) and all(
            np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
        rays = rays_fwd * 2  # forward trace + backward replay
        if ok:
            value = rays / dt / 1e6
    except Exception as e:
        import sys
        print(f"{name} failed: {type(e).__name__}: {e}", file=sys.stderr)
        value = 0.0
    print(json.dumps({
        "metric": f"{name}_replay_fwd_bwd_Mrays_per_s_per_chip",
        "value": round(float(value), 3), "unit": "Mrays/s",
        "vs_baseline": round(float(value) / 100.0, 6)}))


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax.numpy as jnp
    from dataclasses import replace

    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene, load_flat_scene
    from tungsten_tpu.ops import intersect as isect
    from bench import simplified_bsdfs

    # --- materialtest, bench.py's exact forward config ---
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    scene, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(scene)
    settings = replace(settings, width=256, height=256, spp=0, seed=0,
                       max_bounces=64)
    n = settings.width * settings.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    run_config("materialtest", scene, settings, pixel, sample, 0xBA5EBA11)

    # --- cornell-box, the round-3 metric ---
    scene, settings = load_flat_scene(
        "/root/reference/data/example-scenes/cornell-box/scene.json")
    isect.enable_pallas_if_suitable(scene)
    settings = replace(settings, width=128, height=72, max_bounces=16,
                       spp=0, seed=0)
    n = settings.width * settings.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    run_config("cornell", scene, settings, pixel, sample, 0xBA5EBA11)


if __name__ == "__main__":
    main()
