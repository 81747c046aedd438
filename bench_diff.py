#!/usr/bin/env python
"""Differentiable-mode benchmark: forward+backward path-replay
throughput (BASELINE north star "path-replay backprop for pixel
gradients").

Cornell-box, 128x72 @ max_bounces 16, gradients w.r.t. material albedos
+ emitter radiance through trace_wave_replay (custom_vjp around the
bounce loop, O(1) memory in depth).  Metric: fwd+bwd Mrays/s/chip
(rays counted once for the forward trace and once for the backward
replay).  Prints exactly one JSON line.
"""
import json
import time


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dataclasses import replace

    from tungsten_tpu.scene.flatten import load_flat_scene
    from tungsten_tpu.integrators.path_tracer import trace_wave_replay
    from tungsten_tpu.ops import intersect as isect

    scene, settings = load_flat_scene(
        "/root/reference/data/example-scenes/cornell-box/scene.json")
    isect.enable_pallas_if_suitable(scene)
    settings = replace(settings, width=128, height=72, max_bounces=16,
                       spp=0, seed=0)
    n = settings.width * settings.height
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)

    params = {"tex_const": scene.tex_const,
              "light_emission": scene.light_emission}

    @jax.jit
    def loss_and_grad(params):
        sc = scene.replace(**params)

        def loss(params2):
            sc2 = sc.replace(**params2)
            rad = trace_wave_replay(sc2, settings, pixel, sample,
                                    jnp.uint32(0xBA5EBA11))
            return jnp.mean(rad)

        return jax.value_and_grad(loss)(params)

    value = 0.0
    try:
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
        # ray census: ~3 rays per bounce-vertex per pass (continuation +
        # 2 NEE), forward + backward replay = 2 passes; a conservative
        # lower bound uses 8 effective bounces before extinction
        rays = n * 3 * 8 * 2
        if ok:
            value = rays / dt / 1e6
    except Exception:
        value = 0.0
    print(json.dumps({
        "metric": "cornell_replay_fwd_bwd_Mrays_per_s_per_chip",
        "value": round(float(value), 3), "unit": "Mrays/s",
        "vs_baseline": round(float(value) / 100.0, 6)}))


if __name__ == "__main__":
    main()
