"""Round-5 A/B driver: end-to-end staged-wave timings on the real TPU.

Usage: python tools_r5ab.py fused      # round-4 fused 2R closest shadow
       python tools_r5ab.py anyhit     # shadow rays via any-hit drain
       python tools_r5ab.py width      # wavefront width sweep (anyhit)

Each variant times trace_wave_staged at the bench config (materialtest,
simplified bsdfs, 64 bounces) and prints ms + Mrays/s.  One variant per
process: SHADOW_ANY_HIT is a module flag, not a jit cache key.
"""
import sys
import time

import numpy as np


def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main(mode):
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import intersect as isect
    from tungsten_tpu.integrators import path_tracer as pt
    from bench import simplified_bsdfs

    pt.SHADOW_ANY_HIT = mode != "fused"
    if mode == "nosort":
        isect.SORT_RAYS = False
    if mode == "shsort":
        pt.SHADOW_OWN_SORT = True
    if mode == "q2":
        from tungsten_tpu.ops import wave_trace as wt
        wt.LEAF_Q = 2
    mw, step = 4096, 2
    if mode == "mw1024":
        mw = 1024
    if mode == "mw512":
        mw = 512
    if mode == "step4":
        step = 4
    print("platform:", jax.devices()[0].platform,
          "shadow_any_hit:", pt.SHADOW_ANY_HIT,
          "sort:", isect.SORT_RAYS, flush=True)

    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(flat)
    settings = replace(settings, width=256, height=256, seed=0, spp=0,
                       max_bounces=64)

    n = 256 * 256
    widths = (1 << 20,) if mode != "width" else \
        (1 << 18, 1 << 19, 1 << 20)
    for R in widths:
        k = R // n
        pixel = jnp.asarray(np.tile(np.arange(n, dtype=np.uint32), k))
        sample = jnp.asarray(np.repeat(np.arange(k, dtype=np.uint32), n))

        from tungsten_tpu.render import _jit_staged
        fb, rays = _jit_staged(flat, settings, pixel, sample,
                               np.uint32(1), n, mw, step)
        jax.block_until_ready(fb)
        t = timeit(lambda: jax.block_until_ready(_jit_staged(
            flat, settings, pixel, sample, np.uint32(1), n, mw, step)))
        r = int(rays)
        print(f"staged wave R={R}: {t*1e3:7.1f} ms  {r} rays -> "
              f"{r/t/1e6:5.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "anyhit")
