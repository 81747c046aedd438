"""Kernel-only A/B profile for the wave traversal (fast: no renderer).

Usage: python tools_kprof.py            # timings, coherent + incoherent
       python tools_kprof.py counts     # visit counters (debug rows)
Run on the real TPU. Prints ms / 1M rays per phase so rewrites land
with before/after evidence (VERDICT r2 rule).
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


def main(mode="time"):
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.cameras.camera import generate_rays
    from tungsten_tpu.ops import wave_trace as wt
    from bench import simplified_bsdfs

    print("platform:", jax.devices()[0].platform, flush=True)
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    settings = replace(settings, width=256, height=256, max_bounces=64)
    R = 1 << 20
    pixel = jnp.arange(R, dtype=jnp.uint32) % (256 * 256)
    sample = (jnp.arange(R, dtype=jnp.uint32) // (256 * 256))
    o, d = jax.jit(lambda: generate_rays(
        flat, replace(settings, spp=0), pixel, sample, jnp.uint32(1)))()
    o.block_until_ready()

    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, (R, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (R, 1)) + \
        0.5 * jax.random.normal(jax.random.PRNGKey(1), (R, 3))

    # the production path sorts rays before the kernel; mirror it here
    from tungsten_tpu.ops.intersect import _sort_for_wave
    o2s, d2s = _sort_for_wave(flat, o2, d2)

    kw = dict(ncp=flat.wk_boxes.shape[1])
    if hasattr(flat, "wk_sbox"):
        args = (flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap,
                flat.wk_sbox)
    else:
        args = (flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap)

    if mode == "counts":
        for name, (oo, dd) in (("coherent", (o, d)),
                               ("incoherent", (o2s, d2s))):
            res = jax.jit(lambda oo=oo, dd=dd: wt.wave_intersect(
                *args, oo, dd, 1e-4, 3e38, debug_rows=True, **kw))()
            vis = np.asarray(res[-2])     # per-block cluster visits
            sup = np.asarray(res[-1])     # per-block super visits
            print(f"{name}: cluster visits/block mean={vis.mean():.1f} "
                  f"p95={np.percentile(vis, 95):.0f} max={vis.max():.0f}; "
                  f"super visits/block mean={sup.mean():.1f}", flush=True)
        return

    for name, (oo, dd) in (("coherent", (o, d)), ("incoherent", (o2s, d2s))):
        phases = (0, 1, 3, 2) if name == "coherent" else (2,)
        for phase in phases:
            fn = jax.jit(lambda oo=oo, dd=dd, p=phase: wt.wave_intersect(
                *args, oo, dd, 1e-4, 3e38, debug_phase=p, **kw)[0])
            t = timeit(lambda: fn().block_until_ready(), 5)
            print(f"{name} 1M rays phase={phase}: {t*1e3:7.1f} ms  "
                  f"({R/t/1e6:6.1f} Mrays/s)", flush=True)
        fn = jax.jit(lambda oo=oo, dd=dd: wt.wave_intersect(
            *args, oo, dd, 1e-4, 3e38, any_hit=True, **kw)[0])
        t = timeit(lambda: fn().block_until_ready(), 5)
        print(f"{name} 1M rays any_hit: {t*1e3:7.1f} ms  "
              f"({R/t/1e6:6.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main("counts" if len(sys.argv) > 1 and sys.argv[1] == "counts"
         else "time")
