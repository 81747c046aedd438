"""Phase-level TPU profile of the materialtest bench path (VERDICT
round-1 item: committed profile showing where the ms/Kray goes)."""
import time
import numpy as np


def timeit(fn, n=5):
    fn()  # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import intersect as isect
    from bench import simplified_bsdfs

    print("platform:", jax.devices()[0].platform, flush=True)

    # ---- RPC / dispatch overhead ----
    x = jnp.zeros((8, 128))
    f = jax.jit(lambda x: x + 1)
    f(x).block_until_ready()
    t = timeit(lambda: f(x).block_until_ready(), 20)
    print(f"dispatch overhead (tiny jit call): {t*1e3:.2f} ms", flush=True)

    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(flat)
    print("pallas enabled:", isect.USE_PALLAS, flush=True)
    settings = replace(settings, width=256, height=256,
                       seed=0xBA5EBA11, max_bounces=64)

    # ---- raw traversal kernel, coherent primary rays ----
    from tungsten_tpu.cameras.camera import generate_rays
    from tungsten_tpu.ops.wave_trace import wave_intersect
    R = 1 << 20
    pixel = jnp.arange(R, dtype=jnp.uint32) % (256 * 256)
    sample = (jnp.arange(R, dtype=jnp.uint32) // (256 * 256))
    o, d = jax.jit(lambda: generate_rays(
        flat, replace(settings, spp=0), pixel, sample,
        jnp.uint32(1)))()
    o.block_until_ready()
    ncp = flat.wk_boxes.shape[1]

    for phase in (0, 1, 2):
        fn = jax.jit(lambda o=o, d=d, p=phase: wave_intersect(
            flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap,
            flat.wk_sbox, o, d, 1e-4, 3e38, ncp=ncp, debug_phase=p)[0])
        t = timeit(lambda: fn().block_until_ready(), 5)
        print(f"wave_intersect 1M coherent rays, phase={phase}: "
              f"{t*1e3:.1f} ms  ({R/t/1e6:.1f} Mrays/s)", flush=True)

    # incoherent (post-bounce-like) rays: shuffle directions
    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, (R, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (R, 1)) + \
        0.5 * jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    fn2 = jax.jit(lambda: wave_intersect(
        flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap,
        flat.wk_sbox, o2, d2, 1e-4, 3e38, ncp=ncp)[0])
    t = timeit(lambda: fn2().block_until_ready(), 5)
    print(f"wave_intersect 1M incoherent rays: {t*1e3:.1f} ms  "
          f"({R/t/1e6:.1f} Mrays/s)", flush=True)

    # ---- bvh_intersect wrapper (includes sort + pack) ----
    from tungsten_tpu.ops.intersect import bvh_intersect
    fn3 = jax.jit(lambda: bvh_intersect(flat, o, d, 0.0, 3e38)["t"])
    t = timeit(lambda: fn3().block_until_ready(), 5)
    print(f"bvh_intersect wrapper 1M coherent: {t*1e3:.1f} ms  "
          f"({R/t/1e6:.1f} Mrays/s)", flush=True)

    # ---- one full bounce segment at bench widths ----
    from tungsten_tpu.integrators.path_tracer import init_wave, run_bounces
    C = 256 * 256
    k = 4
    pix = jnp.tile(jnp.arange(C, dtype=jnp.uint32), k)
    smp = jnp.repeat(jnp.arange(k, dtype=jnp.uint32), C)
    st0 = jax.jit(lambda: init_wave(flat, settings, pix, smp,
                                    jnp.uint32(1)))()
    jax.block_until_ready(st0)
    W = C * k
    print(f"wavefront width {W}", flush=True)

    runj = jax.jit(lambda s, e: run_bounces(flat, settings,
                                            jnp.uint32(1), s, e))
    s4 = runj(st0, 4)
    jax.block_until_ready(s4)
    t = timeit(lambda: jax.block_until_ready(runj(st0, 4)), 3)
    alive = int(jnp.sum(s4["alive"]))
    rays = int(s4["rays"]) - W
    print(f"run_bounces[0:4] ({W} wide): {t*1e3:.1f} ms, {rays} rays "
          f"-> {rays/t/1e6:.1f} Mrays/s  (alive after: {alive})",
          flush=True)

    t = timeit(lambda: jax.block_until_ready(
        jax.jit(lambda: init_wave(flat, settings, pix, smp,
                                  jnp.uint32(1)))()), 3)
    print(f"init_wave ({W} wide): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "visits":
        visits()
    else:
        main()
