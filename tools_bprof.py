"""Bounce-loop stage decomposition on the real TPU (round-4: find where
the end-to-end ms goes — the kernel drain got 1.6-1.7x faster in v7 yet
bench.py stayed at 1.26 Mrays/s, so the wall is elsewhere).

Times, at the production wavefront width:
  * init_wave (camera rays + primary intersect)
  * run_bounces one bounce at a time (marginal cost per bounce)
  * standalone: the 3R ray sort, the phase-A cull, the kernel dispatch
    floor, the un-permute sort, and a full 3R bvh_intersect
"""
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
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(flat)
    settings = replace(settings, width=256, height=256, seed=0,
                       max_bounces=64, spp=0)
    W = 262144
    pixel = jnp.asarray(np.tile(np.arange(256 * 256, dtype=np.uint32),
                                4)[:W])
    sample = jnp.asarray(np.repeat(np.arange(4, dtype=np.uint32),
                                   256 * 256)[:W])

    from tungsten_tpu.integrators.path_tracer import init_wave, run_bounces

    @jax.jit
    def jinit():
        return init_wave(flat, settings, pixel, sample, jnp.uint32(1))

    state0 = jinit()
    jax.block_until_ready(state0)
    t = timeit(lambda: jax.block_until_ready(jinit()))
    print(f"init_wave ({W} wide, camera+primary isect): {t*1e3:7.1f} ms",
          flush=True)

    # marginal per-bounce cost: run to bounce k for k = 1..6
    prev = 0.0
    states = {0: state0}
    for k in range(1, 7):
        fn = jax.jit(lambda s, k=k: run_bounces(
            flat, settings, jnp.uint32(1), s, k))
        t = timeit(lambda: jax.block_until_ready(fn(state0)))
        st = fn(state0)
        alive = int(jnp.sum(st["alive"]))
        print(f"run_bounces[0:{k}]: {t*1e3:7.1f} ms  (marginal "
              f"{(t-prev)*1e3:6.1f} ms, alive after = {alive})", flush=True)
        prev = t
    rays = int(st["rays"])
    print(f"rays through bounce 6: {rays} -> "
          f"{rays/prev/1e6:.2f} Mrays/s", flush=True)

    # ---- standalone stage costs at the bounce-batch width (3R) ----
    R3 = 3 * W
    rng = np.random.default_rng(0)
    o3 = jnp.asarray(rng.uniform(-1, 1, (R3, 3)).astype(np.float32))
    d3 = rng.normal(size=(R3, 3)).astype(np.float32)
    d3 = jnp.asarray(d3 / np.linalg.norm(d3, axis=-1, keepdims=True))
    tmin3 = jnp.zeros((R3,))
    tmax3 = jnp.full((R3,), 3e38)

    f = jax.jit(lambda o, d, a, b: isect._sort_for_wave(flat, o, d, a, b))
    t = timeit(lambda: jax.block_until_ready(f(o3, d3, tmin3, tmax3)))
    print(f"_sort_for_wave ({R3} rays, 10-operand sort): {t*1e3:7.1f} ms",
          flush=True)

    from tungsten_tpu.ops import wave_trace as wt
    G = R3 // wt.BLOCK
    f = jax.jit(lambda o, d: wt._cull_sorted_supers(
        o, d, tmin3[:, None], tmax3[:, None], flat.wk_sbox, G))
    t = timeit(lambda: jax.block_until_ready(f(o3, d3)))
    print(f"phase-A cull ({R3} rays): {t*1e3:7.1f} ms", flush=True)

    # un-permute: sort 5 operands back on the original index
    order = jnp.asarray(rng.permutation(R3).astype(np.int32))
    vals = [jnp.zeros((R3,)), jnp.zeros((R3,), jnp.int32),
            jnp.zeros((R3,)), jnp.zeros((R3,))]

    @jax.jit
    def unperm(order, *vals):
        return jax.lax.sort([order, *vals], num_keys=1, is_stable=False)

    t = timeit(lambda: jax.block_until_ready(unperm(order, *vals)))
    print(f"un-permute sort ({R3} rays, 5 operands): {t*1e3:7.1f} ms",
          flush=True)

    f = jax.jit(lambda o, d: isect.bvh_intersect(flat, o, d, 0.0, 3e38))
    t = timeit(lambda: jax.block_until_ready(f(o3, d3)))
    print(f"bvh_intersect full ({R3} incoherent): {t*1e3:7.1f} ms "
          f"({R3/t/1e6:.1f} Mrays/s)", flush=True)

    f = jax.jit(lambda o, d: isect.bvh_intersect(flat, o, d, 0.0, 3e38,
                                                 any_hit=True))
    t = timeit(lambda: jax.block_until_ready(f(o3, d3)))
    print(f"bvh_intersect any-hit ({R3} incoherent): {t*1e3:7.1f} ms "
          f"({R3/t/1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    main()
