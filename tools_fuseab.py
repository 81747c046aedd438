"""A/B: fused single-program staged loop (trace_wave_staged) vs the
round-3 host-driven schedule (init/run/bank/compact with a host sync per
bounce) on the real TPU, materialtest at bench widths.  Run ALONE on an
idle machine — host contention poisons both numbers.
"""
import time

import numpy as np


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
    from tungsten_tpu import render as RE

    print("platform:", jax.devices()[0].platform, flush=True)
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(flat)
    settings = replace(settings, width=256, height=256, seed=0,
                       max_bounces=64, spp=0)
    n = 256 * 256
    K = 16  # spp per batch, matching bench.py's one staged call
    pix = np.tile(np.arange(n, dtype=np.uint32), K)
    smp = np.repeat(np.arange(K, dtype=np.uint32), n)
    pixel = jnp.asarray(pix)
    sample = jnp.asarray(smp)

    def timeit(fn, reps=3):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return min(ts)

    # --- fused ---
    def fused():
        fb, rays = RE._jit_staged(flat, settings, pixel, sample,
                                  np.uint32(1), n, RE.MIN_WAVE, 2)
        jax.block_until_ready(fb)
        return int(rays)

    t_f = timeit(fused)
    rays = fused()
    print(f"fused:  {t_f*1e3:8.1f} ms  rays={rays}  "
          f"{rays/t_f/1e6:6.2f} Mrays/s", flush=True)

    # --- host-driven (round-3 schedule, per-bounce sync) ---
    def hostloop():
        state = RE._jit_init(flat, settings, pixel, sample, np.uint32(1))
        fb = None
        width = pixel.shape[0]
        bounce = 0
        seg = 1
        while True:
            state = RE._jit_run(flat, settings, np.uint32(1), state,
                                min(bounce + seg, settings.max_bounces))
            bounce += seg
            if bounce >= settings.max_bounces:
                break
            alive = int(jnp.sum(state["alive"]))
            if alive == 0:
                break
            w = width
            while w // 2 >= max(alive, RE.MIN_WAVE):
                w //= 2
            if w < width:
                part = RE._jit_bank(state, n)
                fb = part if fb is None else fb + part
                state = RE._jit_compact(state, w)
                width = w
        part = RE._jit_bank(state, n)
        fb = part if fb is None else fb + part
        jax.block_until_ready(fb)
        return int(state["rays"])

    t_h = timeit(hostloop)
    rays_h = hostloop()
    print(f"host:   {t_h*1e3:8.1f} ms  rays={rays_h}  "
          f"{rays_h/t_h/1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
