"""Round-5b: in-context kernel decomposition via slopes on CAPTURED
bounce rays (262k wide, sorted exactly as the body launches them).

For each phase (0 = IO only, 1 = consume cull lists, 2 = full drain)
run wave_intersect N times dependency-chained inside ONE jit (tmax
perturbed per rep so CSE can't collapse), fetch one scalar, and take
the slope.  Also times the closest vs any-hit epilogue and the full
_sort_for_wave + phase-A-only form.
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
    from tungsten_tpu.ops import wave_trace as wt
    from tungsten_tpu.integrators import path_tracer as pt
    from bench import simplified_bsdfs

    print("platform:", jax.devices()[0].platform, flush=True)
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    isect.enable_pallas_if_suitable(flat)
    settings = replace(settings, width=256, height=256, seed=0, spp=0,
                       max_bounces=64)
    n = 256 * 256
    W = 1 << 18
    k = W // n
    pixel = jnp.asarray(np.tile(np.arange(n, dtype=np.uint32), k))
    sample = jnp.asarray(np.repeat(np.arange(k, dtype=np.uint32), n))

    state = pt.init_wave(flat, settings, pixel, sample, jnp.uint32(1))
    state = pt.run_bounces(flat, settings, jnp.uint32(1), state, 2)
    alive = jnp.asarray(state["alive"])
    o = jnp.asarray(state["o"])
    d = jnp.asarray(state["d"])
    tmax0 = jnp.where(alive, wt.INF, 0.0)
    # body-sort order (what the closest launch sees)
    key = isect.ray_sort_key(flat, o, d, ~alive)
    _, order = jax.lax.sort(
        [key, jnp.arange(W, dtype=jnp.int32)], num_keys=1, is_stable=True)
    o = o[order]
    d = d[order]
    tmax0 = tmax0[order]
    ncp = flat.wk_boxes.shape[1]

    N = 8

    def chain(phase, any_hit):
        def f(o, d, tmax):
            acc = jnp.float32(0.0)
            for i in range(N):
                t, tri, u, v = wt.wave_intersect(
                    flat.wk_boxes, flat.wk_cbox, flat.wk_attr,
                    flat.wk_remap, flat.wk_sbox, o, d,
                    jnp.zeros((W,)) + acc * 1e-30, tmax, ncp=ncp,
                    any_hit=any_hit, debug_phase=phase,
                    tri_v0=None if any_hit else flat.tri_v0,
                    tri_e1=None if any_hit else flat.tri_e1,
                    tri_e2=None if any_hit else flat.tri_e2)
                acc = acc + jnp.sum(t) + jnp.sum(tri.astype(jnp.float32))
            return acc

        jf = jax.jit(f)
        # one-shot version for the intercept
        def f1(o, d, tmax):
            t, tri, u, v = wt.wave_intersect(
                flat.wk_boxes, flat.wk_cbox, flat.wk_attr,
                flat.wk_remap, flat.wk_sbox, o, d,
                jnp.zeros((W,)), tmax, ncp=ncp, any_hit=any_hit,
                debug_phase=phase,
                tri_v0=None if any_hit else flat.tri_v0,
                tri_e1=None if any_hit else flat.tri_e1,
                tri_e2=None if any_hit else flat.tri_e2)
            return jnp.sum(t) + jnp.sum(tri.astype(jnp.float32))
        j1 = jax.jit(f1)
        tN = timeit(lambda: np.asarray(jf(o, d, tmax0)))
        t1 = timeit(lambda: np.asarray(j1(o, d, tmax0)))
        slope = (tN - t1) / (N - 1) * 1e3
        print(f"phase={phase} any_hit={any_hit}: slope {slope:6.2f} "
              f"ms/call (t1={t1*1e3:6.1f} tN={tN*1e3:6.1f})", flush=True)
        return slope

    full_c = chain(2, False)
    full_a = chain(2, True)
    cull = chain(1, False)
    io = chain(0, False)
    print(f"drain closest ~ {full_c - cull:6.2f} ms, any-hit ~ "
          f"{full_a - cull:6.2f} ms, cull+sortA ~ {cull - io:6.2f} ms, "
          f"io ~ {io:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
