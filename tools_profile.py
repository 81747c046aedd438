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
            o, d, 1e-4, 3e38, ncp=ncp, debug_phase=p)[0])
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
        o2, d2, 1e-4, 3e38, ncp=ncp)[0])
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
    main()


def visits():
    """Visit-count + fixed-drain ablation profile."""
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import intersect as isect
    from tungsten_tpu.ops.wave_trace import wave_intersect, BLOCK
    from tungsten_tpu.cameras.camera import generate_rays
    from bench import simplified_bsdfs
    import jax.numpy as jnp

    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    settings = replace(settings, width=256, height=256, max_bounces=64)
    R = 1 << 20
    pixel = jnp.arange(R, dtype=jnp.uint32) % (256 * 256)
    sample = (jnp.arange(R, dtype=jnp.uint32) // (256 * 256))
    o, d = jax.jit(lambda: generate_rays(
        flat, replace(settings, spp=0), pixel, sample, jnp.uint32(1)))()
    ncp = flat.wk_boxes.shape[1]

    import numpy as np
    import time

    def run(o, d, phase=2):
        G = R // BLOCK
        import functools
        # raw pallas call to read the count row
        from jax.experimental import pallas as pl
        from tungsten_tpu.ops import wave_trace as wt
        t, tri, u, v = wave_intersect(
            flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap,
            o, d, 1e-4, 3e38, ncp=ncp, debug_phase=phase)
        return t

    # visit counts: re-run and fetch res row 3 via a modified call
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tungsten_tpu.ops.wave_trace import _make_kernel, FCOLS
    G = R // BLOCK

    def full_call(o, d):
        m = jnp.cross(o, d)
        tmin_c = jnp.full((R, 1), 1e-4)
        tmax_c = jnp.full((R, 1), 3e38)
        f = jnp.concatenate([o, d, m, jnp.ones((R, 1)), tmin_c, tmax_c,
                             jnp.zeros((R, 4))], axis=1)
        f = f.reshape(G, BLOCK, FCOLS).transpose(0, 2, 1)
        live = (tmax_c > 0).reshape(G, 8, 128, 1)
        od = jnp.concatenate([o, d], axis=1).reshape(G, 8, 128, 6)
        wlo = jnp.min(jnp.where(live, od, 3e38), axis=2)
        whi = jnp.max(jnp.where(live, od, -3e38), axis=2)
        w = jnp.concatenate([
            wlo[..., 0:3], whi[..., 0:3], wlo[..., 3:6], whi[..., 3:6],
            jnp.full((G, 8, 1), 1e-4), jnp.full((G, 8, 1), 3e38),
            jnp.ones((G, 8, 1)), jnp.zeros((G, 8, 1))], axis=-1)
        res, tri = pl.pallas_call(
            _make_kernel(ncp, False, 2), grid=(G,),
            in_specs=[pl.BlockSpec((None, FCOLS, BLOCK),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((None, 8, 16), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((None, 8, BLOCK),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((None, 8, BLOCK),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.float32),
                       jax.ShapeDtypeStruct((G, 8, BLOCK), jnp.int32)],
            scratch_shapes=[pltpu.VMEM((16, 512), jnp.float32),
                            pltpu.VMEM((8, ncp), jnp.float32)],
        )(f, w, flat.wk_boxes, flat.wk_cbox, flat.wk_attr)
        return res[:, 3, 0]

    fc = jax.jit(full_call)
    counts = np.asarray(fc(o, d))
    print(f"coherent visits/block: mean={counts.mean():.1f} "
          f"p50={np.median(counts):.0f} p95={np.percentile(counts,95):.0f} "
          f"max={counts.max():.0f} total_blocks={len(counts)}", flush=True)

    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, (R, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (R, 1)) + \
        0.5 * jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    counts2 = np.asarray(fc(o2, d2))
    print(f"incoherent visits/block: mean={counts2.mean():.1f} "
          f"p95={np.percentile(counts2,95):.0f} max={counts2.max():.0f}",
          flush=True)

    fn3 = jax.jit(lambda: run(o, d, 3))
    t = timeit(lambda: fn3().block_until_ready(), 5)
    print(f"fixed 16-visit drain: {t*1e3:.1f} ms "
          f"({t/ (R//BLOCK) / 16 * 1e6:.2f} us/visit)", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "visits":
        visits()
    else:
        main()
