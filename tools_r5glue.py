"""Round-5 ablation: what does a bounce cost WITHOUT traversal?

Times one bounce body at fixed width with (a) the real pipeline and
(b) bvh_intersect stubbed to instant all-miss — the difference is the
traversal (sort + cull + kernel + unsort); the stub time is the
shading/NEE/RNG/state-update glue.  Run on the real TPU.
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
    for W in (1 << 18, 1 << 20):
        k = W // n
        pixel = jnp.asarray(np.tile(np.arange(n, dtype=np.uint32), k))
        sample = jnp.asarray(np.repeat(np.arange(k, dtype=np.uint32), n))

        @jax.jit
        def jinit(pixel=pixel, sample=sample):
            return pt.init_wave(flat, settings, pixel, sample,
                                jnp.uint32(1))

        state0 = jinit()
        jax.block_until_ready(state0)

        def one_bounce(s):
            return pt._make_bounce_body(flat, settings, jnp.uint32(1))(s)

        f_full = jax.jit(one_bounce)
        t_full = timeit(lambda: jax.block_until_ready(f_full(state0)))

        real = isect.bvh_intersect

        def stub(scene, o, d, t_min, t_max, any_hit=False):
            R = o.shape[0]
            z = jnp.zeros((R,))
            return dict(t=jnp.broadcast_to(jnp.asarray(t_max,
                                                       jnp.float32), (R,)),
                        tri=jnp.full((R,), -1, jnp.int32),
                        sph=jnp.full((R,), -1, jnp.int32),
                        dsk=jnp.full((R,), -1, jnp.int32),
                        cyl=jnp.full((R,), -1, jnp.int32),
                        crv=jnp.full((R,), -1, jnp.int32),
                        u=z, v=z, hit=jnp.zeros((R,), bool))

        isect.bvh_intersect = stub
        pt.bvh_intersect = stub
        try:
            f_stub = jax.jit(one_bounce)
            t_stub = timeit(lambda: jax.block_until_ready(f_stub(state0)))
        finally:
            isect.bvh_intersect = real
            pt.bvh_intersect = real
        print(f"W={W}: bounce full {t_full*1e3:7.1f} ms | "
              f"glue-only {t_stub*1e3:7.1f} ms | "
              f"traversal {(t_full-t_stub)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
