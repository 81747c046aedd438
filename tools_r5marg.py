"""Round-5: dispatch-free per-bounce decomposition via MARGINAL costs.

run_bounces[0:k] for k=1..5, (a) real pipeline, (b) traversal stubbed
to all-miss (paths die, but the marginal cost of a bounce is width-
bound, not population-bound — round-4 evidence).  The marginal
difference isolates the true in-context traversal cost per bounce;
dispatch overhead cancels in the differences.
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


def run(stubbed):
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import intersect as isect
    from tungsten_tpu.integrators import path_tracer as pt
    from bench import simplified_bsdfs

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

    @jax.jit
    def jinit():
        return pt.init_wave(flat, settings, pixel, sample, jnp.uint32(1))

    state0 = jinit()
    jax.block_until_ready(state0)

    real = isect.bvh_intersect

    T = flat.tri_v0.shape[0]

    def stub(scene, o, d, t_min, t_max, any_hit=False, **kw):
        # every ray hits a pseudo-random triangle at t=1: keeps the
        # wavefront alive and the shading gathers index-diverse so the
        # glue marginal stays representative
        R = o.shape[0]
        z = jnp.zeros((R,))
        tri = (jax.lax.bitcast_convert_type(o[:, 0], jnp.int32)
               & 0x7FFFFFFF) % T
        return dict(t=jnp.ones((R,)),
                    tri=tri,
                    sph=jnp.full((R,), -1, jnp.int32),
                    dsk=jnp.full((R,), -1, jnp.int32),
                    cyl=jnp.full((R,), -1, jnp.int32),
                    crv=jnp.full((R,), -1, jnp.int32),
                    u=z + 0.3, v=z + 0.3,
                    hit=jnp.ones((R,), bool))

    if stubbed:
        isect.bvh_intersect = stub
        pt.bvh_intersect = stub
    try:
        prev = 0.0
        marg = []
        for kk in range(1, 6):
            # force alive so stubbed paths don't die: keep hit/alive
            fn = jax.jit(lambda s, kk=kk: pt.run_bounces(
                flat, settings, jnp.uint32(1), s, kk))
            t = timeit(lambda: jax.block_until_ready(fn(state0)))
            marg.append((t - prev) * 1e3)
            prev = t
        label = "STUB" if stubbed else "REAL"
        print(f"{label} marginals (ms): " +
              " ".join(f"{m:7.1f}" for m in marg), flush=True)
    finally:
        isect.bvh_intersect = real
        pt.bvh_intersect = real


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    run(False)
    run(True)


if __name__ == "__main__":
    main()
