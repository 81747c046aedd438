"""Round-5 glue bisection, pass 2: env-light stages + full _nee with
stubbed traversal + the emitter-hit block."""
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
    from tungsten_tpu.integrators import lights as L
    from tungsten_tpu.bsdf.eval import ShadePoint
    from tungsten_tpu.utils import rng
    from tungsten_tpu.utils import vecmath as vm
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

    @jax.jit
    def jinit():
        return pt.init_wave(flat, settings, pixel, sample, jnp.uint32(1))

    s = jinit()
    jax.block_until_ready(s)
    seed = jnp.uint32(1)

    def t_of(name, fn):
        f = jax.jit(fn)
        t = timeit(lambda: jax.block_until_ready(f(s)))
        print(f"{name:28s} {t*1e3:8.2f} ms", flush=True)

    t_of("env_eval", lambda s: L.env_eval(flat, s["d"]))
    t_of("env_pdf", lambda s: L.env_pdf(flat, s["d"]))

    def stage_env_sample(s):
        u1, u2 = rng.random_2d(seed, s["pixel"], s["sample"], 1)
        return L.env_sample(flat, u1, u2)
    t_of("env_sample", stage_env_sample)

    def stage_bitmap(s):
        uv = jnp.stack([s["u"], s["v"]], -1)
        from tungsten_tpu.scene.textures import sample_bitmap
        return sample_bitmap(flat.env_image, uv)
    t_of("sample_bitmap 512x1024", stage_bitmap)

    # full _nee with traversal stubbed
    real = isect.bvh_intersect

    def stub(scene, o, d, t_min, t_max, any_hit=False):
        R = o.shape[0]
        z = jnp.zeros((R,))
        return dict(t=jnp.broadcast_to(jnp.asarray(t_max, jnp.float32),
                                       (R,)),
                    tri=jnp.full((R,), -1, jnp.int32),
                    sph=jnp.full((R,), -1, jnp.int32),
                    dsk=jnp.full((R,), -1, jnp.int32),
                    cyl=jnp.full((R,), -1, jnp.int32),
                    crv=jnp.full((R,), -1, jnp.int32),
                    u=z, v=z, hit=jnp.zeros((R,), bool))

    def stage_nee(s):
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        ctx = dict(p=info["p"], is_volume=jnp.zeros_like(s["alive"]),
                   sp=sp, frame=(tan, bit, ns), wi_local=wi,
                   ray_d=s["d"], medium=None, gate=s["alive"])
        return pt._nee(flat, settings, ctx, seed, s["pixel"], s["sample"],
                       rng.DIMS_CAMERA)

    isect.bvh_intersect = stub
    pt.bvh_intersect = stub
    try:
        t_of("expand+frame+NEE (stub trace)", stage_nee)
    finally:
        isect.bvh_intersect = real
        pt.bvh_intersect = real
    t_of("expand+frame+NEE (real trace)", stage_nee)

    # emitter-hit block approximation: prim gathers + env escape eval
    def stage_emit(s):
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        etex = flat.prim_emission_tex[info["prim"]]
        samplable = flat.prim_light[info["prim"]] >= 0
        li = jnp.clip(flat.prim_light[info["prim"]], 0,
                      max(flat.light_emission.shape[0] - 1, 0))
        lpdf = L.area_light_direct_pdf(flat, li, s["t"], s["d"],
                                       info["ng"])
        env_val = L.env_eval(flat, s["d"])
        epdf = L.env_pdf(flat, s["d"])
        return etex, samplable, lpdf, env_val, epdf
    t_of("emitter-hit block", stage_emit)


if __name__ == "__main__":
    main()
