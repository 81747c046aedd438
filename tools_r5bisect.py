"""Round-5 glue bisection: time each sub-stage of the bounce body
standalone at bench width to find where the ~400 ns/ray goes."""
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
    from tungsten_tpu.bsdf.eval import (ShadePoint, bsdf_eval, bsdf_pdf,
                                        bsdf_sample)
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

    # stage: hit expansion
    t_of("expand_hit", lambda s: pt._expand_hit(flat, s["o"], s["d"], s))

    # stage: rng (the bounce's full dim budget)
    def stage_rng(s):
        outs = []
        for dim in range(12):
            outs.append(rng.random_1d(seed, s["pixel"], s["sample"], dim))
        return jnp.stack(outs)
    t_of("rng x12", stage_rng)

    # stage: shading frame + bsdf sample
    def stage_bsdf(s):
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        ul = rng.random_1d(seed, s["pixel"], s["sample"], 3)
        u1, u2 = rng.random_2d(seed, s["pixel"], s["sample"], 4)
        ul2 = rng.random_1d(seed, s["pixel"], s["sample"], 6)
        return bsdf_sample(sp, wi, ul, u1, u2,
                           settings.present_bsdf_types, u_lobe2=ul2)
    t_of("expand+frame+bsdf_sample", stage_bsdf)

    # stage: bsdf eval + pdf at a fixed direction
    def stage_eval(s):
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        wo = vm.to_local(tan, bit, ns, s["d"])
        return (bsdf_eval(sp, wi, wo, settings.present_bsdf_types),
                bsdf_pdf(sp, wi, wo, settings.present_bsdf_types))
    t_of("expand+frame+eval+pdf", stage_eval)

    # stage: light sample math only (no shadow trace)
    def stage_light(s):
        p = s["o"]
        u_sel = rng.random_1d(seed, s["pixel"], s["sample"], 0)
        u1, u2 = rng.random_2d(seed, s["pixel"], s["sample"], 1)
        u_tri = rng.random_1d(seed, s["pixel"], s["sample"], 2)
        li, w = L.choose_light(flat, settings, p, u_sel)
        a = L.area_light_sample(flat, li, p, u_tri, u1, u2)
        return a["d"], a["pdf"], w
    t_of("choose+area_light_sample", stage_light)

    # stage: state assembly (wheres over the full state dict)
    def stage_state(s):
        alive = s["alive"]
        out = {}
        for k2, v in s.items():
            if hasattr(v, "ndim") and v.ndim >= 1 and \
                    v.shape[0] == s["o"].shape[0]:
                out[k2] = jnp.where(
                    alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, v)
            else:
                out[k2] = v
        return out
    t_of("state where-pass", stage_state)

    # whole bounce for reference
    body = pt._make_bounce_body(flat, settings, seed)
    t_of("FULL bounce", body)


if __name__ == "__main__":
    main()
