"""Round-5 slope profiler v2 — hardened against the measurement traps
found in round 5 (PROFILE_r05.md): state ALWAYS passed as jit args
(closures constant-fold), stage outputs reduced over FULL arrays (a
[0] index lets XLA DCE all other lanes' ops), per-iteration input
perturbation (CSE), fetch-timed (block_until_ready returns early on
this backend), slope of reps (dispatch cancels)."""
import time

import numpy as np


def fetch_time(f, args, n=4):
    np.asarray(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(f(*args))
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
    from tungsten_tpu.bsdf.eval import ShadePoint, bsdf_sample
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

    s0 = jinit()
    jax.block_until_ready(s0)
    seed = jnp.uint32(1)

    def sall(x):
        return jnp.sum(x.astype(jnp.float32)) * 1e-9

    def slope(name, make, hi=4):
        def runner(reps):
            @jax.jit
            def f(s):
                acc = jnp.float32(0.0)
                for i in range(reps):
                    acc = acc + make(i, s, acc)
                return acc
            return fetch_time(f, (s0,))
        t1, th = runner(1), runner(hi)
        per = (th - t1) / (hi - 1) * 1e3
        print(f"{name:34s} {per:8.2f} ms/pass", flush=True)

    def perturb(s, i, acc):
        s = dict(s)
        s["o"] = s["o"] + acc * 1e-20 + i * 1e-7
        s["d"] = s["d"] / jnp.linalg.norm(s["d"], axis=-1, keepdims=True)
        return s

    def st_expand(i, s, acc):
        s = perturb(s, i, acc)
        # tri indices must vary per pass or the gathers CSE
        s["tri"] = (s["tri"] + i) % max(flat.tri_v0.shape[0], 1)
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        return sum(sall(v) for k2, v in info.items()
                   if k2 not in ("is_curve",))
    slope("expand_hit (full)", st_expand)

    def st_shade(i, s, acc):
        s = perturb(s, i, acc)
        s["tri"] = (s["tri"] + i) % max(flat.tri_v0.shape[0], 1)
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        ul = rng.random_1d(seed ^ jnp.uint32(i), s["pixel"], s["sample"], 3)
        u1, u2 = rng.random_2d(seed ^ jnp.uint32(i), s["pixel"],
                               s["sample"], 4)
        ul2 = rng.random_1d(seed ^ jnp.uint32(i), s["pixel"],
                            s["sample"], 6)
        wo, wt, pdf, flags = bsdf_sample(sp, wi, ul, u1, u2,
                                         settings.present_bsdf_types,
                                         u_lobe2=ul2)
        return sall(wo) + sall(wt) + sall(pdf)
    slope("expand+frame+bsdf_sample (full)", st_shade)

    real = isect.bvh_intersect

    def stub(scene, o, d, t_min, t_max, any_hit=False):
        R = o.shape[0]
        z = jnp.zeros((R,))
        T = max(flat.tri_v0.shape[0], 1)
        tri = (jax.lax.bitcast_convert_type(o[:, 0], jnp.int32)
               & 0x7FFFFFFF) % T
        return dict(t=jnp.ones((R,)), tri=tri,
                    sph=jnp.full((R,), -1, jnp.int32),
                    dsk=jnp.full((R,), -1, jnp.int32),
                    cyl=jnp.full((R,), -1, jnp.int32),
                    crv=jnp.full((R,), -1, jnp.int32),
                    u=z + 0.3, v=z + 0.3, hit=jnp.ones((R,), bool))

    def st_nee(i, s, acc):
        s = perturb(s, i, acc)
        s["tri"] = (s["tri"] + i) % max(flat.tri_v0.shape[0], 1)
        info = pt._expand_hit(flat, s["o"], s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        ctx = dict(p=info["p"], is_volume=jnp.zeros_like(s["alive"]),
                   sp=sp, frame=(tan, bit, ns), wi_local=wi,
                   ray_d=s["d"], medium=None, gate=s["alive"])
        rets = pt._nee(flat, settings, ctx, seed ^ jnp.uint32(i),
                       s["pixel"], s["sample"], rng.DIMS_CAMERA)
        return sall(rets[0])

    isect.bvh_intersect = stub
    pt.bvh_intersect = stub
    try:
        slope("expand+frame+NEE (stub trace)", st_nee)

        body_stub = pt._make_bounce_body(flat, settings, seed)

        def st_bodystub(i, s, acc):
            s2 = perturb(s, i, acc)
            s2["bounce"] = jnp.int32(i)
            out = body_stub(s2)
            return sall(out["emission"]) + sall(out["t"]) + \
                sall(out["throughput"])
        slope("FULL body (stub trace)", st_bodystub, 3)
    finally:
        isect.bvh_intersect = real
        pt.bvh_intersect = real

    body = pt._make_bounce_body(flat, settings, seed)

    def st_body(i, s, acc):
        s2 = perturb(s, i, acc)
        s2["bounce"] = jnp.int32(i)
        out = body(s2)
        return sall(out["emission"]) + sall(out["t"]) + \
            sall(out["throughput"])
    slope("FULL body (real trace)", st_body, 3)


if __name__ == "__main__":
    main()
