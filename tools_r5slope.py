"""Round-5 slope profiler: the axon backend's block_until_ready returns
before plain-XLA programs finish and fetches pay a ~59 ms/2MB tunnel
floor, so the ONLY trustworthy stage cost is a SLOPE: run the stage N
times (dependency-chained, inputs perturbed against CSE) inside one jit
and fetch one scalar; cost = (t_N - t_1) / (N - 1)."""
import time

import numpy as np


def fetch_time(fn, args, n=4):
    np.asarray(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(fn(*args))
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

    def slope(name, make_stage, n_lo=1, n_hi=5):
        """make_stage(i, s, acc) -> scalar-ish contribution; the loop
        carries acc so iterations are dependency-chained."""
        def runner(reps):
            @jax.jit
            def f(s):
                acc = jnp.float32(0.0)
                for i in range(reps):
                    acc = acc + make_stage(i, s, acc)
                return acc
            return fetch_time(f, (s,)) if False else fetch_time(
                lambda s=s0: f(s), ())
        t_lo = runner(n_lo)
        t_hi = runner(n_hi)
        per = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
        print(f"{name:30s} {per:8.2f} ms/pass", flush=True)
        return per

    s = s0

    def st_expand(i, s, acc):
        o = s["o"] + acc * 1e-20 + i * 1e-7
        info = pt._expand_hit(flat, o, s["d"], s)
        return jnp.sum(info["ns"][0]) + jnp.sum(info["uv"][0]) + \
            jnp.sum(info["p"][0])
    slope("expand_hit", st_expand)

    def st_rng(i, s, acc):
        tot = jnp.float32(0.0)
        for d in range(12):
            tot = tot + rng.random_1d(
                seed ^ jnp.uint32(i), s["pixel"], s["sample"], d)[0]
        return tot + acc * 0.0
    slope("rng x12", st_rng)

    def st_bsdf(i, s, acc):
        o = s["o"] + acc * 1e-20 + i * 1e-7
        info = pt._expand_hit(flat, o, s["d"], s)
        ns = info["ns"]
        tan, bit = pt.shading_frame(settings, info, ns)
        wi = vm.to_local(tan, bit, ns, -s["d"])
        sp = ShadePoint(flat, info["bsdf"], info["uv"])
        ul = rng.random_1d(seed ^ jnp.uint32(i), s["pixel"], s["sample"], 3)
        u1, u2 = rng.random_2d(seed ^ jnp.uint32(i), s["pixel"],
                               s["sample"], 4)
        ul2 = rng.random_1d(seed ^ jnp.uint32(i), s["pixel"],
                            s["sample"], 6)
        wo, wtv, pdf, flags = bsdf_sample(sp, wi, ul, u1, u2,
                                          settings.present_bsdf_types,
                                          u_lobe2=ul2)
        return jnp.sum(wo[0]) + jnp.sum(wtv[0]) + pdf[0]
    slope("expand+frame+bsdf_sample", st_bsdf, 1, 4)

    def st_env(i, s, acc):
        u1, u2 = rng.random_2d(seed ^ jnp.uint32(i), s["pixel"],
                               s["sample"], 1)
        d, radiance, pdf = L.env_sample(flat, u1 + acc * 1e-20, u2)
        return jnp.sum(radiance[0]) + pdf[0] + jnp.sum(d[0])
    slope("env_sample", st_env)

    def st_enveval(i, s, acc):
        d = s["d"] + acc * 1e-20 + i * 1e-7
        return jnp.sum(L.env_eval(flat, d)[0]) + L.env_pdf(flat, d)[0]
    slope("env_eval+env_pdf", st_enveval)

    def st_sort(i, s, acc):
        o = s["o"] + acc * 1e-20 + i * 1e-7
        o2 = jnp.concatenate([o, o], axis=0)
        d2 = jnp.concatenate([s["d"], -s["d"]], axis=0)
        tmin = jnp.zeros((2 * W,))
        tmax = jnp.full((2 * W,), 3e38)
        os_, ds_, a, b, order = isect._sort_for_wave(flat, o2, d2, tmin,
                                                     tmax)
        return jnp.sum(os_[0]) + jnp.sum(ds_[0]) + \
            order[0].astype(jnp.float32)
    slope("_sort_for_wave 2R=524k", st_sort, 1, 4)

    def st_cull(i, s, acc):
        o = s["o"] + acc * 1e-20 + i * 1e-7
        o2 = jnp.concatenate([o, o], axis=0)
        d2 = jnp.concatenate([s["d"], -s["d"]], axis=0)
        sent, sids = wt._cull_sorted_supers(
            o2, d2, jnp.zeros((2 * W, 1)), jnp.full((2 * W, 1), 3e38),
            flat.wk_sbox, 2 * W // wt.BLOCK)
        return jnp.sum(sent[0, 0, 0]) + sids[0, 0, 0].astype(jnp.float32)
    slope("phase-A cull 2R=524k", st_cull, 1, 4)

    body = pt._make_bounce_body(flat, settings, seed)

    def st_body(i, s, acc):
        s2 = dict(s)
        s2["o"] = s["o"] + acc * 1e-20
        s2["bounce"] = jnp.int32(i)
        out = body(s2)
        return jnp.sum(out["emission"][0]) + out["t"][0]
    slope("FULL bounce body", st_body, 1, 3)


if __name__ == "__main__":
    main()
