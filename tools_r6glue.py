"""Round-5b: finer glue decomposition via stage-neutered marginals.

For each mode, measure run_bounces[0:1] and run_bounces[0:6] (2 compiles)
and report the steady-state per-bounce marginal (t6 - t1)/5.  Modes:

  real          full pipeline (baseline)
  stub          traversal -> fake hit (glue only)
  stub_noenv    stub + env sample/eval/pdf replaced by constants
  stub_nonee    stub + light sampling disabled
  stub_noexp    stub + _expand_hit replaced by constants
  real_nosort   real with SORT_RAYS=False

Usage: python tools_r6glue.py [mode ...]   (default: all)
"""
import sys
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


def run(mode):
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import intersect as isect
    from tungsten_tpu.integrators import path_tracer as pt
    from tungsten_tpu.integrators import lights as L
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

    saved = {}

    def patch(obj, name, val):
        saved[(obj, name)] = getattr(obj, name)
        setattr(obj, name, val)

    T = flat.tri_v0.shape[0]

    def stub(scene, o, d, t_min, t_max, any_hit=False, **kw):
        R = o.shape[0]
        z = jnp.zeros((R,))
        tri = (jax.lax.bitcast_convert_type(o[:, 0], jnp.int32)
               & 0x7FFFFFFF) % T
        return dict(t=jnp.ones((R,)), tri=tri,
                    sph=jnp.full((R,), -1, jnp.int32),
                    dsk=jnp.full((R,), -1, jnp.int32),
                    cyl=jnp.full((R,), -1, jnp.int32),
                    crv=jnp.full((R,), -1, jnp.int32),
                    u=z + 0.3, v=z + 0.3,
                    hit=jnp.ones((R,), bool))

    def env_sample_c(scene, u1, u2, active=None):
        d = jnp.stack([u1 * 0.1, jnp.ones_like(u1), u2 * 0.1], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return d, jnp.ones(d.shape), jnp.ones(u1.shape) * 0.25

    def env_eval_c(scene, d, active=None):
        return jnp.ones(d.shape) * (1.0 + d[..., :1] * 0.0)

    def env_pdf_c(scene, d, active=None):
        return jnp.full(d.shape[:-1], 0.25) + d[..., 0] * 1e-30

    def expand_c(scene, o, d, s, active=None):
        R = o.shape[0]
        up = jnp.zeros((R, 3)).at[:, 1].set(1.0)
        return dict(p=o + d, ng=up, ns=up,
                    uv=jnp.full((R, 2), 0.3),
                    bsdf=jnp.zeros((R,), jnp.int32),
                    prim=jnp.zeros((R,), jnp.int32),
                    tri=s["tri"])

    if mode.startswith("stub"):
        patch(isect, "bvh_intersect", stub)
        patch(pt, "bvh_intersect", stub)
    if mode == "stub_noenv":
        patch(L, "env_sample", env_sample_c)
        patch(L, "env_eval", env_eval_c)
        patch(L, "env_pdf", env_pdf_c)
        patch(pt.L, "env_sample", env_sample_c)
        patch(pt.L, "env_eval", env_eval_c)
        patch(pt.L, "env_pdf", env_pdf_c)
    if mode == "stub_nonee":
        settings = replace(settings, enable_light_sampling=False)
    if mode == "stub_noexp":
        patch(pt, "_expand_hit", expand_c)
    if mode == "real_nosort":
        patch(isect, "SORT_RAYS", False)
    if mode == "stub_nobsort":
        patch(pt, "BODY_SORT", False)

    try:
        @jax.jit
        def jinit():
            return pt.init_wave(flat, settings, pixel, sample,
                                jnp.uint32(1))
        state0 = jax.block_until_ready(jinit())
        ts = {}
        for kk in (1, 6):
            fn = jax.jit(lambda s, kk=kk: pt.run_bounces(
                flat, settings, jnp.uint32(1), s, kk))
            ts[kk] = timeit(lambda: jax.block_until_ready(fn(state0)))
        marg = (ts[6] - ts[1]) / 5 * 1e3
        print(f"{mode:12s} per-bounce marginal: {marg:7.1f} ms "
              f"(t1={ts[1]*1e3:.0f} t6={ts[6]*1e3:.0f})", flush=True)
    finally:
        for (obj, name), val in saved.items():
            setattr(obj, name, val)


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)
    modes = sys.argv[1:] or ["real", "stub", "stub_noenv", "stub_nonee",
                             "stub_noexp", "stub_nobsort", "real_nosort"]
    for m in modes:
        run(m)


if __name__ == "__main__":
    main()
