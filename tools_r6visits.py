"""Round-5b: cluster-visit counts on REAL bounce rays.

Captures the wavefront's (o, d) at several bounses, applies the same
ray sort as _wave_dispatch, and runs the resident kernel with
debug_rows=True to report cluster-visits and super-visits per ray.
Occupancy diagnosis: visits/ray >> clusters a single ray needs means
the per-warp union drain is the wall, not per-visit cost.
"""
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
    ncp = flat.wk_remap.shape[0] // wt.CLUSTER
    print(f"scene: {flat.tri_v0.shape[0]} tris, {ncp} clusters, "
          f"{flat.wk_sbox.shape[1]} supers-padded", flush=True)

    for b in range(5):
        alive = np.asarray(state["alive"])
        o = np.asarray(state["o"])
        d = np.asarray(state["d"])
        # continuation rays of THIS bounce state (as the next traversal
        # would see them): sort exactly like _wave_dispatch
        oj = jnp.asarray(o)
        dj = jnp.asarray(d)
        tmax = jnp.where(jnp.asarray(alive), wt.INF, 0.0)
        os_, ds_, tmn, tmx, order = isect._sort_for_wave(
            flat, oj, dj, jnp.zeros((W,)), tmax)
        t, tri, u, v, visits, supers = wt.wave_intersect(
            flat.wk_boxes, flat.wk_cbox, flat.wk_attr, flat.wk_remap,
            flat.wk_sbox, os_, ds_, tmn, tmx, ncp=ncp, debug_rows=True)
        na = int(alive.sum())
        vis = float(jnp.sum(visits))
        sup = float(jnp.sum(supers))
        nwarp = W // wt.WARP
        print(f"bounce {b}: alive {na:7d} ({na/W*100:4.1f}%)  "
              f"cluster-visits {vis:9.0f} ({vis/max(na,1):6.2f}/alive-ray, "
              f"{vis/nwarp:6.1f}/warp)  super-visits {sup:9.0f} "
              f"({sup/nwarp:5.1f}/warp)", flush=True)
        state = pt.run_bounces(flat, settings, jnp.uint32(1), state, b + 1)

    # reference point: how many clusters does a SINGLE ray actually
    # need?  Approximate with per-ray brute slab count on cluster boxes.
    cb = np.asarray(flat.wk_cbox)
    valid = cb[:, 6] > 0
    o0 = np.asarray(state["o"])[:4096]
    d0 = np.asarray(state["d"])[:4096]
    inv = 1.0 / np.where(np.abs(d0) < 1e-20, 1e-20, d0)
    t0 = (cb[None, valid, 0:3] - o0[:, None]) * inv[:, None]
    t1 = (cb[None, valid, 3:6] - o0[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hits = ((tn <= tf) & (tf > 0)).sum(-1)
    print(f"per-ray cluster-box overlaps (bounce-5 rays, brute): "
          f"mean {hits.mean():.1f}  p50 {np.percentile(hits,50):.0f}  "
          f"p90 {np.percentile(hits,90):.0f}  max {hits.max()}", flush=True)


if __name__ == "__main__":
    main()
