"""Pending-set analysis for the traversal drain redesign (round 3).

Measures, per 1024-ray block on materialtest primaries + incoherent
rays, the pending-cluster counts at several cull granularities:
  - block union (v4's visit count driver)
  - per-warp (128 rays): sum over 8 warps = v5 per-warp drain work
  - per-subwarp (32 rays) unioned to warp: tighter warp lists
  - "useful" visits: clusters where some ray in the warp actually has
    its closest hit (lower bound on any sweep)
Run on CPU or TPU; pure XLA, no Pallas.
"""
import numpy as np


def interval_cull(o, d, tmin, tmax, boxes, group):
    """o,d (R,3); group rays into (R//group) intervals; boxes (16, NC).
    Returns pending bool (R//group, NC) via the kernel's interval slab
    test."""
    import jax.numpy as jnp
    R = o.shape[0]
    G = R // group
    NC = boxes.shape[1]
    od = jnp.concatenate([o, d], axis=1).reshape(G, group, 6)
    lo = jnp.min(od, axis=1)
    hi = jnp.max(od, axis=1)
    olo, ohi = lo[:, 0:3], hi[:, 0:3]
    dlo, dhi = lo[:, 3:6], hi[:, 3:6]
    tn = jnp.full((G, NC), np.float32(tmin))
    tf = jnp.full((G, NC), np.float32(min(tmax, 1e37)))
    INF = 3e38
    for ax in range(3):
        lo_row = boxes[ax:ax + 1, :]
        hi_row = boxes[ax + 3:ax + 4, :]
        d0 = dlo[:, ax:ax + 1]
        d1 = dhi[:, ax:ax + 1]
        same = (d0 > 0) | (d1 < 0)
        i0 = 1.0 / jnp.where(same, d1, 1.0)
        i1 = 1.0 / jnp.where(same, d0, 1.0)

        def hull(n0, n1):
            p = [n0 * i0, n0 * i1, n1 * i0, n1 * i1]
            return (jnp.minimum(jnp.minimum(p[0], p[1]),
                                jnp.minimum(p[2], p[3])),
                    jnp.maximum(jnp.maximum(p[0], p[1]),
                                jnp.maximum(p[2], p[3])))

        a0l, a1l = hull(lo_row - ohi[:, ax:ax + 1], lo_row - olo[:, ax:ax + 1])
        a0h, a1h = hull(hi_row - ohi[:, ax:ax + 1], hi_row - olo[:, ax:ax + 1])
        a0 = jnp.minimum(a0l, a0h)
        a1 = jnp.maximum(a1l, a1h)
        tn = jnp.maximum(tn, jnp.where(same, a0, -INF))
        tf = jnp.minimum(tf, jnp.where(same, a1, INF))
    valid = boxes[9:10, :] > 0
    return (tn <= tf * 1.00000024) & valid


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from bench import simplified_bsdfs
    from tungsten_tpu.cameras.camera import generate_rays

    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)
    settings = replace(settings, width=256, height=256, max_bounces=64)
    R = 1 << 18
    pixel = jnp.arange(R, dtype=jnp.uint32) % (256 * 256)
    sample = (jnp.arange(R, dtype=jnp.uint32) // (256 * 256))
    o, d = jax.jit(lambda: generate_rays(
        flat, replace(settings, spp=0), pixel, sample, jnp.uint32(1)))()
    boxes = flat.wk_boxes
    nc_valid = int(np.asarray(boxes[9]).sum())
    print(f"clusters: {nc_valid} (padded {boxes.shape[1]})")

    # apply the production sort (intersect.py does this before the kernel)
    def sort_rays(o, d):
        lo = flat.bvh_min[0]
        hi = flat.bvh_max[0]
        q = jnp.clip((o - lo) / jnp.maximum(hi - lo, 1e-9), 0, 1)
        q = (q * 31).astype(jnp.uint32)

        def spread5(x):
            x = (x | (x << 8)) & jnp.uint32(0x00F00F)
            x = (x | (x << 4)) & jnp.uint32(0x0C30C3)
            x = (x | (x << 2)) & jnp.uint32(0x249249)
            return x
        morton = spread5(q[:, 0]) | (spread5(q[:, 1]) << 1) | \
            (spread5(q[:, 2]) << 2)
        qd = ((jnp.clip(d, -1, 1) + 1) * 7.999).astype(jnp.uint32)
        dmorton = spread5(qd[:, 0]) | (spread5(qd[:, 1]) << 1) | \
            (spread5(qd[:, 2]) << 2)
        octant = ((d[:, 0] > 0).astype(jnp.uint32)
                  | ((d[:, 1] > 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.uint32) << 2))
        key = (octant << 28) | (morton << 13) | (dmorton & jnp.uint32(0xFFF))
        (_, ox, oy, oz, dx, dy, dz) = jax.lax.sort(
            [key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]],
            num_keys=1, is_stable=True)
        return jnp.stack([ox, oy, oz], -1), jnp.stack([dx, dy, dz], -1)

    key = jax.random.PRNGKey(0)
    d2 = jax.random.normal(key, (R, 3))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (R, 1)) + \
        0.5 * jax.random.normal(jax.random.PRNGKey(1), (R, 3))

    for name, (oo, dd) in [("coherent", (o, d)),
                           ("incoherent", sort_rays(o2, d2))]:
        for group in (1024, 128, 32):
            p = np.asarray(interval_cull(oo, dd, 1e-4, 3e38, boxes, group))
            # per-128-warp list = union of its subgroups
            per_warp = p.reshape(R // 128, 128 // min(group, 128), -1).any(1) \
                if group <= 128 else None
            cnt = p.sum(1)
            msg = (f"{name:10s} group={group:5d}: pending/group "
                   f"mean={cnt.mean():7.1f} p95={np.percentile(cnt, 95):7.1f}")
            if group < 1024:
                pw = p.reshape(R // 1024, 1024 // group, -1)
                warp = pw.reshape(R // 1024, 8, (128 // group), -1).any(2)
                sum_warp = warp.sum(2).sum(1)   # per-block sum of warp lists
                union = pw.any(1).sum(1)
                msg += (f" | per-block warp-sum mean={sum_warp.mean():7.1f}"
                        f" union={union.mean():6.1f}")
            print(msg, flush=True)


if __name__ == "__main__":
    main()
