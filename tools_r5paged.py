"""Paged-kernel A/B on the real TPU.

Builds a ~600k-tri scene (materialtest geometry tiled 3x3) whose
cluster tables exceed the VMEM budget, and measures:
  * paged kernel, coherent + incoherent closest-hit + any-hit
  * a brute-force spot-check on a ray subsample (correctness)
  * the resident kernel on the untiled scene for reference overhead
Single-dispatch wall times via fetch (block_until_ready returns early
on this backend — PROFILE_r05.md).
"""
import time

import numpy as np


def fetch_time(f, args, n=4):
    np.asarray(f(*args)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(f(*args)[0])
        ts.append(time.time() - t0)
    return min(ts)


def main():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    from tungsten_tpu.scene.parse import load_scene
    from tungsten_tpu.scene.flatten import flatten_scene
    from tungsten_tpu.ops import wave_trace as wt
    from bench import simplified_bsdfs

    print("platform:", jax.devices()[0].platform, flush=True)
    desc = load_scene("/root/reference/data/materialtest/materialtest.json")
    desc.bsdfs[:] = simplified_bsdfs(desc.bsdfs)
    flat, settings = flatten_scene(desc)

    v0 = np.asarray(flat.tri_v0)
    e1 = np.asarray(flat.tri_e1)
    e2 = np.asarray(flat.tri_e2)
    tiles = []
    for ix in range(3):
        for iz in range(3):
            off = np.asarray([ix * 12.0, 0.0, iz * 12.0], np.float32)
            tiles.append(v0 + off)
    v0b = np.concatenate(tiles)
    e1b = np.tile(e1, (9, 1))
    e2b = np.tile(e2, (9, 1))
    print(f"big scene: {v0b.shape[0]} tris", flush=True)
    boxes, cbox, attr, remap, sbox = wt.build_wave_tables(v0b, e1b, e2b)
    sz = attr.size * 4
    print(f"attr table {sz/1e6:.1f} MB (vmem budget "
          f"{wt.VMEM_TABLE_BUDGET/1e6:.0f} MB) -> paged", flush=True)

    R = 1 << 20
    rs = np.random.default_rng(0)
    # coherent: camera-ish fan from one point over the tiled field
    o_c = np.tile(np.asarray([[18.0, 8.0, -6.0]], np.float32), (R, 1))
    tgt = rs.uniform(0, 1, (R, 3)).astype(np.float32) * \
        np.asarray([36.0, 4.0, 36.0], np.float32) - \
        np.asarray([6.0, 0.0, 6.0], np.float32)
    d_c = tgt - o_c
    d_c /= np.linalg.norm(d_c, axis=-1, keepdims=True)
    # incoherent
    o_i = rs.uniform(-4, 28, (R, 3)).astype(np.float32)
    d_i = rs.normal(size=(R, 3)).astype(np.float32)
    d_i /= np.linalg.norm(d_i, axis=-1, keepdims=True)

    from tungsten_tpu.ops.intersect import _sort_for_wave
    o_is, d_is = _sort_for_wave(flat, jnp.asarray(o_i), jnp.asarray(d_i))

    args = [jnp.asarray(x) for x in (boxes, cbox, attr, remap, sbox)]
    tmin = jnp.zeros((R,))
    tmax = jnp.full((R,), 3.0e38)

    def run(o, d, any_hit):
        return wt.wave_intersect_paged(
            *args, o, d, tmin, tmax, ncp=boxes.shape[1], any_hit=any_hit,
            tri_v0=jnp.asarray(v0b), tri_e1=jnp.asarray(e1b),
            tri_e2=jnp.asarray(e2b))

    for name, o, d, ah in (("coherent closest", jnp.asarray(o_c),
                            jnp.asarray(d_c), False),
                           ("coherent any-hit", jnp.asarray(o_c),
                            jnp.asarray(d_c), True),
                           ("incoherent closest", o_is, d_is, False),
                           ("incoherent any-hit", o_is, d_is, True)):
        f = jax.jit(lambda o=o, d=d, ah=ah: run(o, d, ah))
        t = fetch_time(lambda: f(), ())
        print(f"paged 600k-tri {name}: {t*1e3:7.1f} ms/1M "
              f"({R/t/1e6:5.2f} Mrays/s)", flush=True)

    # correctness spot check on 256 coherent rays vs brute force
    # (rays padded to one BLOCK — the kernel needs R % 1024 == 0)
    k = 256
    o_p = np.concatenate([o_c[:k],
                          np.zeros((wt.BLOCK - k, 3), np.float32)])
    d_p = np.concatenate([d_c[:k], np.tile(
        np.asarray([[0.0, 0.0, 1.0]], np.float32), (wt.BLOCK - k, 1))])
    out = wt.wave_intersect_paged(
        *args, jnp.asarray(o_p), jnp.asarray(d_p),
        jnp.zeros((wt.BLOCK,)), jnp.full((wt.BLOCK,), 3.0e38),
        ncp=boxes.shape[1], tri_v0=jnp.asarray(v0b),
        tri_e1=jnp.asarray(e1b), tri_e2=jnp.asarray(e2b))
    t_k, tri_k = np.asarray(out[0])[:k], np.asarray(out[1])[:k]
    # chunked brute force to bound memory
    best_t = np.full(k, 3e38, np.float32)
    best_i = np.full(k, -1, np.int64)
    C = 25000
    for off in range(0, v0b.shape[0], C):
        vv0 = v0b[off:off + C]
        ee1 = e1b[off:off + C]
        ee2 = e2b[off:off + C]
        pvec = np.cross(d_c[:k, None, :], ee2[None])
        dd = np.sum(ee1[None] * pvec, -1)
        inv = np.where(np.abs(dd) > 1e-16, 1.0 / dd, 0.0)
        tv = o_c[:k, None, :] - vv0[None]
        uu = np.sum(tv * pvec, -1) * inv
        qv = np.cross(tv, ee1[None])
        vv = np.sum(d_c[:k, None, :] * qv, -1) * inv
        tt = np.sum(ee2[None] * qv, -1) * inv
        hit = ((np.abs(dd) > 1e-16) & (uu >= 0) & (vv >= 0)
               & (uu + vv <= 1) & (tt > 0) & (tt < best_t[:, None]))
        tc = np.where(hit, tt, 3e38)
        j = tc.argmin(1)
        tj = tc[np.arange(k), j]
        got = tj < best_t
        best_t = np.where(got, tj, best_t)
        best_i = np.where(got, off + j, best_i)
    agree = ((tri_k >= 0) == (best_i >= 0))
    print(f"spot-check hit agreement: {agree.mean()*100:.2f}%",
          flush=True)
    both = (tri_k >= 0) & (best_i >= 0)
    rel = np.abs(t_k[both] - best_t[both]) / np.maximum(best_t[both], 1e-9)
    print(f"spot-check t rel err p99: {np.percentile(rel, 99):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
