"""Microbenchmark: XLA TPU gather cost vs table width / count / size.

If gather cost is per-INDEX (row) rather than per-element, packing the
9 per-triangle shading tables into one wide row turns 9 gathers into 1.
"""
import time

import numpy as np


def timeit(fn, n=10):
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

    print("platform:", jax.devices()[0].platform, flush=True)
    R = 1 << 18
    rs = np.random.default_rng(0)

    for T, C in ((80_000, 1), (80_000, 3), (80_000, 8), (80_000, 24),
                 (512 * 1024, 3), (8, 3), (8, 16), (1024, 8)):
        tbl = jnp.asarray(rs.standard_normal((T, C), dtype=np.float32))
        idx = jnp.asarray(rs.integers(0, T, R).astype(np.int32))
        f = jax.jit(lambda tbl, idx: tbl[idx])
        t = timeit(lambda: jax.block_until_ready(f(tbl, idx)))
        print(f"gather (R={R}) from ({T:7d},{C:2d}): {t*1e3:7.2f} ms",
              flush=True)

    # 9 separate (T,3) gathers in one jit vs 1 (T,27) gather
    T = 80_000
    tbls = [jnp.asarray(rs.standard_normal((T, 3), dtype=np.float32))
            for _ in range(9)]
    idx = jnp.asarray(rs.integers(0, T, R).astype(np.int32))

    @jax.jit
    def nine(idx, *tbls):
        return sum(t[idx].sum() for t in tbls)
    t = timeit(lambda: jax.block_until_ready(nine(idx, *tbls)))
    print(f"9 x (80k,3) gathers, one jit: {t*1e3:7.2f} ms", flush=True)

    wide = jnp.concatenate(tbls, axis=1)

    @jax.jit
    def one(idx, wide):
        return wide[idx].sum()
    t = timeit(lambda: jax.block_until_ready(one(idx, wide)))
    print(f"1 x (80k,27) gather, one jit: {t*1e3:7.2f} ms", flush=True)

    # tiny-table lookup: gather vs one-hot matmul
    B = 8
    tbl = jnp.asarray(rs.standard_normal((B, 16), dtype=np.float32))
    bidx = jnp.asarray(rs.integers(0, B, R).astype(np.int32))

    @jax.jit
    def g(bidx, tbl):
        return tbl[bidx].sum()
    t = timeit(lambda: jax.block_until_ready(g(bidx, tbl)))
    print(f"tiny gather (8,16): {t*1e3:7.2f} ms", flush=True)

    @jax.jit
    def oh(bidx, tbl):
        hot = jax.nn.one_hot(bidx, B, dtype=jnp.float32)
        return (hot @ tbl).sum()
    t = timeit(lambda: jax.block_until_ready(oh(bidx, tbl)))
    print(f"tiny one-hot matmul (8,16): {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()


def calib():
    from tungsten_tpu.utils import jaxcfg
    jaxcfg.setup()
    import jax
    import jax.numpy as jnp
    import numpy as np
    R = 1 << 18
    rs = np.random.default_rng(1)
    x = jnp.asarray(rs.standard_normal((R, 8), dtype=np.float32))

    @jax.jit
    def chain(x):
        for i in range(50):
            x = x * 1.0001 + 0.001
        return x
    t = timeit(lambda: jax.block_until_ready(chain(x)))
    print(f"50 chained muladds (262k,8): {t*1e3:7.2f} ms", flush=True)

    ops = [jnp.asarray(rs.standard_normal(2 * R, dtype=np.float32))
           for _ in range(10)]

    @jax.jit
    def srt(*ops):
        return jax.lax.sort(list(ops), num_keys=1)
    t = timeit(lambda: jax.block_until_ready(srt(*ops)))
    print(f"lax.sort 10 operands (524k): {t*1e3:7.2f} ms", flush=True)

    y = jnp.asarray(rs.standard_normal((R, 3), dtype=np.float32))
    m = jnp.asarray(rs.standard_normal(R, dtype=np.float32)) > 0

    @jax.jit
    def wh(y, m):
        for _ in range(20):
            y = jnp.where(m[:, None], y * 1.001, y)
        return y
    t = timeit(lambda: jax.block_until_ready(wh(y, m)))
    print(f"20 wheres (262k,3): {t*1e3:7.2f} ms", flush=True)

    # 30 DISTINCT unfusable passes: each reads its own input buffer
    bufs = [jnp.asarray(rs.standard_normal((R, 3), dtype=np.float32))
            for _ in range(30)]

    @jax.jit
    def many(*bufs):
        return sum(b * 1.001 for b in bufs)
    t = timeit(lambda: jax.block_until_ready(many(*bufs)))
    print(f"sum of 30 (262k,3) buffers: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__" and __import__("sys").argv[-1] == "calib":
    calib()
