"""Micro-benchmark: MXU dot_general shapes inside a Pallas while-loop,
mimicking the wave-trace leaf's serialized visit chain.  Measures the
marginal cost per matmul for candidate (M, K, N) shapes to guide the
leaf design (cycles are latency-dominated when visits serialize).

Usage: python tools_mxubench.py   (run on the real TPU)
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_loop_kernel(M, K, N, iters, with_stores):
    def kernel(a_ref, out_ref, b_ref):
        # a_ref: (K, N) activations; b_ref scratch (K, M) weights;
        # out accumulates so nothing is dead-code-eliminated
        @pl.when(pl.program_id(0) == 0)
        def _init():
            b_ref[:, :] = jnp.zeros((K, M), jnp.bfloat16)

        def body(i, acc):
            if with_stores:
                # 12 stores of ~(4-6, 128) like the leaf build
                src = a_ref[0:6, 0:128].astype(jnp.bfloat16)
                for ko in (0, 16, 32):
                    if ko + 10 <= K:
                        for c in range(0, min(M, 512), 128):
                            b_ref[ko + 4:ko + 10, c:c + 128] = src
            s = jax.lax.dot_general(
                b_ref[:], a_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (M, N)
            return acc + s[0:1, :]

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, iters, body, jnp.zeros((1, N), jnp.float32))

    return kernel


def bench(M, K, N, iters=512, with_stores=False):
    a = jnp.ones((K, N), jnp.bfloat16)
    fn = pl.pallas_call(
        make_loop_kernel(M, K, N, iters, with_stores),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K, M), jnp.bfloat16)],
    )
    f = jax.jit(lambda a: fn(a))
    f(a).block_until_ready()
    ts = []
    for _ in range(5):
        t0 = time.time()
        f(a).block_until_ready()
        ts.append(time.time() - t0)
    dt = min(ts) / iters
    label = "+stores" if with_stores else "       "
    print(f"M={M:5d} K={K:3d} N={N:4d} {label}: {dt*1e9:7.0f} ns/matmul "
          f"({M*K*N*2/dt/1e12:6.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    for shape in [(512, 48, 128), (512, 16, 128), (512, 128, 128),
                  (1024, 48, 128), (2048, 48, 128), (512, 48, 256),
                  (128, 48, 128), (256, 48, 128)]:
        bench(*shape)
    # with the store chain, like the real leaf
    for shape in [(512, 48, 128), (1024, 48, 128)]:
        bench(*shape, with_stores=True)
    bench_variants()


def bench_variants():
    """Quad-cluster leaf variants: stores+1matmul vs resident tables."""
    import functools
    M, K, N = 2048, 48, 128
    ncp = 1024

    # Variant A: 48 stores + one (2048,48,128) matmul per quad
    def kA(a_ref, out_ref, b_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            b_ref[:, :] = jnp.zeros((K, M), jnp.bfloat16)
        src = a_ref[0:6, 0:128].astype(jnp.bfloat16)
        src4 = a_ref[0:4, 0:128].astype(jnp.bfloat16)
        src3 = a_ref[0:3, 0:128].astype(jnp.bfloat16)
        def body(i, acc):
            for q in range(4):          # 4 clusters
                for ko in (0, 16, 32):  # 3 arrangements
                    c = q * 512
                    b_ref[ko + 4:ko + 10, c + 128:c + 256] = src
                    b_ref[ko + 4:ko + 10, c + 256:c + 384] = src
                    b_ref[ko + 0:ko + 4, c + 384:c + 512] = src4
                    b_ref[ko + 4:ko + 7, c:c + 128] = src3
            s = jax.lax.dot_general(
                b_ref[:], a_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + s[0:1, :]
        out_ref[0:1, :] = jax.lax.fori_loop(
            0, 256, body, jnp.zeros((1, N), jnp.float32))

    # Variant B: resident (48, ncp*512) arranged table, 1 matmul, 0 stores
    def kB(a_ref, tbl_ref, out_ref):
        def body(i, acc):
            col = pl.multiple_of((i % 64) * 2048, 2048)
            s = jax.lax.dot_general(
                tbl_ref[:, pl.ds(col, M)], a_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + s[0:1, :]
        out_ref[0:1, :] = jax.lax.fori_loop(
            0, 256, body, jnp.zeros((1, N), jnp.float32))

    # Variant C: resident (32, ncp*512) table, 2 matmuls (K32+K16) + add
    def kC(a_ref, tbl_ref, out_ref):
        def body(i, acc):
            col = pl.multiple_of((i % 64) * 2048, 2048)
            b = tbl_ref[:, pl.ds(col, M)]
            s = jax.lax.dot_general(
                b, a_ref[0:32, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + jax.lax.dot_general(
                b[0:16, :], a_ref[32:48, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return acc + s[0:1, :]
        out_ref[0:1, :] = jax.lax.fori_loop(
            0, 256, body, jnp.zeros((1, N), jnp.float32))

    a = jnp.ones((K, N), jnp.bfloat16)
    for name, kern, tbl_rows in (("A 48-store 1mm", kA, None),
                                 ("B resident48 1mm", kB, 48),
                                 ("C resident32 2mm", kC, 32)):
        try:
            if tbl_rows is None:
                fn = pl.pallas_call(
                    kern, grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((K, M), jnp.bfloat16)])
                f = jax.jit(lambda a: fn(a))
                args = (a,)
            else:
                tbl = jnp.ones((tbl_rows, ncp * 512), jnp.bfloat16)
                fn = pl.pallas_call(
                    kern, grid=(1,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32))
                f = jax.jit(lambda a, tbl=tbl: fn(a, tbl))
                args = (a, tbl)
            f(*args).block_until_ready()
            ts = []
            for _ in range(5):
                t0 = time.time()
                f(*args).block_until_ready()
                ts.append(time.time() - t0)
            dt = min(ts) / 256
            print(f"variant {name}: {dt*1e9:7.0f} ns/quad "
                  f"({dt*1e9/4:6.0f} ns/cluster-visit)"
                  + (f"  [table {tbl_rows*ncp*512*2>>20} MB VMEM]"
                     if tbl_rows else ""), flush=True)
        except Exception as e:
            print(f"variant {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
