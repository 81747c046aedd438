"""Sobol' low-discrepancy sampler (stratified_sampler parity).

The reference uses scrambled Sobol' with the vendored Gruenschloss
matrices (ref src/core/sampling/SobolPathSampler.hpp:20-54,
src/thirdparty/sobol/ — 53 kLoC of tables we do not copy): per-pixel
scramble = seed ^ hash(pixelId), per-run-of-256 index permutation, and
a fallback to the uniform sampler past dimension 1024.

This build GENERATES its direction numbers at import: primitive
polynomials over GF(2) are found by exhaustive search in increasing
order (the classical construction — primitivity is checked by the order
of x in GF(2)[x]/(p)), and the free initial direction numbers m_j are
drawn odd from a fixed-seed PCG-style hash.  Any such choice yields a
valid Sobol' sequence (a (t, s)-sequence in base 2); the Joe-Kuo
optimized m_j only tune higher-dimension uniformity, and the XOR
scrambling applied per (pixel, dim) recovers most of that quality in
practice.

Device evaluation: value(index, dim) = XOR of direction numbers
v_{dim, j} over the set bits of the (scrambled) sample index, one
(32,)-row gather from the (D, 32) uint32 matrix per dimension.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

NUM_DIMS = 1024
BITS = 32


# ------------------------------------------------- GF(2) primitive polys

def _gf2_mulmod(a: int, b: int, p: int, d: int) -> int:
    """(a*b) mod p over GF(2)[x], deg p = d."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> d & 1:
            a ^= p
    return r


def _gf2_powmod(a: int, e: int, p: int, d: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _gf2_mulmod(r, a, p, d)
        a = _gf2_mulmod(a, a, p, d)
        e >>= 1
    return r


def _prime_factors(n: int):
    out = set()
    f = 2
    while f * f <= n:
        while n % f == 0:
            out.add(f)
            n //= f
        f += 1
    if n > 1:
        out.add(n)
    return out


@functools.lru_cache(maxsize=32)
def _primitive_polys(count: int):
    """First `count` primitive polynomials over GF(2) (excluding x+1),
    in increasing degree/value order, as (poly_bits, degree)."""
    polys = []
    d = 2
    factor_cache = {}
    while len(polys) < count:
        order = (1 << d) - 1
        if d not in factor_cache:
            factor_cache[d] = _prime_factors(order)
        for p in range(1 << d | 1, 1 << (d + 1), 2):  # odd constant term
            # x has multiplicative order 2^d - 1  <=>  p primitive
            if _gf2_powmod(2, order, p, d) != 1:
                continue
            if any(_gf2_powmod(2, order // q, p, d) == 1
                   for q in factor_cache[d]):
                continue
            polys.append((p, d))
            if len(polys) >= count:
                break
        d += 1
    return polys


def _hash32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x ^ (x >> 16)) * np.uint64(0x45D9F3B)
    x = (x ^ (x >> 16)) * np.uint64(0x45D9F3B)
    x = x ^ (x >> 16)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)


@functools.lru_cache(maxsize=4)
def direction_matrix(num_dims: int = NUM_DIMS) -> np.ndarray:
    """(num_dims, 32) uint32 direction numbers, MSB-aligned."""
    V = np.zeros((num_dims, BITS), np.uint32)
    # dim 0: van der Corput (identity matrix)
    for j in range(BITS):
        V[0, j] = 1 << (31 - j)
    polys = _primitive_polys(num_dims - 1)
    rng = np.random.default_rng(0x5060701)
    for i, (poly, s) in enumerate(polys, start=1):
        a = [(poly >> (s - k)) & 1 for k in range(1, s)]  # a_1..a_{s-1}
        m = [0] * BITS
        for j in range(s):
            m[j] = int(rng.integers(0, 1 << j)) * 2 + 1  # odd, < 2^(j+1)
        for j in range(s, BITS):
            val = m[j - s] ^ (m[j - s] << s)
            for k in range(1, s):
                if a[k - 1]:
                    val ^= m[j - k] << k
            m[j] = val
        for j in range(BITS):
            V[i, j] = np.uint32(m[j] << (31 - j))
    return V


def device_matrix():
    # direction_matrix() is lru-cached on host; re-wrapping per call is
    # safe under jit (the constant is deduped by value per trace) and
    # avoids leaking a traced constant into later traces
    return jnp.asarray(direction_matrix())


def sobol_uint(index, dim):
    """Scrambled-index Sobol' value as uint32; index/dim uint32 arrays.
    Dims wrap mod NUM_DIMS (the reference instead falls back to its
    uniform sampler past 1024 — both keep the estimator unbiased)."""
    V = device_matrix()
    rows = V[jnp.asarray(dim).astype(jnp.uint32) % NUM_DIMS]  # (..., 32)
    idx = jnp.asarray(index).astype(jnp.uint32)
    out = jnp.zeros(jnp.broadcast_shapes(idx.shape, rows.shape[:-1]),
                    jnp.uint32)
    for j in range(BITS):
        bit = (idx >> j) & jnp.uint32(1)
        out = out ^ (rows[..., j] * bit)
    return out


def validate_matrix(num_dims: int = 16, n: int = 256) -> bool:
    """Each dim's first 2^k points must be a (0, k, 1)-net in base 2
    (perfect stratification) — the defining Sobol' property."""
    V = direction_matrix()
    for d in range(num_dims):
        vals = np.zeros(n, np.uint32)
        for i in range(n):
            x, g = 0, i
            j = 0
            while g:
                if g & 1:
                    x ^= int(V[d, j])
                g >>= 1
                j += 1
            vals[i] = x
        u = vals.astype(np.float64) / 2 ** 32
        for k in (4, 16, 64, 256):
            if k > n:
                break
            counts = np.bincount((u * k).astype(int), minlength=k)
            if not (counts == n // k).all():
                return False
    return True
