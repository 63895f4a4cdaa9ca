"""Sobol' sequence with hash-based Owen scrambling.

Counterpart of the reference's global Sobol' sampler (ref: src/samplers/
sobol.cpp, sobolseq.h:136), re-designed for the counter-based wavefront:
instead of shipping the 108k-line vendored Joe-Kuo direction-number table
(ref: src/samplers/sobolseq.cpp), direction numbers are *generated* at
import time from primitive polynomials over GF(2) found by search, with
initial values drawn deterministically from a hash (odd, in range — any
such choice yields a valid digital (t,s)-sequence in base 2; the classic
tables only tune cross-dimension projections, which the per-dimension-pair
Owen scrambling below randomizes anyway).

Scrambling is nested-uniform (Owen) via the Laine-Karras-style hash
(Burley, "Practical Hash-based Owen Scrambling", JCGT 2020): applied in
the reversed-bit domain, keyed per (seed, pixel, dimension), which both
decorrelates pixels (the role of the reference's global image-space
enumeration) and removes the unscrambled sequence's projection artifacts.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_U32 = jnp.uint32
_INV_2_32 = float(2.0 ** -32)

N_SOBOL_DIMS = 64


# ---------------------------------------------------------------------------
# direction-number generation (host side, import time)
# ---------------------------------------------------------------------------

def _primitive_polys(count: int) -> list[tuple[int, int]]:
    """First `count` primitive polynomials over GF(2), ordered by degree.
    Returns (degree s, a) where a packs interior coefficients a_1..a_{s-1}
    (Bratley-Fox convention: leading and trailing coefficient are 1)."""
    out = []
    degree = 1
    while len(out) < count:
        n = 1 << degree
        period = n - 1
        # proper divisors of the period (for primitivity order check)
        divs = [d for d in range(1, period) if period % d == 0]
        for interior in range(1 << max(degree - 1, 0)):
            # polynomial bits: x^s + (interior) + 1
            poly = (1 << degree) | (interior << 1) | 1
            # irreducibility + primitivity: order of x mod poly == period
            if not _is_primitive(poly, degree, period, divs):
                continue
            out.append((degree, interior))
            if len(out) == count:
                break
        degree += 1
    return out


def _polymod_mul(a: int, b: int, poly: int, degree: int) -> int:
    """Carry-less multiply mod `poly` in GF(2)[x]."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
        if a >> degree:
            a ^= poly
    return r


def _polymod_pow(base: int, e: int, poly: int, degree: int) -> int:
    r = 1
    while e:
        if e & 1:
            r = _polymod_mul(r, base, poly, degree)
        base = _polymod_mul(base, base, poly, degree)
        e >>= 1
    return r


def _is_primitive(poly: int, degree: int, period: int, divs) -> bool:
    if degree == 1:
        return poly == 0b11          # x + 1
    # x^period == 1 and x^d != 1 for all proper divisors d
    if _polymod_pow(2, period, poly, degree) != 1:
        return False
    for d in divs:
        if d > 1 and _polymod_pow(2, d, poly, degree) == 1:
            return False
    return True


def _hash64(x: int) -> int:
    """splitmix64 finalizer — deterministic initial direction numbers."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _build_matrices(n_dims: int) -> np.ndarray:
    """uint32 [D, 32] direction vectors v_k (column k of the generator
    matrix, MSB-aligned). Dim 0 is the van der Corput identity."""
    v = np.zeros((n_dims, 32), np.uint64)
    v[0] = [1 << (31 - k) for k in range(32)]
    polys = _primitive_polys(n_dims - 1)
    for d, (s, interior) in enumerate(polys, start=1):
        m = np.zeros(33, np.uint64)      # m_1..m_32 (1-indexed)
        for k in range(1, s + 1):
            # odd, < 2^k, deterministic
            m[k] = 2 * (_hash64(d * 1315423911 + k) % (1 << (k - 1))) + 1 \
                if k > 1 else 1 + 2 * (_hash64(d) % 1)  # m_1 = 1 always odd
        for k in range(s + 1, 33):
            acc = m[k - s] ^ (m[k - s] << s)
            for j in range(1, s):
                a_j = (interior >> (s - 1 - j)) & 1
                if a_j:
                    acc ^= m[k - j] << j
            m[k] = acc
        for k in range(1, 33):
            v[d, k - 1] = (m[k] << (32 - k)) & 0xFFFFFFFF
    return v.astype(np.uint32)


_SOBOL_V = _build_matrices(N_SOBOL_DIMS)
_SOBOL_V_J = jnp.asarray(_SOBOL_V)


# ---------------------------------------------------------------------------
# device-side evaluation
# ---------------------------------------------------------------------------

def _reverse_bits(x):
    x = jnp.asarray(x, _U32)
    x = ((x << 16) | (x >> 16)) & _U32(0xFFFFFFFF)
    x = ((x & _U32(0x00ff00ff)) << 8) | ((x & _U32(0xff00ff00)) >> 8)
    x = ((x & _U32(0x0f0f0f0f)) << 4) | ((x & _U32(0xf0f0f0f0)) >> 4)
    x = ((x & _U32(0x33333333)) << 2) | ((x & _U32(0xcccccccc)) >> 2)
    x = ((x & _U32(0x55555555)) << 1) | ((x & _U32(0xaaaaaaaa)) >> 1)
    return x


def owen_scramble(x, key):
    """Nested-uniform scramble of an MSB-aligned uint32 Sobol' value
    (Laine-Karras hash per Burley 2020, operating on reversed bits)."""
    x = _reverse_bits(x)
    key = jnp.asarray(key, _U32)
    x = x + key
    x = x ^ (x * _U32(0x6c50b47c))
    x = x ^ (x * _U32(0xb82f1e52))
    x = x ^ (x * _U32(0xc7afe638))
    x = x ^ (x * _U32(0x8d22f6e6))
    return _reverse_bits(x)


def sobol_u32(index, dim):
    """Raw (unscrambled) Sobol' sample, MSB-aligned uint32.

    index: uint32 array; dim: python int or traced int32 scalar (wraps mod
    the table size — higher path dimensions are pad-scrambled anyway)."""
    index = jnp.asarray(index, _U32)
    dim = jnp.asarray(dim, jnp.int32) % N_SOBOL_DIMS
    vrow = _SOBOL_V_J[dim]                         # [32] uint32

    def body(k, carry):
        y, idx = carry
        y = jnp.where((idx & 1) == 1, y ^ vrow[k], y)
        return y, idx >> 1

    y, _ = jax.lax.fori_loop(
        0, 32, body, (jnp.zeros_like(index), index))
    return y


def sobol_sample(index, dim: int, key):
    """Owen-scrambled Sobol' float in [0, 1)."""
    return owen_scramble(sobol_u32(index, dim), key).astype(
        jnp.float32) * _INV_2_32
