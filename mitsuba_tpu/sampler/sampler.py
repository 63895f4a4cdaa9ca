"""Sample generators: independent, stratified, low-discrepancy (0,2), Halton.

Counterparts of the reference sampler plugins (ref: src/samplers/
{independent,stratified,ldsampler,halton,hammersley,sobol}.cpp; interface
sampler.h:66-173). All samplers here are *stateless functions* of
(seed, pixel, sample_index, spp, dim) — the functional analog of the
reference's per-pixel deterministic streams (`generate(pixelOffset)` +
`setSampleIndex`), which is what path-replay backprop and the CPU oracle
need.

  independent — PCG4D hash (src/samplers/independent.cpp / SFMT)
  stratified  — jittered strata with a per-(pixel,dim) sample permutation
                (src/samplers/stratified.cpp)
  ld          — xor-scrambled (0,2)-sequence, padded per dimension pair
                (src/samplers/ldsampler.cpp)
  halton      — digit-scrambled radical inverse, prime per dimension
                (src/samplers/halton.cpp)
  hammersley  — first coordinate i/spp, rest radical inverse
                (src/samplers/hammersley.cpp)
  sobol       — Owen-scrambled Sobol' with generated direction numbers
                (src/samplers/sobol.cpp; see sampler/sobol.py)

Stratified/ld need spp (static); for 2D draws stratified uses a
⌈√spp⌉×⌈√spp⌉ grid like the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import rng

_U32 = jnp.uint32
_INV_2_32 = float(2.0 ** -32)

INDEPENDENT = "independent"
STRATIFIED = "stratified"
LD = "ldsampler"
HALTON = "halton"
HAMMERSLEY = "hammersley"
SOBOL = "sobol"

# first 64 primes (halton bases; dims beyond fall back to hashing)
_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
           59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
           127, 131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181,
           191, 193, 197, 199, 211, 223, 227, 229, 233, 239, 241, 251,
           257, 263, 269, 271, 277, 281, 283, 293, 307, 311]


def _perm(x, n, key):
    """Pseudorandom permutation of [0, n) via 3-round xor-mul Feistel-ish
    cipher keyed by `key` (Kensler-style, cycles until < n)."""
    x = jnp.asarray(x, _U32)
    key = jnp.asarray(key, _U32)
    # power-of-two domain cipher + cycle-walk
    bits = int(np.ceil(np.log2(max(n, 2))))
    mask = _U32((1 << bits) - 1)

    def one_round(v):
        v = v ^ key
        v = (v * _U32(0xe170893d)) & mask
        v = v ^ (v >> _U32(max(bits // 2, 1)))
        v = (v * _U32(0x0929eb3f)) & mask
        v = v ^ key
        return v & mask

    def cond(v):
        return v >= n

    v = one_round(x)
    # cycle-walk at most a few times (domain ≤ 2n)
    for _ in range(4):
        v = jnp.where(v >= n, one_round(v), v)
    return jnp.where(v >= n, x, v)  # give up → identity (measure-zero)


def _vdc(bits):
    """Base-2 radical inverse (bit reversal) of uint32."""
    bits = jnp.asarray(bits, _U32)
    bits = ((bits << 16) | (bits >> 16)) & _U32(0xFFFFFFFF)
    bits = ((bits & _U32(0x00ff00ff)) << 8) | ((bits & _U32(0xff00ff00)) >> 8)
    bits = ((bits & _U32(0x0f0f0f0f)) << 4) | ((bits & _U32(0xf0f0f0f0)) >> 4)
    bits = ((bits & _U32(0x33333333)) << 2) | ((bits & _U32(0xcccccccc)) >> 2)
    bits = ((bits & _U32(0x55555555)) << 1) | ((bits & _U32(0xaaaaaaaa)) >> 1)
    return bits


def _sobol2(index):
    """Second dimension of the (0,2)-sequence (Sobol' with m_i = 1)."""
    index = jnp.asarray(index, _U32)
    result = jnp.zeros_like(index)
    v = _U32(1 << 31)

    def body(i, carry):
        res, v, idx = carry
        res = jnp.where((idx & 1) == 1, res ^ v, res)
        idx = idx >> 1
        v = v ^ (v >> 1)
        return res, v, idx

    res, _, _ = jax.lax.fori_loop(
        0, 32, body, (result, jnp.broadcast_to(v, index.shape), index))
    return res


def _radical_inverse(index, base, scramble_key):
    """Digit-scrambled radical inverse in prime `base` (static python int).
    Scrambling: per-digit additive shift keyed by (digit position, key)."""
    index = jnp.asarray(index, jnp.uint32)
    n_digits = int(np.ceil(32 / np.log2(base)))
    inv_base = 1.0 / base

    def body(i, carry):
        val, idx, factor = carry
        digit = idx % base
        # additive digit scramble (Cranley-Patterson per digit)
        shift = (scramble_key >> (i % 27)) % base
        digit = (digit + shift) % base
        val = val + digit.astype(jnp.float32) * factor
        return val, idx // base, factor * inv_base

    val, _, _ = jax.lax.fori_loop(
        0, n_digits, body,
        (jnp.zeros(index.shape, jnp.float32), index,
         jnp.full(index.shape, inv_base, jnp.float32)))
    return jnp.minimum(val, 1.0 - 1e-7)


# ---------------------------------------------------------------------------
# public draw functions
# ---------------------------------------------------------------------------

def draw_1d(kind: str, seed, pixel, samp, spp: int, dim):
    """One uniform per lane; kind/spp static, rest traced arrays."""
    if kind == INDEPENDENT or spp <= 0:
        return rng.sample_1d(seed, pixel, dim, samp)
    h = rng.hash_u32(seed, pixel, dim, 0)
    if kind == STRATIFIED:
        s_perm = _perm(samp, spp, h[..., 0])
        jitter = rng.sample_1d(seed, pixel, dim, samp)
        return (s_perm.astype(jnp.float32) + jitter) / spp
    if kind == LD:
        idx = jnp.asarray(samp, _U32)
        bits = _vdc(idx) ^ h[..., 0]
        return bits.astype(jnp.float32) * _INV_2_32
    if kind == HALTON:
        base = _PRIMES[0]
        # global halton index: decorrelate pixels by index offset
        gidx = jnp.asarray(samp, jnp.uint32)
        return _radical_inverse(gidx, base, h[..., 0])
    if kind == HAMMERSLEY:
        # first coordinate = equispaced i/spp, per-pixel permuted
        s_perm = _perm(samp, spp, h[..., 0])
        return (s_perm.astype(jnp.float32) + 0.5) / spp
    if kind == SOBOL:
        from .sobol import sobol_sample
        return sobol_sample(samp, 2 * jnp.asarray(dim, jnp.int32),
                            h[..., 0])
    raise ValueError(f"unknown sampler {kind}")


def draw_2d(kind: str, seed, pixel, samp, spp: int, dim):
    if kind == INDEPENDENT or spp <= 0:
        return rng.sample_2d(seed, pixel, dim, samp)
    h = rng.hash_u32(seed, pixel, dim, 0)
    if kind == STRATIFIED:
        res = int(np.ceil(np.sqrt(spp)))
        n_strata = res * res
        s_perm = _perm(samp, min(spp, n_strata), h[..., 0])
        sx = (s_perm % res).astype(jnp.float32)
        sy = (s_perm // res).astype(jnp.float32)
        jit = rng.sample_2d(seed, pixel, dim, samp)
        return jnp.stack([(sx + jit[..., 0]) / res,
                          (sy + jit[..., 1]) / res], axis=-1)
    if kind == LD:
        idx = jnp.asarray(samp, _U32)
        b0 = _vdc(idx) ^ h[..., 0]
        b1 = _sobol2(idx) ^ h[..., 1]
        return jnp.stack([b0.astype(jnp.float32) * _INV_2_32,
                          b1.astype(jnp.float32) * _INV_2_32], axis=-1)
    if kind == HALTON:
        gidx = jnp.asarray(samp, jnp.uint32)
        u0 = _radical_inverse(gidx, _PRIMES[0], h[..., 0])
        u1 = _radical_inverse(gidx, _PRIMES[1], h[..., 1])
        return jnp.stack([u0, u1], axis=-1)
    if kind == HAMMERSLEY:
        s_perm = _perm(samp, spp, h[..., 0])
        u0 = (s_perm.astype(jnp.float32) + 0.5) / spp
        u1 = _radical_inverse(s_perm, _PRIMES[0], h[..., 1])
        return jnp.stack([u0, u1], axis=-1)
    if kind == SOBOL:
        from .sobol import sobol_sample
        d2 = 2 * jnp.asarray(dim, jnp.int32)
        u0 = sobol_sample(samp, d2, h[..., 0])
        u1 = sobol_sample(samp, d2 + 1, h[..., 1])
        return jnp.stack([u0, u1], axis=-1)
    raise ValueError(f"unknown sampler {kind}")
