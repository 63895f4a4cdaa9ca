"""Independent numpy reimplementation of the PCG4D sample stream.

Used by the CPU oracle renderer so that the JAX renderer and the numpy
reference consume bit-identical uniforms for matched-seed allclose tests
(BASELINE.md correctness target)."""
import numpy as np

U32 = np.uint32


def pcg4d(v: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        v = v.astype(U32)
        v = v * U32(1664525) + U32(1013904223)
        x, y, z, w = (v[..., 0].copy(), v[..., 1].copy(),
                      v[..., 2].copy(), v[..., 3].copy())
        x += y * w
        y += z * x
        z += x * y
        w += y * z
        x ^= x >> U32(16)
        y ^= y >> U32(16)
        z ^= z >> U32(16)
        w ^= w >> U32(16)
        x += y * w
        y += z * x
        z += x * y
        w += y * z
        return np.stack([x, y, z, w], axis=-1)


def hash_u32(seed, idx, dim, samp=0):
    seed, idx, dim, samp = np.broadcast_arrays(
        np.asarray(seed, U32), np.asarray(idx, U32), np.asarray(dim, U32),
        np.asarray(samp, U32))
    with np.errstate(over="ignore"):
        ctr = np.stack([idx, dim, seed, samp + U32(0x9E3779B9)], axis=-1)
    return pcg4d(ctr)


def _to_float(bits):
    return ((bits >> U32(8)).astype(np.float32)
            * np.float32(1.0 / (1 << 24)))


def sample_1d(seed, idx, dim, samp=0):
    return _to_float(hash_u32(seed, idx, dim, samp)[..., 0])


def sample_2d(seed, idx, dim, samp=0):
    return _to_float(hash_u32(seed, idx, dim, samp)[..., 0:2])
