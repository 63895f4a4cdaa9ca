"""RNG: determinism, numpy-oracle bit parity, uniformity."""
import numpy as np

from mitsuba_tpu.core import rng
from tests.oracle import rng as orng


def test_oracle_bit_parity():
    idx = np.arange(4096, dtype=np.uint32)
    for seed in [0, 1, 12345]:
        for dim in [0, 3, 1000]:
            a = np.asarray(rng.hash_u32(seed, idx, dim))
            b = orng.hash_u32(seed, idx, dim)
            assert (a == b).all(), (seed, dim)


def test_float_range_and_determinism():
    u = np.asarray(rng.sample_2d(7, np.arange(100_000), 5))
    assert u.shape == (100_000, 2)
    assert (u >= 0).all() and (u < 1).all()
    u2 = np.asarray(rng.sample_2d(7, np.arange(100_000), 5))
    assert (u == u2).all()


def test_uniformity():
    u = np.asarray(rng.sample_1d(3, np.arange(1_000_000), 0))
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((hist - expected) ** 2 / expected).sum()
    # 63 dof: p=0.001 critical value ~ 103
    assert chi2 < 110, chi2


def test_decorrelated_dims():
    idx = np.arange(200_000)
    a = np.asarray(rng.sample_1d(3, idx, 0))
    b = np.asarray(rng.sample_1d(3, idx, 1))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01, corr
