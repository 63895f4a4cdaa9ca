"""Microfacet distribution tests (analog of test_microfacet.cpp):
VNDF sampling consistency, NDF normalization, G1 sanity."""
import numpy as np
import pytest

from mitsuba_tpu.core import chi2, microfacet as mf, rng
from mitsuba_tpu.core.math import normalize


def _uniforms(n, seed=0):
    return np.asarray(rng.sample_2d(seed, np.arange(n), 0))


@pytest.mark.parametrize("dist", [mf.GGX, mf.BECKMANN])
@pytest.mark.parametrize("alpha", [0.1, 0.5])
def test_ndf_normalization(dist, alpha):
    """∫ D(m) cosθ dω = 1 over the hemisphere."""
    n = 512
    ct = (np.arange(n) + 0.5) / n  # cosθ in (0,1)
    ph = 2 * np.pi * (np.arange(n) + 0.5) / n
    ctg, phg = np.meshgrid(ct, ph, indexing="ij")
    st = np.sqrt(1 - ctg ** 2)
    m = np.stack([st * np.cos(phg), st * np.sin(phg), ctg], -1).reshape(-1, 3)
    d = np.asarray(mf.eval_d(m.astype(np.float32), alpha, alpha, dist))
    integral = (d * m[:, 2]).sum() * (1.0 / n) * (2 * np.pi / n)
    assert abs(integral - 1.0) < 2e-2, integral


@pytest.mark.parametrize("alpha", [0.1, 0.3, 0.8])
@pytest.mark.parametrize("theta_i", [0.2, 1.0, 1.4])
def test_vndf_chi2_ggx(alpha, theta_i):
    wi = np.array([np.sin(theta_i), 0.0, np.cos(theta_i)], np.float32)

    def sample_fn(n):
        wib = np.broadcast_to(wi, (n, 3))
        return np.asarray(mf.sample_visible(wib, _uniforms(n), alpha, alpha,
                                            mf.GGX))

    def pdf_fn(d):
        wib = np.broadcast_to(wi, d.shape)
        return np.asarray(mf.pdf_visible(wib, d.astype(np.float32),
                                         alpha, alpha, mf.GGX))

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=400_000)
    assert passed, stats
    assert abs(stats["total_pdf_mass"] - 1.0) < 2e-2, stats


def test_g1_limits():
    m = np.array([[0.0, 0.0, 1.0]], np.float32)
    v_normal = np.array([[0.0, 0.0, 1.0]], np.float32)
    g = np.asarray(mf.smith_g1(v_normal, m, 0.5, 0.5, mf.GGX))
    assert abs(g[0] - 1.0) < 1e-5
    # grazing → 0
    v_graze = normalize(np.array([[1.0, 0.0, 0.001]], np.float32))
    g = np.asarray(mf.smith_g1(np.asarray(v_graze), m, 0.5, 0.5, mf.GGX))
    assert g[0] < 0.02
