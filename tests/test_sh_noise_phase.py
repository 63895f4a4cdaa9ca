"""Tests for SH, Perlin noise, Sobol sampler, and the extended phase
functions (SGGX microflake, Rayleigh sampling, Kajiya-Kay, mixture) —
mirrors the reference's test_sh.cpp / test_samplers.cpp / chi-square
phase tests (SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import sh
from mitsuba_tpu.core.noise import fbm, perlin, turbulence
from mitsuba_tpu.phase.phase import (hg_eval, kkay_eval, mixture_hg_sample,
                                     rayleigh_eval, rayleigh_sample,
                                     sggx_ndf, sggx_sigma,
                                     sggx_specular_eval,
                                     sggx_specular_sample)
from mitsuba_tpu.sampler.sobol import owen_scramble, sobol_sample, sobol_u32


def _sphere(n, seed=0):
    rs = np.random.RandomState(seed)
    d = rs.randn(n, 3)
    return d / np.linalg.norm(d, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Sobol
# ---------------------------------------------------------------------------

def test_sobol_elementary_intervals():
    """First 2^k points of every dimension stratify into distinct 2^-k
    cells — the defining (0,1)-sequence property."""
    idx = jnp.arange(256, dtype=jnp.uint32)
    for d in [0, 1, 2, 5, 13, 31, 63]:
        x = np.asarray(sobol_u32(idx, d)).astype(np.uint64)
        for k in [4, 8]:
            cells = x[: 1 << k] >> (32 - k)
            assert len(set(cells.tolist())) == 1 << k


def test_owen_scramble_bijective_and_stratified():
    idx = jnp.arange(256, dtype=jnp.uint32)
    x = sobol_u32(idx, 7)
    s = np.asarray(owen_scramble(x, jnp.uint32(0xABCD1234)))
    assert len(set(s.tolist())) == len(s)
    for k in [4, 8]:
        cells = s[: 1 << k].astype(np.uint64) >> (32 - k)
        assert len(set(cells.tolist())) == 1 << k


def test_sobol_sampler_uniform():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    u = np.asarray(sobol_sample(idx, 4, jnp.uint32(99)))
    assert abs(u.mean() - 0.5) < 0.01
    assert (u >= 0).all() and (u < 1).all()
    # integration test: E[u^2] = 1/3 at LD convergence
    assert abs((u ** 2).mean() - 1.0 / 3.0) < 1e-3


def test_sampler_draw_sobol_hammersley():
    from mitsuba_tpu.sampler.sampler import draw_1d, draw_2d
    pix = jnp.arange(128, dtype=jnp.uint32)
    for kind in ["sobol", "hammersley"]:
        u1 = np.asarray(draw_1d(kind, 7, pix, pix % 16, 16, 3))
        u2 = np.asarray(draw_2d(kind, 7, pix, pix % 16, 16, 3))
        assert (u1 >= 0).all() and (u1 <= 1).all()
        assert (u2 >= 0).all() and (u2 <= 1).all()


# ---------------------------------------------------------------------------
# Phases
# ---------------------------------------------------------------------------

def test_sggx_specular_normalized_and_consistent():
    s6 = jnp.asarray([1.0, 0.5, 0.1, 0.0, 0.0, 0.0], jnp.float32)
    d = jnp.asarray(_sphere(100000), jnp.float32)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), d.shape)
    ph = np.asarray(sggx_specular_eval(s6, wi, d))
    assert abs(ph.mean() * 4 * np.pi - 1.0) < 0.02   # energy conservation
    # perfect importance sampling: pdf == eval at sampled directions
    rs = np.random.RandomState(3)
    u2 = jnp.asarray(rs.rand(2048, 2), jnp.float32)
    wi1 = jnp.broadcast_to(jnp.asarray([0.0, 0.6, 0.8]), (2048, 3))
    wo, pdf = sggx_specular_sample(s6, wi1, u2)
    pe = sggx_specular_eval(s6, wi1, wo)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(pdf), rtol=1e-4)
    assert np.abs(np.linalg.norm(np.asarray(wo), axis=1) - 1).max() < 1e-5


def test_sggx_sigma_projected_area():
    # isotropic S = a²·I ⇒ σ(d) = a for every direction
    a = 0.3
    s6 = jnp.asarray([a * a, a * a, a * a, 0, 0, 0], jnp.float32)
    d = jnp.asarray(_sphere(64), jnp.float32)
    np.testing.assert_allclose(np.asarray(sggx_sigma(s6, d)), a, rtol=1e-5)


def test_rayleigh_sampling_exact():
    rs = np.random.RandomState(5)
    u2 = jnp.asarray(rs.rand(50000, 2), jnp.float32)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (50000, 3))
    wo, pdf = rayleigh_sample(wi, u2)
    f = rayleigh_eval(jnp.sum(wi * wo, axis=-1))
    np.testing.assert_allclose(np.asarray(f), np.asarray(pdf), rtol=1e-4)
    # eval integrates to 1
    d = jnp.asarray(_sphere(100000), jnp.float32)
    assert abs(np.asarray(rayleigh_eval(d[..., 2])).mean() * 4 * np.pi
               - 1.0) < 0.01


def test_mixture_hg_consistency():
    rs = np.random.RandomState(7)
    n = 50000
    u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
    u1 = jnp.asarray(rs.rand(n), jnp.float32)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wo, pdf = mixture_hg_sample(0.3, 0.7, -0.2, wi, u2, u1)
    ct = jnp.sum(wi * wo, axis=-1)
    f = 0.3 * hg_eval(0.7, ct) + 0.7 * hg_eval(-0.2, ct)
    # f/pdf should be 1 in expectation (here exactly, since pdf == f)
    np.testing.assert_allclose(np.asarray(f), np.asarray(pdf), rtol=1e-4)


def test_kkay_positive_and_bounded_energy():
    fiber = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (100000, 3))
    d = jnp.asarray(_sphere(100000), jnp.float32)
    wi = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), d.shape)
    v = np.asarray(kkay_eval(fiber, wi, d))
    assert (v >= 0).all()
    integral = v.mean() * 4 * np.pi
    assert 0.05 < integral < 1.5   # not energy-conserving by design


# ---------------------------------------------------------------------------
# Spherical harmonics
# ---------------------------------------------------------------------------

def test_sh_orthonormal():
    d = jnp.asarray(_sphere(200000, seed=11), jnp.float32)
    bands = 4
    b = np.asarray(sh.eval_basis(bands, d))
    gram = b.T @ b * (4 * np.pi / b.shape[0])
    assert np.abs(gram - np.eye(bands * bands)).max() < 0.03


def test_sh_project_reconstruct():
    # project a band-limited function and reconstruct it exactly
    coeffs_true = np.zeros(9, np.float32)
    coeffs_true[sh.sh_index(0, 0)] = 1.0
    coeffs_true[sh.sh_index(1, 0)] = 0.5
    coeffs_true[sh.sh_index(2, 1)] = -0.3

    def fn(d):
        return sh.eval_sh(jnp.asarray(coeffs_true), d)

    c = np.asarray(sh.project_grid(3, fn, 64, 128))
    np.testing.assert_allclose(c, coeffs_true, atol=2e-3)


def test_sh_rotate_z():
    coeffs = np.zeros(9, np.float32)
    coeffs[sh.sh_index(1, 1)] = 1.0     # ∝ x
    rot = sh.rotate_z(jnp.asarray(coeffs), jnp.pi / 2)
    d = jnp.asarray(_sphere(1000, seed=2), jnp.float32)
    # rotating the function by 90° about z: f'(x,y,z) = f(y, -x, z)
    d_back = jnp.stack([d[..., 1], -d[..., 0], d[..., 2]], axis=-1)
    np.testing.assert_allclose(np.asarray(sh.eval_sh(rot, d)),
                               np.asarray(sh.eval_sh(
                                   jnp.asarray(coeffs), d_back)),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Noise
# ---------------------------------------------------------------------------

def test_perlin_range_and_smoothness():
    rs = np.random.RandomState(1)
    p = jnp.asarray(rs.rand(20000, 3) * 20, jnp.float32)
    v = np.asarray(perlin(p))
    assert v.min() >= -1.0 and v.max() <= 1.0
    assert v.std() > 0.05                      # non-degenerate
    # lattice points are exact zeros for gradient noise
    pi = jnp.asarray(rs.randint(0, 100, (100, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(perlin(pi)), 0.0, atol=1e-6)


def test_fbm_turbulence():
    rs = np.random.RandomState(2)
    p = jnp.asarray(rs.rand(1000, 3) * 8, jnp.float32)
    f = np.asarray(fbm(p, octaves=4))
    t = np.asarray(turbulence(p, octaves=4))
    assert np.isfinite(f).all() and np.isfinite(t).all()
    assert (t >= 0).all()
