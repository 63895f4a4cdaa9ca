"""Appearance-prefiltering utilities: analytic checks.

- bsdfSimulator: the simulated spherical distribution of a diffuse BSDF
  must approach cosθ/π over the upper hemisphere.
- SGGX fitting: an isotropic normal distribution → S ≈ (1/4)·... a
  sphere of normals has σ(d) constant; a fiber along z has σ(z) ≈ 0.
- normal mipmap: a flat map has zero variance at every level; a bumpy
  map's variance grows as levels coarsen.
"""
import numpy as np

from mitsuba_tpu.scene.builder import Material
from mitsuba_tpu.util.appearance import (normal_mipmap, sggx_downsample,
                                         sggx_from_normals,
                                         sggx_projected_area,
                                         simulate_bsdf,
                                         spherical_distribution)


def test_bsdf_simulator_diffuse():
    code, p, _ = Material(kind="diffuse", albedo=(0.75, 0.75, 0.75)
                          ).compile()
    hist, albedo = simulate_bsdf(code, p, theta_i=0.4,
                                 n_samples=1 << 18, res_theta=16,
                                 res_phi=32)
    hist = np.asarray(hist)
    assert abs(albedo - 0.75) < 0.01
    # distribution ∝ cosθ/π on the upper hemisphere, ~0 below
    centers = (np.arange(16) + 0.5) / 16 * np.pi
    upper = centers < np.pi / 2
    expected = np.cos(centers[upper]) / np.pi
    measured = hist[upper].mean(axis=1)
    rel = np.abs(measured - expected) / expected.max()
    assert rel.max() < 0.08, rel
    assert hist[~upper].max() < 1e-6


def test_sphere_distribution_normalised():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((200_000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    h = np.asarray(spherical_distribution(v, res_theta=16, res_phi=16))
    # uniform sphere → density 1/4π everywhere; polar bins carry the most
    # MC noise (equal-angle binning → tiny solid angles), so the per-bin
    # bound is loose while the mean is tight
    assert abs(h.mean() * 4 * np.pi - 1.0) < 1e-3
    assert np.allclose(h, 1.0 / (4 * np.pi), rtol=0.3)


def test_sggx_fit_isotropic_and_fiber():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((100_000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    s_iso = sggx_from_normals(v)
    # isotropic: σ(d) = 1/2 in every direction (E|n·d| for uniform n)
    for d in np.eye(3):
        assert abs(float(sggx_projected_area(s_iso, d)) - 0.5) < 0.01
    # fiber along z: normals in the xy plane → σ(z) ≈ 0, σ(x) ≈ 2/π
    ang = rng.uniform(0, 2 * np.pi, 100_000)
    fib = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], -1)
    s_fib = sggx_from_normals(fib)
    assert float(sggx_projected_area(s_fib, [0, 0, 1.0])) < 0.02
    assert abs(float(sggx_projected_area(s_fib, [1.0, 0, 0]))
               - 2 / np.pi) < 0.02
    # downsampling two identical matrices is the identity
    assert np.allclose(sggx_downsample([s_fib, s_fib]), s_fib)


def test_normal_mipmap_moments():
    flat = np.zeros((16, 16, 3)); flat[..., 2] = 1.0
    lv = normal_mipmap(flat)
    assert all((np.asarray(l[..., 2:4]) < 1e-12).all() for l in lv)
    # checkerboard of ±slope normals: variance appears once downsampled
    bump = np.zeros((16, 16, 3))
    s = 0.5
    sign = (-1.0) ** (np.arange(16)[:, None] + np.arange(16)[None, :])
    bump[..., 0] = s * sign
    bump[..., 2] = 1.0
    bump /= np.linalg.norm(bump, axis=-1, keepdims=True)
    lv = normal_mipmap(bump)
    assert lv[0][..., 2].max() < 1e-12          # finest: pure slopes
    assert lv[1][..., 2].min() > 0.1            # coarser: slope variance
