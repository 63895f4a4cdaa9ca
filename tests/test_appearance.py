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


def test_sh_project_diffuse():
    """Diffuse lobe at normal incidence ≈ cosθ/π·albedo: its SH projection
    is dominated by Y_0^0 and Y_1^0 with known analytic values
    (∫cosθ/π·Y dω): c00 = albedo·Y00·π/π... checked numerically against
    direct quadrature."""
    from mitsuba_tpu.core import sh
    from mitsuba_tpu.util.appearance import sh_project_bsdf
    code, p, _ = Material(kind="diffuse", albedo=(0.6, 0.6, 0.6)).compile()
    c = np.asarray(sh_project_bsdf(code, p, theta_i=0.0, bands=3,
                                   n_samples=1 << 17))
    # quadrature reference over the hemisphere: f = 0.6·cosθ/π
    th = np.linspace(0, np.pi / 2, 256)
    ph = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1).reshape(-1, 3)
    w = (np.sin(tt) * (th[1] - th[0]) * (ph[1] - ph[0])).reshape(-1)
    f = 0.6 * np.maximum(d[:, 2], 0.0) / np.pi
    basis = np.asarray(sh.eval_basis(3, d))
    ref = (w * f)[:, None] * basis
    ref = ref.sum(0)
    assert np.abs(c - ref).max() < 0.02, (c, ref)


def test_albedo_cluster():
    from mitsuba_tpu.util.appearance import albedo_cluster
    img = np.zeros((16, 16, 3), np.float32)
    img[:8] = (0.9, 0.1, 0.1)
    img[8:] = (0.1, 0.1, 0.9)
    centers, labels = albedo_cluster(img, k=2, seed=1)
    assert labels.shape == (16, 16)
    assert (labels[:8] == labels[0, 0]).all()
    assert (labels[8:] == labels[8, 0]).all()
    assert labels[0, 0] != labels[8, 0]
    got = sorted(centers.tolist())
    assert np.allclose(got, [[0.1, 0.1, 0.9], [0.9, 0.1, 0.1]], atol=1e-4)


def test_volume_resample_roundtrip():
    from mitsuba_tpu.util.appearance import (volume_downsample,
                                             volume_upsample)
    rng = np.random.default_rng(3)
    g = rng.random((8, 8, 8)).astype(np.float32)
    down = volume_downsample(g, 2)
    assert down.shape == (4, 4, 4)
    assert abs(down.mean() - g.mean()) < 1e-6      # box filter conserves
    up = volume_upsample(down, 2)
    assert up.shape == (8, 8, 8)
    assert abs(up.mean() - g.mean()) < 0.02
    # constant volumes are exact fixed points both ways
    const = np.full((4, 4, 4), 0.7, np.float32)
    assert np.allclose(volume_upsample(const, 2), 0.7, atol=1e-6)
    assert np.allclose(volume_downsample(const, 2), 0.7, atol=1e-6)


def test_lobe_derivative():
    import jax
    import jax.numpy as jnp

    from mitsuba_tpu.util.appearance import lobe_derivative
    w = jnp.asarray([0.3, 0.7])
    lv = jnp.asarray([1.2, 0.4])
    f, d = lobe_derivative(w, lv)
    assert abs(float(f) - (0.3 * 1.2 + 0.7 * 0.4)) < 1e-6
    # matches autodiff of the mixture
    g = jax.grad(lambda ww: jnp.sum(ww * lv))(w)
    assert np.allclose(np.asarray(d), np.asarray(g) * 1.0)
