"""Cluster-indexed multi-lobe SGGX bundle tests
(ref: src/medium/heterogeneous2.cpp:94-104,500-560, volume2.h)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.media.bundle import (cluster_s6w, lookup_bundle,
                                      scaled_albedo)
from mitsuba_tpu.phase.phase import sggx_mix_sigma, sggx_sigma


def _iso_s6(scale):
    # S = scale * I -> (Sxx, Syy, Szz, Sxy, Sxz, Syz)
    return np.array([scale, scale, scale, 0, 0, 0], np.float32)


def test_lookup_bundle_channels():
    Z = Y = X = 4
    density = np.full((Z, Y, X, 1), 2.0, np.float32)
    albedo = np.full((Z, Y, X, 3), 0.5, np.float32)
    cluster = np.zeros((Z, Y, X), np.int32)
    cluster[:, :, X // 2:] = 1            # right half is cluster 1
    K = 2
    lobe_s6 = np.broadcast_to(
        np.stack([_iso_s6(1.0), _iso_s6(0.25)]), (Z, Y, X, K, 6)).copy()
    pdf_lobe = np.broadcast_to(np.array([0.75, 0.25], np.float32),
                               (Z, Y, X, K)).copy()
    p = jnp.array([[0.2, 0.5, 0.5], [0.9, 0.5, 0.5]])
    out = lookup_bundle(p, density=jnp.asarray(density),
                        albedo=jnp.asarray(albedo),
                        cluster=jnp.asarray(cluster),
                        lobe_s6=jnp.asarray(lobe_s6),
                        pdf_lobe=jnp.asarray(pdf_lobe))
    np.testing.assert_allclose(out["density"], [2.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(out["albedo"], 0.5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["cluster"]), [0, 1])
    assert out["lobe_s6"].shape == (2, K, 6)
    np.testing.assert_allclose(out["pdf_lobe"], [[0.75, 0.25]] * 2,
                               atol=1e-6)


def test_cluster_lobe_scales_change_sigma():
    # two clusters with different lobe scales -> different sigmaDir
    lobe_s6 = jnp.stack([jnp.asarray(_iso_s6(1.0)),
                         jnp.asarray(_iso_s6(0.25))])[None]   # [1,K,6]
    pdf_lobe = jnp.array([[0.5, 0.5]])
    lobe_scales = jnp.array([[1.0, 1.0], [2.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])

    s6w0 = cluster_s6w(lobe_s6, pdf_lobe, jnp.array([0]), lobe_scales)
    s6w1 = cluster_s6w(lobe_s6, pdf_lobe, jnp.array([1]), lobe_scales)
    sig0 = sggx_mix_sigma(s6w0, d)
    sig1 = sggx_mix_sigma(s6w1, d)
    # manual: sigma(iso S=s*I, d) = sqrt(s); weights = pdf * scale
    s_a = float(sggx_sigma(jnp.asarray(_iso_s6(1.0)), d[0]))
    s_b = float(sggx_sigma(jnp.asarray(_iso_s6(0.25)), d[0]))
    np.testing.assert_allclose(float(sig0[0]), 0.5 * s_a + 0.5 * s_b,
                               rtol=1e-5)
    np.testing.assert_allclose(float(sig1[0]), 1.0 * s_a, rtol=1e-5)


def test_scaled_albedo():
    albedo = jnp.array([[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]])
    scales = jnp.array([1.0, 0.2])
    out = scaled_albedo(albedo, jnp.array([0, 1]), scales)
    np.testing.assert_allclose(np.asarray(out),
                               [[0.5, 0.5, 0.5], [0.1, 0.1, 0.1]],
                               rtol=1e-6)
