"""HK (Hanrahan-Krueger) + tabulated BSDF tests: reciprocity/limits for
HK, exactness of the tabulated family against its source function."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu.bsdf.bsdf as B
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.chi2 import chi2_test
from mitsuba_tpu.scene.builder import Material


def _compiled(kw):
    code, p, _ = Material(**kw).compile()
    return code, jnp.asarray(p)


def _dirs(theta, phi=0.3):
    return np.array([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)], np.float32)


def test_hk_energy_and_sides():
    code, p = _compiled(dict(kind="hk", sigma_s=(1.0, 1.0, 1.0),
                             sigma_a=(0.2, 0.2, 0.2), thickness=0.5,
                             g=0.3))
    n = 50_000
    wi = jnp.broadcast_to(jnp.asarray(_dirs(0.5)), (n, 3))
    pr = jnp.broadcast_to(p, (n, B_P := p.shape[0]))
    mt = jnp.full((n,), code, jnp.int32)
    bs = B.sample_bsdf(mt, pr, wi, rng.sample_2d(0, np.arange(n), 0),
                       rng.sample_1d(0, np.arange(n), 1))
    w = np.asarray(bs.weight)
    # single-scattering slab reflects+transmits less than it receives
    assert 0.0 < w.mean() < 1.0
    wo = np.asarray(bs.wo)
    # both hemispheres are populated (reflection AND transmission)
    assert (wo[:, 2] > 0).any() and (wo[:, 2] < 0).any()


def test_hk_chi2():
    code, p = _compiled(dict(kind="hk", sigma_s=(0.8, 0.8, 0.8),
                             sigma_a=(0.1, 0.1, 0.1), thickness=1.0,
                             g=-0.2))
    wi = _dirs(0.9)

    def sample_fn(n):
        pr = jnp.broadcast_to(p, (n, p.shape[0]))
        mt = jnp.full((n,), code, jnp.int32)
        wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        bs = B.sample_bsdf(mt, pr, wib, rng.sample_2d(0, np.arange(n), 0),
                           rng.sample_1d(0, np.arange(n), 1))
        return np.asarray(bs.wo)

    def pdf_fn(dirs):
        n = dirs.shape[0]
        pr = jnp.broadcast_to(p, (n, p.shape[0]))
        mt = jnp.full((n,), code, jnp.int32)
        wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        return np.asarray(B.pdf_bsdf(mt, pr, wib, jnp.asarray(dirs)))

    passed, stats = chi2_test(sample_fn, pdf_fn, n_samples=200_000,
                              res_theta=8, res_phi=8)
    assert passed, stats


def test_tabulated_matches_lambertian():
    """A table filled with f = albedo/π must reproduce the diffuse BSDF
    exactly (bilinear interp of a constant table is exact)."""
    from mitsuba_tpu.bsdf.tabulated_pool import (register_tables,
                                                 tabulate_lambertian)
    albedo = (0.6, 0.4, 0.2)
    register_tables(tabulate_lambertian(albedo)[None])
    code_t, pt = _compiled(dict(kind="tabulated", table_id=0))
    code_d, pd = _compiled(dict(kind="diffuse", albedo=albedo))
    n = 4096
    wi = jnp.broadcast_to(jnp.asarray(_dirs(0.7)), (n, 3))
    u2 = rng.sample_2d(3, np.arange(n), 0)
    wo = np.asarray(jnp.stack([
        jnp.sqrt(u2[..., 0]) * jnp.cos(2 * np.pi * u2[..., 1]),
        jnp.sqrt(u2[..., 0]) * jnp.sin(2 * np.pi * u2[..., 1]),
        jnp.sqrt(jnp.maximum(1 - u2[..., 0], 0.0))], axis=-1))
    f_t = np.asarray(B.eval_bsdf(jnp.full((n,), code_t, jnp.int32),
                                 jnp.broadcast_to(pt, (n, pt.shape[0])),
                                 wi, jnp.asarray(wo)))
    f_d = np.asarray(B.eval_bsdf(jnp.full((n,), code_d, jnp.int32),
                                 jnp.broadcast_to(pd, (n, pd.shape[0])),
                                 wi, jnp.asarray(wo)))
    assert np.allclose(f_t, f_d, atol=2e-5), np.abs(f_t - f_d).max()
    # weight identity: sample weight = f/pdf for the cosine sampler
    bs = B.sample_bsdf(jnp.full((n,), code_t, jnp.int32),
                       jnp.broadcast_to(pt, (n, pt.shape[0])), wi,
                       rng.sample_2d(0, np.arange(n), 0),
                       rng.sample_1d(0, np.arange(n), 1))
    assert np.allclose(np.asarray(bs.weight), np.asarray(albedo),
                       atol=1e-4)
    register_tables(None)
