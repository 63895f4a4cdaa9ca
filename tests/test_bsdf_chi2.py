"""BSDF sample/pdf/eval consistency — the analog of the reference's
chi-square testcases over the bsdf fixture list (ref: src/tests/
test_chisquare.cpp:395 over data/tests/test_bsdf.xml).

For every smooth BSDF config: (1) chi2 GOF of sample() vs pdf(),
(2) weight identity sample.weight ≈ eval/pdf at the sampled direction."""
import numpy as np
import pytest

from mitsuba_tpu.bsdf import bsdf as B
from mitsuba_tpu.core import chi2, rng
from mitsuba_tpu.scene.builder import Material

# (name, Material kwargs, incident angle θi)
CONFIGS = [
    ("diffuse", dict(kind="diffuse", albedo=(0.8, 0.5, 0.3)), 0.5),
    ("roughdiffuse", dict(kind="roughdiffuse", albedo=(0.7,) * 3,
                          alpha=0.4), 0.9),
    ("roughconductor_smooth", dict(kind="roughconductor", alpha=0.08), 0.4),
    ("roughconductor_rough", dict(kind="roughconductor", alpha=0.4), 1.1),
    ("roughconductor_beckmann", dict(kind="roughconductor", alpha=0.3,
                                     distribution="beckmann"), 0.7),
    ("plastic", dict(kind="plastic"), 0.6),
    ("phong", dict(kind="phong", exponent=20.0), 0.7),
    ("roughplastic", dict(kind="roughplastic", alpha=0.3), 0.6),
    ("aniso_roughdiffuse", dict(kind="aniso_roughdiffuse",
                                albedo=(0.7,) * 3, moments0=(0.1, -0.05),
                                moments1=(0.11, 0.05, -0.005)), 0.6),
]


def _compiled(kwargs):
    code, p, _tex = Material(**kwargs).compile()
    return code, p


@pytest.mark.parametrize("name,kwargs,theta", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_bsdf_chi2(name, kwargs, theta):
    import jax.numpy as jnp
    code, prow = _compiled(kwargs)
    wi = np.array([np.sin(theta), 0.0, np.cos(theta)], np.float32)

    def sample_fn(n):
        p = jnp.broadcast_to(jnp.asarray(prow), (n, prow.shape[0]))
        mt = jnp.full((n,), code, jnp.int32)
        wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        u2 = rng.sample_2d(0, np.arange(n), 0)
        u1 = rng.sample_1d(0, np.arange(n), 1)
        bs = B.sample_bsdf(mt, p, wib, u2, u1)
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.asarray(jnp.where(ok[..., None], bs.wo, 0.0))

    def pdf_fn(dirs):
        n = dirs.shape[0]
        p = jnp.broadcast_to(jnp.asarray(prow), (n, prow.shape[0]))
        mt = jnp.full((n,), code, jnp.int32)
        wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        pdf = B.pdf_bsdf(mt, p, wib, jnp.asarray(dirs))
        if name == "plastic":
            # plastic pdf excludes the delta lobe; sampling rejects delta
            # picks above → the smooth pdf is the right comparison
            pass
        return np.asarray(pdf)

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=300_000)
    assert passed, (name, stats)


@pytest.mark.parametrize("name,kwargs,theta", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_weight_identity(name, kwargs, theta):
    """sample().weight == eval(wo)/pdf(wo) for non-delta samples."""
    import jax.numpy as jnp
    code, prow = _compiled(kwargs)
    n = 4096
    wi = np.array([np.sin(theta), 0.0, np.cos(theta)], np.float32)
    p = jnp.broadcast_to(jnp.asarray(prow), (n, prow.shape[0]))
    mt = jnp.full((n,), code, jnp.int32)
    wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
    u2 = rng.sample_2d(5, np.arange(n), 0)
    u1 = rng.sample_1d(5, np.arange(n), 1)
    bs = B.sample_bsdf(mt, p, wib, u2, u1)
    f = np.asarray(B.eval_bsdf(mt, p, wib, bs.wo))
    pdf = np.asarray(B.pdf_bsdf(mt, p, wib, bs.wo))
    w = np.asarray(bs.weight)
    ok = (np.asarray(bs.pdf) > 1e-5) & ~np.asarray(bs.is_delta) \
        & (pdf > 1e-5)
    ratio = w[ok] * pdf[ok, None] / np.maximum(f[ok], 1e-9)
    good = np.abs(ratio - 1.0) < 2e-2
    assert good.mean() > 0.98, (name, good.mean())
