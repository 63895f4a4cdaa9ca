"""Rough-transmittance tables (ref: src/bsdfs/rtrans.h +
data/microfacet/*.dat — here generated at build time, bsdf/rtrans.py)
and their use in roughplastic's diffuse coupling."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.bsdf import rtrans


def test_smooth_limit_matches_fresnel():
    """α→0: the rough transmittance must collapse to 1 − F(cosθ, η)."""
    pack = rtrans.transmittance_table(True)
    t, etas, alphas, coss = pack
    for ie in (3, 10, 20):
        eta = etas[ie]
        f = rtrans._fresnel(coss.astype(np.float64), float(eta))
        assert np.allclose(t[ie, 0], 1.0 - f, atol=5e-3), \
            np.abs(t[ie, 0] - (1 - f)).max()


def test_monotone_in_alpha_at_grazing():
    """At grazing incidence roughness increases transmittance (the rough
    interface 'sees' a more favorable average normal)."""
    t, etas, alphas, coss = rtrans.transmittance_table(True)
    graze = t[10, :, 2]          # eta ~2, cos ~0.07, over alpha
    assert graze[-1] > graze[0]


def test_lookup_interpolates():
    pack = rtrans.transmittance_table(True)
    t, etas, alphas, coss = pack
    got = float(rtrans.lookup(pack, jnp.asarray(float(etas[5])),
                              jnp.asarray(float(alphas[3])),
                              jnp.asarray(float(coss[7]))))
    assert abs(got - t[5, 3, 7]) < 1e-5
    # midpoint between two cos knots
    mid = 0.5 * (coss[7] + coss[8])
    got = float(rtrans.lookup(pack, jnp.asarray(float(etas[5])),
                              jnp.asarray(float(alphas[3])),
                              jnp.asarray(float(mid))))
    lo, hi = sorted([t[5, 3, 7], t[5, 3, 8]])
    assert lo - 1e-6 <= got <= hi + 1e-6


def test_roughplastic_smooth_alpha_matches_plastic():
    """roughplastic's diffuse term with tiny α must approach the smooth
    plastic diffuse term (same internal-scattering compensation)."""
    from mitsuba_tpu.bsdf.bsdf import plastic_eval, roughplastic_eval
    from mitsuba_tpu.scene.builder import Material

    def params(kind, alpha):
        m = Material(kind=kind, int_ior=1.5, ext_ior=1.0,
                     diffuse_reflectance=(0.5, 0.5, 0.5),
                     specular_reflectance=(0.0, 0.0, 0.0), alpha=alpha)
        _, p, _ = m.compile()
        return jnp.asarray(p)[None]

    wi = jnp.asarray([[0.3, 0.1, 0.95]])
    wi = wi / jnp.linalg.norm(wi)
    wo = jnp.asarray([[-0.2, 0.4, 0.89]])
    wo = wo / jnp.linalg.norm(wo)
    f_r = np.asarray(roughplastic_eval(params("roughplastic", 0.01),
                                       wi, wo))
    f_s = np.asarray(plastic_eval(params("plastic", 0.01), wi, wo))
    assert np.allclose(f_r, f_s, rtol=0.05), (f_r, f_s)


def test_diffuse_transmittance_smooth_limit():
    """α→0 internal diffuse transmittance must match the exact smooth
    quadrature 2∫(1−F(c, 1/η))·c dc (more accurate than the polynomial
    Fdr fit, which is ~3× off by η≈3.6)."""
    d, etas, alphas = rtrans.diffuse_transmittance_inv(True)
    c = np.sqrt((np.arange(100_000) + 0.5) / 100_000)
    for ie in (4, 10, 20):
        eta = float(etas[ie])
        want = float(np.mean(1.0 - rtrans._fresnel(c, 1.0 / eta)))
        assert abs(d[ie, 0] - want) < 0.01, (eta, d[ie, 0], want)
    # internal side with η=1.5-ish: heavy TIR → well under 1
    assert d[4, 0] < 0.6
