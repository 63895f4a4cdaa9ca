"""Irawan woven-cloth BSDF: DSL parser, normalization bootstrap,
sample/eval/pdf consistency (ref: src/bsdfs/irawan.{h,cpp})."""
import math

import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.bsdf import irawan as ir
from mitsuba_tpu.bsdf import bsdf as B
from mitsuba_tpu.core import rng
from mitsuba_tpu.scene import scene as S

_TXT = '''
/* comment */ weave {
  name = "test", tileWidth = 2, tileHeight = 2,
  alpha = $alpha, beta = 4.0, ss = 0.5, hWidth = 0.5,
  warpArea = 0.6, weftArea = 0.4,
  pattern { 1, 2, 2, 1 },
  yarn { type = warp, psi = 0, umax = 25, kappa = 0.0, width = 2,
         length = 2, centerU = 0.5, centerV = 0.5,
         kd = {0.3, 0.3, 0.3}, ks = {0.4, 0.4, 0.4} },
  yarn { type = weft, psi = 0, umax = 25, kappa = 0.0, width = 2,
         length = 2, centerU = 0.5, centerV = 0.5,
         kd = {0.3, 0.2, 0.1}, ks = {0.4, 0.4, 0.4} }
}
'''


def test_parse_weave_dsl():
    wp = ir.parse_weave(_TXT, {"alpha": 0.1})
    assert wp.name == "test"
    assert wp.tile_width == 2 and wp.tile_height == 2
    assert wp.alpha == 0.1                       # $var substitution
    assert wp.pattern.tolist() == [[1, 2], [2, 1]]
    assert len(wp.yarns) == 2
    assert wp.yarns[0].type == 0 and wp.yarns[1].type == 1
    assert abs(wp.yarns[0].umax - 25 * math.pi / 180) < 1e-9  # degrees→rad
    assert wp.yarns[1].kd == (0.3, 0.2, 0.1)


def _sample(pat, n=8192, seed=3):
    ir.register_patterns([pat])
    p = np.zeros((n, 24), np.float32)
    p[:, 1] = p[:, 2] = 3.0                      # repeatU/V
    p[:, 22:24] = np.asarray(rng.sample_2d(seed, np.arange(n), 7))
    wi = np.array([0.4, 0.2, 0.89], np.float32)
    wi /= np.linalg.norm(wi)
    wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
    u2 = rng.sample_2d(seed, np.arange(n), 0)
    u1 = rng.sample_1d(seed, np.arange(n), 1)
    pj = jnp.asarray(p)
    return pj, wib, ir.irawan_sample(pj, wib, u2, u1)


def test_irawan_filament_and_staple_consistency():
    for pat in [ir.plain_weave(), ir.twill_weave(), ir.denim_weave()]:
        pj, wib, (wo, w, pdf, is_delta, _) = _sample(pat)
        w = np.asarray(w)
        assert np.isfinite(w).all() and (w >= 0).all()
        assert not np.asarray(is_delta).any()
        # weight identity: w == eval/pdf
        f = np.asarray(ir.irawan_eval(pj, wib, wo))
        pv = np.asarray(pdf)
        live = pv > 1e-6
        np.testing.assert_allclose(
            f[live] / pv[live][:, None], w[live], rtol=1e-4, atol=1e-5)
        # diffuse floor present: most samples carry at least kd/π·cos/pdf
        assert (w.sum(axis=-1) > 0).mean() > 0.95
        # specular highlights exist but are sparse
        diffuse_only = np.asarray(pat.yarns[0].kd).max() + 0.05
        assert 0.01 < (w.max(axis=-1) > diffuse_only).mean() < 0.9


def test_irawan_normalization_bounds_energy():
    """The normalization bootstrap keeps the mean albedo within a sane
    multiple of kd+ks (the model is not strictly energy conserving, but
    must not blow up)."""
    pat = ir.plain_weave()
    _, _, (wo, w, pdf, _, _) = _sample(pat, n=16384)
    mean_albedo = float(np.asarray(w).mean())
    assert 0.05 < mean_albedo < 2.0


def test_irawan_through_dispatch():
    """MAT_IRAWAN routes through the generic dispatch tables with uv in
    param slots 22:24."""
    pat = ir.twill_weave()
    ir.register_patterns([pat])
    n = 512
    p = np.zeros((n, 24), np.float32)
    p[:, 12] = S.MAT_IRAWAN
    p[:, 1] = p[:, 2] = 2.0
    p[:, 22:24] = np.asarray(rng.sample_2d(9, np.arange(n), 3))
    mt = jnp.full((n,), S.MAT_IRAWAN, jnp.int32)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.3, 0.954]), (n, 3))
    wo = jnp.broadcast_to(jnp.asarray([0.2, -0.1, 0.974]), (n, 3))
    f = np.asarray(B.eval_bsdf(mt, jnp.asarray(p), wi, wo))
    pv = np.asarray(B.pdf_bsdf(mt, jnp.asarray(p), wi, wo))
    assert np.isfinite(f).all() and (f >= 0).all()
    np.testing.assert_allclose(pv, 0.974 / np.pi, rtol=1e-3)
