"""Scaled-BSDF adapter tests (ref: src/bsdfs/sv_tabulated_scaled_bsdf.cpp,
sh_scaled_bsdf.cpp, heightmap_bsdf.cpp)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.bsdf.scaled import (angular_scale_eval, sh_scale_eval,
                                     square_to_uniform_hemisphere_concentric,
                                     uniform_hemisphere_to_square_concentric,
                                     uv_block_jitter)
from mitsuba_tpu.core import sh


def test_concentric_hemisphere_roundtrip():
    rng = np.random.default_rng(1)
    u = rng.uniform(0.02, 0.98, (512, 2)).astype(np.float32)
    d = square_to_uniform_hemisphere_concentric(jnp.asarray(u))
    # unit vectors on the upper hemisphere
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                               1.0, atol=1e-5)
    assert float(d[..., 2].min()) >= -1e-6
    back = uniform_hemisphere_to_square_concentric(d)
    np.testing.assert_allclose(np.asarray(back), u, atol=2e-5)


def test_angular_scale_constant_table():
    # constant table -> constant scale anywhere above the horizon
    tables = jnp.full((2, 2, 16, 16, 3), 2.5)
    uv = jnp.array([[0.1, 0.9], [0.6, 0.3]])
    wi = jnp.array([[0.0, 0.0, 1.0], [0.3, 0.0, 0.954]])
    wo = jnp.array([[0.1, 0.2, 0.974], [0.0, 0.0, 1.0]])
    s = angular_scale_eval(tables, uv, wi, wo)
    np.testing.assert_allclose(np.asarray(s), 2.5, rtol=1e-5)
    # below-horizon -> 0 (sv_tabulated_scaled_bsdf.cpp:87-88)
    s0 = angular_scale_eval(tables, uv[:1], jnp.array([[0., 0., -1.]]),
                            wo[:1])
    np.testing.assert_allclose(np.asarray(s0), 0.0)


def test_angular_scale_spatial_cells():
    # two spatial cells with different constant scales
    tables = np.zeros((1, 2, 9, 9, 3), np.float32)
    tables[0, 0] = 1.0
    tables[0, 1] = 3.0
    wi = jnp.array([[0.0, 0.0, 1.0]])
    wo = jnp.array([[0.0, 0.0, 1.0]])
    left = angular_scale_eval(jnp.asarray(tables),
                              jnp.array([[0.2, 0.5]]), wi, wo)
    right = angular_scale_eval(jnp.asarray(tables),
                               jnp.array([[0.7, 0.5]]), wi, wo)
    np.testing.assert_allclose(np.asarray(left), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(right), 3.0, rtol=1e-5)


def test_sh_scale_constant_band0():
    # single-band SH: scale = c0 * Y00 with Y00 = 1/(2 sqrt(pi))
    coeff = np.zeros((1, 2, 2, 3), np.float32)
    coeff[0, :, :, :] = 4.0
    wo = jnp.array([[0.0, 0.0, 1.0], [0.5, 0.0, 0.866]])
    s = sh_scale_eval(jnp.asarray(coeff), jnp.array([[0.3, 0.3]] * 2), wo)
    y00 = float(sh.eval_basis(1, wo)[0, 0])
    np.testing.assert_allclose(np.asarray(s), 4.0 * y00, rtol=1e-5)


def test_uv_block_jitter_stays_in_block():
    uv = jnp.array([[0.37, 0.62]])
    block = (0.25, 0.25)
    for u in ([0.0, 0.0], [0.999, 0.999], [0.5, 0.5]):
        j = uv_block_jitter(uv, block, jnp.array([u]))
        blk = np.floor(np.asarray(uv) / 0.25)
        assert (np.floor(np.asarray(j) / 0.25) == blk).all()
