"""Pallas trace kernel parity vs the XLA dense intersector.

Runs only on TPU (the kernel targets Mosaic); the driver's bench environment
exercises it. CPU CI covers the dense path via the oracle tests.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="pallas kernel needs TPU")


def test_pallas_matches_dense():
    import jax.numpy as jnp

    from mitsuba_tpu.accel.dense import ray_intersect, ray_test
    from mitsuba_tpu.accel.pallas_trace import (pallas_intersect,
                                                pallas_occluded)
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box

    scene = compile_scene(cornell_box(), cluster_size=64)
    rs = np.random.RandomState(0)
    n = 4096
    o = jnp.asarray(rs.rand(n, 3), jnp.float32)
    d = rs.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mint = jnp.full((n,), 1e-4)
    maxt = jnp.full((n,), 1e30)

    ip = jax.jit(lambda: pallas_intersect(scene, o, d, mint, maxt))()
    ix = jax.jit(lambda: ray_intersect(scene, o, d, mint, maxt,
                                       cluster_size=64))()
    assert (np.asarray(ip.valid) == np.asarray(ix.valid)).all()
    both = np.asarray(ip.valid)
    assert np.allclose(np.asarray(ip.t)[both], np.asarray(ix.t)[both],
                       rtol=1e-5)
    # shared-edge exact-tie lanes may pick either triangle
    tri_agree = (np.asarray(ip.tri_id)[both]
                 == np.asarray(ix.tri_id)[both])
    assert tri_agree.mean() > 0.99, tri_agree.mean()
    uv_close = np.abs(np.asarray(ip.uv)[both]
                      - np.asarray(ix.uv)[both]).max(-1) < 1e-5
    assert (uv_close | ~tri_agree).all()

    occ_p = jax.jit(lambda: pallas_occluded(scene, o, d, mint, maxt))()
    occ_x = jax.jit(lambda: ray_test(scene, o, d, mint, maxt,
                                     cluster_size=64))()
    assert (np.asarray(occ_p) == np.asarray(occ_x)).all()
