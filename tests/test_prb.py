"""Path-replay backprop vs naive autodiff and finite differences
(BASELINE config 4 — the north-star differentiable mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.prb import PRBPathTracer
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=16, height=16)
    px = jnp.arange(16 * 16, dtype=jnp.uint32)
    pix = jnp.stack([(px % 16).astype(jnp.float32) + 0.5,
                     (px // 16).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pix)
    return scene, o, d, px


def _naive_grads(scene, o, d, px, max_depth):
    integ = PathTracer(max_depth=max_depth,
                       cluster_size=128).specialized_for(scene)

    def loss(mat, em):
        sc = scene._replace(mat_params=mat, em_radiance=em)
        return jnp.mean(integ.li(sc, o, d, jnp.uint32(0), px, 0))

    return jax.jit(jax.grad(loss, argnums=(0, 1)))(
        scene.mat_params, scene.em_radiance)


@pytest.mark.parametrize("max_depth", [2, 3])
def test_prb_matches_naive_ad(setup, max_depth):
    """PRB gradients must match naive reverse-mode AD through the scan on
    the differentiated entries (albedo rgb, emitter radiance)."""
    scene, o, d, px = setup
    g_mat_ad, g_em_ad = _naive_grads(scene, o, d, px, max_depth)

    prb = PRBPathTracer(max_depth=max_depth,
                        cluster_size=128).specialized_for(scene)
    n = o.shape[0]
    dL = jnp.full((n, 3), 1.0 / (n * 3))   # adjoint of mean over lanes+rgb
    L, grads = jax.jit(lambda: prb.li_and_grad(
        scene, o, d, jnp.uint32(0), px, 0, dL))()

    # forward values agree with the plain tracer
    L_ref = PathTracer(max_depth=max_depth, cluster_size=128).li(
        scene, o, d, jnp.uint32(0), px, 0)
    assert np.allclose(np.asarray(L), np.asarray(L_ref), rtol=1e-5,
                       atol=1e-6)

    # albedo gradients (diffuse rows, cols 0:3) and emitter radiance
    gm_ad = np.asarray(g_mat_ad)[:, 0:3]
    gm_prb = np.asarray(grads["mat_params"])[:, 0:3]
    assert np.all(np.isfinite(gm_prb))
    assert np.allclose(gm_prb, gm_ad, rtol=2e-2,
                       atol=2e-4 * max(abs(gm_ad).max(), 1)), (
        gm_prb, gm_ad)
    ge_ad = np.asarray(g_em_ad)
    ge_prb = np.asarray(grads["em_radiance"])
    assert np.allclose(ge_prb, ge_ad, rtol=2e-2,
                       atol=2e-4 * max(abs(ge_ad).max(), 1)), (
        ge_prb, ge_ad)


def test_prb_gradcheck_fd(setup):
    """PRB vs central finite differences on the white-wall albedo."""
    scene, o, d, px = setup
    integ = PathTracer(max_depth=3, cluster_size=128).specialized_for(scene)

    def loss_at(mat):
        sc = scene._replace(mat_params=mat)
        return float(jnp.mean(integ.li(sc, o, d, jnp.uint32(0), px, 0)))

    prb = PRBPathTracer(max_depth=3,
                        cluster_size=128).specialized_for(scene)
    n = o.shape[0]
    dL = jnp.full((n, 3), 1.0 / (n * 3))
    _, grads = jax.jit(lambda: prb.li_and_grad(
        scene, o, d, jnp.uint32(0), px, 0, dL))()

    eps = 1e-3
    base = np.asarray(scene.mat_params)
    delta = np.zeros_like(base)
    delta[0, 0] = eps   # white albedo R
    fd = (loss_at(jnp.asarray(base + delta))
          - loss_at(jnp.asarray(base - delta))) / (2 * eps)
    ad = float(np.asarray(grads["mat_params"])[0, 0])
    assert abs(ad - fd) <= 2e-2 * max(abs(fd), 1e-3) + 2e-4, (ad, fd)
