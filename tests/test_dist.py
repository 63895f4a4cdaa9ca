"""Distributed rendering tests on the 8-virtual-device CPU mesh —
the deterministic multi-device harness the reference never had
(SURVEY.md §4)."""
import jax
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.parallel.dist import (make_mesh, render_grad_sharded,
                                       render_sharded, replicate_scene)
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=32, height=32)
    film = Film(width=32, height=32, filter_name="box")
    # specialized_for: without it the traced graph carries every material
    # family and the grad test compiles for tens of minutes on CPU
    integ = PathTracer(max_depth=3,
                       cluster_size=128).specialized_for(scene)
    return scene, cam, film, integ


def test_sharded_matches_single_device(setup):
    """Sharding the wavefront over 8 devices must not change the image at
    all — same sample streams, same splats, just different placement."""
    scene, cam, film, integ = setup
    img1 = np.asarray(render(scene, cam, film, integ, spp=4, seed=0))
    mesh = make_mesh()
    assert mesh.devices.size == 8
    scene_r = replicate_scene(scene, mesh)
    img8 = np.asarray(render_sharded(scene_r, cam, film, integ, spp=4,
                                     seed=0, mesh=mesh))
    assert np.allclose(img1, img8, rtol=1e-4, atol=1e-5), (
        np.abs(img1 - img8).max())


def test_sharded_grad_step(setup):
    """Distributed differentiable step: the 8-device psum'd gradients must
    equal plain single-device jax.grad through the same estimator."""
    import jax.numpy as jnp

    from mitsuba_tpu.render import render_fn
    scene, cam, film, integ = setup
    mesh8 = make_mesh(jax.devices()[:8])
    loss8, grads8 = render_grad_sharded(
        replicate_scene(scene, mesh8), cam, film, integ, spp=1, seed=0,
        mesh=mesh8)

    def plain_loss(mat, em):
        sc = scene._replace(mat_params=mat, em_radiance=em)
        return jnp.mean(render_fn(sc, cam, film, integ, 1, 0))

    loss_p, (g_mat, g_em) = jax.jit(jax.value_and_grad(
        plain_loss, argnums=(0, 1)))(scene.mat_params, scene.em_radiance)
    assert np.isfinite(float(loss8))
    assert np.allclose(float(loss8), float(loss_p), rtol=1e-5)
    for k, ref in [("mat_params", g_mat), ("em_radiance", g_em)]:
        g8 = np.asarray(grads8[k])
        assert np.all(np.isfinite(g8)), k
        assert np.allclose(g8, np.asarray(ref), rtol=1e-3,
                           atol=1e-6), (k, np.abs(g8 - ref).max())
