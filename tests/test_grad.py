"""Differentiable rendering: gradient checks vs finite differences
(BASELINE config 4). The reference fork computes forward-mode derivative
images d(pixel)/d(albedo, lobe weights) (SURVEY Appendix A.9); here reverse-
mode AD through the whole renderer is checked against central differences
on the same scene parameters."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render_fn
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=16, height=16)
    film = Film(width=16, height=16, filter_name="box")
    integ = PathTracer(max_depth=3, cluster_size=128).specialized_for(scene)
    return scene, cam, film, integ


def _loss_fn(scene, cam, film, integ):
    def loss(mat_params, em_radiance):
        sc = scene._replace(mat_params=mat_params, em_radiance=em_radiance)
        img = render_fn(sc, cam, film, integ, spp=4, seed=0)
        return jnp.mean(img)
    return loss


def test_gradcheck_albedo_and_emitter(setup):
    """Reverse-mode d(loss)/d(albedo), d(loss)/d(radiance) match central
    finite differences. The fixed counter-based sample stream makes the
    estimator a deterministic differentiable function of the parameters, so
    FD agreement is tight (same paths on both sides of the perturbation)."""
    scene, cam, film, integ = setup
    loss = jax.jit(_loss_fn(scene, cam, film, integ))
    g_mat, g_em = jax.jit(jax.grad(_loss_fn(scene, cam, film, integ),
                                   argnums=(0, 1)))(
        scene.mat_params, scene.em_radiance)
    g_mat, g_em = np.asarray(g_mat), np.asarray(g_em)
    assert np.all(np.isfinite(g_mat)) and np.all(np.isfinite(g_em))

    eps = 1e-3
    checks = [
        # (leaf, index) — white albedo R, red albedo R, light radiance G
        ("mat", (0, 0)), ("mat", (1, 0)), ("em", (0, 1)),
    ]
    for leaf, idx in checks:
        if leaf == "mat":
            base = np.asarray(scene.mat_params)
            delta = np.zeros_like(base)
            delta[idx] = eps
            lp = float(loss(jnp.asarray(base + delta), scene.em_radiance))
            lm = float(loss(jnp.asarray(base - delta), scene.em_radiance))
            ad = g_mat[idx]
        else:
            base = np.asarray(scene.em_radiance)
            delta = np.zeros_like(base)
            delta[idx] = eps
            lp = float(loss(scene.mat_params, jnp.asarray(base + delta)))
            lm = float(loss(scene.mat_params, jnp.asarray(base - delta)))
            ad = g_em[idx]
        fd = (lp - lm) / (2 * eps)
        # tolerance dominated by f32 rounding of the FD quotient
        # (~1e-7 loss ulp / 2e-3 step ≈ 1e-4 absolute)
        assert np.abs(ad - fd) <= 1.5e-2 * max(abs(fd), 1e-3) + 2e-4, (
            leaf, idx, ad, fd)
        assert abs(fd) > 0, (leaf, idx)   # parameter actually matters


def test_grad_deterministic(setup):
    scene, cam, film, integ = setup
    gfn = jax.jit(jax.grad(_loss_fn(scene, cam, film, integ)))
    g1 = np.asarray(gfn(scene.mat_params, scene.em_radiance))
    g2 = np.asarray(gfn(scene.mat_params, scene.em_radiance))
    assert (g1 == g2).all()
