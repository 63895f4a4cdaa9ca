"""roughdielectric / ward / null / spot / directional tests."""
import numpy as np
import pytest

from mitsuba_tpu.bsdf import bsdf as B
from mitsuba_tpu.core import chi2, rng
from mitsuba_tpu.scene.builder import Material


def _compiled(kwargs):
    code, p, _ = Material(**kwargs).compile()
    return code, p


@pytest.mark.parametrize("name,kwargs,theta", [
    ("roughdielectric", dict(kind="roughdielectric", alpha=0.3), 0.5),
    ("roughdielectric_inside", dict(kind="roughdielectric", alpha=0.3),
     2.4),
    ("ward", dict(kind="ward", alpha=0.2, alpha_v=0.4,
                  diffuse_reflectance=(0.3,) * 3,
                  specular_reflectance=(0.5,) * 3), 0.7),
], ids=["roughdielectric", "rd_inside", "ward"])
def test_chi2(name, kwargs, theta):
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
        return np.asarray(B.pdf_bsdf(mt, p, wib, jnp.asarray(dirs)))

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=300_000)
    assert passed, (name, stats)


def test_roughdielectric_energy():
    """White rough glass: sampled weights are bounded and both lobes get
    visited; energy roughly conserved for alpha moderate."""
    import jax.numpy as jnp
    code, prow = _compiled(dict(kind="roughdielectric", alpha=0.2))
    n = 100_000
    wi = np.array([np.sin(0.4), 0, np.cos(0.4)], np.float32)
    p = jnp.broadcast_to(jnp.asarray(prow), (n, prow.shape[0]))
    mt = jnp.full((n,), code, jnp.int32)
    wib = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
    bs = B.sample_bsdf(mt, p, wib, rng.sample_2d(0, np.arange(n), 0),
                       rng.sample_1d(0, np.arange(n), 1))
    wo = np.asarray(bs.wo)
    w = np.asarray(bs.weight)
    ok = np.asarray(bs.pdf) > 0
    trans = ok & (wo[:, 2] < 0)
    refl = ok & (wo[:, 2] > 0)
    assert 0.5 < trans.sum() / ok.sum() < 0.99   # mostly transmits
    # transmission carries the 1/η² radiance compression (≈ 0.44 for BK7);
    # reflection is near-unit up to masking losses
    assert 0.35 < w[trans].mean() < 0.55, w[trans].mean()
    assert 0.70 < w[refl].mean() < 1.05, w[refl].mean()


def test_null_passthrough():
    import jax.numpy as jnp
    code, prow = _compiled(dict(kind="null"))
    wi = jnp.asarray(np.array([[0.3, 0.2, 0.93]], np.float32))
    bs = B.sample_bsdf(jnp.full((1,), code, jnp.int32),
                       jnp.broadcast_to(jnp.asarray(prow), (1, prow.shape[0])),
                       wi, jnp.zeros((1, 2)), jnp.zeros((1,)))
    assert np.allclose(np.asarray(bs.wo), -np.asarray(wi))
    assert np.allclose(np.asarray(bs.weight), 1.0)


def test_spot_and_directional():
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import (DirectionalLight, SceneDesc,
                                           SpotLight, compile_scene)
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    cam = PerspectiveCamera(
        width=32, height=32, fov_x=40.0,
        to_world=tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]))
    film = Film(width=32, height=32)

    # spot aimed at the center of a floor quad: bright center, dark edge
    d = SceneDesc()
    d.add_material(kind="diffuse", albedo=(1, 1, 1))
    d.add_shape(rectangle(), material=0)
    d.spot_lights.append(SpotLight(
        position=[0, 0, 2], direction=[0, 0, -1], intensity=[5, 5, 5],
        cutoff_angle=12.0, beam_width=8.0))
    img = np.asarray(render(compile_scene(d, cluster_size=128), cam, film,
                            PathTracer(max_depth=2, cluster_size=128),
                            spp=16, seed=0))
    assert img[16, 16].mean() > 0.2
    assert img[2, 2].mean() < 0.01 * img[16, 16].mean()

    # directional light at 45°: uniform shading ∝ cosθ
    d2 = SceneDesc()
    d2.add_material(kind="diffuse", albedo=(1, 1, 1))
    d2.add_shape(rectangle(), material=0)
    d2.directional_lights.append(DirectionalLight(
        direction=[0, -1, -1], irradiance=[1, 1, 1]))
    img2 = np.asarray(render(compile_scene(d2, cluster_size=128), cam,
                             film,
                             PathTracer(max_depth=2, cluster_size=128),
                             spp=16, seed=0))
    expect = (1 / np.pi) * np.cos(np.pi / 4)
    center = img2[16, 16].mean()
    assert abs(center - expect) / expect < 0.05, (center, expect)
