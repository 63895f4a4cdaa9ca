"""Volumetric path tracing tests (BASELINE config 5)."""
import numpy as np
import pytest

from mitsuba_tpu.core import rng as jrng
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.volpath import VolPathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import Medium, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
from tests.oracle.volpath import render_volpath_oracle


def test_hg_chi2():
    """HG sampling matches its pdf (analog of test_chisquare.cpp phases)."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import chi2
    from mitsuba_tpu.phase.phase import hg_pdf, hg_sample
    for g in [-0.5, 0.0, 0.3, 0.8]:
        wi = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (1, 3))

        def sample_fn(n, g=g):
            u = jrng.sample_2d(0, np.arange(n), 0)
            wo, _ = hg_sample(g, jnp.broadcast_to(wi, (n, 3)), u)
            return np.asarray(wo)

        def pdf_fn(d, g=g):
            return np.asarray(hg_pdf(g, jnp.broadcast_to(wi, d.shape),
                                     jnp.asarray(d)))

        passed, stats = chi2.chi2_test(sample_fn, pdf_fn,
                                       n_samples=300_000)
        assert passed, (g, stats)
        assert abs(stats["total_pdf_mass"] - 1.0) < 1e-2, (g, stats)


def test_volpath_vacuum_matches_path():
    """With no medium, VolPathTracer must agree with PathTracer to MC noise
    (streams differ — volpath burns medium dims — so compare means)."""
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=32, height=32)
    film = Film(width=32, height=32)
    img_v = np.asarray(render(scene, cam, film,
                              VolPathTracer(max_depth=4, cluster_size=128),
                              spp=48, seed=0))
    img_p = np.asarray(render(scene, cam, film,
                              PathTracer(max_depth=4, cluster_size=128),
                              spp=48, seed=0))
    assert np.abs(img_v.mean() - img_p.mean()) / img_p.mean() < 0.03


def test_volpath_fog_vs_oracle():
    """Cornell box filled with scattering fog: JAX vs matched-stream
    numpy oracle."""
    desc = cornell_box()
    desc.medium = Medium(sigma_t=(0.8, 1.0, 1.2), albedo=(0.7, 0.7, 0.7),
                         g=0.2)
    scene = compile_scene(desc, cluster_size=128)
    cam = cornell_camera(width=32, height=32)
    film = Film(width=32, height=32)
    img = np.asarray(render(scene, cam, film,
                            VolPathTracer(max_depth=6, cluster_size=128),
                            spp=6, seed=2))
    ref = render_volpath_oracle(scene, cam, 32, 32, spp=6, seed=2,
                                max_depth=6)
    denom = np.maximum(ref, 1e-3)
    rel = np.abs(img - ref) / denom
    frac_bad = (rel > 5e-2).mean()
    assert frac_bad < 1e-2, (frac_bad, img.mean(), ref.mean())
    assert np.abs(img.mean() - ref.mean()) / ref.mean() < 5e-3


def test_absorption_beer_lambert():
    """Pure absorption: direct view of an emitter through the medium decays
    as exp(-σt·d) in expectation."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.scene.builder import SceneDesc
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    sigma = 0.5
    d = SceneDesc()
    d.add_material(kind="diffuse", albedo=(0, 0, 0))
    d.add_shape(rectangle(), material=0, radiance=(2.0, 2.0, 2.0))
    d.medium = Medium(sigma_t=(sigma,) * 3, albedo=(0.0, 0.0, 0.0))
    scene = compile_scene(d, cluster_size=128)
    dist = 3.0
    cam = PerspectiveCamera(
        width=8, height=8, fov_x=5.0,
        to_world=tf.look_at([0, 0, dist], [0, 0, 0], [0, 1, 0]))
    film = Film(width=8, height=8)
    img = np.asarray(render(scene, cam, film,
                            VolPathTracer(max_depth=2, cluster_size=128),
                            spp=1024, seed=0))
    expect = 2.0 * np.exp(-sigma * dist)
    # binary estimator (survive-to-surface) → average the whole 8×8 film
    # (fov 5° ⇒ per-pixel distance varies < 0.1%)
    got = img.mean()
    assert abs(got - expect) / expect < 0.03, (got, expect)
