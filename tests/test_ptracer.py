"""Light tracing (ptracer) vs eye-path tracing: both estimate the same
image — the classic bidirectional consistency check."""
import numpy as np

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.ptracer import ParticleTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


def test_ptracer_matches_path():
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=24, height=24)
    film = Film(width=24, height=24)

    img_pt = np.asarray(render(scene, cam, film,
                               PathTracer(max_depth=3, cluster_size=128),
                               spp=96, seed=0))
    lt = ParticleTracer(max_depth=3, cluster_size=128)
    img_lt = np.mean([np.asarray(
        lt.render(scene, cam, n_particles=1 << 17, seed=s))
        for s in range(3)], axis=0)

    # global brightness matches
    assert np.abs(img_lt.mean() - img_pt.mean()) / img_pt.mean() < 0.08, (
        img_lt.mean(), img_pt.mean())
    # spatial structure correlates (both show the same illumination)
    a = img_pt.mean(-1).ravel()
    b = img_lt.mean(-1).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.8, corr


def test_ptracer_energy_finite():
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=16, height=16)
    lt = ParticleTracer(max_depth=5, cluster_size=128)
    img = np.asarray(lt.render(scene, cam, n_particles=1 << 15, seed=1))
    assert np.isfinite(img).all()
    assert img.min() >= 0
    assert img.mean() > 0.01
