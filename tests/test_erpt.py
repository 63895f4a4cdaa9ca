"""ERPT consistency: energy-redistributed estimate must match the path
tracer (same integral; redistribution only reshapes variance)."""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.erpt import ERPT
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


def test_erpt_matches_path(cornell):
    cam = cornell_camera(width=16, height=16)
    film = Film(width=16, height=16)
    erpt = ERPT(max_depth=3, n_chains=2048, mutations_per_chain=64,
                seeds_per_chain=4,
                cluster_size=128).specialized_for(cornell)
    img_e, b, acc = erpt.render(cornell, cam, film, seed=2)
    img_e = np.asarray(img_e)
    img_p = np.asarray(render(
        cornell, cam, film,
        PathTracer(max_depth=3, rr_depth=99,
                   cluster_size=128).specialized_for(cornell),
        spp=128, seed=1))
    rel = abs(img_e.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.1, (img_e.mean(), img_p.mean(), rel)
    assert 0.05 < float(acc) < 0.95
    assert np.isfinite(img_e).all() and (img_e >= 0).all()
