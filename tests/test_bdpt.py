"""BDPT consistency: must estimate the same image as the path tracer.

Mirrors the reference's cross-integrator strategy (test_renderer.cpp
compares plugin outputs on shared scenes): BDPT and PathTracer are
independent unbiased estimators of the same integral, so their
high-spp means must agree.
"""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.bdpt import BDPT
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


@pytest.fixture(scope="module")
def cam():
    return cornell_camera(width=24, height=24)


def _mean_img(scene, cam, integ, spp, seed):
    film = Film(width=24, height=24)
    return np.asarray(render(scene, cam, film, integ, spp=spp, seed=seed))


def test_bdpt_matches_path_depth2(cornell, cam):
    """Direct lighting only: the l∈{0,1} strategies alone must agree
    with a depth-2 path trace (same integral, different MIS split)."""
    img_b = _mean_img(cornell, cam,
                      BDPT(max_depth=2, cluster_size=128).specialized_for(cornell), 96, 0)
    img_p = _mean_img(cornell, cam,
                      PathTracer(max_depth=2, cluster_size=128, rr_depth=99).specialized_for(cornell),
                      96, 1)
    rel = abs(img_b.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.03, (img_b.mean(), img_p.mean(), rel)


def test_bdpt_matches_path_depth4(cornell, cam):
    """Full multi-strategy sum incl. subpath connections (l >= 2)."""
    img_b = _mean_img(cornell, cam,
                      BDPT(max_depth=4, cluster_size=128).specialized_for(cornell), 128, 0)
    img_p = _mean_img(cornell, cam,
                      PathTracer(max_depth=4, cluster_size=128, rr_depth=99).specialized_for(cornell),
                      128, 1)
    rel = abs(img_b.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.04, (img_b.mean(), img_p.mean(), rel)
    # per-pixel agreement in a smoothed sense: column means
    cb, cp = img_b.mean(axis=(0, 2)), img_p.mean(axis=(0, 2))
    assert np.abs(cb - cp).max() / img_p.mean() < 0.35


def test_bdpt_nonnegative_and_finite(cornell, cam):
    img = _mean_img(cornell, cam, BDPT(max_depth=3, cluster_size=128).specialized_for(cornell), 8, 0)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
