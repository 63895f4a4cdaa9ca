"""Integrator family tests: direct, ao, field AOVs, cross-checks."""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.direct import DirectIntegrator
from mitsuba_tpu.integrator.misc import AmbientOcclusion, FieldIntegrator
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


@pytest.fixture(scope="module")
def cam():
    return cornell_camera(width=32, height=32)


def test_direct_matches_path_depth2(cornell, cam):
    """DirectIntegrator(1,1) estimates the same integral as
    PathTracer(max_depth=2) — compare means across spp."""
    film = Film(width=32, height=32)
    img_d = np.asarray(render(cornell, cam, film,
                              DirectIntegrator(cluster_size=128),
                              spp=64, seed=0))
    img_p = np.asarray(render(cornell, cam, film,
                              PathTracer(max_depth=2, cluster_size=128),
                              spp=64, seed=1))
    assert np.abs(img_d.mean() - img_p.mean()) / img_p.mean() < 0.02, (
        img_d.mean(), img_p.mean())


def test_direct_sample_splitting(cornell, cam):
    """More emitter samples reduce variance but keep the mean."""
    film = Film(width=32, height=32)
    img1 = np.asarray(render(cornell, cam, film,
                             DirectIntegrator(cluster_size=128),
                             spp=32, seed=0))
    img4 = np.asarray(render(
        cornell, cam, film,
        DirectIntegrator(cluster_size=128, emitter_samples=4),
        spp=32, seed=0))
    assert np.abs(img1.mean() - img4.mean()) / img1.mean() < 0.03


def test_ao(cornell, cam):
    film = Film(width=32, height=32)
    # finite ray length: local occlusion only (Cornell box is closed up to
    # the camera opening, so infinite rays would darken everything)
    img = np.asarray(render(
        cornell, cam, film,
        AmbientOcclusion(cluster_size=128, ray_length=0.25),
        spp=32, seed=0))
    assert 0.4 < img.mean() < 0.98, img.mean()
    # open back-wall center is brighter than the wall-floor corner
    assert img[16, 16].mean() > img[31, 16].mean()


def test_field_aovs(cornell, cam):
    film = Film(width=32, height=32)
    # depth: center pixel ≈ distance to back wall (camera at z=2.45)
    depth = np.asarray(render(
        cornell, cam, film,
        FieldIntegrator(cluster_size=128, field="distance"),
        spp=4, seed=0))
    assert 2.0 < depth[16, 16, 0] < 2.6
    # shading normal of back wall ≈ +z
    n = np.asarray(render(
        cornell, cam, film,
        FieldIntegrator(cluster_size=128, field="shNormal"),
        spp=4, seed=0))
    assert n[16, 16, 2] > 0.9
    # albedo of left wall is red-dominant
    alb = np.asarray(render(
        cornell, cam, film,
        FieldIntegrator(cluster_size=128, field="albedo"),
        spp=4, seed=0))
    left = alb[16, 2]
    assert left[0] > 3 * left[1]
