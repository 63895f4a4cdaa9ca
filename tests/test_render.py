"""End-to-end rendering tests: JAX renderer vs CPU oracle (matched seeds),
plus physical sanity checks (furnace test)."""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import ConstantLight, SceneDesc, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
from mitsuba_tpu.scene.shapes import sphere
from tests.oracle.render import render_oracle


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box())


def test_cornell_direct_vs_oracle(cornell):
    """BASELINE config 1 (direct illumination) at reduced size: the JAX
    renderer and the numpy oracle consume the same sample stream, so images
    must agree to f32 tolerance — not just statistically."""
    cam = cornell_camera(width=64, height=64)
    film = Film(width=64, height=64, filter_name="box")
    integ = PathTracer(max_depth=2)
    img = np.asarray(render(cornell, cam, film, integ, spp=8, seed=0))
    ref = render_oracle(cornell, cam, 64, 64, spp=8, seed=0, max_depth=2)
    # tolerate a tiny fraction of decision-boundary pixels
    denom = np.maximum(ref, 1e-3)
    rel = np.abs(img - ref) / denom
    frac_bad = (rel > 5e-2).mean()
    assert frac_bad < 5e-3, (frac_bad, rel.max(), img.mean(), ref.mean())
    assert np.abs(img.mean() - ref.mean()) / ref.mean() < 1e-3


def test_cornell_path_vs_oracle(cornell):
    """BASELINE config 2: 8-bounce path tracing with NEE+MIS+RR."""
    cam = cornell_camera(width=48, height=48)
    film = Film(width=48, height=48, filter_name="box")
    integ = PathTracer(max_depth=8)
    img = np.asarray(render(cornell, cam, film, integ, spp=8, seed=3))
    ref = render_oracle(cornell, cam, 48, 48, spp=8, seed=3, max_depth=8)
    denom = np.maximum(ref, 1e-3)
    rel = np.abs(img - ref) / denom
    frac_bad = (rel > 5e-2).mean()
    assert frac_bad < 1e-2, (frac_bad, img.mean(), ref.mean())
    assert np.abs(img.mean() - ref.mean()) / ref.mean() < 5e-3


@pytest.mark.parametrize("albedo,expect", [(1.0, 1.0), (0.8, 0.8)])
def test_furnace(albedo, expect):
    """White furnace: a convex diffuse object with albedo ρ in a constant
    environment L reflects exactly ρ·L (NEE + BSDF-sample env MIS must sum
    to the full irradiance); at ρ=1 the object is indistinguishable from
    the background."""
    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(albedo,) * 3)
    d.add_shape(sphere(16, 32), material=white)
    d.constant_light = ConstantLight(radiance=(1.0, 1.0, 1.0))
    scene = compile_scene(d)

    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    cam = PerspectiveCamera(
        width=32, height=32, fov_x=45.0,
        to_world=tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]))
    film = Film(width=32, height=32, filter_name="box")
    img = np.asarray(render(scene, cam, film, PathTracer(max_depth=16),
                            spp=64, seed=1))
    center = img[12:20, 12:20].mean()   # fully on the sphere
    assert np.abs(center - expect) < 0.02, center
    # background = env exactly
    assert np.abs(img[0, 0].mean() - 1.0) < 1e-5


def test_point_light():
    """Point light inverse-square falloff on a diffuse floor patch."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.scene.builder import PointLight
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    d = SceneDesc()
    m = d.add_material(kind="diffuse", albedo=(1.0, 1.0, 1.0))
    d.add_shape(rectangle(), material=m)  # z=0 plane, normal +z
    d.point_lights.append(PointLight(position=[0, 0, 2],
                                     intensity=[1, 1, 1]))
    scene = compile_scene(d)
    cam = PerspectiveCamera(
        width=16, height=16, fov_x=10.0,
        to_world=tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]))
    film = Film(width=16, height=16, filter_name="box")
    img = np.asarray(render(scene, cam, film, PathTracer(max_depth=2),
                            spp=16, seed=0))
    # center pixel: L = albedo/pi * I * cos/d² = (1/pi)·(1/4)
    expect = 1.0 / np.pi / 4.0
    center = img[8, 8].mean()
    assert np.abs(center - expect) / expect < 0.02, (center, expect)


def test_image_io_roundtrip(tmp_path):
    from mitsuba_tpu.io.image import read_exr, read_pfm, write_exr, write_pfm
    img = np.random.rand(17, 23, 3).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    assert np.allclose(read_exr(p), img)
    p = str(tmp_path / "t.pfm")
    write_pfm(p, img)
    assert np.allclose(read_pfm(p), img)
