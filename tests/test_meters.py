"""Radiance/irradiance meter sensors."""
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import (ConstantLight, SceneDesc,
                                       compile_scene)
from mitsuba_tpu.sensor.sensor import IrradianceMeter, RadianceMeter


def test_radiancemeter_env():
    d = SceneDesc()
    d.add_material(kind="diffuse")
    d.constant_light = ConstantLight(radiance=(2.0, 3.0, 4.0))
    scene = compile_scene(d, cluster_size=128)
    meter = RadianceMeter(to_world=tf.look_at([0, 0, 0], [0, 0, 1],
                                              [0, 1, 0]))
    film = Film(width=1, height=1)
    img = np.asarray(render(scene, meter, film,
                            PathTracer(max_depth=2, cluster_size=128),
                            spp=8, seed=0))
    assert np.allclose(img[0, 0], [2.0, 3.0, 4.0], rtol=1e-4)


def test_irradiancemeter_constant_env():
    """Constant env L: measured mean = L (irradiance E = π·L)."""
    d = SceneDesc()
    d.add_material(kind="diffuse")
    d.constant_light = ConstantLight(radiance=(1.5, 1.5, 1.5))
    scene = compile_scene(d, cluster_size=128)
    meter = IrradianceMeter()
    film = Film(width=1, height=1)
    img = np.asarray(render(scene, meter, film,
                            PathTracer(max_depth=2, cluster_size=128),
                            spp=256, seed=0))
    assert abs(img[0, 0, 0] - 1.5) < 0.02
