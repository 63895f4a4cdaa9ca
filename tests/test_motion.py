"""AnimatedTransform + motion-blur tests."""
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.track import AnimatedTransform
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.direct import DirectIntegrator
from mitsuba_tpu.integrator.motion import render_motion
from mitsuba_tpu.scene.builder import SceneDesc
from mitsuba_tpu.scene.shapes import rectangle, sphere
from mitsuba_tpu.sensor.sensor import PerspectiveCamera


def test_animated_transform_interpolation():
    at = AnimatedTransform()
    at.put(0.0, tf.translate([0, 0, 0]))
    at.put(1.0, tf.translate([2, 0, 0]) @ tf.rotate([0, 0, 1], 90.0)
           @ tf.scale(3.0))
    m0 = at.eval(0.0)
    mh = at.eval(0.5)
    m1 = at.eval(1.0)
    assert np.allclose(m0, np.eye(4), atol=1e-12)
    # keys reproduced exactly
    ref1 = tf.translate([2, 0, 0]) @ tf.rotate([0, 0, 1], 90.0) \
        @ tf.scale(3.0)
    assert np.allclose(m1, ref1, atol=1e-9)
    # halfway: translation lerps, rotation slerps (45°), scale lerps (2)
    assert np.allclose(mh[:3, 3], [1, 0, 0], atol=1e-9)
    c45 = np.cos(np.radians(45))
    assert np.allclose(mh[:3, 0] / 2.0, [c45, c45, 0], atol=1e-7)
    # clamping outside the range
    assert np.allclose(at.eval(-5.0), m0, atol=1e-12)
    assert np.allclose(at.eval(9.0), m1, atol=1e-12)


def test_motion_blur_streak():
    """A sphere translating across the frame must smear along its path:
    the time-averaged image is brighter at swept positions than a static
    render is away from the sphere."""
    at = AnimatedTransform()
    at.put(0.0, tf.translate([-0.8, 0, 0]) @ tf.scale(0.35))
    at.put(1.0, tf.translate([0.8, 0, 0]) @ tf.scale(0.35))

    def desc_at(t):
        d = SceneDesc()
        m = d.add_material(kind="diffuse", albedo=(0.8, 0.8, 0.8))
        d.add_shape(sphere(12, 16), to_world=at.eval(t), material=m)
        d.add_shape(rectangle(),
                    to_world=tf.translate([0, 0, 3]) @ tf.rotate(
                        [1, 0, 0], 180) @ tf.scale(4.0),
                    material=m, radiance=(6.0, 6.0, 6.0))
        return d

    cam = PerspectiveCamera(width=32, height=16, fov_x=80.0,
                            to_world=tf.look_at([0, 0, 2.5], [0, 0, 0],
                                                [0, 1, 0]))
    film = Film(width=32, height=16)
    integ = DirectIntegrator(cluster_size=128)
    img_blur = render_motion(desc_at, cam, film, integ, spp=16,
                             n_time=8, cluster_size=128)
    img_t0 = render_motion(desc_at(0.0), cam, film, integ, spp=16,
                           n_time=1, cluster_size=128)
    assert np.isfinite(img_blur).all()
    mid = img_blur.shape[0] // 2
    # at t=0 the sphere is on the LEFT: static render has it lit left,
    # background right; the blurred render spreads it across the row
    left = slice(2, 10)
    right = slice(22, 30)
    assert img_t0[mid, left].mean() > 2 * img_t0[mid, right].mean()
    ratio_blur = (img_blur[mid, left].mean()
                  / max(img_blur[mid, right].mean(), 1e-6))
    ratio_t0 = (img_t0[mid, left].mean()
                / max(img_t0[mid, right].mean(), 1e-6))
    assert ratio_blur < 0.6 * ratio_t0   # streak evens the row out
