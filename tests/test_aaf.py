"""AAF soft-shadow filtering: noise must drop in penumbrae while fully
lit / fully shadowed regions stay unchanged."""
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.aaf import AAFIntegrator
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene.shapes import rectangle
from mitsuba_tpu.sensor.sensor import PerspectiveCamera


def _scene():
    d = SceneDesc()
    m = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    # ground plane
    d.add_shape(rectangle(), to_world=tf.rotate([1, 0, 0], -90)
                @ tf.scale(6.0), material=m)
    # floating occluder casting a soft shadow
    d.add_shape(rectangle(),
                to_world=tf.translate([0, 1.0, 0]) @ tf.rotate(
                    [1, 0, 0], -90) @ tf.scale(0.7), material=m)
    # area light above
    d.add_shape(rectangle(),
                to_world=tf.translate([0, 3.0, 0]) @ tf.rotate(
                    [1, 0, 0], 90) @ tf.scale(0.8),
                material=m, radiance=(12.0, 12.0, 12.0))
    return compile_scene(d, cluster_size=128)


def test_aaf_smooths_penumbra():
    scene = _scene()
    cam = PerspectiveCamera(
        width=48, height=48, fov_x=55.0,
        to_world=tf.look_at([0, 3.5, 4.5], [0, 0, 0], [0, 1, 0]))
    integ = AAFIntegrator(cluster_size=128, light_sigma=0.4,
                          max_filter_px=6)
    img, vis, vis_f, beta = integ.render(scene, cam,
                                         Film(width=48, height=48),
                                         spp=4, seed=0)
    img, vis, vis_f, beta = (np.asarray(x) for x in (img, vis, vis_f,
                                                     beta))
    assert np.isfinite(img).all()
    # penumbra = pixels with intermediate filtered visibility
    pen = (vis_f > 0.15) & (vis_f < 0.85)
    assert pen.sum() > 20, pen.sum()
    # raw visibility at 4 spp is quantised {0, .25, .5, .75, 1}; the
    # filtered channel must be smoother (higher-entropy local variation)
    def tv(a):  # total variation (noise proxy)
        return np.abs(np.diff(a, axis=0)).mean() \
            + np.abs(np.diff(a, axis=1)).mean()
    assert tv(vis_f) < 0.7 * tv(vis)
    # energy roughly preserved by the normalised blur
    assert abs(vis_f.mean() - vis.mean()) < 0.05
    # filter widths: large only where occlusion was seen
    assert beta.max() > 1.0
    assert beta.min() >= 0.5 - 1e-6
