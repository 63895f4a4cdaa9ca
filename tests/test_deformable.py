"""DeformableMesh keyframe interpolation + motion-blur render smoke
(ref: src/shapes/deformable.cpp — vertex lerp between bracketing
keyframes at ray time)."""
import numpy as np

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.motion import render_motion
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
from mitsuba_tpu.scene.shapes import DeformableMesh, rectangle


def _deform():
    base = rectangle()
    f0 = np.asarray(base.vertices)
    f1 = f0 + [0.5, 0.0, 0.0]
    f2 = f0 + [1.0, 1.0, 0.0]
    return DeformableMesh(frames=np.stack([f0, f1, f2]),
                          faces=base.faces,
                          times=np.array([0.0, 0.5, 1.0]))


def test_keyframe_lerp_and_clamp():
    d = _deform()
    f0 = d.frames[0]
    np.testing.assert_allclose(d.at(0.0).vertices, f0)
    np.testing.assert_allclose(d.at(0.25).vertices,
                               f0 + [0.25, 0.0, 0.0])
    np.testing.assert_allclose(d.at(0.75).vertices,
                               f0 + [0.75, 0.5, 0.0])
    # clamped outside the keyframe range (reference clamps too)
    np.testing.assert_allclose(d.at(-1.0).vertices, f0)
    np.testing.assert_allclose(d.at(2.0).vertices, d.frames[2])
    # faces/topology unchanged
    np.testing.assert_array_equal(d.at(0.3).faces, d.faces)


def test_deformable_motion_render_blurs():
    """A box sweeping across the Cornell floor must light up pixels in
    both its t=0 and t=1 positions when rendered with motion blur."""
    base = cornell_box()
    cam = cornell_camera(width=24, height=24)
    film = Film(width=24, height=24)

    def desc_at(t):
        import dataclasses
        d = cornell_box()
        # translate one interior box along x over the shutter
        inst = d.shapes[-1]
        v = np.asarray(inst.mesh.vertices)
        dm = DeformableMesh(
            frames=np.stack([v, v + [0.25, 0.0, 0.0]]),
            faces=inst.mesh.faces, uvs=inst.mesh.uvs)
        d.shapes[-1] = dataclasses.replace(inst, mesh=dm.at(t))
        return d

    pt = PathTracer(max_depth=3, cluster_size=128)
    img_m = render_motion(desc_at, cam, film, pt, spp=8, n_time=4,
                          seed=0, cluster_size=128)
    img_0 = render_motion(desc_at(0.0), cam, film, pt, spp=8, n_time=1,
                          seed=0, cluster_size=128)
    assert np.isfinite(img_m).all() and img_m.mean() > 0
    # blurred render differs from the static t=0 render
    assert np.abs(img_m - img_0).mean() > 1e-4
