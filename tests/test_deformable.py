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


def test_per_ray_time_intersector():
    """accel/motion.py: per-ray-time Möller–Trumbore against lerped
    keyframes agrees with the static intersector evaluated at each
    endpoint time, and hits move continuously in between."""
    import jax.numpy as jnp

    from mitsuba_tpu.accel.dense import build_woop, intersect_soup
    from mitsuba_tpu.accel.motion import intersect_motion, triangle_buffers
    from mitsuba_tpu.scene.shapes import Mesh, rectangle

    base = rectangle()          # z=0 quad spanning [-1,1]^2
    v0 = np.asarray(base.vertices, np.float64)
    v1 = v0 + [0.0, 0.0, 1.0]   # translating up to z=1
    m0 = Mesh(v0, base.faces)
    m1 = Mesh(v1, base.faces)
    bufs = tuple(jnp.asarray(b) for b in triangle_buffers(m0, m1))

    n = 8
    o = jnp.tile(jnp.array([[0.3, -0.2, 5.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    time = jnp.linspace(0.0, 1.0, n)
    t, u, v, tri, hit = intersect_motion(o, d, time, bufs)
    assert bool(hit.all())
    # hit distance must lerp: plane z = time → t = 5 - time
    np.testing.assert_allclose(np.asarray(t), 5.0 - np.asarray(time),
                               atol=1e-5)

    # endpoint parity with the static Woop path
    for tm, mesh in ((0.0, m0), (1.0, m1)):
        f = mesh.faces
        p0 = np.asarray(mesh.vertices)[f[:, 0]]
        e1 = np.asarray(mesh.vertices)[f[:, 1]] - p0
        e2 = np.asarray(mesh.vertices)[f[:, 2]] - p0
        wo, wd = build_woop(p0, e1, e2)
        ts, us, vs, tris, hs = intersect_soup(
            o, d, jnp.asarray(wo), jnp.asarray(wd),
            jnp.full((n,), 1e-4), jnp.full((n,), np.inf))
        tm_v, _, _, _, hm = intersect_motion(
            o, d, jnp.full((n,), tm), bufs)
        assert bool((hs == hm).all())
        np.testing.assert_allclose(np.asarray(tm_v), np.asarray(ts),
                                   atol=1e-5)


def test_motion_jittered_shutter_unbiased():
    """Continuous-shutter jitter: a quad sweeping z=0→1 viewed head-on
    must produce hit coverage at times OTHER than the stratum centers
    (the n_time=1 centered render sees only t=0.5)."""
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.scene.builder import ConstantLight, SceneDesc
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    import mitsuba_tpu.core.transform as tf

    def desc_at(t):
        d = SceneDesc()
        mat = d.add_material(albedo=(0.5, 0.5, 0.5))
        d.add_shape(rectangle(),
                    to_world=tf.translate([2.0 * t - 1.0, 0.0, 0.0])
                    @ tf.scale(0.2), material=mat)
        d.constant_light = ConstantLight(radiance=(1.0, 1.0, 1.0))
        return d

    cam = PerspectiveCamera(
        width=48, height=8, fov_x=90.0,
        to_world=tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]))
    film = Film(48, 8)
    img_j = render_motion(desc_at, cam, film, PathTracer(max_depth=2),
                          spp=8, n_time=8, seed=3, jitter_time=True)
    img_c = render_motion(desc_at, cam, film, PathTracer(max_depth=2),
                          spp=8, n_time=8, seed=3, jitter_time=False)
    # both smear the quad across the sweep; jittered times differ from
    # centered times but cover the same footprint
    assert np.isfinite(img_j).all() and np.isfinite(img_c).all()
    assert img_j.mean() > 0 and img_c.mean() > 0
    assert not np.allclose(img_j, img_c)
