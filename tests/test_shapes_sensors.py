"""Shapes (heightfield, hair, instancing) + sensor (telecentric, rdist)
coverage tests — mesh invariants and end-to-end renders."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.direct import DirectIntegrator
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene.shapes import (ShapeGroup, hair, heightfield,
                                      instance, rectangle, sphere)
from mitsuba_tpu.sensor.sensor import (PerspectiveRDistCamera,
                                       TelecentricCamera)


def test_heightfield_mesh():
    rng = np.random.default_rng(0)
    hts = rng.random((9, 17)) * 0.1
    m = heightfield(hts)
    assert m.vertices.shape == (9 * 17, 3)
    assert m.faces.shape == (8 * 16 * 2, 3)
    # normals unit, roughly +z for a gentle field
    nn = np.linalg.norm(m.normals, axis=-1)
    assert np.allclose(nn, 1.0, atol=1e-6)
    assert (m.normals[:, 2] > 0.5).all()
    # faces reference valid vertices, surface interpolates the heights
    assert m.faces.max() < len(m.vertices)
    assert np.allclose(m.vertices[:, 2].reshape(9, 17), hts)


def test_hair_tube_geometry():
    pts = np.array([[0, 0, 0], [0, 0, 1], [0, 0, 2.0]])
    m = hair(pts, np.array([0, 3]), radius=0.1, sides=6)
    assert m.vertices.shape == (3 * 6, 3)
    # every ring vertex is at distance `radius` from the strand axis
    r = np.linalg.norm(m.vertices[:, :2], axis=-1)
    assert np.allclose(r, 0.1, atol=1e-9)
    assert m.faces.shape == (2 * 6 * 2, 3)


def test_instancing_compiles_and_renders():
    g = ShapeGroup().add(sphere(8, 12), material=0)
    desc = SceneDesc()
    desc.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    for k, x in enumerate((-1.5, 0.0, 1.5)):
        for (mesh, t, mat) in instance(
                g, tf.translate([x, 0, 0]) @ tf.scale(0.5)):
            desc.add_shape(mesh, to_world=t, material=mat)
    # key light
    desc.add_shape(rectangle(),
                   to_world=tf.translate([0, 3, 0])
                   @ tf.rotate([1, 0, 0], 90) @ tf.scale(0.5),
                   radiance=(20.0, 20.0, 20.0), material=0)
    scene = compile_scene(desc, cluster_size=128)
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    cam = PerspectiveCamera(
        width=48, height=16, fov_x=70.0,
        to_world=tf.look_at([0, 0.4, 4.5], [0, 0, 0], [0, 1, 0]))
    img = np.asarray(render(scene, cam, Film(width=48, height=16),
                            DirectIntegrator(cluster_size=128), spp=8,
                            seed=0))
    assert np.isfinite(img).all()
    # three lit blobs across the strip: left/middle/right thirds all lit
    thirds = img.reshape(16, 3, 16, 3).mean(axis=(0, 2, 3))
    assert (thirds > 1e-4).all()


def _flat_scene():
    desc = SceneDesc()
    desc.add_material(kind="diffuse", albedo=(0.6, 0.6, 0.6))
    desc.add_shape(rectangle(), to_world=tf.scale(5.0), material=0)
    desc.constant_light = None
    desc.add_shape(rectangle(),
                   to_world=tf.translate([0, 0, 4]) @ tf.rotate(
                       [1, 0, 0], 180),
                   radiance=(8.0, 8.0, 8.0), material=0)
    return compile_scene(desc, cluster_size=128)


def test_telecentric_parallel_rays():
    cam = TelecentricCamera(width=16, height=16)
    pos = jnp.asarray(np.stack(np.meshgrid(np.arange(16) + 0.5,
                                           np.arange(16) + 0.5),
                               -1).reshape(-1, 2), jnp.float32)
    o, d = cam.sample_ray(pos)
    d = np.asarray(d)
    # no aperture: all rays parallel (orthographic chief rays)
    assert np.allclose(d, d[0], atol=1e-6)
    o = np.asarray(o)
    assert o.std(axis=0).max() > 0.01   # origins spread over the plane


def test_rdist_reduces_to_perspective_when_zero():
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    c0 = PerspectiveCamera(width=16, height=16, fov_x=50.0)
    c1 = PerspectiveRDistCamera(width=16, height=16, fov_x=50.0,
                                kc0=0.0, kc1=0.0)
    pos = jnp.asarray([[2.0, 13.0], [8.0, 8.0]], jnp.float32)
    d0 = np.asarray(c0.sample_ray(pos)[1])
    d1 = np.asarray(c1.sample_ray(pos)[1])
    assert np.allclose(d0, d1, atol=1e-6)
    # negative kc pulls corners toward the center (barrel)
    c2 = PerspectiveRDistCamera(width=16, height=16, fov_x=50.0, kc0=-0.3)
    d2 = np.asarray(c2.sample_ray(pos)[1])
    assert d2[0, 2] > d0[0, 2] - 1e-7   # corner ray closer to the axis
    assert np.allclose(d2[1], d0[1], atol=1e-6)  # center unchanged


def test_shellmap_heightfield_flat():
    """Constant heightfield over a flat base = translated plane with +z
    normals (ref: src/shapes/shellmap_heightfield.cpp semantics)."""
    from mitsuba_tpu.scene.shapes import rectangle, shellmap_heightfield
    base = rectangle()
    m = shellmap_heightfield(base, np.full((4, 4), 0.5), scale=2.0,
                             offset=0.1, subdiv=2)
    assert np.allclose(m.vertices[:, 2], 1.1, atol=1e-12)
    assert np.allclose(m.normals, [0, 0, 1], atol=1e-9)
    # 1:4 subdivision twice: 2 tris -> 32
    assert len(m.faces) == 32
    # area preserved for a pure translation
    e1 = m.vertices[m.faces[:, 1]] - m.vertices[m.faces[:, 0]]
    e2 = m.vertices[m.faces[:, 2]] - m.vertices[m.faces[:, 0]]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1).sum()
    assert abs(area - 4.0) < 1e-9


def test_shellmap_heightfield_bump_renders():
    """A bumped shell surface renders without NaNs and displaces along
    the base normal field (sphere base -> radius grows by h)."""
    from mitsuba_tpu.scene.shapes import shellmap_heightfield, sphere
    base = sphere(subdiv_theta=12, subdiv_phi=24)
    hts = 0.25 * (1.0 + np.sin(np.linspace(0, 6 * np.pi, 16))[None, :]
                  * np.ones((8, 1)))
    m = shellmap_heightfield(base, hts, scale=0.4, subdiv=1)
    r = np.linalg.norm(m.vertices, axis=-1)
    # midpoint subdivision puts chord midpoints slightly inside the sphere
    assert r.min() >= 0.99 and r.max() <= 1.6 + 1e-6
    assert np.isfinite(m.normals).all()
