"""Footprint / LoD path tracing tests: analytic footprint check on a
fronto-parallel plane + prefiltered-texture moiré suppression."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.footprint import (FootprintIntegrator,
                                              LoDPathTracer,
                                              first_hit_footprint)
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene.shapes import rectangle
from mitsuba_tpu.sensor.sensor import PerspectiveCamera


def test_footprint_analytic_plane():
    """Camera 1 unit from a unit quad ([-1,1]², uv spans [0,1]²), 90°
    horizontal fov over W pixels: the central pixel's world footprint is
    2·tan(fov/2)/W = 2/W per pixel → duv/dx = 1/W (uv = (p+1)/2)."""
    d = SceneDesc()
    d.add_material(kind="diffuse")
    d.add_shape(rectangle(), material=0)
    scene = compile_scene(d, cluster_size=128)
    w = h = 64
    cam = PerspectiveCamera(width=w, height=h, fov_x=90.0,
                            to_world=tf.look_at([0, 0, 1.0], [0, 0, 0],
                                                [0, 1, 0]))
    pos = jnp.asarray([[w / 2, h / 2]], jnp.float32)
    its, duv_dx, duv_dy = first_hit_footprint(scene, cam, pos)
    assert bool(its.valid[0])
    got = float(jnp.abs(duv_dx[0, 0]))
    assert abs(got - 1.0 / w) < 0.15 / w, (got, 1.0 / w)
    # y-differential magnitude matches in v (square pixels)
    gv = float(jnp.abs(duv_dy[0, 1]))
    assert abs(gv - 1.0 / w) < 0.15 / w


def test_footprint_aov_increases_with_grazing():
    d = SceneDesc()
    d.add_material(kind="diffuse")
    d.add_shape(rectangle(), to_world=tf.rotate([1, 0, 0], -90)
                @ tf.scale(50.0), material=0)
    scene = compile_scene(d, cluster_size=128)
    cam = PerspectiveCamera(width=32, height=32, fov_x=60.0,
                            to_world=tf.look_at([0, 1.0, 0], [0, 0, -6],
                                                [0, 1, 0]))
    img = np.asarray(FootprintIntegrator(cluster_size=128).render(
        scene, cam, Film(width=32, height=32)))
    assert np.isfinite(img).all()
    # footprints grow toward the horizon (top rows see farther ground)
    col = img[:, 16, 0]
    near = col[-6:].mean()          # bottom = close ground
    far = col[4:10].mean()          # upper rows = grazing, far ground
    assert far > near + 1.0         # ≥ 2× footprint in log2 units


def test_lod_render_suppresses_aliasing():
    """1px checkerboard viewed from afar: level-0 sampling aliases to a
    high-variance mosaic; prefiltered lookups converge to the 0.5 mean."""
    from mitsuba_tpu.texture.texture import checkerboard
    d = SceneDesc()
    tid = d.add_texture(checkerboard((1, 1, 1), (0, 0, 0), res=512,
                                     tiles=256))
    m = d.add_material(kind="diffuse", albedo_texture=tid)
    d.add_shape(rectangle(), to_world=tf.scale(4.0), material=m)
    d.add_shape(rectangle(),
                to_world=tf.translate([0, 0, 6]) @ tf.rotate(
                    [1, 0, 0], 180) @ tf.scale(8.0),
                material=0, radiance=(6.0, 6.0, 6.0))
    scene = compile_scene(d, cluster_size=128)
    cam = PerspectiveCamera(width=24, height=24, fov_x=45.0,
                            to_world=tf.look_at([0, 0, 5.0], [0, 0, 0],
                                                [0, 1, 0]))
    film = Film(width=24, height=24)
    lod = LoDPathTracer(max_depth=2, cluster_size=128)
    img_f = np.asarray(lod.render_lod(scene, cam, film, spp=4, seed=0))
    from mitsuba_tpu.render import render
    img_0 = np.asarray(render(scene, cam, film,
                              LoDPathTracer(max_depth=2,
                                            cluster_size=128),
                              spp=4, seed=0))
    # prefiltering shrinks pixel-to-pixel variation on the plane
    inner_f = img_f[6:18, 6:18, 0]
    inner_0 = img_0[6:18, 6:18, 0]
    assert inner_f.std() < 0.6 * inner_0.std(), (inner_f.std(),
                                                 inner_0.std())
    # mean preserved (gray = average of the checker)
    assert abs(inner_f.mean() - inner_0.mean()) < 0.15 * inner_0.mean()
