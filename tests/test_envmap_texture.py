"""Envmap importance sampling + bitmap texture tests (BASELINE config 3)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import chi2, rng
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import (ConstantLight, EnvmapLight, SceneDesc,
                                       compile_scene)
from mitsuba_tpu.scene.shapes import rectangle, sphere


def _sky_image(h=32, w=64):
    """Smooth anisotropic test envmap: bright 'sun' patch + gradient."""
    v, u = np.meshgrid((np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
                       indexing="ij")
    base = 0.2 + 0.8 * (1 - v)
    sun = 20.0 * np.exp(-(((u - 0.3) * 8) ** 2 + ((v - 0.3) * 8) ** 2))
    img = np.stack([base + sun, base + 0.8 * sun, base + 0.5 * sun], -1)
    return img.astype(np.float32)


@pytest.fixture(scope="module")
def env_scene():
    d = SceneDesc()
    d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.5))
    d.envmap = EnvmapLight(image=_sky_image())
    return compile_scene(d, cluster_size=128)


def test_envmap_chi2(env_scene):
    """sample_env matches pdf_env_dir (envmap.cpp row/column CDF scheme).
    Note the chi2 harness bins around +z while the envmap is y-up — fine,
    the test is coordinate-agnostic."""
    from mitsuba_tpu.emitter.envmap import pdf_env_dir, sample_env

    def sample_fn(n):
        u = rng.sample_2d(1, np.arange(n), 0)
        d, _, _ = sample_env(env_scene, u)
        return np.asarray(d)

    def pdf_fn(dirs):
        return np.asarray(pdf_env_dir(env_scene, jnp.asarray(dirs)))

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=400_000,
                                   res_theta=12, res_phi=24)
    assert passed, stats
    assert abs(stats["total_pdf_mass"] - 1.0) < 1e-2, stats


def test_envmap_eval_roundtrip(env_scene):
    """sample → eval direction mapping is self-consistent: sampled
    directions land on texels whose radiance matches eval_env_dir."""
    from mitsuba_tpu.emitter.envmap import eval_env_dir, sample_env
    u = rng.sample_2d(3, np.arange(4096), 0)
    d, pdf, rad_nearest = sample_env(env_scene, u)
    rad_eval = eval_env_dir(env_scene, d)
    # bilinear vs nearest differ by smoothing only
    ratio = np.asarray(rad_eval / np.maximum(rad_nearest, 1e-6))
    assert np.median(ratio) == pytest.approx(1.0, abs=0.2)
    assert np.asarray(pdf).min() > 0


def test_envmap_furnace_equivalence():
    """A constant-image envmap must behave exactly like ConstantLight:
    diffuse sphere furnace reads albedo × L."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    imgs = []
    for light in ["constant", "envmap"]:
        d = SceneDesc()
        d.add_material(kind="diffuse", albedo=(0.8, 0.8, 0.8))
        d.add_shape(sphere(16, 32), material=0)
        if light == "constant":
            d.constant_light = ConstantLight(radiance=(1.0, 1.0, 1.0))
        else:
            d.envmap = EnvmapLight(image=np.ones((16, 32, 3), np.float32))
        scene = compile_scene(d, cluster_size=128)
        cam = PerspectiveCamera(
            width=24, height=24, fov_x=45.0,
            to_world=tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]))
        film = Film(width=24, height=24)
        imgs.append(np.asarray(render(
            scene, cam, film, PathTracer(max_depth=16, cluster_size=128),
            spp=48, seed=1)))
    c_center = imgs[0][9:15, 9:15].mean()
    e_center = imgs[1][9:15, 9:15].mean()
    assert abs(c_center - 0.8) < 0.03, c_center
    assert abs(e_center - c_center) < 0.03, (e_center, c_center)


def test_bitmap_texture_lookup():
    """Textured albedo: checkerboard on a quad lit by a point light —
    pixel albedos alternate with the checker pattern."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.scene.builder import PointLight
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    from mitsuba_tpu.texture.texture import checkerboard

    d = SceneDesc()
    tex = d.add_texture(checkerboard(color0=(1, 1, 1), color1=(0, 0, 0),
                                     res=64, tiles=2))
    d.add_material(kind="diffuse", albedo=(1, 0, 0), albedo_texture=tex)
    d.add_shape(rectangle(), material=0)
    d.point_lights.append(PointLight(position=[0, 0, 3],
                                     intensity=[10, 10, 10]))
    scene = compile_scene(d, cluster_size=128)
    cam = PerspectiveCamera(
        width=32, height=32, fov_x=30.0,
        to_world=tf.look_at([0, 0, 3.5], [0, 0, 0], [0, 1, 0]))
    film = Film(width=32, height=32)
    img = np.asarray(render(scene, cam, film,
                            PathTracer(max_depth=2, cluster_size=128),
                            spp=16, seed=0))
    lum = img.mean(-1)
    center = lum[4:28, 4:28]
    bright = (center > center.mean()).mean()
    # roughly half the quad is white, half black
    assert 0.3 < bright < 0.7
    # dark cells are truly dark (texture, not red constant, drove albedo)
    assert center.min() < 0.02 * center.max()


def test_mip_pyramid():
    from mitsuba_tpu.texture.texture import build_pyramid, checkerboard
    levels = build_pyramid(checkerboard(res=64, tiles=8))
    assert len(levels) == 7
    assert levels[-1].shape[:2] == (1, 1)
    # energy preserved at every level (box filter)
    for lv in levels:
        assert np.allclose(lv.mean(), levels[0].mean(), atol=1e-5)


def test_aniso_filtering_matches_footprint_average():
    """EWA/Feline anisotropic lookup: a strongly anisotropic footprint
    over a stripe texture must average along the major axis (≈ the
    stripe mean) while an isotropic lookup at the same minor LOD aliases
    (returns a near-pure stripe color)."""
    import jax.numpy as jnp
    import numpy as np
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.texture.texture import (eval_texture,
                                             eval_texture_aniso)

    res = 256
    stripes = np.zeros((res, res, 3), np.float32)
    stripes[:, ::2] = 1.0            # vertical 1px stripes along u
    desc = SceneDesc()
    tid = desc.add_texture(stripes)
    m = desc.add_material(kind="diffuse", albedo_texture=tid)
    desc.add_shape(rectangle(), material=m)
    scene = compile_scene(desc, cluster_size=128)

    uv = jnp.asarray([[64.5 / res, 0.5]])   # centered ON a stripe
    t = jnp.full((1,), tid, jnp.int32)
    # footprint: wide along u (64 texels), 1 texel along v
    duv0 = jnp.asarray([[64.0 / res, 0.0]])
    duv1 = jnp.asarray([[0.0, 1.0 / res]])
    val = np.asarray(eval_texture_aniso(scene, t, uv, duv0, duv1))
    assert abs(val.mean() - 0.5) < 0.12, val
    # isotropic lookup at the minor-axis LOD (level 0) sees one stripe
    iso = np.asarray(eval_texture(scene, t, uv, jnp.zeros((1,))))
    assert abs(iso.mean() - 0.5) > 0.3
