"""VPL instant radiosity + adaptive sampler + sun/sky emitter tests.

Strategy per SURVEY.md §4: cross-integrator consistency on a shared scene
(the reference compares plugin outputs on test_bidir fixtures) and
behavioral invariants (energy conservation, sample allocation).
"""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.adaptive import AdaptiveSampler
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.vpl import VPLIntegrator
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


@pytest.fixture(scope="module")
def cam():
    return cornell_camera(width=24, height=24)


def test_vpl_matches_path(cornell, cam):
    """With a tiny clamp the VPL estimate must approach the path-traced
    solution (instant radiosity is consistent as clamping → 0)."""
    film = Film(width=24, height=24)
    vpl = VPLIntegrator(max_depth=3, n_paths=2048, clamping=0.02,
                        cluster_size=128).specialized_for(cornell)
    img_v = np.asarray(vpl.render(cornell, cam, film, spp=16, seed=0))
    img_p = np.asarray(render(
        cornell, cam, film,
        PathTracer(max_depth=3, rr_depth=99,
                   cluster_size=128).specialized_for(cornell),
        spp=160, seed=1))
    # VPL loses the clamped near-field energy ⇒ slightly darker is OK
    rel = (img_v.mean() - img_p.mean()) / img_p.mean()
    assert -0.15 < rel < 0.05, (img_v.mean(), img_p.mean(), rel)
    # smoothed spatial agreement on the non-emitter region (clip the
    # directly-visible light: its edge pixels carry AA coverage noise and
    # its neighborhood the expected clamping bias)
    clip = 2.0 * img_p.mean()
    cv = img_v.clip(0, clip).mean(axis=(0, 2))
    cp = img_p.clip(0, clip).mean(axis=(0, 2))
    assert np.abs(cv - cp).max() / img_p.mean() < 0.35


def test_vpl_generation_counts(cornell):
    vpl = VPLIntegrator(max_depth=4, n_paths=128,
                        cluster_size=128).specialized_for(cornell)
    vpls = vpl.generate_vpls(cornell, seed=0)
    nv = int(np.asarray(vpls.valid).sum())
    # emitter VPLs always valid; surface VPLs only on hits
    assert nv >= 128
    assert vpls.p.shape[0] == 128 * 3   # 1 emitter + (max_depth-2) surface
    # emitter VPLs carry the light's flux
    assert float(np.asarray(vpls.flux[:128]).sum()) > 0


def test_adaptive_allocates_to_variance(cornell, cam):
    """High-variance pixels must receive more samples, and the image must
    agree with a uniform-sampling render."""
    film = Film(width=24, height=24)
    ad = AdaptiveSampler(max_error=0.02, batch_spp=8, max_passes=6)
    pt = PathTracer(max_depth=3, cluster_size=128).specialized_for(cornell)
    img, counts = ad.render_with_counts(cornell, cam, film, pt, seed=0)
    img, counts = np.asarray(img), np.asarray(counts)
    img_u = np.asarray(render(cornell, cam, film, pt, spp=64, seed=5))
    assert abs(img.mean() - img_u.mean()) / img_u.mean() < 0.05
    # total budget respected and redistributed non-uniformly
    assert counts.max() > counts.min()
    assert counts.min() >= 8
    # count conservation: lanes·passes·batch = Σ counts
    assert counts.sum() == 24 * 24 * 8 * 6


def test_sunsky_renders():
    """sky/sunsky emitters integrate with the envmap machinery."""
    from mitsuba_tpu.emitter.sunsky import sky_image, sunsky_image
    from mitsuba_tpu.scene.builder import EnvmapLight, SceneDesc
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.core import transform as tf

    img = sunsky_image(3.0, (0.2, 0.8, 0.3), resolution=64)
    assert np.isfinite(img).all() and (img >= 0).all()
    # sun adds energy on top of the sky
    img_sky = sky_image(3.0, (0.2, 0.8, 0.3), resolution=64)
    assert img.sum() > img_sky.sum()

    desc = SceneDesc()
    m = desc.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.5))
    desc.add_shape(rectangle(),
                   to_world=tf.scale([2, 2, 1]) @ tf.rotate([1, 0, 0],
                                                            -90),
                   material=m)
    desc.envmap = EnvmapLight(image=img)
    scene = compile_scene(desc, cluster_size=128)
    cam = cornell_camera(width=12, height=12)
    film = Film(width=12, height=12)
    out = np.asarray(render(
        scene, cam, film, PathTracer(max_depth=3, cluster_size=128),
        spp=16, seed=0))
    assert np.isfinite(out).all()
    assert out.mean() > 0
