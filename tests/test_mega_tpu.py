"""Megakernel integrator parity vs the XLA wavefront PathTracer (TPU only).

Same RNG streams and estimator — images must agree lane-for-lane up to
intersection tie-breaks on shared triangle edges.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="megakernel needs TPU")


def test_mega_matches_path():
    import jax.numpy as jnp

    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    scene = compile_scene(cornell_box(), cluster_size=64)
    cam = cornell_camera(64, 64)
    n = 64 * 64
    px = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                     (px // 64).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    ref = PathTracer(max_depth=8, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=8)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, d, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, d, jnp.uint32(3), px, 0))())
    rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-3)
    assert (rel > 1e-2).mean() < 0.02, (rel > 1e-2).mean()
    assert abs(L_ref.mean() - L_m.mean()) / L_ref.mean() < 5e-3


def test_persistent_matches_mega():
    """Persistent path-regeneration render must estimate the same image
    as the per-pass megakernel (same estimator, different sample
    scheduling), and its ray counters must be plausible."""
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.mega import (MegaPathTracer,
                                             render_persistent)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    scene = compile_scene(cornell_box(), cluster_size=64)
    cam = cornell_camera(64, 64)
    integ = MegaPathTracer.for_scene(scene, max_depth=8, block=2048)
    img_p, n_rays = render_persistent(integ, cam, spp=32, seed=0)
    img_p = np.asarray(img_p)
    img_m = np.asarray(render(scene, cam, Film(width=64, height=64),
                              integ, spp=32, seed=0))
    assert np.isfinite(img_p).all()
    rel = abs(img_p.mean() - img_m.mean()) / img_m.mean()
    assert rel < 0.01, (img_p.mean(), img_m.mean())
    # per-pixel agreement at matched spp (same pixel estimator variance)
    diff = np.abs(img_p - img_m).mean() / img_m.mean()
    assert diff < 0.25, diff
    # counters: between 2 (first closest+shadow) and 2·spp·max_depth
    per_path = int(n_rays) / (64 * 64 * 32)
    assert 2.0 <= per_path <= 16.0, per_path


def test_mega_smooth_shading_sphere():
    """Interpolated vertex normals in the fused kernel: a tessellated
    sphere in the Cornell box must match the XLA wavefront PathTracer
    (which interpolates ns in dense.fill_intersection)."""
    import jax.numpy as jnp
    import mitsuba_tpu.core.transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
    from mitsuba_tpu.scene.shapes import sphere

    desc = cornell_box()
    white = 0
    t = tfm.translate([0.5, 0.3, 0.5]) @ tfm.scale([0.22, 0.22, 0.22])
    desc.add_shape(sphere(subdiv_theta=10, subdiv_phi=20), to_world=t,
                   material=white)
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(64, 64)
    n = 64 * 64
    px = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                     (px // 64).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    ref = PathTracer(max_depth=6, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=6)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, d, jnp.uint32(5), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, d, jnp.uint32(5), px, 0))())
    rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-3)
    assert (rel > 1e-2).mean() < 0.02, (rel > 1e-2).mean()
    assert abs(L_ref.mean() - L_m.mean()) / L_ref.mean() < 5e-3


def test_mega_multi_emitter_env():
    """Multi-area-emitter + constant-env NEE in the fused kernel: two
    lights of different power plus a dim constant sky must match the XLA
    wavefront (emitter pick via the SMEM pmf chain; env picks sample a
    uniform sphere direction — emitter.py sample_direct semantics)."""
    import jax.numpy as jnp

    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
    from mitsuba_tpu.scene.shapes import rectangle
    import mitsuba_tpu.core.transform as tfm

    desc = cornell_box()
    # second, smaller warm light on the back wall
    t = tfm.translate([0.25, 0.6, 0.02]) @ tfm.scale([0.08, 0.08, 1.0])
    desc.add_shape(rectangle(), to_world=t, material=0,
                   radiance=(6.0, 2.0, 1.0))
    from mitsuba_tpu.scene.builder import ConstantLight
    desc.constant_light = ConstantLight(radiance=(0.08, 0.09, 0.12))
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(64, 64)
    n = 64 * 64
    px = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                     (px // 64).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    ref = PathTracer(max_depth=5, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=5)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, d, jnp.uint32(7), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, d, jnp.uint32(7), px, 0))())
    rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-3)
    assert (rel > 1e-2).mean() < 0.02, (rel > 1e-2).mean()
    assert abs(L_ref.mean() - L_m.mean()) / L_ref.mean() < 5e-3


def test_mega_dielectric_matches_path():
    """Smooth-dielectric family in the fused kernel (delta reflect/
    refract, radiance-transport eta², eta_scale-aware RR) vs the XLA
    wavefront path tracer — same RNG streams, lane-level agreement."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    d = cornell_box()
    glass = d.add_material(kind="dielectric", int_ior=1.5)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([0.68, 0.45, 0.66])
                @ tfm.scale([0.15] * 3),
                material=glass)
    scene = compile_scene(d, cluster_size=64)
    cam = cornell_camera(64, 64)
    n = 64 * 64
    px = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                     (px // 64).astype(jnp.float32) + 0.5], -1)
    o, dv = cam.sample_ray(pos)
    ref = PathTracer(max_depth=8, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=8)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, dv, jnp.uint32(5), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, dv, jnp.uint32(5), px, 0))())
    assert np.isfinite(L_m).all()
    rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-3)
    # tie-break lanes + grazing refractions may diverge; the bulk must
    # agree lane-for-lane and the estimate must match in the mean
    assert (rel > 1e-2).mean() < 0.03, (rel > 1e-2).mean()
    assert abs(L_ref.mean() - L_m.mean()) / L_ref.mean() < 1e-2


def test_mega_rejects_unsupported_family():
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box

    d = cornell_box()
    pl = d.add_material(kind="hk", sigma_s=(0.5, 0.5, 0.5))
    from mitsuba_tpu.scene import shapes
    d.add_shape(shapes.sphere(4, 8), material=pl)
    scene = compile_scene(d, cluster_size=64)
    with pytest.raises(ValueError, match="families"):
        MegaPathTracer.for_scene(scene)
    # isotropic-GGX-only gates (round 5): Beckmann / anisotropic
    # microfacet variants must not claim the fast path
    d2 = cornell_box()
    d2.add_material(kind="roughconductor", alpha=0.2,
                    distribution="beckmann")
    d2.add_shape(shapes.sphere(4, 8), material=len(d2.materials) - 1)
    ok, why = MegaPathTracer.supports(compile_scene(d2, cluster_size=64))
    assert not ok and "roughconductor" in why


def _li_pair(scene, cam_origin, n=4096, depth=6, seed=11):
    """(L_wavefront, L_mega) over a random hemisphere of primary rays."""
    import jax.numpy as jnp

    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer

    rs = np.random.RandomState(seed)
    o = jnp.asarray(np.tile(cam_origin, (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.25] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)
    ref = PathTracer(max_depth=depth,
                     cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=depth)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, dv, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, dv, jnp.uint32(3), px, 0))())
    return L_ref, L_m


def _assert_close(L_ref, L_m, frac=0.02, mean_tol=8e-3):
    rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-2)
    assert (rel > 1e-2).mean() < frac, (rel > 1e-2).mean()
    ref_mean = max(L_ref.mean(), 1e-4)
    assert abs(L_ref.mean() - L_m.mean()) / ref_mean < mean_tol, (
        L_ref.mean(), L_m.mean())


def test_mega_new_families_match_path():
    """Round-4 in-kernel families: plastic / phong / ward / Oren-Nayar
    rough diffuse vs the XLA wavefront (same streams)."""
    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    mats = [
        d.add_material(kind="plastic",
                       diffuse_reflectance=(0.5, 0.2, 0.2)),
        d.add_material(kind="phong",
                       diffuse_reflectance=(0.3, 0.4, 0.2),
                       specular_reflectance=(0.4, 0.4, 0.4),
                       exponent=40.0),
        d.add_material(kind="ward",
                       diffuse_reflectance=(0.3, 0.3, 0.4),
                       specular_reflectance=(0.3, 0.3, 0.3),
                       alpha=0.15, alpha_v=0.3),
        d.add_material(kind="roughdiffuse", albedo=(0.6, 0.5, 0.4),
                       alpha=0.4),
    ]
    floor = d.add_material(kind="diffuse", albedo=(0.6, 0.6, 0.6))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    for i, m in enumerate(mats):
        d.add_shape(shapes.sphere(12, 24),
                    to_world=tfm.translate([1.7 * i - 2.5, 0, 0])
                    @ tfm.scale([0.7] * 3), material=m)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2.0] * 3),
                material=floor, radiance=(12.0, 11.0, 10.0))
    scene = compile_scene(d, cluster_size=64)
    L_ref, L_m = _li_pair(scene, [0.0, 1.0, 6.0])
    _assert_close(L_ref, L_m)


def test_mega_thin_difftrans_null_match_path():
    """Delta/transmissive round-4 families: thindielectric, difftrans,
    null panes between camera and light."""
    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    thin = d.add_material(kind="thindielectric", int_ior=1.5)
    dt = d.add_material(kind="difftrans", transmittance=(0.6, 0.5, 0.4))
    nul = d.add_material(kind="null")
    floor = d.add_material(kind="diffuse", albedo=(0.6, 0.6, 0.6))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    for i, m in enumerate((thin, dt, nul)):
        d.add_shape(shapes.rectangle(),
                    to_world=tfm.translate([2.2 * i - 2.2, 0.5, 0])
                    @ tfm.scale([0.9] * 3), material=m)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2.0] * 3),
                material=floor, radiance=(12.0, 11.0, 10.0))
    scene = compile_scene(d, cluster_size=64)
    L_ref, L_m = _li_pair(scene, [0.0, 0.7, 5.0])
    _assert_close(L_ref, L_m)


def test_mega_delta_emitters_match_path():
    """Point + spot + directional emitters through the in-kernel NEE
    chain vs the XLA wavefront."""
    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import (DirectionalLight, PointLight,
                                           SceneDesc, SpotLight,
                                           compile_scene)

    d = SceneDesc()
    floor = d.add_material(kind="diffuse", albedo=(0.6, 0.55, 0.5))
    ggx = d.add_material(kind="roughconductor", alpha=0.2)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(16, 32), material=ggx)
    d.point_lights.append(PointLight(position=[2.0, 3.0, 1.0],
                                     intensity=[30.0, 28.0, 25.0]))
    d.spot_lights.append(SpotLight(position=[-2.0, 3.0, 1.0],
                                   direction=[0.5, -1.0, -0.2],
                                   intensity=[40.0, 40.0, 40.0],
                                   cutoff_angle=30.0, beam_width=20.0))
    d.directional_lights.append(DirectionalLight(
        direction=[-0.3, -1.0, -0.4], irradiance=[0.8, 0.8, 0.9]))
    scene = compile_scene(d, cluster_size=64)
    L_ref, L_m = _li_pair(scene, [0.0, 1.0, 5.0])
    _assert_close(L_ref, L_m)


def test_megavol_matches_volpath():
    """Round-5: the in-kernel homogeneous-medium branch (balance distance
    sampling + HG phase + attenuated NEE) vs the XLA VolPathTracer —
    same estimator and RNG streams, lane-level agreement."""
    import jax.numpy as jnp

    from mitsuba_tpu.integrator.mega import MegaVolPathTracer
    from mitsuba_tpu.integrator.volpath import VolPathTracer
    from mitsuba_tpu.scene.builder import Medium, compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    desc = cornell_box()
    desc.medium = Medium(sigma_t=(2.0, 2.5, 3.0), albedo=(0.9, 0.8, 0.7),
                         g=0.3)
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(64, 64)
    n = 64 * 64
    px = jnp.arange(n, dtype=jnp.uint32)
    pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                     (px // 64).astype(jnp.float32) + 0.5], -1)
    o, d = cam.sample_ray(pos)
    ref = VolPathTracer(max_depth=8, cluster_size=64).specialized_for(scene)
    mega = MegaVolPathTracer.for_scene(scene, max_depth=8)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, d, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, d, jnp.uint32(3), px, 0))())
    _assert_close(L_ref, L_m)
    # the medium must actually attenuate (not silently compile out)
    assert L_m.mean() < 0.1, L_m.mean()


def test_megavol_persistent_matches_run_path():
    """Persistent regeneration with the medium branch: same estimator as
    the per-pass megakernel on a foggy Cornell box."""
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.mega import (MegaVolPathTracer,
                                             render_persistent)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import Medium, compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    desc = cornell_box()
    desc.medium = Medium(sigma_t=(0.6, 0.7, 0.8), albedo=(0.9, 0.85, 0.8),
                         g=0.2)
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(64, 64)
    integ = MegaVolPathTracer.for_scene(scene, max_depth=8, block=2048)
    img_p, n_rays = render_persistent(integ, cam, spp=32, seed=0)
    img_p = np.asarray(img_p)
    img_m = np.asarray(render(scene, cam, Film(width=64, height=64),
                              integ, spp=32, seed=0))
    assert np.isfinite(img_p).all()
    rel = abs(img_p.mean() - img_m.mean()) / img_m.mean()
    assert rel < 0.01, (img_p.mean(), img_m.mean())
    per_path = int(n_rays) / (64 * 64 * 32)
    assert 2.0 <= per_path <= 16.0, per_path


def test_mega_thinlens_persistent():
    """Round-5: in-kernel thin-lens camera regeneration (concentric-disk
    aperture + focus plane) vs the wavefront megakernel fed by the host
    ray generator, plus an actual-blur check vs the pinhole."""
    import dataclasses

    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.mega import (MegaPathTracer,
                                             render_persistent)
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    scene = compile_scene(cornell_box(), cluster_size=64)
    cam0 = cornell_camera(64, 64)
    cam = dataclasses.replace(cam0, aperture_radius=0.05,
                              focus_distance=2.0)
    ok, why = MegaPathTracer.supports(scene, cam,
                                      Film(width=64, height=64))
    assert ok, why
    integ = MegaPathTracer.for_scene(scene, max_depth=8, block=2048)
    img_p, _ = render_persistent(integ, cam, spp=64, seed=0)
    img_p = np.asarray(img_p)
    img_m = np.asarray(render(scene, cam, Film(width=64, height=64),
                              integ, spp=64, seed=0))
    assert np.isfinite(img_p).all()
    rel = abs(img_p.mean() - img_m.mean()) / img_m.mean()
    assert rel < 0.01, (img_p.mean(), img_m.mean())
    img_pin, _ = render_persistent(integ, cam0, spp=64, seed=0)
    assert np.abs(np.asarray(img_pin) - img_p).mean() > 1e-3


def test_megavol_point_light_matches_volpath():
    """Fog + point light: delta-emitter NEE with medium transmittance
    through the in-kernel chain vs the XLA VolPathTracer."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaVolPathTracer
    from mitsuba_tpu.integrator.volpath import VolPathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import (Medium, PointLight, SceneDesc,
                                           compile_scene)

    d = SceneDesc()
    floor = d.add_material(kind="diffuse", albedo=(0.6, 0.55, 0.5))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(16, 32), material=floor)
    d.point_lights.append(PointLight(position=[2.0, 3.0, 1.0],
                                     intensity=[40.0, 38.0, 35.0]))
    d.medium = Medium(sigma_t=(0.25, 0.3, 0.35), albedo=(0.9, 0.85, 0.8),
                      g=0.1)
    scene = compile_scene(d, cluster_size=64)
    n = 4096
    rs = np.random.RandomState(7)
    o = jnp.asarray(np.tile([0.0, 1.0, 5.0], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.25] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)
    ref = VolPathTracer(max_depth=6,
                        cluster_size=64).specialized_for(scene)
    mega = MegaVolPathTracer.for_scene(scene, max_depth=6)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, dv, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, dv, jnp.uint32(3), px, 0))())
    _assert_close(L_ref, L_m)


def test_mega_procedural_textures_match_path():
    """Round-5: analytic in-kernel checkerboard/grid albedo vs the XLA
    wavefront sampling the rasterized bitmap — the analytic bilinear
    form is exact, so parity is lane-level."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
    from mitsuba_tpu.texture.texture import checkerboard, grid_texture

    d = SceneDesc()
    chk = d.add_texture(checkerboard(color0=(0.7, 0.2, 0.2),
                                     color1=(0.2, 0.2, 0.7)))
    grd = d.add_texture(grid_texture(color0=(0.1, 0.6, 0.1),
                                     color1=(0.7, 0.7, 0.6),
                                     line_width=0.02))
    floor = d.add_material(kind="diffuse", albedo=(1, 1, 1),
                           albedo_texture=chk)
    wall = d.add_material(kind="diffuse", albedo=(1, 1, 1),
                          albedo_texture=grd)
    plain = d.add_material(kind="roughconductor", alpha=0.25)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([4] * 3),
                material=floor)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 1, -3]) @ tfm.scale([4] * 3),
                material=wall)
    d.add_shape(shapes.sphere(16, 32), material=plain)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(12, 11, 10))
    scene = compile_scene(d, cluster_size=64)
    ok, why = MegaPathTracer.supports(scene, tex_procs=d.tex_procs)
    assert ok, why
    # without provenance the textured scene must stay off the fast path
    assert not MegaPathTracer.supports(scene)[0]
    n = 4096
    rs = np.random.RandomState(5)
    o = jnp.asarray(np.tile([0.0, 1.0, 5.0], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.25] + [0, -0.15, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)
    ref = PathTracer(max_depth=6, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=6,
                                    tex_procs=d.tex_procs)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, dv, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, dv, jnp.uint32(3), px, 0))())
    _assert_close(L_ref, L_m)
    # and the texture must actually drive the albedo
    mega_plain = MegaPathTracer.for_scene(scene, max_depth=6)
    L_p = np.asarray(jax.jit(
        lambda: mega_plain.li(scene, o, dv, jnp.uint32(3), px, 0))())
    assert np.abs(L_m - L_p).mean() > 0.05


def test_mega_roughdielectric_matches_path():
    """Round-5: Walter rough glass (isotropic GGX, visible normals)
    through the in-kernel dispatch vs the XLA wavefront."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(0.7, 0.6, 0.5))
    glass = d.add_material(kind="roughdielectric", int_ior=1.5,
                           alpha=0.15, distribution="ggx")
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=white)
    d.add_shape(shapes.sphere(24, 48), material=glass)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=white, radiance=(14, 13, 12))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    # Beckmann rough glass must NOT claim the fast path
    d2 = SceneDesc()
    d2.add_material(kind="roughdielectric", alpha=0.2,
                    distribution="beckmann")
    d2.add_shape(shapes.sphere(8, 16), material=0)
    assert not MegaPathTracer.supports(
        compile_scene(d2, cluster_size=64))[0]
    n = 8192
    rs = np.random.RandomState(9)
    o = jnp.asarray(np.tile([0.0, 0.8, 4.5], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.25] + [0, -0.15, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)
    ref = PathTracer(max_depth=8, cluster_size=64).specialized_for(scene)
    mega = MegaPathTracer.for_scene(scene, max_depth=8)
    L_ref = np.asarray(jax.jit(
        lambda: ref.li(scene, o, dv, jnp.uint32(3), px, 0))())
    L_m = np.asarray(jax.jit(
        lambda: mega.li(scene, o, dv, jnp.uint32(3), px, 0))())
    _assert_close(L_ref, L_m)


def test_mega_twosided_matches_path():
    """Round-5 fix: the kernel previously ignored the twosided flag
    (param slot 15), shading back-facing lanes black where the XLA path
    mirrors them into the upper hemisphere. A camera-facing BACK side
    of a twosided plate must match the wavefront."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    ts = d.add_material(kind="diffuse", albedo=(0.8, 0.4, 0.3),
                        two_sided=True)
    one = d.add_material(kind="diffuse", albedo=(0.3, 0.4, 0.8))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 0.5, -1])
                @ tfm.rotate([0, 1, 0], 180) @ tfm.scale([2] * 3),
                material=ts)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([5] * 3),
                material=one)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 1])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=one, radiance=(12, 12, 12))
    scene = compile_scene(d, cluster_size=64)
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 4.0])
    _assert_close(L_ref, L_m)
    # the back side must actually shade (not black): plate faces away
    assert L_m.mean() > 0.1


def test_persistent_sharded_matches_unsharded():
    """Round-5: the persistent kernel under shard_map (flagship path on
    a device mesh). On the 1-device mesh available here it must agree
    with render_persistent statistically (fp association differs per
    compilation unit; the estimator is the same)."""
    from mitsuba_tpu.integrator.mega import (MegaPathTracer,
                                             render_persistent,
                                             render_persistent_sharded)
    from mitsuba_tpu.parallel.dist import make_mesh
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    scene = compile_scene(cornell_box(), cluster_size=64)
    cam = cornell_camera(64, 64)
    integ = MegaPathTracer.for_scene(scene, max_depth=8, pblock=2048)
    mesh = make_mesh(jax.devices()[:1])
    img_a, nr_a = render_persistent(integ, cam, spp=64, seed=0)
    img_b, nr_b = render_persistent_sharded(integ, cam, 64, 0, mesh)
    a, b = np.asarray(img_a), np.asarray(img_b)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.01
    assert abs(int(nr_a) - int(nr_b)) / int(nr_a) < 0.01


def test_mega_mixture_mask_match_path():
    """Round-5: composite mixture/blend/mask families through the
    in-kernel child select chains — diffuse+GGX mixture, a mask
    (null-child pass-through delta), and a glass+diffuse mixture with a
    delta child, vs the XLA wavefront."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    dif = d.add_material(kind="diffuse", albedo=(0.7, 0.3, 0.2))
    ggx = d.add_material(kind="roughconductor", alpha=0.2)
    mix = d.add_material(kind="mixturebsdf", child_a=dif, child_b=ggx,
                         weight=0.6)
    msk = d.add_material(kind="mask", child_a=dif, weight=0.4)
    glass = d.add_material(kind="dielectric", int_ior=1.5)
    mixd = d.add_material(kind="mixturebsdf", child_a=glass,
                          child_b=dif, weight=0.5)
    floor = d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.55))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([-1.6, 0, 0]), material=mix)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 0.2, 0]), material=msk)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([1.8, 0, 0]), material=mixd)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(13, 12, 11))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 5.0], n=8192, depth=8)
    _assert_close(L_ref, L_m)


def test_mega_coating_matches_path():
    """Round-5: smooth coating (delta coat + nested child bent through
    the interface, absorption, refraction Jacobian) vs the XLA
    wavefront — coat over diffuse and coat over GGX."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    dif = d.add_material(kind="diffuse", albedo=(0.6, 0.25, 0.2))
    coat = d.add_material(kind="coating", child_a=dif, int_ior=1.5,
                          sigma_a=(0.1, 0.15, 0.2), thickness=1.0)
    ggx = d.add_material(kind="roughconductor", alpha=0.25)
    coat2 = d.add_material(kind="coating", child_a=ggx, int_ior=1.49)
    floor = d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.55))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([-1.3, 0, 0]), material=coat)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([1.3, 0, 0]), material=coat2)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(13, 12, 11))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 5.0], n=8192, depth=8)
    _assert_close(L_ref, L_m)


def test_mega_roughcoating_matches_path():
    """Round-5: rough coating (GGX coat lobe + nested child through the
    interface, MIS-combined weights) vs the XLA wavefront, plus the
    high-spp statistical mean check from the coating validation
    recipe."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    dif = d.add_material(kind="diffuse", albedo=(0.55, 0.2, 0.15))
    rc = d.add_material(kind="roughcoating", child_a=dif, int_ior=1.5,
                        alpha=0.1, sigma_a=(0.05, 0.08, 0.1),
                        distribution="ggx")
    floor = d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.55))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(12, 24), material=rc)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(13, 12, 11))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 5.0], n=8192, depth=8)
    _assert_close(L_ref, L_m)


def test_mega_roughplastic_matches_path():
    """Round-5: rough plastic — GGX spec lobe + diffuse base through
    the rough interface, with the rtrans 3D tables collapsed to
    per-material cosθ slices in SMEM (eta/alpha are material
    constants). Lane parity + high-spp recipe both exact in probes."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    rp = d.add_material(kind="roughplastic",
                        diffuse_reflectance=(0.5, 0.15, 0.1),
                        alpha=0.15, distribution="ggx", int_ior=1.49)
    rp2 = d.add_material(kind="roughplastic",
                         diffuse_reflectance=(0.1, 0.3, 0.5),
                         alpha=0.4, distribution="ggx", nonlinear=True)
    floor = d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.55))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([-1.3, 0, 0]), material=rp)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([1.3, 0, 0]), material=rp2)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(13, 12, 11))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 5.0], n=8192, depth=8)
    _assert_close(L_ref, L_m)


def test_mega_leadr_matches_path():
    """Round-5: LEADR anisotropic rough diffuse (4-point unscented
    quadrature over the slope Gaussian, moments-derived Smith G2) in
    the in-kernel dispatch vs the XLA wavefront — both the
    visibility-on and visibility-off variants."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.mega import MegaPathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    lead = d.add_material(kind="aniso_roughdiffuse",
                          albedo=(0.6, 0.4, 0.25),
                          moments0=(0.15, -0.1),
                          moments1=(0.55, 0.4, 0.05))
    lead2 = d.add_material(kind="aniso_roughdiffuse",
                           albedo=(0.3, 0.4, 0.6),
                           moments0=(0.0, 0.0),
                           moments1=(0.3, 0.3, 0.0),
                           sample_visibility=False)
    floor = d.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.55))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=floor)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([-1.3, 0, 0]), material=lead)
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([1.3, 0, 0]), material=lead2)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2] * 3),
                material=floor, radiance=(13, 12, 11))
    scene = compile_scene(d, cluster_size=64)
    assert MegaPathTracer.supports(scene)[0]
    L_ref, L_m = _li_pair(scene, [0.0, 0.8, 5.0], n=8192, depth=8)
    _assert_close(L_ref, L_m)
