"""Composite BSDF adapters: mixture/blend/mask, smooth coating, difftrans,
normal maps — sample↔pdf↔eval consistency and render integration
(mirrors the reference's chi-square strategy for adapter BSDFs,
src/bsdfs/{mixturebsdf,mask,coating,difftrans}.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu.bsdf.bsdf as B
from mitsuba_tpu.core import rng
from mitsuba_tpu.scene import scene as S
from mitsuba_tpu.scene.builder import Material, SceneDesc, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


def _mat_info(desc, mat_id, n, uv=None):
    scene = compile_scene(desc, cluster_size=64)
    mid = jnp.full((n,), mat_id, jnp.int32)
    return scene, B.resolve_material(scene, mid, uv)


def _hemi_dirs(n, seed=0, sign=1.0):
    rs = np.random.RandomState(seed)
    d = rs.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d[:, 2] = sign * np.abs(d[:, 2])
    return jnp.asarray(d, jnp.float32)


def _mk_desc(*mats):
    desc = SceneDesc()
    for m in mats:
        desc.materials.append(m)
    # one dummy shape so compile_scene works
    from mitsuba_tpu.scene.shapes import rectangle
    desc.add_shape(rectangle(), material=0)
    return desc


def test_difftrans_transmits():
    desc = _mk_desc(Material(kind="difftrans",
                             transmittance=(0.8, 0.6, 0.4)))
    n = 4096
    scene, mat = _mat_info(desc, 0, n)
    wi = _hemi_dirs(n, 1)
    u2 = rng.sample_2d(0, jnp.arange(n), 0)
    u1 = rng.sample_1d(0, jnp.arange(n), 1)
    bs = B.sample_bsdf_ex(mat, wi, u2, u1)
    wo = np.asarray(bs.wo)
    # all samples on the opposite hemisphere
    assert (np.sign(wo[:, 2]) == -np.sign(np.asarray(wi)[:, 2])).all()
    # weight == transmittance (cosine sampling cancels exactly)
    np.testing.assert_allclose(np.asarray(bs.weight),
                               np.tile([0.8, 0.6, 0.4], (n, 1)), rtol=1e-5)
    # eval/pdf consistency
    f = np.asarray(B.eval_bsdf_ex(mat, wi, bs.wo))
    p = np.asarray(B.pdf_bsdf_ex(mat, wi, bs.wo))
    np.testing.assert_allclose(f / np.maximum(p, 1e-9)[:, None],
                               np.asarray(bs.weight), rtol=1e-4)


def test_mixture_eval_is_convex_combination():
    m0 = Material(kind="diffuse", albedo=(0.9, 0.1, 0.1))
    m1 = Material(kind="diffuse", albedo=(0.1, 0.1, 0.9))
    mix = Material(kind="mixturebsdf", child_a=0, child_b=1, weight=0.25)
    desc = _mk_desc(m0, m1, mix)
    n = 1024
    scene, mat_mix = _mat_info(desc, 2, n)
    _, mat0 = _mat_info(desc, 0, n)
    _, mat1 = _mat_info(desc, 1, n)
    wi = _hemi_dirs(n, 2)
    wo = _hemi_dirs(n, 3)
    f_mix = np.asarray(B.eval_bsdf_ex(mat_mix, wi, wo))
    f0 = np.asarray(B.eval_bsdf_ex(mat0, wi, wo))
    f1 = np.asarray(B.eval_bsdf_ex(mat1, wi, wo))
    np.testing.assert_allclose(f_mix, 0.25 * f0 + 0.75 * f1, rtol=1e-5)
    p_mix = np.asarray(B.pdf_bsdf_ex(mat_mix, wi, wo))
    p0 = np.asarray(B.pdf_bsdf_ex(mat0, wi, wo))
    np.testing.assert_allclose(p_mix, p0, rtol=1e-5)  # both cosine pdfs


def test_mixture_sample_weight_consistency():
    """MC estimator check: weight == f_mix/pdf_mix at sampled directions
    for a smooth+smooth mixture (diffuse + roughconductor)."""
    m0 = Material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    m1 = Material(kind="roughconductor", alpha=0.3)
    mix = Material(kind="mixturebsdf", child_a=0, child_b=1, weight=0.4)
    desc = _mk_desc(m0, m1, mix)
    n = 8192
    scene, mat = _mat_info(desc, 2, n)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.4472, 0.8944]), (n, 3))
    u2 = rng.sample_2d(1, jnp.arange(n), 0)
    u1 = rng.sample_1d(1, jnp.arange(n), 1)
    bs = B.sample_bsdf_ex(mat, wi, u2, u1)
    live = np.asarray(bs.pdf) > 1e-6
    f = np.asarray(B.eval_bsdf_ex(mat, wi, bs.wo))[live]
    p = np.asarray(bs.pdf)[live]
    w = np.asarray(bs.weight)[live]
    np.testing.assert_allclose(f / p[:, None], w, rtol=2e-3, atol=1e-4)
    # pdf integrates to ~1 over sampled measure: E[1] via self-normalization
    assert 0.2 < live.mean() <= 1.0


def test_mask_passthrough_energy():
    """mask = mixture(child, null): opacity q passes through with prob
    1-q carrying full throughput (ref mask.cpp)."""
    child = Material(kind="diffuse", albedo=(1.0, 1.0, 1.0))
    m = Material(kind="mask", child_a=0, weight=0.3)   # 30% opaque
    desc = _mk_desc(child, m)
    n = 20000
    scene, mat = _mat_info(desc, 1, n)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    u2 = rng.sample_2d(2, jnp.arange(n), 0)
    u1 = rng.sample_1d(2, jnp.arange(n), 1)
    bs = B.sample_bsdf_ex(mat, wi, u2, u1)
    wo = np.asarray(bs.wo)
    frac_through = (wo[:, 2] < 0).mean()     # null lobe: wo = -wi
    assert abs(frac_through - 0.7) < 0.02
    # pass-through lanes are delta with weight 1
    thr = wo[:, 2] < 0
    np.testing.assert_allclose(np.asarray(bs.weight)[thr], 1.0, rtol=1e-5)
    assert np.asarray(bs.is_delta)[thr].all()


def test_coating_white_furnace_bound_and_consistency():
    """Smooth coat over white diffuse: sampled weights stay ≤ 1 + eps and
    eval/pdf matches the sample weight on smooth (non-delta) lanes."""
    child = Material(kind="diffuse", albedo=(1.0, 1.0, 1.0))
    coat = Material(kind="coating", child_a=0, int_ior=1.5, ext_ior=1.0,
                    sigma_a=(0.0, 0.0, 0.0))
    desc = _mk_desc(child, coat)
    n = 16384
    scene, mat = _mat_info(desc, 1, n)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.5, 0.8660254]), (n, 3))
    u2 = rng.sample_2d(3, jnp.arange(n), 0)
    u1 = rng.sample_1d(3, jnp.arange(n), 1)
    bs = B.sample_bsdf_ex(mat, wi, u2, u1)
    w = np.asarray(bs.weight)
    assert np.isfinite(w).all() and (w >= 0).all()
    # energy: average outgoing ≤ 1 (absorption-free coat, white base)
    mean_w = w.mean(axis=0)
    assert (mean_w < 1.02).all()
    # Weidlich-Wilkie-style coat drops TIR'd nested samples (as the
    # reference does): survival ≈ F + (1-F)·sin²θc·(1-F̄o) ≈ 0.42 for η=1.5
    assert 0.35 < mean_w.mean() < 0.55
    smooth = ~np.asarray(bs.is_delta) & (np.asarray(bs.pdf) > 1e-6)
    f = np.asarray(B.eval_bsdf_ex(mat, wi, bs.wo))[smooth]
    p = np.asarray(bs.pdf)[smooth]
    np.testing.assert_allclose(f / p[:, None], w[smooth],
                               rtol=5e-3, atol=1e-3)


def test_coating_darkens_at_grazing():
    child = Material(kind="diffuse", albedo=(0.8, 0.8, 0.8))
    coat = Material(kind="coating", child_a=0, int_ior=1.5)
    desc = _mk_desc(child, coat)
    n = 512
    scene, mat = _mat_info(desc, 1, n)
    wo = _hemi_dirs(n, 5)
    wi_n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wi_g = jnp.broadcast_to(jnp.asarray([0.0, 0.995, 0.0998]), (n, 3))
    f_n = np.asarray(B.eval_bsdf_ex(mat, wi_n, wo)).mean()
    f_g = np.asarray(B.eval_bsdf_ex(mat, wi_g, wo)).mean()
    assert f_g < f_n                     # more Fresnel loss at grazing


def test_render_with_mixture_and_mask():
    """End-to-end: Cornell with a mixture back wall renders without NaNs
    and close to the pure-diffuse render in overall energy."""
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.render import render
    desc = cornell_box()
    shiny = desc.add_material(kind="roughconductor", alpha=0.2)
    base = desc.materials[0]
    mix = desc.add_material(kind="mixturebsdf", child_a=0, child_b=shiny,
                            weight=0.7)
    desc.shapes[0].material = mix       # floor → mixture
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(width=32, height=32)
    integ = PathTracer(max_depth=4).specialized_for(scene)
    img = np.asarray(render(scene, cam, Film(width=32, height=32),
                            integ, spp=16, seed=0))
    assert np.isfinite(img).all()
    assert 0.05 < img.mean() < 1.0


def test_normal_map_changes_shading():
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.render import render
    desc = cornell_box()
    # constant tilted normal map on the floor
    nm = np.zeros((4, 4, 3), np.float32)
    nm[..., 0] = 0.5 + 0.35      # tilt in +x
    nm[..., 1] = 0.5
    nm[..., 2] = 0.75
    tid = desc.add_texture(nm)
    desc.materials[0].normal_texture = tid
    scene = compile_scene(desc, cluster_size=64)
    cam = cornell_camera(width=32, height=32)
    integ = PathTracer(max_depth=3).specialized_for(scene)
    img = np.asarray(render(scene, cam, Film(width=32, height=32),
                            integ, spp=8, seed=0))
    desc2 = cornell_box()
    scene2 = compile_scene(desc2, cluster_size=64)
    integ2 = PathTracer(max_depth=3).specialized_for(scene2)
    img2 = np.asarray(render(scene2, cam, Film(width=32, height=32),
                             integ2, spp=8, seed=0))
    assert np.isfinite(img).all()
    assert np.abs(img - img2).mean() > 1e-3   # shading visibly changed


def test_roughcoating_consistency_and_energy():
    """Rough coat over diffuse: sample weight == eval/pdf on smooth lanes,
    energy bounded, reflection lobe concentrates near the mirror direction
    (ref: src/bsdfs/roughcoating.cpp)."""
    child = Material(kind="diffuse", albedo=(0.9, 0.9, 0.9))
    coat = Material(kind="roughcoating", child_a=0, int_ior=1.5,
                    ext_ior=1.0, alpha=0.1)
    desc = _mk_desc(child, coat)
    n = 16384
    scene, mat = _mat_info(desc, 1, n)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.5, 0.8660254]), (n, 3))
    u2 = rng.sample_2d(7, jnp.arange(n), 0)
    u1 = rng.sample_1d(7, jnp.arange(n), 1)
    bs = B.sample_bsdf_ex(mat, wi, u2, u1)
    w = np.asarray(bs.weight)
    assert np.isfinite(w).all() and (w >= 0).all()
    assert (w.mean(axis=0) < 1.05).all()
    # live smooth lanes: nested picks that TIR on the way out are dropped
    # (as in the smooth coat); survivors ≈ F + (1-F)/η² ≈ 0.47 for η=1.5
    smooth = ~np.asarray(bs.is_delta) & (np.asarray(bs.pdf) > 1e-5)
    assert 0.38 < smooth.mean() < 0.6
    f = np.asarray(B.eval_bsdf_ex(mat, wi, bs.wo))[smooth]
    p = np.asarray(bs.pdf)[smooth]
    np.testing.assert_allclose(f / p[:, None], w[smooth],
                               rtol=5e-3, atol=1e-3)
    # spec-lobe picks (u1 < F(wi)) land near the mirror direction
    mirror = np.asarray([0.0, -0.5, 0.8660254])
    cosm = np.asarray(bs.wo) @ mirror
    near = (cosm > 0.9).mean()
    assert near > 0.02                    # a visible glossy highlight


def test_roughcoating_chi2_sample_pdf():
    """Chi-square GOF: roughcoating sampled directions match its pdf
    (the reference's test_chisquare.cpp strategy)."""
    from mitsuba_tpu.core import chi2
    child = Material(kind="roughconductor", alpha=0.3)
    coat = Material(kind="roughcoating", child_a=0, int_ior=1.5,
                    ext_ior=1.0, alpha=0.2)
    desc = _mk_desc(child, coat)
    theta = 0.7
    wi1 = np.array([np.sin(theta), 0.0, np.cos(theta)], np.float32)

    def sample_fn(n):
        scene, mat = _mat_info(desc, 1, n)
        wib = jnp.broadcast_to(jnp.asarray(wi1), (n, 3))
        u2 = rng.sample_2d(11, np.arange(n), 0)
        u1 = rng.sample_1d(11, np.arange(n), 1)
        bs = B.sample_bsdf_ex(mat, wib, u2, u1)
        ok = (bs.pdf > 0) & ~bs.is_delta
        return np.asarray(jnp.where(ok[..., None], bs.wo, 0.0))

    def pdf_fn(dirs):
        n = dirs.shape[0]
        scene, mat = _mat_info(desc, 1, n)
        wib = jnp.broadcast_to(jnp.asarray(wi1), (n, 3))
        return np.asarray(B.pdf_bsdf_ex(mat, wib, jnp.asarray(dirs)))

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=200_000)
    assert passed, stats
