"""Photon mapping tests: hash-grid gather correctness vs brute force,
photon-power accounting, and render-level agreement with the path tracer
(the reference validates photonmapper against path renders of
data/tests scenes — SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.photonmap import (PhotonMapper,
                                              build_photon_map,
                                              render_progressive,
                                              trace_photons)
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    scene = compile_scene(cornell_box(), cluster_size=64)
    return scene


def test_photon_power_conservation(cornell):
    """Total deposited photon power ≤ emitted power and > 0 (deposits are
    depth ≥ 3 only; RR keeps the estimate unbiased)."""
    pm = PhotonMapper(max_depth=6, n_photons=1 << 13).specialized_for(
        cornell)
    pp, pw, pn, pwi, pv = trace_photons(cornell, pm, 1 << 13,
                                        jnp.uint32(3), 6)
    total = float(jnp.where(pv[..., None], pw, 0.0).sum())
    # emitted power = Le·A·π summed over area emitters
    le = np.asarray(cornell.em_radiance)[0]
    area = float(np.asarray(cornell.em_area)[0])
    emitted = float(le.mean() * area * np.pi)
    assert 0.05 * emitted < total < 3.5 * emitted  # avg albedo bounces


def test_grid_gather_matches_bruteforce(cornell):
    """Fixed-radius photon gather through the sorted hash grid equals the
    O(N·P) brute-force sum."""
    rs = np.random.RandomState(0)
    n_ph = 2048
    pos = jnp.asarray(rs.rand(n_ph, 3) * 2 - 1, jnp.float32)
    power = jnp.asarray(rs.rand(n_ph, 3) * 1e-3, jnp.float32)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n_ph, 3))
    wi = jnp.broadcast_to(
        jnp.asarray([0.0, 0.6, 0.8], jnp.float32), (n_ph, 3))
    valid = jnp.ones((n_ph,), bool)
    radius = 0.15
    pmap = build_photon_map(pos, power, normal, wi, valid, radius,
                            jnp.asarray([-1.0, -1.0, -1.0]),
                            jnp.asarray([1.0, 1.0, 1.0]), n_cells_dim=16)

    from mitsuba_tpu.bsdf.bsdf import resolve_material
    from mitsuba_tpu.core.math import Frame
    from mitsuba_tpu.integrator.photonmap import gather_radiance
    n_q = 64
    q = jnp.asarray(rs.rand(n_q, 3) * 1.6 - 0.8, jnp.float32)
    mat = resolve_material(cornell, jnp.zeros((n_q,), jnp.int32))
    frame = Frame.from_normal(
        jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n_q, 3)))
    wi_local = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n_q, 3))
    out = np.asarray(gather_radiance(pmap, mat, frame, q, wi_local,
                                     radius, max_per_cell=64))

    # brute force (numpy): diffuse albedo/π per photon in radius,
    # eval(wi_local, ph_wi) strips cos then multiplies... replicate:
    albedo = np.asarray(cornell.mat_params)[0, 0:3]
    ph_wi_z = 0.8
    f_per = albedo / np.pi * ph_wi_z / max(ph_wi_z, 1e-3)  # eval/|cos|
    ref = np.zeros((n_q, 3))
    pos_n = np.asarray(pos)
    pw_n = np.asarray(power)
    for i in range(n_q):
        d2 = ((pos_n - np.asarray(q)[i]) ** 2).sum(axis=1)
        sel = d2 <= radius * radius
        ref[i] = (pw_n[sel].sum(axis=0)) * f_per / (np.pi * radius ** 2)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-7)


def test_photonmap_render_matches_path(cornell):
    cam = cornell_camera(width=32, height=32)
    pm = PhotonMapper(max_depth=6, n_photons=1 << 15,
                      gather_radius=0.07).specialized_for(cornell)
    img_pm = np.asarray(render(cornell, cam, Film(width=32, height=32),
                               pm, spp=4, seed=0))
    pt = PathTracer(max_depth=6).specialized_for(cornell)
    img_pt = np.asarray(render(cornell, cam, Film(width=32, height=32),
                               pt, spp=64, seed=0))
    assert np.isfinite(img_pm).all()
    # agree in overall energy within the radius-bias margin
    assert abs(img_pm.mean() - img_pt.mean()) / img_pt.mean() < 0.15
    # and per-pixel correlation is strong (same structure)
    a, b = img_pm.reshape(-1, 3).mean(1), img_pt.reshape(-1, 3).mean(1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9


def test_progressive_converges(cornell):
    cam = cornell_camera(width=24, height=24)
    pm = PhotonMapper(max_depth=5, n_photons=1 << 13,
                      gather_radius=0.12).specialized_for(cornell)
    img = render_progressive(cornell, cam, Film(width=24, height=24),
                             pm, n_passes=3, spp_per_pass=2, seed=1)
    pt = PathTracer(max_depth=5).specialized_for(cornell)
    img_pt = np.asarray(render(cornell, cam, Film(width=24, height=24),
                               pt, spp=48, seed=0))
    assert np.isfinite(img).all()
    assert abs(img.mean() - img_pt.mean()) / img_pt.mean() < 0.2
