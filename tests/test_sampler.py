"""Sampler plugin tests (analog of test_samplers.cpp QMC property checks)."""
import numpy as np
import pytest

from mitsuba_tpu.sampler import sampler as S


@pytest.mark.parametrize("kind", [S.INDEPENDENT, S.STRATIFIED, S.LD,
                                  S.HALTON])
def test_range_and_determinism(kind):
    spp = 16
    samp = np.tile(np.arange(spp, dtype=np.uint32), 100)
    pixel = np.repeat(np.arange(100, dtype=np.uint32), spp)
    u = np.asarray(S.draw_2d(kind, 7, pixel, samp, spp, 3))
    assert u.shape == (1600, 2)
    assert (u >= 0).all() and (u < 1).all(), kind
    u2 = np.asarray(S.draw_2d(kind, 7, pixel, samp, spp, 3))
    assert (u == u2).all()


@pytest.mark.parametrize("kind", [S.STRATIFIED, S.LD])
def test_stratification_1d(kind):
    """Every pixel's spp draws must cover all spp strata exactly once."""
    spp = 16
    for pix in [0, 17, 1234]:
        u = np.asarray(S.draw_1d(kind, 1, np.full(spp, pix, np.uint32),
                                 np.arange(spp, dtype=np.uint32), spp, 5))
        strata = np.sort((u * spp).astype(int))
        assert (strata == np.arange(spp)).all(), (kind, pix, strata)


def test_ld_2d_elementary_intervals():
    """(0,2)-sequence: first 16 points land one per cell of every 4×4
    dyadic partition."""
    spp = 16
    u = np.asarray(S.draw_2d(S.LD, 3, np.zeros(spp, np.uint32),
                             np.arange(spp, dtype=np.uint32), spp, 2))
    cells = (u[:, 0] * 4).astype(int) * 4 + (u[:, 1] * 4).astype(int)
    assert len(np.unique(cells)) == spp


def test_halton_low_discrepancy():
    """Halton points are more evenly spread than random: star-discrepancy
    proxy via 8×8 cell occupancy variance."""
    spp = 64
    uh = np.asarray(S.draw_2d(S.HALTON, 0, np.zeros(spp, np.uint32),
                              np.arange(spp, dtype=np.uint32), spp, 2))
    ui = np.asarray(S.draw_2d(S.INDEPENDENT, 0, np.zeros(spp, np.uint32),
                              np.arange(spp, dtype=np.uint32), spp, 2))

    def occ_var(u):
        c = (u[:, 0] * 8).astype(int) * 8 + (u[:, 1] * 8).astype(int)
        counts = np.bincount(c, minlength=64)
        return counts.var()

    assert occ_var(uh) < occ_var(ui)


def test_stratified_variance_reduction():
    """Integrating a smooth function: stratified beats independent."""
    spp = 64
    f = lambda u: np.sin(np.pi * u[:, 0]) * u[:, 1]
    exact = 2 / np.pi * 0.5
    errs = {}
    for kind in [S.INDEPENDENT, S.STRATIFIED]:
        est = []
        for pix in range(200):
            u = np.asarray(S.draw_2d(kind, 0, np.full(spp, pix, np.uint32),
                                     np.arange(spp, dtype=np.uint32), spp,
                                     0))
            est.append(f(u).mean())
        errs[kind] = np.mean((np.array(est) - exact) ** 2)
    assert errs[S.STRATIFIED] < 0.5 * errs[S.INDEPENDENT], errs


def test_render_with_ld_sampler():
    """End-to-end: LD sampler renders the Cornell box with lower noise than
    independent at equal spp."""
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=32, height=32)
    film = Film(width=32, height=32)
    spp = 16
    ref = np.asarray(render(
        scene, cam, film, PathTracer(max_depth=3, cluster_size=128),
        spp=128, seed=9))
    imgs = {}
    for kind in [S.INDEPENDENT, S.LD]:
        integ = PathTracer(max_depth=3, cluster_size=128, sampler=kind,
                           spp=spp)
        imgs[kind] = np.asarray(render(scene, cam, film, integ, spp=spp,
                                       seed=0))
    mse = {k: ((v - ref) ** 2).mean() for k, v in imgs.items()}
    assert mse[S.LD] < mse[S.INDEPENDENT], mse
