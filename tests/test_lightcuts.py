"""Lightcuts: tree invariants + render consistency vs full VPL sum.

The cut is an approximation of the complete VPL sum; with cut_size ≈
n_vpls it must match exactly-ish, with small cuts it must stay within
the paper's ~2% perceptual regime on smooth scenes (loose bound here).
"""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.lightcuts import (LightcutsIntegrator,
                                              build_light_tree)
from mitsuba_tpu.integrator.vpl import VPLIntegrator
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


def test_tree_flux_conservation(cornell):
    vpl = VPLIntegrator(max_depth=4, n_paths=64,
                        cluster_size=128).specialized_for(cornell)
    vpls = vpl.generate_vpls(cornell, seed=0)
    tree = build_light_tree(vpls)
    child = np.asarray(tree.child)
    flux = np.asarray(tree.flux)
    # parent flux = sum of child fluxes, root = total
    inner = child[:, 0] >= 0
    assert np.allclose(flux[inner],
                       flux[child[inner, 0]] + flux[child[inner, 1]],
                       rtol=1e-5)
    valid = np.asarray(vpls.valid)
    assert np.allclose(flux[0], np.asarray(vpls.flux)[valid].sum(0),
                       rtol=1e-5)
    # bboxes contain representatives
    assert (np.asarray(tree.rep_p) >= np.asarray(tree.bb_min) - 1e-5
            ).all()
    assert (np.asarray(tree.rep_p) <= np.asarray(tree.bb_max) + 1e-5
            ).all()


def test_lightcuts_matches_vpl(cornell):
    cam = cornell_camera(width=16, height=16)
    film = Film(width=16, height=16)
    vpl = VPLIntegrator(max_depth=3, n_paths=256, clamping=0.05,
                        cluster_size=128).specialized_for(cornell)
    img_full = np.asarray(vpl.render(cornell, cam, film, spp=4, seed=0))
    # a cut as large as the VPL count reproduces the full sum
    lc_big = LightcutsIntegrator(max_depth=3, n_paths=256, clamping=0.05,
                                 cut_size=256,
                                 cluster_size=128).specialized_for(cornell)
    img_big = np.asarray(lc_big.render(cornell, cam, film, spp=4, seed=0))
    rel_big = abs(img_big.mean() - img_full.mean()) / img_full.mean()
    assert rel_big < 0.02, (img_big.mean(), img_full.mean())
    # a small cut stays close (error-bound-driven refinement)
    lc = LightcutsIntegrator(max_depth=3, n_paths=256, clamping=0.05,
                             cut_size=48,
                             cluster_size=128).specialized_for(cornell)
    img_cut = np.asarray(lc.render(cornell, cam, film, spp=4, seed=0))
    rel = abs(img_cut.mean() - img_full.mean()) / img_full.mean()
    assert rel < 0.1, (img_cut.mean(), img_full.mean(), rel)
    assert np.isfinite(img_cut).all()
