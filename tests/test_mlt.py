"""Path-space MLT (Veach mutation strategies) consistency tests.

Same strategy as tests/test_pssmlt.py: the Metropolis estimator must
reproduce the path tracer's image (shared integral), mirroring the
reference's cross-integrator scenes (SURVEY.md §4, test_bidir_*.xml).
Additionally checks each structured mutation keeps the PSV inside the
unit cube and only touches its designated dimension block.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.common import (DIM_PIXEL, DIMS_PER_BOUNCE,
                                           SENSOR_DIMS, bounce_dim)
from mitsuba_tpu.integrator.mlt import MLT
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


@pytest.fixture(scope="module")
def cam():
    return cornell_camera(width=16, height=16)


def _propose_with(mlt, psv, seed, step):
    chain = jnp.arange(psv.shape[0], dtype=jnp.uint32)
    out, strat = mlt._propose(psv, jnp.uint32(seed), chain,
                              jnp.uint32(step))
    return np.asarray(out), np.asarray(strat)


def test_mutations_stay_in_unit_cube_and_respect_blocks():
    mlt = MLT(max_depth=3, n_chains=256)
    D = mlt.n_dims
    key = np.random.default_rng(7)
    psv = jnp.asarray(key.random((256, D, 2), dtype=np.float32))
    out, strat = _propose_with(mlt, psv, seed=5, step=11)
    assert (out >= 0.0).all() and (out < 1.0).all()
    psv = np.asarray(psv)
    delta = np.abs(out - psv).sum(axis=-1)  # [n, D]

    # lens perturbation: only the pixel dims move
    lens = strat == 1
    if lens.any():
        moved = delta[lens] > 1e-7
        other = np.ones(D, bool)
        other[DIM_PIXEL] = False
        assert not moved[:, other].any()

    # caustic perturbation: only bounce-0 BSDF dir dims move
    caustic = strat == 2
    if caustic.any():
        moved = delta[caustic] > 1e-7
        other = np.ones(D, bool)
        other[bounce_dim(0, 2)] = False
        assert not moved[:, other].any()

    # bidirectional: sensor dims move only in the whole-vector (large)
    # variant, in which case essentially every dim was resampled
    bidir = strat == 0
    if bidir.any():
        moved = delta[bidir] > 1e-7
        sensor_moved = moved[:, :SENSOR_DIMS].any(axis=1)
        frac_moved = moved.mean(axis=1)
        assert (frac_moved[sensor_moved] > 0.9).all()
        assert moved.any()

    # all four strategies appear in 256 draws
    assert set(np.unique(strat)) == {0, 1, 2, 3}


def test_mlt_matches_path(cornell, cam):
    film = Film(width=16, height=16)
    mlt = MLT(max_depth=3, n_chains=2048, boot_mult=4,
              cluster_size=128).specialized_for(cornell)
    img_m, b, acc = mlt.render(cornell, cam, film, n_mutations=160,
                               seed=3)
    img_m = np.asarray(img_m)
    img_p = np.asarray(render(
        cornell, cam, film,
        PathTracer(max_depth=3, rr_depth=99,
                   cluster_size=128).specialized_for(cornell),
        spp=128, seed=1))

    lum_p = (img_p * [0.212671, 0.715160, 0.072169]).sum(-1).mean()
    assert abs(float(b) - lum_p) / lum_p < 0.15, (float(b), lum_p)

    rel = abs(img_m.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.10, (img_m.mean(), img_p.mean(), rel)

    cm = img_m.mean(axis=(0, 2))
    cp = img_p.mean(axis=(0, 2))
    assert np.abs(cm - cp).max() / img_p.mean() < 0.65

    assert 0.1 < float(acc) < 0.95


def test_mlt_via_xml_registry():
    from mitsuba_tpu.scene.xml import LoadedScene
    d = LoadedScene(desc=None, camera=None, film=None,
                    integrator_config={"type": "mlt", "max_depth": 4})
    integ = d.make_integrator()
    assert isinstance(integ, MLT) and integ.max_depth == 4
