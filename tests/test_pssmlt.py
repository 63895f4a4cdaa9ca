"""PSSMLT consistency: the Metropolis estimator must reproduce the path
tracer's image (same integral; Kelemen weights make it unbiased).

Mirrors the reference's cross-integrator testing strategy (SURVEY.md §4,
data/tests/test_bidir_*.xml compare integrators on shared scenes).
"""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.integrator.pssmlt import PSSMLT, _mutate_small
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


@pytest.fixture(scope="module")
def cam():
    return cornell_camera(width=16, height=16)


def test_mutation_kernel_stays_in_unit_interval():
    import jax.numpy as jnp
    u = jnp.linspace(0.0, 0.999, 64).reshape(8, 8)
    r = jnp.linspace(0.0, 0.999, 64).reshape(8, 8)
    coin = (jnp.arange(64).reshape(8, 8) % 2).astype(jnp.float32)
    up = np.asarray(_mutate_small(u, r, coin))
    assert (up >= 0.0).all() and (up < 1.0).all()
    # small steps: bounded by s2
    assert np.abs(((up - np.asarray(u)) + 0.5) % 1.0 - 0.5).max() \
        <= 1.0 / 64.0 + 1e-6


def test_pssmlt_matches_path(cornell, cam):
    film = Film(width=16, height=16)
    mlt = PSSMLT(max_depth=3, n_chains=2048, boot_mult=4,
                 cluster_size=128).specialized_for(cornell)
    img_m, b, acc = mlt.render(cornell, cam, film, n_mutations=160,
                               seed=3)
    img_m = np.asarray(img_m)
    img_p = np.asarray(render(
        cornell, cam, film,
        PathTracer(max_depth=3, rr_depth=99,
                   cluster_size=128).specialized_for(cornell),
        spp=128, seed=1))

    # bootstrap normalisation b ≈ mean image luminance of the PT render
    lum_p = (img_p * [0.212671, 0.715160, 0.072169]).sum(-1).mean()
    assert abs(float(b) - lum_p) / lum_p < 0.15, (float(b), lum_p)

    # global brightness agreement
    rel = abs(img_m.mean() - img_p.mean()) / img_p.mean()
    assert rel < 0.08, (img_m.mean(), img_p.mean(), rel)

    # spatial agreement in a smoothed sense. Loose bound: at this mutation
    # count the directly-visible-emitter columns still carry ~±15% chain
    # variance (their luminance is ~15× the image mean).
    cm = img_m.mean(axis=(0, 2))
    cp = img_p.mean(axis=(0, 2))
    assert np.abs(cm - cp).max() / img_p.mean() < 0.65

    # a healthy Kelemen chain accepts a sizeable fraction of mutations
    assert 0.1 < float(acc) < 0.9
