"""Irradiance cache: record irradiance correctness + render consistency
vs the path tracer (the cache is an approximation — loose tolerances,
like the reference's qualitative validation)."""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.irrcache import IrrCacheIntegrator
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


@pytest.fixture(scope="module")
def cornell():
    return compile_scene(cornell_box(), cluster_size=128)


def test_cache_records(cornell):
    ic = IrrCacheIntegrator(records=256, hemi_samples=32,
                            cluster_size=128)
    cache = ic.build_cache(cornell, seed=0)
    e = np.asarray(cache.e)
    r = np.asarray(cache.r)
    assert np.isfinite(e).all() and (e >= 0).all()
    assert (r > 0).all()
    # indirect irradiance in a lit Cornell box is nonzero for most records
    assert (e.sum(-1) > 1e-4).mean() > 0.5


def test_irrcache_render_close_to_path(cornell):
    cam = cornell_camera(width=20, height=20)
    film = Film(width=20, height=20)
    ic = IrrCacheIntegrator(records=768, hemi_samples=48, max_depth=4,
                            indirect_depth=3, cluster_size=128)
    img_c = np.asarray(ic.render(cornell, cam, film, spp=8, seed=0))
    img_p = np.asarray(render(
        cornell, cam, film,
        PathTracer(max_depth=4, rr_depth=99, cluster_size=128),
        spp=96, seed=1))
    assert np.isfinite(img_c).all()
    rel = abs(img_c.mean() - img_p.mean()) / img_p.mean()
    # cached-irradiance interpolation is biased; 15% mean agreement is
    # the qualitative bar (reference offers no quantitative one)
    assert rel < 0.15, (img_c.mean(), img_p.mean(), rel)
