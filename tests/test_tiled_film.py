"""Tiled out-of-core film + EXR annotation tests."""
import numpy as np

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.film.tiled import render_tiled
from mitsuba_tpu.integrator.direct import DirectIntegrator
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


def test_tiled_matches_monolithic(tmp_path):
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=24, height=24)
    integ = DirectIntegrator(cluster_size=128)
    out = render_tiled(scene, cam, integ, spp=4,
                       out_path=str(tmp_path / "t.npy"), tile=16, seed=0)
    img = np.asarray(render(scene, cam, Film(width=24, height=24),
                            integ, spp=4, seed=0))
    # identical RNG streams ⇒ bit-identical to the box-filter film
    assert np.allclose(np.asarray(out), img, atol=1e-5)
    # memmap persisted
    back = np.load(str(tmp_path / "t.npy"), mmap_mode="r")
    assert back.shape == (24, 24, 3)
    assert np.allclose(back, img, atol=1e-5)


def test_exr_annotations_roundtrip(tmp_path):
    from mitsuba_tpu.io.image import (read_exr, read_exr_annotations,
                                      write_exr)
    img = np.random.default_rng(0).random((8, 12, 3)).astype(np.float32)
    fn = str(tmp_path / "a.exr")
    write_exr(fn, img, annotations={"renderTime": 12.5, "spp": 64,
                                    "generatedBy": "mitsuba_tpu"})
    back = read_exr(fn)
    assert np.allclose(back, img)
    meta = read_exr_annotations(fn)
    assert abs(meta["renderTime"] - 12.5) < 1e-6
    assert meta["spp"] == 64
    assert meta["generatedBy"] == "mitsuba_tpu"


def test_banner_stamp():
    """hdrfilm banner overlay (ref: hdrfilm.cpp banner property)."""
    from mitsuba_tpu.io.image import stamp_banner
    img = np.zeros((32, 64, 3), np.float32)
    out = stamp_banner(img)
    assert out.shape == img.shape
    assert out.max() > 0.5           # glyphs stamped
    assert img.max() == 0.0          # input untouched
    assert out[:20].max() == 0.0     # only the bottom rows
    tiny = np.zeros((4, 8, 3), np.float32)
    assert stamp_banner(tiny).max() == 0.0   # too small: no-op
