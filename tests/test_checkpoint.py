"""Checkpoint/resume: a resumed progressive render equals an uninterrupted
one bit-for-bit (counter-based sampler addresses the stream absolutely)."""
import numpy as np

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
from mitsuba_tpu.util.checkpoint import ProgressiveRenderer


def test_resume_bit_exact(tmp_path):
    scene = compile_scene(cornell_box(), cluster_size=128)
    cam = cornell_camera(width=16, height=16)
    film = Film(width=16, height=16)
    integ = PathTracer(max_depth=3, cluster_size=128)

    # uninterrupted: 4 chunks of 4 spp
    r1 = ProgressiveRenderer(scene, cam, film, integ, seed=7)
    for _ in range(4):
        img_full = r1.step(4)

    # interrupted after 2 chunks, checkpointed, resumed in a new renderer
    r2 = ProgressiveRenderer(scene, cam, film, integ, seed=7)
    r2.step(4)
    r2.step(4)
    ck = str(tmp_path / "render.ckpt.npz")
    r2.save(ck)
    r3 = ProgressiveRenderer(scene, cam, film, integ, seed=7)
    r3.load(ck)
    r3.step(4)
    img_resumed = r3.step(4)

    assert np.array_equal(np.asarray(img_full), np.asarray(img_resumed))
