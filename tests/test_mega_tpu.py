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
