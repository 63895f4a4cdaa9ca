"""Sweep persistent-megakernel block configs on the real chip.

Run: python -c "exec(open('experiments/sweep_mega.py').read())"
"""
import time

import jax
import jax.numpy as jnp

from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

W = H = 256
SPP = 2048
scene = compile_scene(cornell_box(), cluster_size=64)
cam = cornell_camera(width=W, height=H)

for pblock, sublanes in ((16384, 8), (8192, 8), (32768, 8),
                         (16384, 16), (32768, 16), (65536, 8),
                         (16384, 32), (65536, 16)):
    try:
        integ = MegaPathTracer.for_scene(scene, max_depth=8,
                                         pblock=pblock, sublanes=sublanes)
        img, n_rays = render_persistent(integ, cam, spp=SPP, seed=0)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        outs = []
        for s in range(1, 3):
            img, _ = render_persistent(integ, cam, spp=SPP, seed=s)
            outs.append(img)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"pblock={pblock:6d} S={sublanes:2d}: "
              f"{int(n_rays) * 2 / dt / 1e9:.3f} G rays/s")
    except Exception as e:
        print(f"pblock={pblock:6d} S={sublanes:2d}: FAIL {type(e).__name__} {str(e)[:80]}")
