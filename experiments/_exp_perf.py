"""Perf experiments for the persistent megakernel (not part of the library)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

WIDTH = HEIGHT = 256
SPP = 128
MAX_DEPTH = 8


def bench_block(block):
    scene = compile_scene(cornell_box(), cluster_size=64)
    camera = cornell_camera(width=WIDTH, height=HEIGHT)
    integ = MegaPathTracer.for_scene(scene, max_depth=MAX_DEPTH, block=block)
    img, n_rays = render_persistent(integ, camera, spp=SPP, seed=0)
    jax.block_until_ready(img)
    rays = int(n_rays)
    t0 = time.perf_counter()
    outs = []
    for s in range(1, 3):
        img, _ = render_persistent(integ, camera, spp=SPP, seed=s)
        outs.append(img)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"block={block}: {rays * 2 / dt / 1e6:.1f} M rays/s "
          f"(mean {float(img.mean()):.4f})")


if __name__ == "__main__":
    for b in (4096, 8192, 16384, 32768):
        bench_block(b)
