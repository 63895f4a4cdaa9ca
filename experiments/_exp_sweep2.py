"""Round-2 tuning sweep for the persistent megakernel (Cornell PT8).

Times render_persistent across (pblock, sublanes, spp-per-pass) and
prints Mrays/s per config. Quick mode: spp=512, 1 warmup + 2 timed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

W = H = 256
SPP = 512


def run(pblock, sublanes, spp=SPP):
    scene = compile_scene(cornell_box(), cluster_size=64)
    cam = cornell_camera(width=W, height=H)
    integ = MegaPathTracer.for_scene(scene, max_depth=8, pblock=pblock,
                                     sublanes=sublanes)
    img, n_rays = render_persistent(integ, cam, spp=spp, seed=0)
    jax.block_until_ready(img)
    rays = int(n_rays)
    t0 = time.perf_counter()
    outs = []
    for s in range(1, 3):
        img, _ = render_persistent(integ, cam, spp=spp, seed=s)
        outs.append(img)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    mrs = rays * 2 / dt / 1e6
    print(f"pblock={pblock:6d} s={sublanes:2d} spp={spp}: "
          f"{mrs:8.1f} Mrays/s  ({dt:.2f}s)", flush=True)
    return mrs


if __name__ == "__main__":
    configs = [(16384, 8), (8192, 8), (32768, 8), (65536, 8),
               (16384, 16), (32768, 16), (16384, 4)]
    pick = [int(x) for x in sys.argv[1:]] or range(len(configs))
    for i in pick:
        pb, s = configs[i]
        try:
            run(pb, s)
        except Exception as e:
            print(f"pblock={pb} s={s}: FAIL {type(e).__name__}: {e}",
                  flush=True)
