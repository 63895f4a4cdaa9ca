"""Time one persistent render (helper for kernel ablations)."""
import time

import jax

from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

scene = compile_scene(cornell_box(), cluster_size=64)
cam = cornell_camera(width=256, height=256)
integ = MegaPathTracer.for_scene(scene, max_depth=8)
img, n_rays = render_persistent(integ, cam, spp=2048, seed=0)
jax.block_until_ready(img)
t0 = time.perf_counter()
outs = []
for s in range(1, 4):
    img, _ = render_persistent(integ, cam, spp=2048, seed=s)
    outs.append(img)
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"{int(n_rays) * 3 / dt / 1e9:.4f} G rays/s  "
      f"(img mean {float(img.mean()):.4f})")
