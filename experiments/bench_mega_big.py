"""Big-scene megakernel throughput (cluster fori_loop + AABB culling)."""
import time

import jax
import jax.numpy as jnp

from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.sensor.sensor import PerspectiveCamera
from mitsuba_tpu.core.transform import look_at

d = SceneDesc()
white = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
d.add_shape(shapes.rectangle(), to_world=tfm.translate([0, -1, 0])
            @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([8] * 3),
            material=white)
d.add_shape(shapes.sphere(40, 80), to_world=tfm.translate([0, 0, 0]),
            material=white)
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, 4, 0]) @ tfm.rotate([1, 0, 0], 90)
            @ tfm.scale([2] * 3), material=white,
            radiance=(8.0, 8.0, 8.0))
scene = compile_scene(d, cluster_size=64)
print("tris", scene.n_tris)
cam = PerspectiveCamera(width=256, height=256, fov_x=45.0,
                        to_world=look_at([0, 1.5, 6], [0, 0, 0],
                                         [0, 1, 0]))
integ = MegaPathTracer.for_scene(scene, max_depth=6)
print("clusters", integ.tables.woop.shape[0], "tc", integ.tables.tc)
img, n_rays = render_persistent(integ, cam, spp=256, seed=0)
jax.block_until_ready(img)
t0 = time.perf_counter()
outs = []
for s in range(1, 3):
    img, _ = render_persistent(integ, cam, spp=256, seed=s)
    outs.append(img)
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"{int(n_rays) * 2 / dt / 1e9:.3f} G rays/s (mean "
      f"{float(img.mean()):.4f})")

import numpy as np
from mitsuba_tpu.io.image import write_image
write_image('/tmp/verify/mega_big.png',
            np.clip(np.asarray(img), 0, 1) ** (1 / 2.2))
print("wrote /tmp/verify/mega_big.png")
