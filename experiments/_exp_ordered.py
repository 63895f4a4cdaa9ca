"""Diagnose ordered traversal: raw fused-trace throughput + clusters
visited per block, on primary rays and on randomized rays."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.accel import pallas_trace as pt
from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.core.transform import look_at
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.scene.builder import EnvmapLight, SceneDesc, compile_scene
from mitsuba_tpu.sensor.sensor import PerspectiveCamera
from mitsuba_tpu.texture.texture import checkerboard

d = SceneDesc()
m_floor = d.add_material(kind="diffuse")
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, -1, 0])
            @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([8] * 3),
            material=m_floor)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([-1.2, 0, 0]),
            material=m_floor)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([1.2, 0, 0]),
            material=m_floor)
scene = compile_scene(d, cluster_size=64)
C = scene.woop_clusters.shape[0]
print("clusters:", C, "order:", scene.cluster_order is not None)

W = H = 512
cam = PerspectiveCamera(width=W, height=H, fov_x=45.0,
                        to_world=look_at([0, 1, 6], [0, 0, 0], [0, 1, 0]))
n = W * H * 4
px = jnp.arange(n) % (W * H)
pos = jnp.stack([(px % W).astype(jnp.float32) + 0.5,
                 (px // W).astype(jnp.float32) + 0.5], -1)
o, dd = cam.sample_ray(pos)

rs = np.random.RandomState(0)
perm = jnp.asarray(rs.permutation(n))
o_rand, d_rand = o[perm], dd[perm]


def bench(label, o, dv, ordered, any_hit=False):
    mint = jnp.full((n,), 1e-4)
    maxt = jnp.full((n,), 1e30)
    kw = {}
    if ordered:
        kw = dict(cluster_meta=scene.cluster_meta,
                  cluster_order=scene.cluster_order,
                  cluster_odist=scene.cluster_odist)
    ro, rd = pt._pack_rays(o, dv)

    @jax.jit
    def run():
        return pt.trace(scene.woop_clusters, ro, rd, mint[None],
                        maxt[None], tc=64, block=int(os.environ.get("BLOCK",2048)), any_hit=any_hit,
                        cluster_aabb=scene.cluster_aabb, **kw)

    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(8):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 8
    print(f"{label} ordered={ordered}: {n / dt / 1e6:.1f} M rays/s, "
          f"hit {float(jnp.mean(out[2].astype(jnp.float32))):.3f}")


for ordered in (False, True):
    bench("primary ", o, dd, ordered)
    bench("shuffled", o_rand, d_rand, ordered)
