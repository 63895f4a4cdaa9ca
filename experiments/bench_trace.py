"""Isolate pallas_trace throughput on the GGX scene."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.accel.pallas_trace import pallas_intersect, pallas_occluded
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.core import transform as tfm

d = SceneDesc()
m = d.add_material(kind="diffuse")
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, -1, 0]) @ tfm.rotate([1, 0, 0], -90)
            @ tfm.scale([8] * 3), material=m)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([-1.2, 0, 0]),
            material=m)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([1.2, 0, 0]),
            material=m)
# shuffle triangles pathologically via many small interleaved shapes
scene = compile_scene(d, cluster_size=64)
print("tris", scene.n_tris, "clusters", scene.woop_clusters.shape)

n = 1 << 20
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-3, 3, (n, 3)), jnp.float32)
dvec = rng.standard_normal((n, 3))
dvec /= np.linalg.norm(dvec, axis=-1, keepdims=True)
dv = jnp.asarray(dvec, jnp.float32)
mint = jnp.full((n,), 1e-4)
maxt = jnp.full((n,), 1e30)

@jax.jit
def closest(o, dv):
    its = pallas_intersect(scene, o, dv, mint, maxt)
    return its.valid.sum()

@jax.jit
def shadow(o, dv):
    return pallas_occluded(scene, o, dv, mint, maxt).sum()

for name, fn in (("closest", closest), ("shadow", shadow)):
    fn(o, dv).block_until_ready()
    t0 = time.perf_counter()
    outs = [fn(o, dv) for _ in range(5)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{name}: {n * 5 / dt / 1e6:.1f} M rays/s")
