"""Debug: families scene black on TPU — isolate trace vs shading."""
import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

d = SceneDesc()
mats = [
    d.add_material(kind="plastic", diffuse_reflectance=(0.5, 0.2, 0.2)),
    d.add_material(kind="phong", diffuse_reflectance=(0.3, 0.4, 0.2),
                   specular_reflectance=(0.4, 0.4, 0.4), exponent=40.0),
    d.add_material(kind="ward", diffuse_reflectance=(0.3, 0.3, 0.4),
                   specular_reflectance=(0.3, 0.3, 0.3),
                   alpha=0.15, alpha_v=0.3),
    d.add_material(kind="roughdiffuse", albedo=(0.6, 0.5, 0.4),
                   alpha=0.4),
]
floor = d.add_material(kind="diffuse", albedo=(0.6, 0.6, 0.6))
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, -1, 0])
            @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
            material=floor)
for i, m in enumerate(mats):
    d.add_shape(shapes.sphere(12, 24),
                to_world=tfm.translate([1.7 * i - 2.5, 0, 0])
                @ tfm.scale([0.7] * 3), material=m)
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, 4, 0])
            @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([2.0] * 3),
            material=floor, radiance=(12.0, 11.0, 10.0))
scene = compile_scene(d, cluster_size=64)
print("tris", scene.n_tris, "clusters", scene.woop_clusters.shape[0],
      "ordered", scene.cluster_order is not None)

n = 2048
rs = np.random.RandomState(11)
o = jnp.asarray(np.tile([0.0, 1.0, 6.0], (n, 1)), jnp.float32)
dirs = rs.randn(n, 3) * [0.5, 0.4, 0.25] + [0, -0.1, -1.0]
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
dv = jnp.asarray(dirs, jnp.float32)
px = jnp.arange(n, dtype=jnp.uint32)

# 1. raw trace hits (ordered on)
from mitsuba_tpu.accel.pallas_trace import pallas_intersect
its = pallas_intersect(scene, o, dv, jnp.full((n,), 1e-4),
                       jnp.full((n,), 1e30))
print("ordered trace hit rate:", float(jnp.mean(its.valid.astype(jnp.float32))))

# 2. raw trace with ordered disabled
scene_no = scene._replace(cluster_meta=None, cluster_order=None,
                          cluster_odist=None)
its2 = pallas_intersect(scene_no, o, dv, jnp.full((n,), 1e-4),
                        jnp.full((n,), 1e30))
print("plain trace hit rate:  ",
      float(jnp.mean(its2.valid.astype(jnp.float32))),
      "agree:", float(jnp.mean((its.valid == its2.valid)
                               .astype(jnp.float32))))

# 3. wavefront li on both
pt = PathTracer(max_depth=6, cluster_size=64).specialized_for(scene)
L1 = jax.jit(pt.li)(scene, o, dv, jnp.uint32(3), px, 0)
print("li ordered:", float(jnp.mean(L1)))
L2 = jax.jit(pt.li)(scene_no, o, dv, jnp.uint32(3), px, 0)
print("li plain:  ", float(jnp.mean(L2)))
