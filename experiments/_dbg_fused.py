"""Debug: fused shade kernel vs XLA tail, family by family, depth by depth.

PYTHONPATH=... python experiments/_dbg_fused.py
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene


def build(fams):
    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    mats = [white]
    if "ggx" in fams:
        mats.append(d.add_material(kind="roughconductor", alpha=0.2))
    if "glass" in fams:
        mats.append(d.add_material(kind="dielectric", int_ior=1.5))
    if "mirror" in fams:
        mats.append(d.add_material(kind="conductor"))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=white)
    for i, m in enumerate(mats):
        d.add_shape(shapes.sphere(12, 24),
                    to_world=tfm.translate([1.6 * i - 2, 0, 0])
                    @ tfm.scale([0.6] * 3), material=m)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([1.5] * 3),
                material=white, radiance=(10.0, 9.0, 8.0))
    return compile_scene(d, cluster_size=64)


def run(scene, depth, n=1 << 13):
    rs = np.random.RandomState(5)
    o = jnp.asarray(np.tile([[0.0, 1.0, 6.0]], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.2] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)
    base = PathTracer(max_depth=depth,
                      accel="pallas").specialized_for(scene)
    l_off = np.asarray(jax.jit(dataclasses.replace(
        base, fused_shade="off").li)(scene, o, dv, jnp.uint32(9), px, 0))
    l_on = np.asarray(jax.jit(dataclasses.replace(
        base, fused_shade="on").li)(scene, o, dv, jnp.uint32(9), px, 0))
    bad = ~np.isclose(l_on, l_off, rtol=2e-3, atol=2e-4).all(-1)
    print(f"  depth={depth}: mismatch {bad.mean():.4f} "
          f"mean_on={l_on.mean():.5f} mean_off={l_off.mean():.5f}")
    if bad.any():
        i = np.nonzero(bad)[0][:4]
        for j in i:
            print(f"    lane {j}: on={l_on[j]} off={l_off[j]}")
    return bad.mean()


which = os.environ.get("FAMS", "diffuse")
fams = which.split(",") if which else []
scene = build([f for f in fams if f != "diffuse"])
print("families:", which, "n_tris", scene.n_tris)
for depth in (2, 3, 6):
    run(scene, depth)
