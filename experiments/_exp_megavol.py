"""TPU parity probe: MegaVolPathTracer vs VolPathTracer on Cornell+medium."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.integrator.mega import MegaVolPathTracer
from mitsuba_tpu.integrator.volpath import VolPathTracer
from mitsuba_tpu.scene.builder import Medium, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

desc = cornell_box()
desc.medium = Medium(sigma_t=(0.4, 0.55, 0.7), albedo=(0.8, 0.7, 0.6),
                     g=0.3, bound=1e30)
scene = compile_scene(desc, cluster_size=64)
cam = cornell_camera(64, 64)
n = 64 * 64
px = jnp.arange(n, dtype=jnp.uint32)
pos = jnp.stack([(px % 64).astype(jnp.float32) + 0.5,
                 (px // 64).astype(jnp.float32) + 0.5], -1)
o, d = cam.sample_ray(pos)
ref = VolPathTracer(max_depth=8, cluster_size=64).specialized_for(scene)
mega = MegaVolPathTracer.for_scene(scene, max_depth=8)
print("medium:", mega.medium)
L_ref = np.asarray(jax.jit(
    lambda: ref.li(scene, o, d, jnp.uint32(3), px, 0))())
L_m = np.asarray(jax.jit(
    lambda: mega.li(scene, o, d, jnp.uint32(3), px, 0))())
rel = np.abs(L_ref - L_m) / np.maximum(L_ref, 1e-3)
print("mean ref", L_ref.mean(), "mean mega", L_m.mean())
print("frac rel>1e-2:", (rel > 1e-2).mean())
print("mean rel diff:", abs(L_ref.mean() - L_m.mean()) / L_ref.mean())
