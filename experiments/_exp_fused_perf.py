"""A/B: fused shade kernel on the GGX+envmap+texture wavefront scene."""
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import rng
from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.core.transform import look_at
from mitsuba_tpu.integrator.common import DIM_PIXEL
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.scene.builder import EnvmapLight, SceneDesc, compile_scene
from mitsuba_tpu.sensor.sensor import PerspectiveCamera
from mitsuba_tpu.texture.texture import checkerboard

W = H = 256
SPP = int(os.environ.get("SPP", 16))

d = SceneDesc()
tex = d.add_texture(checkerboard(res=256))
m_floor = d.add_material(kind="diffuse", albedo_texture=tex)
m_ggx = d.add_material(kind="roughconductor", alpha=0.15)
m_diff = d.add_material(kind="diffuse", albedo=(0.5, 0.3, 0.2))
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, -1, 0])
            @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([8] * 3),
            material=m_floor)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([-1.2, 0, 0]),
            material=m_ggx)
d.add_shape(shapes.sphere(24, 48), to_world=tfm.translate([1.2, 0, 0]),
            material=m_diff)
env = np.maximum(np.random.default_rng(0).uniform(
    0.2, 1.5, (64, 128, 3)), 0).astype(np.float32)
d.envmap = EnvmapLight(image=env)
scene = compile_scene(d, cluster_size=64)
cam = PerspectiveCamera(width=W, height=H, fov_x=45.0,
                        to_world=look_at([0, 1, 6], [0, 0, 0], [0, 1, 0]))

n_pix = W * H
n = n_pix * SPP
px = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(n_pix)
pix_x = (px % W).astype(jnp.float32)
pix_y = (px // W).astype(jnp.float32)
samp = jnp.arange(n, dtype=jnp.uint32) // jnp.uint32(n_pix)


def bench(label, **over):
    integ = dataclasses.replace(
        PathTracer(max_depth=8, cluster_size=64).specialized_for(scene),
        **over)

    @jax.jit
    def one_pass(seed):
        s = samp + seed * jnp.uint32(SPP)
        jit2 = rng.sample_2d(seed, px, DIM_PIXEL, s)
        pos = jnp.stack([pix_x + jit2[..., 0], pix_y + jit2[..., 1]], -1)
        o, dd = cam.sample_ray(pos)
        radiance, n_rays = integ.li_stats(scene, o, dd, seed, px, s)
        return jnp.mean(radiance), n_rays

    t0 = time.perf_counter()
    m, n_rays = one_pass(jnp.uint32(0))
    m.block_until_ready()
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [one_pass(jnp.uint32(s))[0] for s in range(1, 5)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{label}: {int(n_rays) * 4 / dt / 1e6:.2f} M rays/s "
          f"(mean {float(m):.4f}, compile {tc:.0f}s)")


modes = os.environ.get("MODES", "off,on").split(",")
for mo in modes:
    bench(f"fused={mo}", fused_shade=mo)
