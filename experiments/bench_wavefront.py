"""Wavefront (XLA, non-megakernel) throughput on BASELINE config-3-class
scenes: rough GGX + envmap + mip-mapped textures."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import rng
from mitsuba_tpu.integrator.common import DIM_PIXEL
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera
from mitsuba_tpu.scene import shapes
from mitsuba_tpu.core import transform as tfm
from mitsuba_tpu.texture.texture import checkerboard

W = H = 256
import os  # noqa
SPP = int(os.environ.get('SPP', 16))


def bench(scene, camera, label, max_depth=8):
    integ = PathTracer(max_depth=max_depth,
                       cluster_size=64).specialized_for(scene)
    n_pix = W * H
    n = n_pix * SPP
    px = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(n_pix)
    pix_x = (px % W).astype(jnp.float32)
    pix_y = (px // W).astype(jnp.float32)
    samp = jnp.arange(n, dtype=jnp.uint32) // jnp.uint32(n_pix)

    @jax.jit
    def one_pass(seed):
        s = samp + seed * jnp.uint32(SPP)
        jit2 = rng.sample_2d(seed, px, DIM_PIXEL, s)
        pos = jnp.stack([pix_x + jit2[..., 0], pix_y + jit2[..., 1]], -1)
        o, d = camera.sample_ray(pos)
        radiance, n_rays = integ.li_stats(scene, o, d, seed, px, s)
        return jnp.mean(radiance), n_rays

    m, n_rays = one_pass(jnp.uint32(0))
    m.block_until_ready()
    t0 = time.perf_counter()
    outs = [one_pass(jnp.uint32(s))[0] for s in range(1, 5)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{label}: {int(n_rays) * 4 / dt / 1e6:.1f} M rays/s "
          f"(mean {float(m):.4f})")


# config 2-class: Cornell, wavefront
scene = compile_scene(cornell_box(), cluster_size=64)
bench(scene, cornell_camera(width=W, height=H), "cornell wavefront")

# config 3-class: GGX spheres + checkerboard floor + envmap
d = SceneDesc()
tex = d.add_texture(checkerboard(res=256))
if os.environ.get("NO_TEX"):
    m_floor = d.add_material(kind="diffuse")
else:
    m_floor = d.add_material(kind="diffuse", albedo_texture=tex)
m_ggx = d.add_material(kind="roughconductor", alpha=0.15)
m_diff = d.add_material(kind="diffuse", albedo=(0.5, 0.3, 0.2))
d.add_shape(shapes.rectangle(),
            to_world=tfm.translate([0, -1, 0])
            @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([8] * 3),
            material=m_floor)
d.add_shape(shapes.sphere(int(os.environ.get('SUB','24')), 2*int(os.environ.get('SUB','24'))), to_world=tfm.translate([-1.2, 0, 0]),
            material=m_ggx)
d.add_shape(shapes.sphere(int(os.environ.get('SUB','24')), 2*int(os.environ.get('SUB','24'))), to_world=tfm.translate([1.2, 0, 0]),
            material=m_diff)
import os
env = np.maximum(np.random.default_rng(0).uniform(
    0.2, 1.5, (64, 128, 3)), 0).astype(np.float32)
from mitsuba_tpu.scene.builder import EnvmapLight, ConstantLight
if os.environ.get("NO_ENV"):
    d.constant_light = ConstantLight(radiance=(0.8, 0.8, 0.8))
else:
    d.envmap = EnvmapLight(image=env)
scene3 = compile_scene(d, cluster_size=64)
from mitsuba_tpu.sensor.sensor import PerspectiveCamera
from mitsuba_tpu.core.transform import look_at
cam3 = PerspectiveCamera(width=W, height=H, fov_x=45.0,
                         to_world=look_at([0, 1, 6], [0, 0, 0],
                                          [0, 1, 0]))
bench(scene3, cam3, "ggx+envmap+texture wavefront")
