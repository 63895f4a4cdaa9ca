"""A/B: coherence sort of live lanes vs plain compaction, on the
GGX+envmap scene (71 clusters) and a denser displaced-heightfield scene.

PYTHONPATH=/root/repo:$PYTHONPATH python experiments/_exp_sort.py
"""
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
from mitsuba_tpu.scene.builder import (EnvmapLight, SceneDesc,
                                       compile_scene)
from mitsuba_tpu.sensor.sensor import PerspectiveCamera
from mitsuba_tpu.texture.texture import checkerboard

W = H = 256
SPP = int(os.environ.get("SPP", 16))


def bench(scene, camera, label, sort_mode, max_depth=8):
    integ = PathTracer(max_depth=max_depth, cluster_size=64,
                       sort_rays=sort_mode).specialized_for(scene)
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

    t0 = time.perf_counter()
    m, n_rays = one_pass(jnp.uint32(0))
    m.block_until_ready()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [one_pass(jnp.uint32(s))[0] for s in range(1, 5)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{label} sort={sort_mode}: "
          f"{int(n_rays) * 4 / dt / 1e6:.2f} M rays/s "
          f"(mean {float(m):.4f}, compile {t_compile:.0f}s)")


def scene_ggx():
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
    return compile_scene(d, cluster_size=64), PerspectiveCamera(
        width=W, height=H, fov_x=45.0,
        to_world=look_at([0, 1, 6], [0, 0, 0], [0, 1, 0]))


def scene_hf():
    d = SceneDesc()
    hmap = (np.sin(np.linspace(0, 6 * np.pi, 96))[:, None]
            * np.cos(np.linspace(0, 6 * np.pi, 96))[None, :]
            ).astype(np.float32) * 0.35
    m_diff = d.add_material(kind="diffuse", albedo=(0.6, 0.55, 0.5))
    m_ggx = d.add_material(kind="roughconductor", alpha=0.1)
    d.add_shape(shapes.heightfield(hmap),
                to_world=tfm.rotate([1, 0, 0], -90) @ tfm.scale([4] * 3),
                material=m_diff)
    d.add_shape(shapes.sphere(32, 64),
                to_world=tfm.translate([0, 1.0, 0]) @ tfm.scale([0.6] * 3),
                material=m_ggx)
    env = np.maximum(np.random.default_rng(0).uniform(
        0.2, 1.5, (64, 128, 3)), 0).astype(np.float32)
    d.envmap = EnvmapLight(image=env)
    return compile_scene(d, cluster_size=64), PerspectiveCamera(
        width=W, height=H, fov_x=50.0,
        to_world=look_at([0, 3, 6], [0, 0, 0], [0, 1, 0]))


which = os.environ.get("WHICH", "ggx")
sc, cam = scene_ggx() if which == "ggx" else scene_hf()
print(which, "n_tris:", sc.n_tris,
      "clusters:", sc.woop_clusters.shape[0])
for mode in os.environ.get("MODES", "off,on").split(","):
    bench(sc, cam, which, mode)
