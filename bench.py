"""Benchmark: path-trace throughput on the Cornell box (BASELINE north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured rays/s divided by the 1e9 rays/s/chip target
(BASELINE.md). Runs on whatever jax.devices() provides (TPU under the
driver; CPU works for smoke tests via JAX_PLATFORMS=cpu).

Ray accounting matches the reference's "Normal/Shadow rays traced" counters
(ref: src/librender/skdtree.cpp:46-47): one count per live intersection ray
plus one per attempted NEE shadow ray, measured exactly by the integrator's
on-device counter — not estimated.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from mitsuba_tpu.core import rng
from mitsuba_tpu.integrator.common import DIM_PIXEL
from mitsuba_tpu.integrator.path import PathTracer
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

BASELINE_RAYS_PER_S = 1e9

WIDTH = HEIGHT = 256
SPP_PER_PASS = 16         # wavefront = W*H*SPP_PER_PASS rays
N_TIMED_PASSES = 4
MAX_DEPTH = 8


def main():
    scene = compile_scene(cornell_box(), cluster_size=64)
    camera = cornell_camera(width=WIDTH, height=HEIGHT)
    # fused per-bounce megakernel (accel/megakernel.py); falls back to the
    # XLA wavefront integrator for scenes outside its feature subset
    try:
        from mitsuba_tpu.integrator.mega import MegaPathTracer
        integrator = MegaPathTracer.for_scene(scene, max_depth=MAX_DEPTH,
                                              block=4096)
    except AssertionError:
        integrator = PathTracer(max_depth=MAX_DEPTH,
                                cluster_size=64).specialized_for(scene)

    n_pix = WIDTH * HEIGHT
    n = n_pix * SPP_PER_PASS
    px = jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(n_pix)
    pix_x = (px % WIDTH).astype(jnp.float32)
    pix_y = (px // WIDTH).astype(jnp.float32)

    samp = jnp.arange(n, dtype=jnp.uint32) // jnp.uint32(n_pix)

    @jax.jit
    def one_pass(scene, seed):
        s = samp + seed * jnp.uint32(SPP_PER_PASS)
        jitter = rng.sample_2d(seed, px, DIM_PIXEL, s)
        pos = jnp.stack([pix_x + jitter[..., 0], pix_y + jitter[..., 1]],
                        axis=-1)
        o, d = camera.sample_ray(pos)
        radiance, n_rays = integrator.li_stats(scene, o, d, seed, px, s)
        return jnp.mean(radiance), n_rays

    # warmup / compile
    mean_r, n_rays = one_pass(scene, jnp.uint32(0))
    mean_r.block_until_ready()
    rays_per_pass = int(n_rays)

    t0 = time.perf_counter()
    outs = []
    for s in range(1, N_TIMED_PASSES + 1):
        m, _ = one_pass(scene, jnp.uint32(s))
        outs.append(m)   # no host sync inside the timed loop
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    rays_per_s = rays_per_pass * N_TIMED_PASSES / dt
    print(json.dumps({
        "metric": "cornell_pt8_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
