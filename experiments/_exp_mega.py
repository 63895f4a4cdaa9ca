"""Megakernel trace-variant experiments (scratch, not library).

Monkeypatches megakernel._trace_inline with optimization candidates and
re-times the persistent bench.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import mitsuba_tpu.accel.megakernel as mk
from mitsuba_tpu.integrator.mega import MegaPathTracer, render_persistent
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

WIDTH = HEIGHT = 256
SPP = 128
MAX_DEPTH = 8
_MISS = 1e30
_DZ_EPS = 1e-12

_orig = mk._trace_inline


def trace_v2(woop, tc, c_clusters, ox, oy, oz, dx, dy, dz, mint, maxt,
             attr_ref=None):
    """Micro-opt: no safe_dz clamp (masked-out lanes can hold garbage),
    single fused inside test."""
    b = ox.shape[-1]
    t_best = jnp.full((1, b), _MISS)
    attr_best = jnp.zeros((32, b)) if attr_ref is not None else None

    for c in range(c_clusters):
        w = woop[c]

        def comp(k):
            w0 = w[k * tc:(k + 1) * tc, 0:1]
            w1 = w[k * tc:(k + 1) * tc, 1:2]
            w2 = w[k * tc:(k + 1) * tc, 2:3]
            tr = w[k * tc:(k + 1) * tc, 3:4]
            return (w0 * ox + w1 * oy + w2 * oz + tr,
                    w0 * dx + w1 * dy + w2 * dz)

        opx, dpx = comp(0)
        opy, dpy = comp(1)
        opz, dpz = comp(2)
        t = -opz / dpz          # inf/NaN where dpz==0 -> fails range cmp
        u = opx + t * dpx
        v = opy + t * dpy
        inside = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        mask = ((inside >= 0.0) & (jnp.abs(dpz) >= _DZ_EPS)
                & (t > mint) & (t < maxt))
        tm = jnp.where(mask, t, _MISS)
        t_c = jnp.min(tm, axis=0, keepdims=True)
        closer = t_c < t_best
        t_best = jnp.where(closer, t_c, t_best)
        if attr_ref is not None:
            rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            hit_rows = jnp.where(tm == t_c, rows, tc)
            row_best = jnp.min(hit_rows, axis=0, keepdims=True)
            sel = ((rows == row_best) & mask).astype(jnp.float32)
            a_c = attr_ref[c * tc:(c + 1) * tc, :]
            attr_c = jax.lax.dot_general(
                a_c, sel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            attr_best = jnp.where(closer, attr_c, attr_best)
    return t_best, attr_best


def _mxu_transform(w, tc, ox, oy, oz, dx, dy, dz, precision):
    """One [3tc, 8] @ [8, B] matmul computes op (rows for o,1) and dp
    (rows for d,0): cols 0..3 hit [o;1], cols 4..7 hit [d;0]."""
    rays8 = jnp.concatenate([
        ox, oy, oz, jnp.ones_like(ox), dx, dy, dz, jnp.zeros_like(ox)],
        axis=0)                                            # [8, B]
    w8 = jnp.concatenate([w[:, 0:4], w[:, 0:3],
                          jnp.zeros_like(w[:, 0:1])], axis=1)  # [3tc, 8]
    # op+dp in one pass is wrong (they'd sum); two matmuls on the halves
    op = jax.lax.dot_general(
        w[:, 0:4], rays8[0:4], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    dp = jax.lax.dot_general(
        w[:, 0:3], rays8[4:7], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    return op, dp


def make_trace_v3(precision):
    def trace_v3(woop, tc, c_clusters, ox, oy, oz, dx, dy, dz, mint, maxt,
                 attr_ref=None):
        b = ox.shape[-1]
        t_best = jnp.full((1, b), _MISS)
        attr_best = jnp.zeros((32, b)) if attr_ref is not None else None

        for c in range(c_clusters):
            w = woop[c]
            op, dp = _mxu_transform(w, tc, ox, oy, oz, dx, dy, dz,
                                    precision)
            opx, opy, opz = op[0:tc], op[tc:2 * tc], op[2 * tc:3 * tc]
            dpx, dpy, dpz = dp[0:tc], dp[tc:2 * tc], dp[2 * tc:3 * tc]
            t = -opz / dpz
            u = opx + t * dpx
            v = opy + t * dpy
            inside = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
            mask = ((inside >= 0.0) & (jnp.abs(dpz) >= _DZ_EPS)
                    & (t > mint) & (t < maxt))
            tm = jnp.where(mask, t, _MISS)
            t_c = jnp.min(tm, axis=0, keepdims=True)
            closer = t_c < t_best
            t_best = jnp.where(closer, t_c, t_best)
            if attr_ref is not None:
                rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
                hit_rows = jnp.where(tm == t_c, rows, tc)
                row_best = jnp.min(hit_rows, axis=0, keepdims=True)
                sel = ((rows == row_best) & mask).astype(jnp.float32)
                a_c = attr_ref[c * tc:(c + 1) * tc, :]
                attr_c = jax.lax.dot_general(
                    a_c, sel, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                attr_best = jnp.where(closer, attr_c, attr_best)
        return t_best, attr_best
    return trace_v3


def bench(label, block=8192):
    scene = compile_scene(cornell_box(), cluster_size=64)
    camera = cornell_camera(width=WIDTH, height=HEIGHT)
    integ = MegaPathTracer.for_scene(scene, max_depth=MAX_DEPTH,
                                     block=block)
    img, n_rays = render_persistent(integ, camera, spp=SPP, seed=0)
    jax.block_until_ready(img)
    rays = int(n_rays)
    t0 = time.perf_counter()
    outs = []
    for s in range(1, 3):
        img, _ = render_persistent(integ, camera, spp=SPP, seed=s)
        outs.append(img)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{label}: {rays * 2 / dt / 1e6:.1f} M rays/s "
          f"(mean {float(img.mean()):.4f})", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("v1", "all"):
        bench("v1 baseline")
    if which in ("v2", "all"):
        mk._trace_inline = trace_v2
        bench("v2 micro-opt")
    if which in ("v3h", "all"):
        mk._trace_inline = make_trace_v3(jax.lax.Precision.HIGHEST)
        bench("v3 mxu HIGHEST")
    if which in ("v3", "all"):
        mk._trace_inline = make_trace_v3(jax.lax.Precision.HIGH)
        bench("v3 mxu HIGH")
    mk._trace_inline = _orig
