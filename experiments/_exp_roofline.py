"""Roofline experiments for the persistent megakernel (scratch, not library).

E0: raw VPU FMA peak via a chain kernel.
E1: trace-only persistent loop (closest+shadow, no shading) rays/s.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 8192
TC = 40


def e0_vpu_peak(n_iter=2048, rows=TC):
    """FMA chain on [rows, B] f32: 2*rows*B flops per step, 4 indep chains."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        a = x * 1.000001 + 0.3
        b = x * 0.999999 + 0.1
        c = x * 1.000002 + 0.2
        d = x * 0.999998 + 0.4

        def body(i, carry):
            a, b, c, d = carry
            a = a * 1.0000001 + 1e-7
            b = b * 0.9999999 + 1e-7
            c = c * 1.0000002 + 1e-7
            d = d * 0.9999998 + 1e-7
            return a, b, c, d

        a, b, c, d = jax.lax.fori_loop(0, n_iter, body, (a, b, c, d))
        o_ref[:] = a + b + c + d

    x = jnp.ones((rows, B), jnp.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((rows, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, B), jnp.float32),
    )
    f = jax.jit(f)
    r = f(x)
    r.block_until_ready()
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        r = f(x)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    flops = 4 * 2 * rows * B * n_iter
    print(f"E0 VPU peak ({rows}x{B}): {flops / dt / 1e12:.2f} TFLOP/s "
          f"({dt*1e3:.2f} ms)")


def _trace(woop, tc, c_clusters, ox, oy, oz, dx, dy, dz, mint, maxt):
    t_best = jnp.full((1, ox.shape[-1]), 1e30)
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
        safe_dz = jnp.where(jnp.abs(dpz) < 1e-12, 1e-12, dpz)
        t = -opz / safe_dz
        u = opx + t * dpx
        v = opy + t * dpy
        inside = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        mask = ((inside >= 0.0) & (jnp.abs(dpz) >= 1e-12)
                & (t > mint) & (t < maxt))
        tm = jnp.where(mask, t, 1e30)
        t_c = jnp.min(tm, axis=0, keepdims=True)
        t_best = jnp.minimum(t_best, t_c)
    return t_best


def e1_trace_only(n_iter=1024, c_clusters=1):
    """Persistent-style loop: 2 traces per iteration, trivial state update."""
    woop = jnp.asarray(np.random.randn(c_clusters, 3 * TC, 4), jnp.float32)

    def kernel(woop_ref, st_ref, o_ref):
        woop = woop_ref[:]
        st = st_ref[:]

        def body(i, st):
            ox, oy, oz = st[0:1], st[1:2], st[2:3]
            dx, dy, dz = st[3:4], st[4:5], st[5:6]
            mint = jnp.zeros_like(ox) + 1e-4
            maxt = jnp.full_like(ox, 1e30)
            t1 = _trace(woop, TC, c_clusters, ox, oy, oz, dx, dy, dz,
                        mint, maxt)
            t2 = _trace(woop, TC, c_clusters, ox + 0.1, oy, oz,
                        -dx, -dy, -dz, mint, maxt * 0.5)
            st = jnp.concatenate(
                [ox + 0.001 * t1, oy, oz + 0.001 * t2, dx, dy, dz], axis=0)
            return st

        st = jax.lax.fori_loop(0, n_iter, body, st)
        o_ref[:] = st

    st = jnp.asarray(np.random.randn(6, B), jnp.float32)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(woop.shape, lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((6, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((6, B), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, B), jnp.float32),
    ))
    r = f(woop, st)
    r.block_until_ready()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        r = f(woop, st)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    rays = 2 * B * n_iter
    print(f"E1 trace-only (c={c_clusters}): {rays / dt / 1e6:.1f} M rays/s "
          f"({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    e0_vpu_peak()
    e1_trace_only()
