"""Ablation timing of the persistent megakernel bounce (scratch).

Runs _bounce_math in a fixed-count fori_loop kernel and times variants
with pieces stubbed out, to get a per-component time breakdown.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import mitsuba_tpu.accel.megakernel as mk
from mitsuba_tpu.integrator.mega import MegaPathTracer
from mitsuba_tpu.scene.builder import compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera

B = 8192
N_ITER = 512

_orig_trace = mk._trace_inline


def _fixed_attr(ox):
    """[32, B] fixed hit attrs: normal +y (row 1), em_id=-1 (row 19)."""
    b = ox.shape[-1]
    z = jnp.zeros((1, b)) + 0.0 * ox[0:1]
    one = z + 1.0
    rows = [z] * 32
    rows[1] = one
    rows[19] = z - 1.0
    return jnp.concatenate(rows, axis=0)


def make_stub_trace(skip_closest=False, skip_shadow=False,
                    skip_attr=False, transform_only=False):
    def trace(woop, tc, c_clusters, ox, oy, oz, dx, dy, dz, mint, maxt,
              attr_ref=None):
        is_closest = attr_ref is not None
        if (is_closest and skip_closest) or \
           (not is_closest and skip_shadow):
            t = jnp.full((1, ox.shape[-1]), 1.0) + 0.0 * ox[0:1]
            attr = _fixed_attr(ox) if is_closest else None
            return t, attr
        if transform_only and is_closest:
            # transform + t only, skip test/select; fixed attrs
            b = ox.shape[-1]
            acc = jnp.zeros((1, b))
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
                acc = acc + jnp.min(opx + opy + opz + dpx + dpy + dpz,
                                    axis=0, keepdims=True)
            return 1.0 + 0.0 * acc, _fixed_attr(ox)
        if skip_attr and is_closest:
            t, _ = _orig_trace(woop, tc, c_clusters, ox, oy, oz,
                               dx, dy, dz, mint, maxt, None)
            return t, _fixed_attr(ox)
        return _orig_trace(woop, tc, c_clusters, ox, oy, oz, dx, dy, dz,
                           mint, maxt, attr_ref)
    return trace


_SHADE_STUB = [False]
_real_bounce = mk._bounce_math


def _bounce_noshade(tc, c_clusters, families, rr_depth, max_depth, m_pad,
                    et_pad, woop, attr_tab, mat, em, consts, pixel, samp,
                    seed, bounce, st):
    """Trace-only bounce: closest + shadow trace, minimal state update."""
    ox, oy, oz = st[0:1], st[1:2], st[2:3]
    dx, dy, dz = st[3:4], st[4:5], st[5:6]
    mint = 1e-4 * (1.0 + jnp.abs(ox))
    maxt = jnp.full_like(mint, 1e30)
    t_best, attr = mk._trace_inline(woop, tc, c_clusters, ox, oy, oz,
                                    dx, dy, dz, mint, maxt, attr_tab)
    t_sh, _ = mk._trace_inline(woop, tc, c_clusters, ox + 0.01, oy, oz,
                               dy, dz, dx, mint, maxt * 0.5, None)
    t_safe = jnp.where(t_best < 1e30, t_best, 1.0)
    new_st = jnp.concatenate([
        ox + 0.001 * t_safe * dx, oy + 0.001 * t_safe * dy,
        oz + 0.001 * t_safe * dz,
        dx, dy, dz,
        st[6:9] * 0.999,
        st[9:12] + 0.0001 * attr[0:3],
        st[12:13],
        st[13:14], st[14:15], st[15:16]], axis=0)
    ones = jnp.ones_like(t_best)
    return new_st, ones, ones


def run_fixed(tables, families, label):
    """Time N_ITER bounces with NO early exit / regen — pure bounce cost."""
    c_clusters = tables.woop.shape[0]
    m_pad = tables.mat.shape[1]
    et_pad = tables.em_rows.shape[0]
    tc = tables.tc
    consts_v = (20.0, 20.0, 20.0, 0.0, 0.0, 0.0, 0.0, 0.13, 1.0)
    bounce_fn = _bounce_noshade if _SHADE_STUB[0] else mk._bounce_math

    def kernel(woop_ref, attr_ref, mat_ref, em_ref, pix_ref, samp_ref,
               st_in_ref, st_out_ref):
        woop = woop_ref[:]
        attr_tab = attr_ref[:]
        mat = mat_ref[:]
        em = em_ref[:]
        pixel = pix_ref[:]
        samp = samp_ref[:]

        def body(i, st):
            new16, _, _ = bounce_fn(
                tc, c_clusters, (0, 2), 99, 0, m_pad, et_pad, woop,
                attr_tab, mat, em, consts_v, pixel, samp,
                jnp.int32(1), i, st)
            # keep lanes alive forever: force active, reset throughput
            st2 = jnp.concatenate([
                new16[0:6],
                jnp.maximum(new16[6:9], 0.25),
                new16[9:12] * 0.0,
                jnp.ones((1, new16.shape[1])),
                new16[13:16]], axis=0)
            return st2

        st = jax.lax.fori_loop(0, N_ITER, body, st_in_ref[:])
        st_out_ref[:] = st

    full = lambda shape: pl.BlockSpec(shape, lambda: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    st0 = np.zeros((16, B), np.float32)
    st0[1] = 1.0    # o
    st0[3:6] = np.random.default_rng(0).normal(size=(3, B))
    st0[3:6] /= np.linalg.norm(st0[3:6], axis=0, keepdims=True)
    st0[6:9] = 1.0
    st0[12] = 1.0
    st0[13] = 1.0
    st0[15] = 1.0
    pix = np.arange(B, dtype=np.int32)[None]
    samp = np.zeros((1, B), np.int32)

    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[full(tables.woop.shape), full(tables.attr.shape),
                  full(tables.mat.shape), full(tables.em_rows.shape),
                  full((1, B)), full((1, B)), full((16, B))],
        out_specs=full((16, B)),
        out_shape=jax.ShapeDtypeStruct((16, B), jnp.float32),
    ))
    args = (tables.woop, tables.attr, tables.mat, tables.em_rows,
            jnp.asarray(pix), jnp.asarray(samp), jnp.asarray(st0))
    r = f(*args)
    r.block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    per_iter = dt / N_ITER
    print(f"{label}: {per_iter*1e6:.2f} us/iter "
          f"({2 * B / per_iter / 1e6:.0f} M rays/s equiv)", flush=True)
    return per_iter


if __name__ == "__main__":
    scene = compile_scene(cornell_box(), cluster_size=64)
    integ = MegaPathTracer.for_scene(scene, max_depth=8)
    tables = integ.tables
    fams = integ.families

    run_fixed(tables, fams, "full bounce")
    mk._trace_inline = make_stub_trace(skip_shadow=True)
    run_fixed(tables, fams, "no shadow trace")
    mk._trace_inline = make_stub_trace(skip_closest=True)
    run_fixed(tables, fams, "no closest trace")
    mk._trace_inline = make_stub_trace(skip_closest=True, skip_shadow=True)
    run_fixed(tables, fams, "no traces (shading only)")
    mk._trace_inline = make_stub_trace(skip_attr=True)
    run_fixed(tables, fams, "no attr select")
    mk._trace_inline = make_stub_trace(transform_only=True)
    run_fixed(tables, fams, "closest=transform only")
    mk._trace_inline = _orig_trace
    _SHADE_STUB[0] = True
    run_fixed(tables, fams, "traces only (no shading)")
