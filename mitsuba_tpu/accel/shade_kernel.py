"""Fused wavefront SHADE kernel: everything between the closest-hit trace
and the next trace in ONE Pallas program.

The wavefront path tracer (integrator/path.py) interleaves XLA stages with
the two fused trace kernels each bounce. The gather-y stages (hit-attribute
fetch, texture lookups, envmap NEE sampling/eval) are genuinely good XLA
fits — TPU standalone gathers are fast — but the elementwise tail (shading
frame transforms, BSDF eval toward the light, MIS, BSDF sampling, Russian
roulette) plus the shadow trace is a chain of small HBM-bound fusions. This
kernel fuses that tail:

    inputs  (XLA): hit record + resolved per-lane material row + NEE sample
    kernel: wi→local frame, two-sided flip, BSDF eval/pdf toward the light,
            SHADOW TRACE (in-VMEM cluster loop), MIS, NEE contribution,
            BSDF sampling (counter RNG in-kernel), RR, next-ray state
    outputs (XLA): 16 state rows, same as the XLA stages it replaces

Layout: every logical per-lane variable is an [8, B] block (full (8,128)
tile utilization — the megakernel's S-layout finding); the XLA wrapper
packs [K, N] rows into [K*8, N/8] so no in-kernel relayout is needed.
The shadow trace runs per 8-sublane row against the VMEM-resident Woop
cluster table with the same AABB gate as accel/pallas_trace.py.

Supported (static) material families: diffuse / conductor / rough-conductor
GGX / smooth dielectric (+ the twosided adapter flag). Scenes with other
families or non-independent samplers keep the XLA shading stages.

Ref parity: implements path.cpp:169-289 (NEE + MIS + RR) exactly as
integrator/path.py — same RNG streams, same formulas; tests assert
agreement with the XLA stages on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (MEGA_FAMILIES, _bsdf_eval_pdf, _bsdf_sample, _mis,
                         _rng2, _trace_inline)

# logical input rows ([K_IN, N] packed by the wrapper)
_I_P = 0          # hit position (3)
_I_NG = 3         # geometric normal (3)
_I_S = 6          # frame s (3)
_I_T = 9          # frame t (3)
_I_N = 12         # frame n = (possibly perturbed) shading normal (3)
_I_D = 15         # incident ray direction (3)
_I_TP = 18        # throughput (3)
_I_L = 21         # radiance incl. env + emitter-hit terms (3)
_I_MAT = 24       # material params cols 0..12 (13 rows; 24+12 = type)
_I_TWO = 37       # two-sided flag (mat col 15)
_I_ND = 38        # NEE direction (3)
_I_NDIST = 41     # NEE distance
_I_NPDF = 42      # NEE solid-angle pdf
_I_NVAL = 43      # NEE value = Le/pdf (3)
_I_NDELTA = 46    # NEE delta-emitter flag
_I_HIT = 47       # active & valid hit
_I_ACT = 48       # lane active
_I_ETA = 49       # eta_scale carry
K_IN = 50

K_OUT = 16        # o(3) d(3) tp(3) L(3) alive prev_pdf prev_delta eta

# RNG dims (mirror integrator/common.py)
_SENSOR_DIMS = 4
_DIMS_PER_BOUNCE = 8
_DIM_BSDF_U2, _DIM_BSDF_U1, _DIM_RR = 2, 3, 4

_SHADOW_EPS = 1e-3      # core/math.py SHADOW_EPSILON


def make_shade_kernel(tc: int, c_clusters: int, families: tuple,
                      rr_depth: int, max_depth: int):
    def kernel(live_ref, woop_ref, aabb_ref, in_ref, pix_ref, samp_ref,
               meta_ref, out_ref):
        v = lambda k: in_ref[8 * k:8 * (k + 1), :]          # [8, B]
        seed = meta_ref[0]
        bounce = meta_ref[2]
        dim_base = _SENSOR_DIMS + bounce * _DIMS_PER_BOUNCE
        b = in_ref.shape[1]

        # all-dead blocks: PASS THROUGH the carry (L keeps the finished
        # path's radiance; d/o/eta ride along; throughput 0, alive 0) —
        # matching what the XLA tail produces for inactive lanes
        zero = jnp.zeros((8, b), jnp.float32)
        one = zero + 1.0
        out_ref[:] = jnp.concatenate([
            v(_I_P + 0), v(_I_P + 1), v(_I_P + 2),
            v(_I_D + 0), v(_I_D + 1), v(_I_D + 2),
            zero, zero, zero,
            v(_I_L + 0), v(_I_L + 1), v(_I_L + 2),
            zero, one, one, v(_I_ETA),
        ], axis=0)

        @pl.when(live_ref[pl.program_id(0)] != 0)
        def _():
            px_, py_, pz_ = v(_I_P + 0), v(_I_P + 1), v(_I_P + 2)
            ngx, ngy, ngz = v(_I_NG + 0), v(_I_NG + 1), v(_I_NG + 2)
            sx, sy, sz = v(_I_S + 0), v(_I_S + 1), v(_I_S + 2)
            tx_, ty_, tz_ = v(_I_T + 0), v(_I_T + 1), v(_I_T + 2)
            nx, ny, nz = v(_I_N + 0), v(_I_N + 1), v(_I_N + 2)
            dx, dy, dz = v(_I_D + 0), v(_I_D + 1), v(_I_D + 2)
            tpr, tpg, tpb = v(_I_TP + 0), v(_I_TP + 1), v(_I_TP + 2)
            lr, lg, lb = v(_I_L + 0), v(_I_L + 1), v(_I_L + 2)
            ldx, ldy, ldz = v(_I_ND + 0), v(_I_ND + 1), v(_I_ND + 2)
            ldist = v(_I_NDIST)
            pdf_nee = v(_I_NPDF)
            nvr, nvg, nvb = v(_I_NVAL + 0), v(_I_NVAL + 1), v(_I_NVAL + 2)
            nee_delta = v(_I_NDELTA) > 0.5
            hit = v(_I_HIT) > 0.5
            eta_scale = v(_I_ETA)
            two = v(_I_TWO) > 0.5
            pixel = pix_ref[:]
            samp = samp_ref[:]

            mat_param = lambda j: v(_I_MAT + j)
            mtype = mat_param(12)

            # wi in the shading frame; twosided flip mirrors back-side
            # incidence into z>0 (bsdf.py _twosided_wi)
            wix = -(dx * sx + dy * sy + dz * sz)
            wiy = -(dx * tx_ + dy * ty_ + dz * tz_)
            wiz_r = -(dx * nx + dy * ny + dz * nz)
            flip = two & (wiz_r < 0.0)
            fsign = jnp.where(flip, -1.0, 1.0)
            wiz = wiz_r * fsign

            # ---- NEE: BSDF eval toward the light + forward pdf --------
            wol_x = ldx * sx + ldy * sy + ldz * sz
            wol_y = ldx * tx_ + ldy * ty_ + ldz * tz_
            wol_z = (ldx * nx + ldy * ny + ldz * nz) * fsign
            f_r, f_g, f_b, pdf_fwd = _bsdf_eval_pdf(
                families, mat_param, mtype, wix, wiy, wiz,
                wol_x, wol_y, wol_z)

            depth_f = bounce.astype(jnp.float32) + 2.0
            if max_depth > 0:
                nee_depth_ok = depth_f + 1.0 <= float(max_depth) + 1.0
            else:
                nee_depth_ok = depth_f == depth_f        # all-true
            contrib0 = (hit & nee_depth_ok & (pdf_nee > 0.0)
                        & ((f_r > 0.0) | (f_g > 0.0) | (f_b > 0.0)))

            # ---- shadow trace (skipped when no lane contributes) ------
            # sign with sign(0)=0, mirroring the XLA offset_ray_origin
            sgn = lambda x: jnp.where(x > 0.0, 1.0,
                                      jnp.where(x < 0.0, -1.0, 0.0))
            side = sgn(ldx * ngx + ldy * ngy + ldz * ngz)
            eps_o = 1e-4 * (1.0 + jnp.maximum(jnp.maximum(jnp.abs(px_),
                                                          jnp.abs(py_)),
                                              jnp.abs(pz_)))
            sox = px_ + side * eps_o * ngx
            soy = py_ + side * eps_o * ngy
            soz = pz_ + side * eps_o * ngz
            smint = 1e-4 * (1.0 + jnp.maximum(jnp.maximum(jnp.abs(sox),
                                                          jnp.abs(soy)),
                                              jnp.abs(soz)))
            smaxt = ldist * (1.0 - _SHADOW_EPS)
            any_contrib = jnp.sum(contrib0.astype(jnp.float32)) > 0.0

            def shadow():
                rows = []
                for s in range(8):
                    t_sh, _ = _trace_inline(
                        woop_ref, tc, c_clusters,
                        sox[s:s + 1], soy[s:s + 1], soz[s:s + 1],
                        ldx[s:s + 1], ldy[s:s + 1], ldz[s:s + 1],
                        smint[s:s + 1], smaxt[s:s + 1], None,
                        aabb_ref=aabb_ref)
                    rows.append(t_sh)
                # f32 payload: Mosaic's scf.if lowering rejects i1 vectors
                return jnp.where(jnp.concatenate(rows, axis=0) < 1e30,
                                 1.0, 0.0)

            occluded = jax.lax.cond(
                any_contrib, shadow,
                lambda: jnp.zeros((8, b), jnp.float32)) > 0.5

            w_nee = jnp.where(nee_delta, 1.0, _mis(pdf_nee, pdf_fwd))
            cgate = (contrib0 & ~occluded).astype(jnp.float32) * w_nee
            lr = lr + tpr * nvr * f_r * cgate
            lg = lg + tpg * nvg * f_g * cgate
            lb = lb + tpb * nvb * f_b * cgate

            # ---- BSDF sample → next ray -------------------------------
            ub0, ub1 = _rng2(seed, pixel, dim_base + _DIM_BSDF_U2, samp)
            uc0, _ = _rng2(seed, pixel, dim_base + _DIM_BSDF_U1, samp)
            (nwx, nwy, nwz, w_r, w_g, w_b, pdf_b, is_delta, eta_ev) = \
                _bsdf_sample(families, mat_param, mtype, wix, wiy, wiz,
                             ub0, ub1, uc0)
            nwz = nwz * fsign                # un-flip (twosided adapter)
            ndx = nwx * sx + nwy * tx_ + nwz * nx
            ndy = nwx * sy + nwy * ty_ + nwz * ny
            ndz = nwx * sz + nwy * tz_ + nwz * nz

            tp_r = tpr * w_r
            tp_g = tpg * w_g
            tp_b = tpb * w_b
            alive = hit & (pdf_b > 0.0) \
                & ((tp_r > 0.0) | (tp_g > 0.0) | (tp_b > 0.0))
            if max_depth > 0:
                alive = alive & (depth_f <= float(max_depth))

            # ---- Russian roulette (path.cpp:278-289) ------------------
            eta_next = eta_scale * eta_ev
            tp_max = jnp.maximum(jnp.maximum(tp_r, tp_g), tp_b)
            q = jnp.minimum(tp_max * eta_next * eta_next, 0.95)
            u_rr, _ = _rng2(seed, pixel, dim_base + _DIM_RR, samp)
            do_rr = depth_f >= float(rr_depth)
            rr_cont = jnp.logical_or(~do_rr, u_rr < q)
            rs = jnp.where(do_rr & rr_cont,
                           1.0 / jnp.maximum(q, 1e-6), 1.0)
            alive = alive & rr_cont
            af = alive.astype(jnp.float32)

            side_n = sgn(ndx * ngx + ndy * ngy + ndz * ngz)
            out = (
                px_ + side_n * eps_o * ngx,
                py_ + side_n * eps_o * ngy,
                pz_ + side_n * eps_o * ngz,
                jnp.where(alive, ndx, dx), jnp.where(alive, ndy, dy),
                jnp.where(alive, ndz, dz),
                tp_r * rs * af, tp_g * rs * af, tp_b * rs * af,
                lr, lg, lb,
                af,
                jnp.where(is_delta, 1.0, pdf_b),
                is_delta.astype(jnp.float32),
                eta_next,
            )
            out_ref[:] = jnp.concatenate(out, axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tc", "families", "rr_depth",
                                    "max_depth", "block"))
def _run_shade(woop_clusters, cluster_aabb, packed, pixel, samp, live,
               meta_u32, tc, families, rr_depth, max_depth, block):
    """packed: [K_IN*8, Np8]; pixel/samp [8, Np8] int32; live [r_blocks]
    int32. Returns [K_OUT*8, Np8]."""
    np8 = packed.shape[1]
    r_blocks = np8 // block
    c_clusters = woop_clusters.shape[0]
    kernel = make_shade_kernel(tc, c_clusters, families, rr_depth,
                               max_depth)
    col = lambda rows: pl.BlockSpec((rows, block), lambda r: (0, r),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(r_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # live flags
            pl.BlockSpec(woop_clusters.shape, lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # cluster aabbs
            col(K_IN * 8),
            col(8), col(8),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # meta
        ],
        out_specs=col(K_OUT * 8),
        out_shape=jax.ShapeDtypeStruct((K_OUT * 8, np8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(live, woop_clusters, cluster_aabb, packed, pixel, samp, meta_u32)


def supports(scene, families, sampler: str) -> bool:
    """Static gate: can this scene/config use the fused shade kernel?"""
    if sampler != "independent" or families is None:
        return False
    if scene.woop_clusters is None:
        return False
    return set(families) <= MEGA_FAMILIES


def fused_shade(scene, its, frame, mat, d, throughput, L, ds, active,
                eta_scale, seed, pixel_id, sample_idx, bounce, families,
                rr_depth: int, max_depth: int):
    """XLA wrapper: pack per-lane rows, run the kernel, unpack.

    Returns (o_next, d_next, tp_next, L, alive, prev_pdf, prev_delta,
    eta_scale_next) with the semantics of the XLA stages it replaces
    (integrator/path.py step, NEE eval → RR)."""
    n = d.shape[0]
    hit = active & its.valid
    s_v, t_v, n_v = frame

    rows = [
        its.p, its.ng, s_v, t_v, n_v, d, throughput, L,                # 24
        mat.params[:, 0:13],                                           # 13
        mat.params[:, 15:16],                                          # 1
        ds.d, ds.dist[:, None], ds.pdf[:, None], ds.value,             # 8
        ds.is_delta.astype(jnp.float32)[:, None],
        hit.astype(jnp.float32)[:, None],
        active.astype(jnp.float32)[:, None],
        eta_scale[:, None],
    ]
    packed = jnp.concatenate(rows, axis=1)                 # [N, K_IN]
    assert packed.shape[1] == K_IN, packed.shape

    block = 1024
    lane_group = 8 * block
    n_pad = (-n) % lane_group
    if n_pad:
        packed = jnp.pad(packed, ((0, n_pad), (0, 0)))
    npad = n + n_pad
    # [N, K] → [K, N] → [K, 8, N/8] → [K*8, N/8]
    pk = packed.T.reshape(K_IN, 8, npad // 8).reshape(K_IN * 8,
                                                      npad // 8)
    as_i32 = lambda x: jnp.pad(
        x.astype(jnp.int32), (0, n_pad)).reshape(8, npad // 8)
    pix = as_i32(pixel_id)
    smp = as_i32(sample_idx)
    # per-block liveness over the 8*block lane groups
    act_pad = jnp.pad(active.astype(jnp.int32), (0, n_pad))
    live = jnp.max(act_pad.reshape(8, npad // 8)
                   .reshape(8, npad // 8 // block, block), axis=(0, 2))
    meta = jnp.stack([jnp.asarray(seed, jnp.int32).astype(jnp.int32),
                      jnp.int32(0),
                      jnp.asarray(bounce, jnp.int32),
                      jnp.int32(0)])
    tc = scene.woop_clusters.shape[1] // 3
    out = _run_shade(scene.woop_clusters,
                     getattr(scene, "cluster_aabb", None)
                     if getattr(scene, "cluster_aabb", None) is not None
                     else jnp.tile(jnp.asarray(
                         [-1e30] * 3 + [1e30] * 3 + [0.0, 0.0],
                         jnp.float32), (scene.woop_clusters.shape[0], 1)),
                     pk, pix, smp, live, meta, tc, tuple(families),
                     rr_depth, max_depth, block)
    # [K_OUT*8, N/8] → [K_OUT, N]
    res = out.reshape(K_OUT, 8, npad // 8).reshape(K_OUT, npad)[:, :n].T
    o_next = res[:, 0:3]
    d_next = res[:, 3:6]
    tp_next = res[:, 6:9]
    L_out = res[:, 9:12]
    alive = res[:, 12] > 0.5
    prev_pdf = res[:, 13]
    prev_delta = res[:, 14] > 0.5
    eta_next = res[:, 15]
    return (o_next, d_next, tp_next, L_out, alive, prev_pdf, prev_delta,
            eta_next)
