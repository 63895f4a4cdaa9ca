"""Fused path-tracing megakernels: whole bounces (or whole paths) in one
Pallas program.

The wavefront XLA integrator spends most of its time outside the trace
kernels — dozens of small elementwise launches (RNG, frames, BSDF math) and
HBM gathers between them. These kernels fuse an ENTIRE path-tracer bounce
(closest-hit trace → hit-attribute fetch → shading frame → NEE emitter
sampling → shadow trace → BSDF sampling → RR) into one Pallas program, with
all intermediates resident in VMEM:

  * triangle tables sit in VMEM; per-lane hit-attribute "gathers" become
    one-hot × table matmuls on the MXU (a [T,B] winner mask against a
    [T, 8] attribute table) — a TPU-native replacement for scatter/gather
    hardware;
  * material/emitter parameter tables sit in SMEM and are folded in with
    scalar-broadcast select chains (small M by construction);
  * the counter-based PCG4D RNG is evaluated in-kernel (uint32 VPU ops),
    so replayability is preserved bit-for-bit with the XLA path;
  * supported lobe families are compile-time specialized (MEGA_FAMILIES:
    diffuse, conductor, rough-conductor GGX, smooth dielectric, plastic,
    phong, ward, Oren-Nayar rough diffuse, thin dielectric, diffuse
    transmitter, null); emitters: area, constant env, point, spot,
    directional (MEGA_EM_TYPES).

LAYOUT (the v5e-measured design): shading state is stored as [S, B] blocks
(S=8 sublanes × B lanes of independent rays), so every elementwise shading
op runs at full (8, 128)-tile utilization. Ray–triangle traces keep the
[Tc, B] triangles-on-sublanes layout (broadcast FMAs against [Tc, 1] Woop
columns) and loop over the S sub-blocks. Ablation on TPU v5e showed the
previous all-[1, B]-rows kernel spent 3× more time in shading than in both
traces combined purely from 1-of-8 sublane utilization; this layout change
plus the amortized per-iteration loop overhead is worth ~2.5× end to end.

Scenes must fit the VMEM table budget (≈4k triangles, ≤16 materials,
≤16 emissive triangles); larger scenes fall back to the XLA wavefront
integrator. The estimator is IDENTICAL to integrator/path.py (same RNG
streams, same MIS/RR semantics) — tests assert statistical agreement.

Ref parity: the fused bounce implements the loop of
src/integrators/path/path.cpp:120-295 (NEE + MIS power heuristic + RR) with
src/librender/triaccel.h:33 Woop-style intersection, reshaped for a machine
with vector/matrix units instead of branch predictors.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.scene import (EM_AREA, EM_CONSTANT, EM_DIRECTIONAL, EM_POINT,
                           EM_SPOT, MAT_ANISO_ROUGHDIFFUSE, MAT_COATING,
                           MAT_CONDUCTOR,
                           MAT_DIELECTRIC, MAT_ROUGH_COATING,
                           MAT_ROUGH_PLASTIC,
                           MAT_DIFFTRANS, MAT_DIFFUSE, MAT_MIXTURE,
                           MAT_NULL,
                           MAT_PHONG, MAT_PLASTIC, MAT_ROUGH_CONDUCTOR,
                           MAT_ROUGH_DIELECTRIC,
                           MAT_ROUGH_DIFFUSE, MAT_THIN_DIELECTRIC,
                           MAT_WARD, SceneData)

# BSDF families implemented by the in-kernel dispatch (_bsdf_sample /
# _bsdf_eval_pdf); MegaPathTracer.for_scene validates against this.
# Every branch mirrors the corresponding bsdf.py leaf family exactly
# (same warps, same clamps) so the kernel stays stream-for-stream
# comparable with the XLA wavefront.
MEGA_FAMILIES = frozenset(
    {MAT_DIFFUSE, MAT_CONDUCTOR, MAT_ROUGH_CONDUCTOR, MAT_DIELECTRIC,
     MAT_PLASTIC, MAT_PHONG, MAT_WARD, MAT_ROUGH_DIFFUSE,
     MAT_THIN_DIELECTRIC, MAT_DIFFTRANS, MAT_NULL,
     MAT_ROUGH_DIELECTRIC, MAT_MIXTURE, MAT_COATING,
     MAT_ROUGH_COATING, MAT_ROUGH_PLASTIC, MAT_ANISO_ROUGHDIFFUSE})

# emitter types the in-kernel NEE chain understands (mega.py validates)
MEGA_EM_TYPES = frozenset(
    {EM_AREA, EM_CONSTANT, EM_POINT, EM_SPOT, EM_DIRECTIONAL})

# families whose sampler draws a cosine-hemisphere candidate
MEGA_COS_FAMILIES = {MAT_DIFFUSE, MAT_ROUGH_DIFFUSE, MAT_PLASTIC,
                     MAT_PHONG, MAT_WARD, MAT_DIFFTRANS,
                     MAT_ROUGH_PLASTIC, MAT_ANISO_ROUGHDIFFUSE}

_U32 = jnp.uint32
_MISS = 1e30
_DZ_EPS = 1e-12
INV_PI = float(1.0 / np.pi)

DEF_BLOCK = 2048      # lanes per [1, B] row block in run_bounce/run_path
DEF_SUBLANES = 8      # S: independent ray rows per shading block
DEF_PBLOCK = 16384    # total lanes (S*B) per grid step in run_persistent

# dims must mirror integrator/common.py
SENSOR_DIMS = 4
DIMS_PER_BOUNCE = 8
DIM_NEE_SEL, DIM_NEE_POS, DIM_BSDF_U2, DIM_BSDF_U1, DIM_RR = 0, 1, 2, 3, 4
DIM_MEDIUM, DIM_PHASE = 5, 6

N_ATTR = 25           # slim per-triangle attrs: ng xyz (0:3), mat_id (3),
                      # em_id (4), vn0 xyz (5:8), vn1-vn0 (8:11),
                      # vn2-vn0 (11:14), emitter radiance rgb (14:17),
                      # emitter area (17), emitter pmf (18), uv0 (19:21),
                      # uv1-uv0 (21:23), uv2-uv0 (23:25)

# extra SMEM material rows appended after the 24 mat_params columns:
# procedural-texture meta for the in-kernel analytic evaluation
TEXROW = 24           # 24 kind (-1 none, 0 checker, 1 grid), 25:28 c0,
                      # 28:31 c1, 31 res, 32 tiles, 33 line_width
# rough-plastic transmittance meta (bsdf/rtrans.py tables collapsed to
# per-material 1D cosθ slices at build time — eta/alpha are material
# constants, so the 3D trilinear lookup reduces to a 32-knot lerp):
RTROW = TEXROW + 10   # 34 internal Fdr scalar, 35:67 T(cosθ) slice,
RT_KNOTS = 32         # 67 cosθ grid lo, 68 cosθ grid hi

ENV_DIST = 1e30       # env "distance" sentinel (emitter.py ENV_DIST)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _pcg4d(x, y, z, w):
    x = x * _U32(1664525) + _U32(1013904223)
    y = y * _U32(1664525) + _U32(1013904223)
    z = z * _U32(1664525) + _U32(1013904223)
    w = w * _U32(1664525) + _U32(1013904223)
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    x = x ^ (x >> _U32(16))
    y = y ^ (y >> _U32(16))
    z = z ^ (z >> _U32(16))
    w = w ^ (w >> _U32(16))
    x = x + y * w
    y = y + z * x
    z = z + x * y
    w = w + y * z
    return x, y, z, w


def _to_float(bits):
    # Mosaic has no uint32→f32 cast; >>8 clears the sign bit so an int32
    # bitcast is value-preserving
    return (pltpu.bitcast(bits >> _U32(8), jnp.int32)
            .astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)))


def _rng2(seed_i, pixel_i, dim_i, samp_i):
    """Two uniforms, mirroring core/rng.py hash_u32 counter layout.
    seed is an int32 scalar; dim may be a scalar OR a per-lane block (the
    persistent kernel's bounce counters); pixel/samp are int32 blocks;
    bit patterns == the uint32 stream."""
    full_u = lambda v: pltpu.bitcast(
        jnp.broadcast_to(jnp.asarray(v, jnp.int32), pixel_i.shape), _U32)
    x, y, z, w = _pcg4d(pltpu.bitcast(pixel_i, _U32),
                        full_u(dim_i), full_u(seed_i),
                        pltpu.bitcast(samp_i, _U32) + _U32(0x9E3779B9))
    return _to_float(x), _to_float(y)


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _coordsys(nx, ny, nz):
    """Duff et al. branchless ONB (mirrors core/math.py)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    sx, sy, sz = 1.0 + sign * nx * nx * a, sign * b, -sign * nx
    tx, ty, tz = b, sign + ny * ny * a, -ny
    return (sx, sy, sz), (tx, ty, tz)


def _mis(pdf_a, pdf_b):
    r = jnp.clip(pdf_b / jnp.maximum(pdf_a, 1e-6), 0.0, 1e6)
    return jnp.where(pdf_a > 0, 1.0 / (1.0 + r * r), 0.0)


def _cosine_hemisphere(u0, u1):
    """Concentric-disk cosine hemisphere warp (mirrors core/warp.py
    square_to_cosine_hemisphere bit-for-bit)."""
    oxx = 2.0 * u0 - 1.0
    oyy = 2.0 * u1 - 1.0
    is_zero = (oxx == 0.0) & (oyy == 0.0)
    use_x = jnp.abs(oxx) > jnp.abs(oyy)
    r = jnp.where(use_x, oxx, oyy)
    ratio = jnp.where(
        is_zero, 0.0,
        jnp.where(use_x, oyy / jnp.where(oxx == 0.0, 1.0, oxx),
                  oxx / jnp.where(oyy == 0.0, 1.0, oyy)))
    phi = jnp.where(use_x, ratio * (np.pi / 4.0),
                    (np.pi / 2.0) - ratio * (np.pi / 4.0))
    r = jnp.where(is_zero, 0.0, r)
    sxd = r * jnp.cos(phi)
    syd = r * jnp.sin(phi)
    szd = jnp.sqrt(jnp.maximum(1.0 - sxd * sxd - syd * syd, 0.0))
    return sxd, syd, szd


def _fresnel_diel_f(cos_i, eta):
    """Unpolarized dielectric Fresnel F for signed cos_i (mirrors
    core/fresnel.py fresnel_dielectric's F output incl. clamps)."""
    eta = jnp.maximum(eta, 1e-3)
    outside = cos_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = 1.0 / eta_it
    ci = jnp.abs(cos_i)
    sin_t2 = eta_ti * eta_ti * (1.0 - ci * ci)
    tir = sin_t2 >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12))
    ct = jnp.where(tir, 0.0, ct)
    rs = (ci - eta_it * ct) / jnp.maximum(ci + eta_it * ct, 1e-4)
    rp = (eta_it * ci - ct) / jnp.maximum(eta_it * ci + ct, 1e-4)
    return jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))


def _powf(a, b):
    """a**b for a > 0 — Mosaic has no general pow lowering; exp/log is
    the standard TPU expansion (callers clamp a ≥ 1e-7)."""
    return jnp.exp(b * jnp.log(a))


def _fdr(eta):
    """Diffuse Fresnel reflectance polynomial fits (mirrors
    core/fresnel.py fresnel_diffuse_reflectance)."""
    inv_eta = 1.0 / eta
    below = -1.4399 * (eta * eta) + 0.7099 * eta + 0.6681 + 0.0636 * inv_eta
    ie2 = inv_eta * inv_eta
    ie3 = ie2 * inv_eta
    above = (0.919317 - 3.4793 * inv_eta + 6.75335 * ie2
             - 7.80989 * ie3 + 4.98554 * ie2 * ie2 - 1.36881 * ie2 * ie3)
    return jnp.where(eta < 1.0, below, above)


# ---------------------------------------------------------------------------
# scene table packing (host side)
# ---------------------------------------------------------------------------

@dataclass(frozen=True, eq=False)
class MegaTables:
    """Static scene tables (padded to tile multiples).
    eq=False → identity hash, so it can ride jit as a static argument
    (the arrays become compile-time constants)."""
    woop: jnp.ndarray        # [C, 3*tc, 4] VMEM
    aabb: jnp.ndarray        # [C, 8] cluster world AABBs, SMEM (culling)
    attr: jnp.ndarray        # [C, tc, N_ATTR] slim attrs (cluster-major)
    mat: jnp.ndarray         # [16, M_pad] mat_params transposed, SMEM
    em_rows: jnp.ndarray     # [ET_pad, 24]: p0|e1|e2|ng|cdfg|area|pmf|emid|rad
    em_meta: jnp.ndarray     # [E_pad, 8]: cdf_lo|pmf|type|rad rgb|area, SMEM
    em_count: int
    n_tris: int
    tc: int
    m_real: int              # actual material rows (select-chain length)
    et_real: int             # actual emissive-triangle rows
    smooth: bool = True      # any vn ≠ ng? False skips barycentric work
    textured: bool = False   # any procedural (checker/grid) albedo?


def build_mega_tables(scene: SceneData, tc: int | None = None,
                      tex_procs: dict | None = None) -> MegaTables:
    attr = np.asarray(scene.tri_attr)
    # Repack Woop transforms at an adaptive cluster size: small scenes
    # shrink tc to the real triangle count (rounded to the 8-sublane
    # tile), so the in-kernel per-triangle VPU work and the MXU row
    # tiles aren't wasted on padding (Cornell: 36 real tris → tc=40,
    # not 64).
    woop_o = np.asarray(scene.woop_o)            # [4, 3T]
    n_total = woop_o.shape[1] // 3
    # real tris = prefix with nonzero area (builder pads at the end)
    areas = np.asarray(scene.tri_area)
    n_real = int(np.max(np.nonzero(areas > 0)[0]) + 1) if \
        (areas > 0).any() else 1
    if tc is None:
        tc = min(64, max(8, -(-n_real // 8) * 8))
    c_clusters = -(-n_real // tc)
    t_pad = c_clusters * tc
    # per-tri rows: w[t, k, j<3] = minv[t,k,j] = woop_o[j, 3t+k];
    # w[t, k, 3] = trans[t,k] = woop_o[3, 3t+k]
    w_tri = woop_o.reshape(4, n_total, 3).transpose(1, 2, 0)  # [T, 3, 4]
    w_p = np.zeros((t_pad, 3, 4), np.float32)
    w_p[:n_real] = w_tri[:n_real]
    w_p[n_real:, 2, 3] = 1.0          # degenerate: d'_z=0, o'_z=1 → miss
    # cluster layout expected by the kernel: [C, 3tc, 4] with rows
    # k*tc + i = component k of tri i
    woop_cl = w_p.reshape(c_clusters, tc, 3, 4).transpose(0, 2, 1, 3) \
        .reshape(c_clusters, 3 * tc, 4)

    # slim attrs: ng (tri_attr cols 0:3), mat/em ids (cols 18:20), and the
    # corner shading normals (cols 3:12) stored as vn0 + deltas so the
    # kernel interpolates ns = vn0 + u·(vn1−vn0) + v·(vn2−vn0)
    attr_p = np.zeros((t_pad, N_ATTR), np.float32)
    n_a = min(attr.shape[0], t_pad)
    attr_p[:n_a, 0:3] = attr[:n_a, 0:3]
    attr_p[:n_a, 3] = attr[:n_a, 18]
    attr_p[:n_a, 4] = attr[:n_a, 19]
    attr_p[:n_a, 5:8] = attr[:n_a, 3:6]                       # vn0
    attr_p[:n_a, 8:11] = attr[:n_a, 6:9] - attr[:n_a, 3:6]    # vn1-vn0
    attr_p[:n_a, 11:14] = attr[:n_a, 9:12] - attr[:n_a, 3:6]  # vn2-vn0
    attr_p[:n_a, 19:21] = attr[:n_a, 12:14]                   # uv0
    attr_p[:n_a, 21:23] = attr[:n_a, 14:16] - attr[:n_a, 12:14]
    attr_p[:n_a, 23:25] = attr[:n_a, 16:18] - attr[:n_a, 12:14]
    attr_p[n_a:, 4] = -1.0    # padding tris: em_id = -1
    # per-tri owning-emitter data for the hit-side MIS weight
    tri_em = attr[:n_a, 19].astype(int)
    emissive = tri_em >= 0
    eid = np.clip(tri_em, 0, max(scene.n_emitters - 1, 0))
    if scene.n_emitters:
        rad_all = np.asarray(scene.em_radiance)
        area_all = np.asarray(scene.em_area)
        pmf_all = np.asarray(scene.em_pmf.pmf)
        attr_p[:n_a, 14:17] = np.where(emissive[:, None], rad_all[eid], 0)
        attr_p[:n_a, 17] = np.where(emissive, area_all[eid], 1.0)
        attr_p[:n_a, 18] = np.where(emissive, pmf_all[eid], 0.0)
    else:
        attr_p[:n_a, 17] = 1.0
    # flat-scene fast path: detected BEFORE the cluster reshape (columns
    # 8:14 are the vn deltas; post-reshape [:, 8:14] would address
    # triangles 8..13 instead and misreport every scene as smooth)
    any_smooth = bool(np.any(np.abs(attr_p[:, 8:14]) > 1e-7))
    attr_p = attr_p.reshape(c_clusters, tc, N_ATTR)

    mat = np.asarray(scene.mat_params)
    m_real = mat.shape[0]
    m_pad = max(8, -(-m_real // 8) * 8)
    mat_p = np.zeros((RTROW + RT_KNOTS + 3, m_pad), np.float32)
    mat_p[:mat.shape[1], :m_real] = mat.T
    # rough-plastic per-material rtrans slices (see RTROW above)
    from ..scene.scene import MAT_ROUGH_PLASTIC as _MRP
    if (mat[:, 12] == _MRP).any():
        from ..bsdf import rtrans
        for mi in range(m_real):
            if mat[mi, 12] != _MRP:
                continue
            eta_m = float(max(mat[mi, 0], 1e-3))
            a_m = float(max(mat[mi, 9], 1e-4))
            ggx = bool(mat[mi, 11] == 1)
            pack = rtrans.transmittance_table(ggx)
            coss = np.asarray(pack[3], np.float64)
            mat_p[RTROW + 1:RTROW + 1 + RT_KNOTS, mi] = [
                float(rtrans.lookup(pack, eta_m, a_m, float(c)))
                for c in coss]
            dpk = rtrans.diffuse_transmittance_inv(ggx)
            mat_p[RTROW, mi] = 1.0 - float(
                rtrans.lookup_diffuse(dpk, eta_m, a_m))
            mat_p[RTROW + 1 + RT_KNOTS, mi] = float(coss[0])
            mat_p[RTROW + 2 + RT_KNOTS, mi] = float(coss[-1])
    # procedural-texture meta rows (TEXROW..): analytic checker/grid
    # parameters per material whose albedo slot (col 13) has recorded
    # provenance — the kernel evaluates these bilinearly, in exact
    # parity with the rasterized bitmap the XLA path samples
    mat_p[TEXROW, :] = -1.0
    textured = False
    if tex_procs:
        for mi in range(m_real):
            slot = int(mat[mi, 13])
            pr = tex_procs.get(slot) if slot >= 0 else None
            if pr is None:
                continue
            mat_p[TEXROW, mi] = {"checker": 0.0, "grid": 1.0}[pr[0]]
            mat_p[TEXROW + 1:TEXROW + 4, mi] = pr[1]
            mat_p[TEXROW + 4:TEXROW + 7, mi] = pr[2]
            mat_p[TEXROW + 7, mi] = float(pr[3])
            mat_p[TEXROW + 8, mi] = float(pr[4])
            mat_p[TEXROW + 9, mi] = float(pr[5]) if len(pr) > 5 else 0.0
            textured = True

    # emissive-triangle rows + per-row emitter metadata
    em_tris = np.asarray(scene.em_tris)
    et = len(em_tris)
    et_pad = max(8, -(-max(et, 1) // 8) * 8)
    rows = np.zeros((et_pad, 24), np.float32)
    if et:
        rows[:et, 0:12] = np.asarray(scene.em_tri_data)[:et]
        rows[:et, 12] = np.asarray(scene.em_tri_cdfg)
        em_of = np.floor(np.asarray(scene.em_tri_cdfg) - 1e-6).astype(int)
        em_of = np.clip(em_of, 0, scene.n_emitters - 1)
        rows[:et, 13] = np.asarray(scene.em_area)[em_of]
        rows[:et, 14] = np.asarray(scene.em_pmf.pmf)[em_of]
        rows[:et, 15] = em_of.astype(np.float32)
        rows[:et, 16:19] = np.asarray(scene.em_radiance)[em_of]
        rows[et:, 12] = 1e9              # cdf sentinel: never selected
    else:
        rows[:, 12] = 1e9

    # per-emitter pick metadata (SMEM select chains in the kernel):
    # 0 cdf_lo, 1 pmf, 2 type, 3:6 radiance/intensity, 6 area,
    # 8:11 position (directional: the emission direction, as em_pos),
    # 11:14 spot axis, 14 cos cutoff, 15 cos beam width
    n_em = int(scene.n_emitters)
    e_pad = max(8, -(-max(n_em, 1) // 8) * 8)
    meta = np.zeros((e_pad, 16), np.float32)
    if n_em:
        pmf_all = np.asarray(scene.em_pmf.pmf)[:n_em]
        meta[:n_em, 0] = np.cumsum(pmf_all) - pmf_all    # cdf_lo
        meta[:n_em, 1] = pmf_all
        meta[:n_em, 2] = np.asarray(scene.em_type)[:n_em]
        meta[:n_em, 3:6] = np.asarray(scene.em_radiance)[:n_em]
        meta[:n_em, 6] = np.asarray(scene.em_area)[:n_em]
        meta[:n_em, 8:11] = np.asarray(scene.em_pos)[:n_em]
        aux = np.asarray(scene.em_aux)
        if aux.shape[0] >= n_em:
            meta[:n_em, 11:14] = aux[:n_em, 0:3]
            meta[:n_em, 14] = aux[:n_em, 3]
            meta[:n_em, 15] = aux[:n_em, 4]
        meta[n_em:, 0] = 2e9             # never selected by the chain
    from .pallas_trace import build_cluster_aabbs
    aabb = build_cluster_aabbs(np.asarray(scene.p0)[:n_real],
                               np.asarray(scene.e1)[:n_real],
                               np.asarray(scene.e2)[:n_real],
                               tc, c_clusters)
    return MegaTables(
        woop=jnp.asarray(woop_cl),
        aabb=jnp.asarray(aabb),
        attr=jnp.asarray(attr_p),
        mat=jnp.asarray(mat_p),
        em_rows=jnp.asarray(rows),
        em_meta=jnp.asarray(meta),
        em_count=int(scene.n_emitters),
        n_tris=n_real,
        tc=tc,
        m_real=m_real,
        et_real=max(et, 1),
        smooth=any_smooth,
        textured=textured)


# ---------------------------------------------------------------------------
# in-kernel trace ([Tc, B] triangles-on-sublanes layout)
# ---------------------------------------------------------------------------

MAX_UNROLLED_CLUSTERS = 4    # >4 unrolled cluster traces at block 2048
                             # exceed the 16 MB scoped-VMEM budget


def _trace_inline(woop_ref, tc, c_clusters, ox, oy, oz, dx, dy, dz, mint,
                  maxt, attr_ref=None, need_uv=True, aabb_ref=None):
    """In-kernel closest-hit trace over all clusters for ONE [1, B] ray
    row. woop_ref/attr_ref are VMEM refs ([C, 3tc, 4] and
    [C, tc, N_ATTR]); clusters are loaded per iteration. Small cluster
    counts unroll (lets Mosaic software-pipeline); large ones run a
    fori_loop so live intermediates stay O(one cluster) — an unrolled
    17-cluster trace blew the 16 MB scoped-VMEM budget.

    The Woop ray transform is elementwise VPU work: per cluster, the
    affine origin transform and linear direction transform are 21
    broadcast FMAs per triangle-sublane — measured faster than any MXU
    matmul formulation (K=4 runs the systolic array nearly empty and
    6-pass f32 makes it 1.7× slower end to end).

    No safe-dz clamp: rays parallel to a triangle plane produce inf/NaN
    t/u/v, which fail the mask compares (NaN compares false), and the
    |d'_z| ≥ ε mask term rejects them explicitly.

    Returns t_best [1,B]; with attr_ref, (t_best, attr_best [N_ATTR, B],
    u_best, v_best) — winner barycentrics (None unless need_uv)."""
    b = ox.shape[-1]
    want_attr = attr_ref is not None

    def cluster_step(c, t_best, attr_best, u_best, v_best):
        w = woop_ref[c]                                 # [3tc, 4]

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
        # fast reciprocal + one Newton step instead of the f32 divide:
        # the divide is the single most expensive per-triangle op (it
        # runs once per (tri, ray) pair); one refinement step restores
        # ~full f32 accuracy (rel err ~1e-7, well under the mint/maxt
        # epsilons), and degenerate dpz≈0 lanes are rejected by the
        # |d'_z| mask exactly as before.
        rz = pl.reciprocal(dpz, approx=True)
        rz = rz * (2.0 - dpz * rz)
        t = -opz * rz
        u = opx + t * dpx
        v = opy + t * dpy
        inside = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        mask = ((inside >= 0.0) & (jnp.abs(dpz) >= _DZ_EPS)
                & (t > mint))
        if maxt is not None:
            mask = mask & (t < maxt)
        # maxt=None (closest pass, far plane = _MISS): a masked-in t >
        # _MISS can never win the min against the _MISS fill, so the
        # compare is dropped
        tm = jnp.where(mask, t, _MISS)
        t_c = jnp.min(tm, axis=0, keepdims=True)
        closer = t_c < t_best
        t_best = jnp.where(closer, t_c, t_best)
        if want_attr:
            rows = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            hit_rows = jnp.where(tm == t_c, rows, tc)
            row_best = jnp.min(hit_rows, axis=0, keepdims=True)
            selb = (rows == row_best) & mask
            sel = selb.astype(jnp.float32)                     # [tc, B]
            a_c = attr_ref[c]                              # [tc, N_ATTR]
            # HIGHEST precision: a bf16 pass would round table values
            # (e.g. a normal component) and break shading
            attr_c = jax.lax.dot_general(
                a_c, sel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [N_ATTR, B]
            attr_best = jnp.where(closer, attr_c, attr_best)
            if need_uv:
                # winner barycentrics (masked lanes may hold inf·0 junk)
                zero = jnp.zeros_like(u)
                u_c = jnp.sum(jnp.where(selb, u, zero), axis=0,
                              keepdims=True)
                v_c = jnp.sum(jnp.where(selb, v, zero), axis=0,
                              keepdims=True)
                u_best = jnp.where(closer, u_c, u_best)
                v_best = jnp.where(closer, v_c, v_best)
        return t_best, attr_best, u_best, v_best

    t_best = jnp.full((1, b), _MISS)
    attr_best = jnp.zeros((N_ATTR, b)) if want_attr else None
    u_best = v_best = None
    if want_attr and need_uv:
        u_best = jnp.zeros((1, b))
        v_best = jnp.zeros((1, b))

    if c_clusters <= MAX_UNROLLED_CLUSTERS:
        # small scenes: unrolled, no culling (the gate would cost more
        # than it saves at a handful of clusters)
        for c in range(c_clusters):
            t_best, attr_best, u_best, v_best = cluster_step(
                c, t_best, attr_best, u_best, v_best)
    else:
        carry = tuple(x for x in (t_best, attr_best, u_best, v_best)
                      if x is not None)
        if aabb_ref is not None:
            # top-level cluster culling (cf. pallas_trace fused kernel):
            # slab-test the whole ray row against the cluster AABB and
            # skip the tc-triangle test when no ray can enter
            big = jnp.float32(1e30)
            inv = lambda x: jnp.where(
                jnp.abs(x) < 1e-12,
                jnp.where(x >= 0.0, big, -big), 1.0 / x)
            ivx, ivy, ivz = inv(dx), inv(dy), inv(dz)
            far_cap = maxt if maxt is not None else jnp.full_like(mint,
                                                                  _MISS)

        def body(c, carry):
            parts = list(carry) + [None] * (4 - len(carry))
            if not want_attr:
                parts = [parts[0], None, None, None]
            elif not need_uv:
                parts = [parts[0], parts[1], None, None]
            if aabb_ref is None:
                out = cluster_step(c, *parts)
                return tuple(x for x in out if x is not None)
            t0x = (aabb_ref[c, 0] - ox) * ivx
            t1x = (aabb_ref[c, 3] - ox) * ivx
            t0y = (aabb_ref[c, 1] - oy) * ivy
            t1y = (aabb_ref[c, 4] - oy) * ivy
            t0z = (aabb_ref[c, 2] - oz) * ivz
            t1z = (aabb_ref[c, 5] - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.maximum(jnp.minimum(t0z, t1z), mint))
            far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                          jnp.maximum(t0y, t1y)),
                              jnp.minimum(jnp.maximum(t0z, t1z),
                                          jnp.minimum(far_cap,
                                                      parts[0])))
            enter = jnp.max(jnp.where(near <= far, 1.0, 0.0)) > 0.0

            def test():
                out = cluster_step(c, *parts)
                return tuple(x for x in out if x is not None)

            return jax.lax.cond(enter, test, lambda: carry)

        carry = jax.lax.fori_loop(0, c_clusters, body, carry)
        parts = list(carry) + [None] * (4 - len(carry))
        if not want_attr:
            t_best, attr_best, u_best, v_best = parts[0], None, None, None
        elif not need_uv:
            t_best, attr_best = parts[0], parts[1]
            u_best = v_best = None
        else:
            t_best, attr_best, u_best, v_best = parts[:4]

    if want_attr:
        return t_best, attr_best, u_best, v_best
    return t_best, attr_best


# ---------------------------------------------------------------------------
# the fused bounce, S-layout ([S, B] shading blocks)
# ---------------------------------------------------------------------------

def _bounce_rows(tc, c_clusters, families, rr_depth, max_depth,
                 m_real, et_real, n_em, smooth, woop_ref, aabb_ref,
                 attr_ref, mat_sm, em_sm, em_meta, consts, pixel, samp,
                 seed, bounce, rows, medium=None, textured=False):
    """One path-tracer bounce over [S, B] shading blocks.

    rows: tuple of 16 [S, B] f32 blocks (o xyz, d xyz, throughput rgb,
    L rgb, active, prev_pdf, prev_delta, eta_scale). pixel/samp: [S, B]
    int32. bounce: int32 scalar or [S, B] block. mat_sm/em_sm are SMEM
    refs read as broadcast scalars. Returns (new 16-row tuple,
    trace_count [S, B], shadow_count [S, B]).

    `medium`: None, or a static 8-tuple (sigma_t rgb, albedo rgb, g,
    bound) of Python floats — compiles in the global homogeneous-medium
    branch with VolPathTracer semantics (ref: volpath.cpp:104-181,
    homogeneous.cpp:157-223 balance strategy; integrator/volpath.py is
    the lane-parity target): per bounce the lane first samples a medium
    interaction against the surface distance, then takes either the
    HG-phase medium branch or the standard surface branch, with NEE
    shadow rays attenuated by the closed-form transmittance."""
    (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, lr, lg, lb,
     active_f, prev_pdf, prev_delta_f, eta_scale) = rows
    s_blocks = ox.shape[0]
    active = active_f > 0.5
    prev_delta = prev_delta_f > 0.5

    dim_base = SENSOR_DIMS + bounce * DIMS_PER_BOUNCE

    # ---- closest hit (per sub-block trace, stacked back to [S, B]) ----
    scale = 1.0 + jnp.maximum(jnp.maximum(jnp.abs(ox), jnp.abs(oy)),
                              jnp.abs(oz))
    mint = 1e-4 * scale
    uvs = smooth or textured
    t_rows, a_rows, u_rows, v_rows = [], [], [], []
    for s in range(s_blocks):
        t_s, attr_s, u_s, v_s = _trace_inline(
            woop_ref, tc, c_clusters,
            ox[s:s + 1], oy[s:s + 1], oz[s:s + 1],
            dx[s:s + 1], dy[s:s + 1], dz[s:s + 1],
            mint[s:s + 1], None, attr_ref, need_uv=uvs,
            aabb_ref=aabb_ref)
        t_rows.append(t_s)
        a_rows.append(attr_s)
        u_rows.append(u_s)
        v_rows.append(v_s)
    t_best = jnp.concatenate(t_rows, axis=0)                   # [S, B]
    if uvs:
        u_hit = jnp.concatenate(u_rows, axis=0)
        v_hit = jnp.concatenate(v_rows, axis=0)
    gather = lambda r: jnp.concatenate(
        [a[r:r + 1] for a in a_rows], axis=0)
    ngx, ngy, ngz = gather(0), gather(1), gather(2)
    mat_id = gather(3)
    em_id = gather(4)

    hit_geo = active & (t_best < _MISS)
    t_safe = jnp.where(t_best < _MISS, t_best, 1.0)
    px_, py_, pz_ = (ox + t_safe * dx, oy + t_safe * dy, oz + t_safe * dz)

    # ---- homogeneous-medium distance sampling (balance strategy:
    # uniform channel pick, t ∝ σt_c e^{-σt_c t}, channel-averaged
    # success/failure pdfs — media/homogeneous.py sample_distance) ----
    if medium is not None:
        (mst_r, mst_g, mst_b, mal_r, mal_g, mal_b, m_g, m_bound) = medium
        u_mc, u_md = _rng2(seed, pixel, dim_base + DIM_MEDIUM, samp)
        ch = jnp.minimum(jnp.floor(u_mc * 3.0), 2.0)
        sig_c = jnp.maximum(
            jnp.where(ch == 0.0, mst_r,
                      jnp.where(ch == 1.0, mst_g, mst_b)), 1e-8)
        t_med = -jnp.log1p(-jnp.clip(u_md, 0.0, 1.0 - 1e-7)) / sig_c
        t_surf = jnp.where(hit_geo, t_best, 1e30)
        seg_end = jnp.minimum(t_surf, m_bound)
        sampled = t_med < seg_end
        in_med = active & sampled
        hit = hit_geo & ~sampled              # surface-event lanes
        escaped = active & ~hit_geo & ~sampled
        tt_r = jnp.exp(-jnp.minimum(mst_r * t_med, 80.0))
        tt_g = jnp.exp(-jnp.minimum(mst_g * t_med, 80.0))
        tt_b = jnp.exp(-jnp.minimum(mst_b * t_med, 80.0))
        ts_r = jnp.exp(-jnp.minimum(mst_r * seg_end, 80.0))
        ts_g = jnp.exp(-jnp.minimum(mst_g * seg_end, 80.0))
        ts_b = jnp.exp(-jnp.minimum(mst_b * seg_end, 80.0))
        third = jnp.float32(1.0 / 3.0)
        pdf_succ = jnp.maximum(
            (mst_r * tt_r + mst_g * tt_g + mst_b * tt_b) * third, 1e-20)
        pdf_fail = jnp.maximum((ts_r + ts_g + ts_b) * third, 1e-20)
        imf = in_med.astype(jnp.float32)
        # w_medium = σs·Tr(t)/pdfSuccess; w_surface = Tr(ts)/pdfFailure
        seg_w = lambda st, al, tt, ts: \
            imf * (st * al * tt / pdf_succ) + (1.0 - imf) * (ts / pdf_fail)
        tpr = tpr * seg_w(mst_r, mal_r, tt_r, ts_r)
        tpg = tpg * seg_w(mst_g, mal_g, tt_g, ts_g)
        tpb = tpb * seg_w(mst_b, mal_b, tt_b, ts_b)
        pex = ox + t_med * dx                 # medium event point
        pey = oy + t_med * dy
        pez = oz + t_med * dz
    else:
        in_med = None
        hit = hit_geo

    # ---- material row via SMEM-scalar select chain --------------------
    # (replaces the one-hot MXU matmul: with state on [S, B] blocks the
    # matmul would need a layout round-trip; M is small by construction)
    def make_chain(ids):
        def param(j):
            p = jnp.full_like(ids, mat_sm[j, 0])
            for m in range(1, m_real):
                p = jnp.where(ids == float(m), mat_sm[j, m], p)
            return p
        return param

    mat_param = make_chain(mat_id)
    mtype = mat_param(12)     # family code row (MAT_DIFFUSE, ...)

    # ---- procedural albedo textures (checker/grid) --------------------
    # Analytic BILINEAR sample of the ideal checkerboard/grid — exact
    # parity with texture.py eval_texture_lod level 0 over the
    # rasterized bitmap (texel-center -0.5 offset, v-flip, REPEAT wrap,
    # then per-corner cell parity / line test instead of a texel fetch).
    if textured:
        uv_u = gather(19) + u_hit * gather(21) + v_hit * gather(23)
        uv_v = gather(20) + u_hit * gather(22) + v_hit * gather(24)
        tknd = mat_param(TEXROW)
        tres = jnp.maximum(mat_param(TEXROW + 7), 1.0)
        ttil = jnp.maximum(mat_param(TEXROW + 8), 1.0)
        tlw = mat_param(TEXROW + 9)
        fx = uv_u * tres - 0.5
        fy = (1.0 - uv_v) * tres - 0.5
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0
        wrap = lambda x: x - jnp.floor(x / tres) * tres
        xw0, xw1 = wrap(x0), wrap(x0 + 1.0)
        yw0, yw1 = wrap(y0), wrap(y0 + 1.0)
        is_grid = tknd == 1.0

        def c0_weight(xw, yw):
            # checker: cell parity 0 → color0 (checkerboard.cpp layout)
            cxy = jnp.floor(xw * ttil / tres) + jnp.floor(yw * ttil
                                                          / tres)
            chk = 1.0 - (cxy - 2.0 * jnp.floor(cxy * 0.5))
            # grid: on-line texels → color0 (gridtexture.cpp)
            gx = jnp.abs((xw + 0.5) / tres * ttil
                         - jnp.round((xw + 0.5) / tres * ttil))
            gy = jnp.abs((yw + 0.5) / tres * ttil
                         - jnp.round((yw + 0.5) / tres * ttil))
            grd = ((gx < tlw * ttil) | (gy < tlw * ttil)) \
                .astype(jnp.float32)
            return jnp.where(is_grid, grd, chk)

        s0w = (c0_weight(xw0, yw0) * (1.0 - tx) * (1.0 - ty)
               + c0_weight(xw1, yw0) * tx * (1.0 - ty)
               + c0_weight(xw0, yw1) * (1.0 - tx) * ty
               + c0_weight(xw1, yw1) * tx * ty)
        has_tex = tknd >= 0.0

        def tex_albedo(k):
            c0 = mat_param(TEXROW + 1 + k)
            c1 = mat_param(TEXROW + 4 + k)
            return jnp.where(has_tex, c0 * s0w + c1 * (1.0 - s0w),
                             mat_param(k))

        alb_r, alb_g, alb_b = tex_albedo(0), tex_albedo(1), tex_albedo(2)
        _base_mat_param = mat_param

        def mat_param(j, _b=_base_mat_param):
            if j == 0:
                return alb_r
            if j == 1:
                return alb_g
            if j == 2:
                return alb_b
            return _b(j)

    # ---- composite (mixture/blend/mask) child resolution --------------
    # children are ordinary material rows: per-lane child ids from the
    # parent's slots 18/19 key fresh SMEM select chains (resolve_material
    # child(slot) semantics; leaf lanes alias their own row so the A
    # chain IS the leaf dispatch)
    has_mix = MAT_MIXTURE in families
    has_coat = MAT_COATING in families
    has_rc = MAT_ROUGH_COATING in families
    if has_mix or has_coat or has_rc:
        is_mix = (mtype == float(MAT_MIXTURE)) if has_mix else None
        is_coat = (mtype == float(MAT_COATING)) if has_coat else None
        is_rc = (mtype == float(MAT_ROUGH_COATING)) if has_rc else None
        masks = [m for m in (is_mix, is_coat, is_rc) if m is not None]
        is_comp = masks[0]
        for m in masks[1:]:
            is_comp = is_comp | m
        ida = jnp.where(is_comp, mat_param(18), mat_id)
        param_a = make_chain(ida)
        mtype_a = param_a(12)
        if has_mix:
            idb = jnp.where(is_mix, mat_param(19), mat_id)
            param_b = make_chain(idb)
            mtype_b = param_b(12)
            w_mix = jnp.where(is_mix, mat_param(20), 1.0)
    else:
        is_mix = is_coat = is_rc = None
        param_a, mtype_a = mat_param, mtype

    # ---- emission on hit + env on escape ------------------------------
    cos_surf = -(dx * ngx + dy * ngy + dz * ngz)
    # consts: constant-env radiance + its pick pmf (0 when no env)
    (env_r, env_g, env_b, env_pmf) = consts[:4]

    if medium is None:
        escaped = active & (t_best >= _MISS)
    inv4pi = jnp.float32(1.0 / (4.0 * np.pi))
    env_pdf = env_pmf * inv4pi
    mis_env = jnp.where(prev_delta, 1.0, _mis(prev_pdf, env_pdf))
    esc = escaped.astype(jnp.float32) * mis_env
    lr = lr + tpr * env_r * esc
    lg = lg + tpg * env_g * esc
    lb = lb + tpb * env_b * esc

    # emitter hit: radiance + NEE pdf of the HIT triangle's emitter come
    # from the slim attr rows (multi-area support; eval_area/
    # pdf_direct_area semantics, area.cpp:158-173 one-sided)
    is_emitter = hit & (em_id >= 0.0) & (cos_surf > 0.0)
    dist2 = t_best * t_best
    pdf_hit = jnp.where(
        cos_surf > 1e-6,
        dist2 / jnp.maximum(cos_surf * gather(17), 1e-12)
        * gather(18), 0.0)
    mis_hit = jnp.where(prev_delta, 1.0, _mis(prev_pdf, pdf_hit))
    hi = is_emitter.astype(jnp.float32) * mis_hit
    lr = lr + tpr * gather(14) * hi
    lg = lg + tpg * gather(15) * hi
    lb = lb + tpb * gather(16) * hi

    if isinstance(bounce, jnp.ndarray) and bounce.ndim:
        depth = bounce.astype(jnp.float32) + 2.0  # path vertices
    else:
        depth = jnp.asarray(bounce, jnp.int32).astype(jnp.float32) + 2.0

    # ---- shading frame (barycentric-interpolated vertex normals, as
    # dense.fill_intersection: ns = vn0 + u·Δvn1 + v·Δvn2, normalized;
    # all-flat scenes skip the interpolation statically) ----------------
    if smooth:
        nsx, nsy, nsz = _normalize3(
            gather(5) + u_hit * gather(8) + v_hit * gather(11),
            gather(6) + u_hit * gather(9) + v_hit * gather(12),
            gather(7) + u_hit * gather(10) + v_hit * gather(13))
    else:
        nsx, nsy, nsz = ngx, ngy, ngz
    (sx, sy, sz), (tx_, ty_, tz_) = _coordsys(nsx, nsy, nsz)
    wil_x = -(dx * sx + dy * sy + dz * sz)
    wil_y = -(dx * tx_ + dy * ty_ + dz * tz_)
    wil_z = -(dx * nsx + dy * nsy + dz * nsz)
    # twosided adapter (bsdf.py _twosided_wi; ref: src/bsdfs/
    # twosided.cpp): flagged materials mirror back-side incidence into
    # the upper hemisphere; local z of wi/wo(NEE) flips in, the sampled
    # direction flips back out. fsgn = 1 everywhere else — free.
    ts_flip = (mat_param(15) > 0.5) & (wil_z < 0.0)
    fsgn = jnp.where(ts_flip, -1.0, 1.0)
    wil_z = wil_z * fsgn

    # ---- NEE ------------------------------------------------------------
    # event point: the medium scatter point for medium lanes, else the
    # surface hit (volpath.py p_event)
    if medium is not None:
        qx = jnp.where(in_med, pex, px_)
        qy = jnp.where(in_med, pey, py_)
        qz = jnp.where(in_med, pez, pz_)
    else:
        qx, qy, qz = px_, py_, pz_
    u_sel, _ = _rng2(seed, pixel, dim_base + DIM_NEE_SEL, samp)
    up0, up1 = _rng2(seed, pixel, dim_base + DIM_NEE_POS, samp)
    # emitter pick ∝ pmf via the SMEM meta chain (DiscreteDistribution
    # sample_reuse, scene.cpp:832), then triangle within the picked area
    # emitter via the globalized per-tri cdf (values in (e, e+1])
    e_k = jnp.zeros_like(u_sel)
    for e in range(1, n_em):
        e_k = e_k + (em_meta[e, 0] <= u_sel).astype(jnp.float32)

    def em_pick(j):
        p = jnp.full_like(u_sel, em_meta[0, j])
        for e in range(1, n_em):
            p = jnp.where(e_k == float(e), em_meta[e, j], p)
        return p

    cdf_lo_k = em_pick(0)
    pmf_k = em_pick(1)
    u_re = jnp.clip((u_sel - cdf_lo_k) / jnp.maximum(pmf_k, 1e-20),
                    0.0, 1.0 - 1e-7)
    is_env_sel = em_pick(2) == float(EM_CONSTANT)
    key = e_k + u_re
    cnt = jnp.zeros_like(key)
    for e in range(et_real):
        cnt = cnt + (em_sm[e, 12] <= key).astype(jnp.float32)

    def em_val(j):
        p = jnp.full_like(key, em_sm[0, j])
        for e in range(1, et_real):
            p = jnp.where(cnt == float(e), em_sm[e, j], p)
        return p

    # uniform barycentric (warp.h triangle warp)
    sq = jnp.sqrt(jnp.maximum(1.0 - up0, 0.0))
    b0 = 1.0 - sq
    b1 = up1 * sq
    plx = em_val(0) + b0 * em_val(3) + b1 * em_val(6)
    ply = em_val(1) + b0 * em_val(4) + b1 * em_val(7)
    plz = em_val(2) + b0 * em_val(5) + b1 * em_val(8)
    nlx, nly, nlz = em_val(9), em_val(10), em_val(11)
    tlx, tly, tlz = plx - qx, ply - qy, plz - qz
    ld2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-12)
    ldist_a = jnp.sqrt(ld2)
    lax_, lay, laz = tlx / ldist_a, tly / ldist_a, tlz / ldist_a
    cos_l = -(lax_ * nlx + lay * nly + laz * nlz)
    pdf_area = jnp.where(
        cos_l > 1e-6,
        ld2 / jnp.maximum(cos_l * em_val(13), 1e-12) * em_val(14),
        0.0)

    # constant-env pick: uniform sphere direction from the same u2
    # (warp.h:43 square_to_uniform_sphere; emitter.py sample_direct)
    ez = 1.0 - 2.0 * up0
    er = jnp.sqrt(jnp.maximum(1.0 - ez * ez, 0.0))
    eph = 2.0 * np.pi * up1
    ldx = jnp.where(is_env_sel, er * jnp.cos(eph), lax_)
    ldy = jnp.where(is_env_sel, er * jnp.sin(eph), lay)
    ldz = jnp.where(is_env_sel, ez, laz)
    ldist = jnp.where(is_env_sel, ENV_DIST, ldist_a)
    pdf_nee = jnp.where(is_env_sel, pmf_k * inv4pi, pdf_area)
    le_nee_r = jnp.where(is_env_sel, em_pick(3), em_val(16))
    le_nee_g = jnp.where(is_env_sel, em_pick(4), em_val(17))
    le_nee_b = jnp.where(is_env_sel, em_pick(5), em_val(18))

    # point/spot/directional delta emitters (emitter.py sample_direct):
    # direction to the stored position (point/spot, with the spot's
    # linear falloff curve) or the fixed direction (directional);
    # pdf bookkept as the pick pmf, MIS weight forced to 1
    etype_k = em_pick(2)
    is_point_sel = (etype_k == float(EM_POINT)) \
        | (etype_k == float(EM_SPOT))
    is_spot_sel = etype_k == float(EM_SPOT)
    is_dir_sel = etype_k == float(EM_DIRECTIONAL)
    is_delta_sel = is_point_sel | is_dir_sel
    epx, epy, epz = em_pick(8), em_pick(9), em_pick(10)
    tqx, tqy, tqz = epx - qx, epy - qy, epz - qz
    pd2 = jnp.maximum(tqx * tqx + tqy * tqy + tqz * tqz, 1e-12)
    pdist = jnp.sqrt(pd2)
    dqx, dqy, dqz = tqx / pdist, tqy / pdist, tqz / pdist
    cos_ang = -(em_pick(11) * dqx + em_pick(12) * dqy
                + em_pick(13) * dqz)
    falloff = jnp.clip(
        (cos_ang - em_pick(14))
        / jnp.maximum(em_pick(15) - em_pick(14), 1e-6), 0.0, 1.0)
    fall = jnp.where(is_spot_sel, falloff, 1.0)
    ldx = jnp.where(is_dir_sel, -epx, jnp.where(is_point_sel, dqx, ldx))
    ldy = jnp.where(is_dir_sel, -epy, jnp.where(is_point_sel, dqy, ldy))
    ldz = jnp.where(is_dir_sel, -epz, jnp.where(is_point_sel, dqz, ldz))
    ldist = jnp.where(is_dir_sel, ENV_DIST,
                      jnp.where(is_point_sel, pdist, ldist))
    pdf_nee = jnp.where(is_delta_sel, pmf_k, pdf_nee)
    inv_pd2 = fall / pd2
    le_nee_r = jnp.where(is_dir_sel, em_pick(3),
                         jnp.where(is_point_sel, em_pick(3) * inv_pd2,
                                   le_nee_r))
    le_nee_g = jnp.where(is_dir_sel, em_pick(4),
                         jnp.where(is_point_sel, em_pick(4) * inv_pd2,
                                   le_nee_g))
    le_nee_b = jnp.where(is_dir_sel, em_pick(5),
                         jnp.where(is_point_sel, em_pick(5) * inv_pd2,
                                   le_nee_b))

    # shadow ray (offset along geometric normal; medium lanes shoot
    # straight from the scatter point — volpath.py `so`)
    sgn = jnp.where(ldx * ngx + ldy * ngy + ldz * ngz >= 0.0, 1.0, -1.0)
    eps_o = 1e-4 * (1.0 + jnp.maximum(jnp.maximum(jnp.abs(px_),
                                                  jnp.abs(py_)),
                                      jnp.abs(pz_)))
    sox = px_ + sgn * eps_o * ngx
    soy = py_ + sgn * eps_o * ngy
    soz = pz_ + sgn * eps_o * ngz
    if medium is not None:
        sox = jnp.where(in_med, pex, sox)
        soy = jnp.where(in_med, pey, soy)
        soz = jnp.where(in_med, pez, soz)
    smint = 1e-4 * (1.0 + jnp.maximum(jnp.maximum(jnp.abs(sox),
                                                  jnp.abs(soy)),
                                      jnp.abs(soz)))
    smaxt = ldist * (1.0 - 1e-3)
    lit_rows = []
    for s in range(s_blocks):
        t_sh, _ = _trace_inline(
            woop_ref, tc, c_clusters,
            sox[s:s + 1], soy[s:s + 1], soz[s:s + 1],
            ldx[s:s + 1], ldy[s:s + 1], ldz[s:s + 1],
            smint[s:s + 1], smaxt[s:s + 1], None, aabb_ref=aabb_ref)
        lit_rows.append(t_sh)
    lit = jnp.concatenate(lit_rows, axis=0) >= _MISS           # [S, B]

    # BSDF eval toward light + pdf (families static)
    wol_x = ldx * sx + ldy * sy + ldz * sz
    wol_y = ldx * tx_ + ldy * ty_ + ldz * tz_
    wol_z = (ldx * nsx + ldy * nsy + ldz * nsz) * fsgn
    f_r, f_g, f_b, pdf_fwd = _bsdf_eval_pdf(
        families, param_a, mtype_a, wil_x, wil_y, wil_z,
        wol_x, wol_y, wol_z)
    if MAT_MIXTURE in families:
        # mixture NEE: f = w·f_A + (1−w)·f_B (eval_bsdf_ex)
        fb_r, fb_g, fb_b, pdf_fb = _bsdf_eval_pdf(
            families, param_b, mtype_b, wil_x, wil_y, wil_z,
            wol_x, wol_y, wol_z)
        one_w = 1.0 - w_mix
        f_r = jnp.where(is_mix, w_mix * f_r + one_w * fb_r, f_r)
        f_g = jnp.where(is_mix, w_mix * f_g + one_w * fb_g, f_g)
        f_b = jnp.where(is_mix, w_mix * f_b + one_w * fb_b, f_b)
        pdf_fwd = jnp.where(is_mix, w_mix * pdf_fwd + one_w * pdf_fb,
                            pdf_fwd)
    if MAT_COATING in families or MAT_ROUGH_COATING in families:
        # smooth/rough coating NEE (bsdf.py _coating_eval/_coating_pdf,
        # _roughcoating_*; ref: src/bsdfs/{coating,roughcoating}.cpp):
        # bend wi/wo into the coat (sinθ' = sinθ/η), evaluate the nested
        # child there, apply absorption e^{−σa·t·path}, both interface
        # transmittances and the dω'/dω Jacobian with the 1/η² radiance
        # compression; roughcoating adds a GGX coat reflection lobe
        c_eta = jnp.maximum(mat_param(0), 1.0 + 1e-4)
        inv_ce = 1.0 / c_eta
        fi_c = _fresnel_diel_f(wil_z, c_eta)

        def coat_in(vx, vy, vz):
            x, y = vx * inv_ce, vy * inv_ce
            z = jnp.sqrt(jnp.maximum(1.0 - x * x - y * y, 0.0)) \
                * jnp.sign(vz)
            return x, y, z

        ci_x, ci_y, ci_z = coat_in(wil_x, wil_y, wil_z)

        def coat_terms(wox, woy, woz):
            """(f rgb, pdf) of the THROUGH-COAT nested component at
            (wil, wo) — shared by coat NEE/eval and the rc combined
            weight."""
            fo = _fresnel_diel_f(woz, c_eta)
            cox, coy, coz = coat_in(wox, woy, woz)
            er, eg, eb, pn = _bsdf_eval_pdf(
                families, param_a, mtype_a, ci_x, ci_y, ci_z,
                cox, coy, coz)
            path = 1.0 / jnp.maximum(jnp.abs(ci_z), 1e-4) \
                + 1.0 / jnp.maximum(jnp.abs(coz), 1e-4)
            jac = jnp.abs(woz) / jnp.maximum(jnp.abs(coz), 1e-6) \
                * (inv_ce * inv_ce)
            sc = (1.0 - fi_c) * (1.0 - fo) * jac
            fr = er * jnp.exp(-mat_param(1) * path) * sc
            fg = eg * jnp.exp(-mat_param(2) * path) * sc
            fb = eb * jnp.exp(-mat_param(3) * path) * sc
            pp = (1.0 - fi_c) * pn * jnp.abs(woz) \
                / jnp.maximum(c_eta * c_eta * jnp.abs(coz), 1e-9)
            return fr, fg, fb, pp

        if MAT_ROUGH_COATING in families:
            rc_a = jnp.maximum(mat_param(9), 1e-4)

            def rc_spec_terms(wox, woy, woz):
                """(f·cosθo scalar, pdf) of the GGX coat reflection
                lobe (bsdf.py _rough_coat_spec_eval/_pdf, upper
                hemisphere, visible-normal pdf)."""
                hx, hy, hz = _normalize3(wil_x + wox, wil_y + woy,
                                         wil_z + woz)
                d_h = _ggx_d(hx, hy, hz, rc_a)
                wih = wil_x * hx + wil_y * hy + wil_z * hz
                f_h = _fresnel_diel_f(wih, c_eta)
                g_h = _ggx_g1(wil_x, wil_y, wil_z, hx, hy, hz, rc_a) \
                    * _ggx_g1(wox, woy, woz, hx, hy, hz, rc_a)
                up = (wil_z > 0.0) & (woz > 0.0)
                upf = up.astype(jnp.float32)
                val = mat_param(4) * f_h * d_h * g_h \
                    / jnp.maximum(4.0 * jnp.abs(wil_z), 1e-7) * upf
                g1i = _ggx_g1(wil_x, wil_y, wil_z, hx, hy, hz, rc_a)
                pdf_h = g1i * jnp.abs(wih) * d_h \
                    / jnp.maximum(jnp.abs(wil_z), 1e-12)
                woh = wox * hx + woy * hy + woz * hz
                pp = pdf_h / jnp.maximum(4.0 * jnp.abs(woh), 1e-7) * upf
                return val, pp

        cf_r, cf_g, cf_b, cpdf_nee = coat_terms(wol_x, wol_y, wol_z)
        if is_coat is not None:
            f_r = jnp.where(is_coat, cf_r, f_r)
            f_g = jnp.where(is_coat, cf_g, f_g)
            f_b = jnp.where(is_coat, cf_b, f_b)
            pdf_fwd = jnp.where(is_coat, cpdf_nee, pdf_fwd)
        if MAT_ROUGH_COATING in families:
            sv, sp = rc_spec_terms(wol_x, wol_y, wol_z)
            f_r = jnp.where(is_rc, cf_r + sv, f_r)
            f_g = jnp.where(is_rc, cf_g + sv, f_g)
            f_b = jnp.where(is_rc, cf_b + sv, f_b)
            pdf_fwd = jnp.where(is_rc, fi_c * sp + cpdf_nee, pdf_fwd)
    # medium lanes: HG phase value replaces the BSDF toward the light
    # (exact importance sampling → counter pdf = value; volpath.py
    # f_phase/pdf_phase_nee)
    if medium is not None:
        cos_ph = -(dx * ldx + dy * ldy + dz * ldz)
        g2 = m_g * m_g
        den = jnp.maximum(1.0 + g2 + 2.0 * m_g * cos_ph, 1e-8)
        f_ph = inv4pi * (1.0 - g2) / (den * jnp.sqrt(den))
        f_r = jnp.where(in_med, f_ph, f_r)
        f_g = jnp.where(in_med, f_ph, f_g)
        f_b = jnp.where(in_med, f_ph, f_b)
        pdf_fwd = jnp.where(in_med, f_ph, pdf_fwd)
    # delta emitters can't be BSDF-sampled: MIS weight 1 (path.py w_nee)
    mis_nee = jnp.where(is_delta_sel, 1.0, _mis(pdf_nee, pdf_fwd))
    # skip NEE when the connection vertex would exceed maxDepth
    # (path.cpp:169-180 via integrator/path.py nee_allowed)
    event = hit if medium is None else hit | in_med
    nee_ok = event if max_depth <= 0 else \
        event & (depth + 1.0 <= float(max_depth) + 1.0)
    contrib = (nee_ok & lit & (pdf_nee > 0.0)).astype(jnp.float32) \
        * mis_nee / jnp.maximum(pdf_nee, 1e-12)
    # NEE attenuated by the medium transmittance over min(dist, bound)
    # on top of surface occlusion (Scene::evalTransmittance semantics)
    if medium is not None:
        dcl = jnp.minimum(ldist, m_bound)
        trs_r = jnp.exp(-jnp.minimum(mst_r * dcl, 80.0))
        trs_g = jnp.exp(-jnp.minimum(mst_g * dcl, 80.0))
        trs_b = jnp.exp(-jnp.minimum(mst_b * dcl, 80.0))
    else:
        trs_r = trs_g = trs_b = 1.0
    lr = lr + tpr * le_nee_r * f_r * trs_r * contrib
    lg = lg + tpg * le_nee_g * f_g * trs_g * contrib
    lb = lb + tpb * le_nee_b * f_b * trs_b * contrib

    # ---- BSDF sample ----------------------------------------------------
    ub0, ub1 = _rng2(seed, pixel, dim_base + DIM_BSDF_U2, samp)
    uc0, _ = _rng2(seed, pixel, dim_base + DIM_BSDF_U1, samp)
    if MAT_MIXTURE not in families:
        (nwx, nwy, nwz, w_r, w_g, w_b, pdf_b, is_delta, eta_ev) = \
            _bsdf_sample(families, param_a, mtype_a, wil_x, wil_y, wil_z,
                         ub0, ub1, uc0)
    else:
        # mixture sampling (sample_bsdf_ex / mixturebsdf.cpp
        # sampleReuse): pick a child ∝ w from the component uniform,
        # remap it into the child's own stream, then weight the smooth
        # case by the FULL mixture f/pdf (MIS-correct) and the delta
        # case by the picked child's weight. Leaf lanes ride the A
        # dispatch with the unmapped uniform.
        uc_a = jnp.where(
            is_mix,
            jnp.clip(uc0 / jnp.maximum(w_mix, 1e-6), 0.0, 1.0 - 1e-6),
            uc0)
        uc_b = jnp.clip((uc0 - w_mix) / jnp.maximum(1.0 - w_mix, 1e-6),
                        0.0, 1.0 - 1e-6)
        (ax, ay, az, wa_r, wa_g, wa_b, pdf_a, d_a, eta_a) = \
            _bsdf_sample(families, param_a, mtype_a, wil_x, wil_y,
                         wil_z, ub0, ub1, uc_a)
        (bx, by, bz, wb_r, wb_g, wb_b, pdf_bb, d_b, eta_b) = \
            _bsdf_sample(families, param_b, mtype_b, wil_x, wil_y,
                         wil_z, ub0, ub1, uc_b)
        pick_a = uc0 < w_mix
        mo_x = jnp.where(pick_a, ax, bx)
        mo_y = jnp.where(pick_a, ay, by)
        mo_z = jnp.where(pick_a, az, bz)
        d_m = (pick_a & d_a) | (~pick_a & d_b)
        eta_m = jnp.where(pick_a, eta_a, eta_b)
        ea_r, ea_g, ea_b, pa_m = _bsdf_eval_pdf(
            families, param_a, mtype_a, wil_x, wil_y, wil_z,
            mo_x, mo_y, mo_z)
        eb_r, eb_g, eb_b, pb_m = _bsdf_eval_pdf(
            families, param_b, mtype_b, wil_x, wil_y, wil_z,
            mo_x, mo_y, mo_z)
        one_w = 1.0 - w_mix
        fm_r = w_mix * ea_r + one_w * eb_r
        fm_g = w_mix * ea_g + one_w * eb_g
        fm_b = w_mix * ea_b + one_w * eb_b
        pdf_mix = w_mix * pa_m + one_w * pb_m
        inv_pm = jnp.where(pdf_mix > 1e-12,
                           1.0 / jnp.maximum(pdf_mix, 1e-12), 0.0)
        w_pick = jnp.where(pick_a, w_mix, one_w)
        pdf_delta = w_pick * jnp.where(pick_a, pdf_a, pdf_bb)
        wd_r = jnp.where(pick_a, wa_r, wb_r)
        wd_g = jnp.where(pick_a, wa_g, wb_g)
        wd_b = jnp.where(pick_a, wa_b, wb_b)
        nwx = jnp.where(is_mix, mo_x, ax)
        nwy = jnp.where(is_mix, mo_y, ay)
        nwz = jnp.where(is_mix, mo_z, az)
        w_r = jnp.where(is_mix, jnp.where(d_m, wd_r, fm_r * inv_pm),
                        wa_r)
        w_g = jnp.where(is_mix, jnp.where(d_m, wd_g, fm_g * inv_pm),
                        wa_g)
        w_b = jnp.where(is_mix, jnp.where(d_m, wd_b, fm_b * inv_pm),
                        wa_b)
        pdf_b = jnp.where(is_mix, jnp.where(d_m, pdf_delta, pdf_mix),
                          pdf_a)
        is_delta = (is_mix & d_m) | (~is_mix & d_a)
        eta_ev = jnp.where(is_mix, eta_m, eta_a)
    if MAT_COATING in families or MAT_ROUGH_COATING in families:
        # coating sample (bsdf.py _coating_sample/_roughcoating_sample):
        # Fresnel pick of the coat reflection (delta mirror for smooth,
        # GGX visible-normal lobe for rough) vs the nested child sampled
        # INSIDE the coat and refracted back out (TIR ⇒ dead lane)
        pick_sp = uc0 < fi_c
        u1_n = jnp.clip((uc0 - fi_c) / jnp.maximum(1.0 - fi_c, 1e-6),
                        0.0, 1.0 - 1e-6)
        (ncx, ncy, ncz, cwn_r, cwn_g, cwn_b, cpdf_n, cd_n, _ce) = \
            _bsdf_sample(families, param_a, mtype_a, ci_x, ci_y, ci_z,
                         ub0, ub1, u1_n)
        ox2, oy2 = ncx * c_eta, ncy * c_eta
        sin2_o = ox2 * ox2 + oy2 * oy2
        ctir = sin2_o >= 1.0
        oz2 = jnp.sqrt(jnp.maximum(1.0 - sin2_o, 0.0)) * jnp.sign(ncz)
        fo_s = _fresnel_diel_f(oz2, c_eta)
        spath = 1.0 / jnp.maximum(jnp.abs(ci_z), 1e-4) \
            + 1.0 / jnp.maximum(jnp.abs(ncz), 1e-4)
        t_out = 1.0 - fo_s
        wn_r = cwn_r * jnp.exp(-mat_param(1) * spath) * t_out
        wn_g = cwn_g * jnp.exp(-mat_param(2) * spath) * t_out
        wn_b = cwn_b * jnp.exp(-mat_param(3) * spath) * t_out
        pdf_no = (1.0 - fi_c) * cpdf_n * jnp.abs(oz2) \
            / jnp.maximum(c_eta * c_eta * jnp.abs(ncz), 1e-9)
        ok_n = ~ctir & (cpdf_n > 0.0)
        okf = ok_n.astype(jnp.float32)
        if is_coat is not None:
            nwx = jnp.where(is_coat, jnp.where(pick_sp, -wil_x, ox2),
                            nwx)
            nwy = jnp.where(is_coat, jnp.where(pick_sp, -wil_y, oy2),
                            nwy)
            nwz = jnp.where(is_coat, jnp.where(pick_sp, wil_z, oz2),
                            nwz)
            w_r = jnp.where(is_coat, jnp.where(pick_sp, mat_param(4),
                                               okf * wn_r), w_r)
            w_g = jnp.where(is_coat, jnp.where(pick_sp, mat_param(4),
                                               okf * wn_g), w_g)
            w_b = jnp.where(is_coat, jnp.where(pick_sp, mat_param(4),
                                               okf * wn_b), w_b)
            pdf_b = jnp.where(is_coat, jnp.where(pick_sp, fi_c,
                                                 okf * pdf_no), pdf_b)
            is_delta = (is_coat & (pick_sp | (~pick_sp & cd_n))) \
                | (~is_coat & is_delta)
            eta_ev = jnp.where(is_coat, 1.0, eta_ev)
        if MAT_ROUGH_COATING in families:
            # GGX coat lobe: VNDF micronormal from wil (upper hemi)
            vx, vy, vz = _normalize3(rc_a * wil_x, rc_a * wil_y, wil_z)
            lensq = vx * vx + vy * vy
            inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
            big = lensq > 1e-20
            t1x = jnp.where(big, -vy * inv_len, 1.0)
            t1y = jnp.where(big, vx * inv_len, 0.0)
            t1z = jnp.zeros_like(vx)
            t2x = vy * t1z - vz * t1y
            t2y = vz * t1x - vx * t1z
            t2z = vx * t1y - vy * t1x
            rrs = jnp.sqrt(jnp.maximum(ub0, 0.0))
            phs = 2.0 * np.pi * ub1
            p1 = rrs * jnp.cos(phs)
            p2 = rrs * jnp.sin(phs)
            ssf = 0.5 * (1.0 + vz)
            p2 = (1.0 - ssf) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) \
                + ssf * p2
            p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
            nhx = p1 * t1x + p2 * t2x + p3 * vx
            nhy = p1 * t1y + p2 * t2y + p3 * vy
            nhz = p1 * t1z + p2 * t2z + p3 * vz
            rmx, rmy, rmz = _normalize3(rc_a * nhx, rc_a * nhy,
                                        jnp.maximum(nhz, 1e-6))
            wim_r = wil_x * rmx + wil_y * rmy + wil_z * rmz
            rsx = 2.0 * wim_r * rmx - wil_x
            rsy = 2.0 * wim_r * rmy - wil_y
            rsz = 2.0 * wim_r * rmz - wil_z
            rx_o = jnp.where(pick_sp, rsx, ox2)
            ry_o = jnp.where(pick_sp, rsy, oy2)
            rz_o = jnp.where(pick_sp, rsz, oz2)
            # smooth lanes: full combined eval/pdf across both lobes
            rcf_r, rcf_g, rcf_b, rcp_c = coat_terms(rx_o, ry_o, rz_o)
            rsv, rsp = rc_spec_terms(rx_o, ry_o, rz_o)
            f_all_r = rcf_r + rsv
            f_all_g = rcf_g + rsv
            f_all_b = rcf_b + rsv
            pdf_all = fi_c * rsp + rcp_c
            ipa = jnp.where(pdf_all > 1e-9,
                            1.0 / jnp.maximum(pdf_all, 1e-9), 0.0)
            nested_delta = ~pick_sp & cd_n
            dead = pick_sp & (rsz <= 0.0)
            live = (~dead).astype(jnp.float32)

            def rc_w(f_all, wn):
                smooth_w = f_all * ipa * live
                return jnp.where(nested_delta, okf * wn, smooth_w)

            nwx = jnp.where(is_rc, rx_o, nwx)
            nwy = jnp.where(is_rc, ry_o, nwy)
            nwz = jnp.where(is_rc, rz_o, nwz)
            w_r = jnp.where(is_rc, rc_w(f_all_r, wn_r), w_r)
            w_g = jnp.where(is_rc, rc_w(f_all_g, wn_g), w_g)
            w_b = jnp.where(is_rc, rc_w(f_all_b, wn_b), w_b)
            pdf_b = jnp.where(
                is_rc, jnp.where(nested_delta, okf * pdf_no,
                                 pdf_all * live), pdf_b)
            is_delta = (is_rc & nested_delta) | (~is_rc & is_delta)
            eta_ev = jnp.where(is_rc, 1.0, eta_ev)


    # to world (nwz mirrored back for twosided back-side lanes)
    nwz = nwz * fsgn
    ndx = nwx * sx + nwy * tx_ + nwz * nsx
    ndy = nwx * sy + nwy * ty_ + nwz * nsy
    ndz = nwx * sz + nwy * tz_ + nwz * nsz

    # medium lanes continue with an HG-sampled direction (exact inverse
    # CDF, hg.cpp:79-90 via phase.py hg_sample: frame about -wi = d),
    # weight = eval/pdf = 1
    if medium is not None:
        up0_, up1_ = _rng2(seed, pixel, dim_base + DIM_PHASE, samp)
        if abs(m_g) < 1e-4:
            cos_t = jnp.clip(1.0 - 2.0 * up0_, -1.0, 1.0)
        else:
            sqr = (1.0 - m_g * m_g) / (1.0 - m_g + 2.0 * m_g * up0_)
            cos_t = jnp.clip((1.0 + m_g * m_g - sqr * sqr)
                             / (2.0 * m_g), -1.0, 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phph = jnp.float32(2.0 * np.pi) * up1_
        (psx, psy, psz), (ptx, pty, ptz) = _coordsys(dx, dy, dz)
        sc, ss = sin_t * jnp.cos(phph), sin_t * jnp.sin(phph)
        pwx = sc * psx + ss * ptx + cos_t * dx
        pwy = sc * psy + ss * pty + cos_t * dy
        pwz = sc * psz + ss * ptz + cos_t * dz
        cos_pdf = -(dx * pwx + dy * pwy + dz * pwz)
        den_p = jnp.maximum(1.0 + m_g * m_g + 2.0 * m_g * cos_pdf, 1e-8)
        pdf_ph = inv4pi * (1.0 - m_g * m_g) / (den_p * jnp.sqrt(den_p))
        ndx = jnp.where(in_med, pwx, ndx)
        ndy = jnp.where(in_med, pwy, ndy)
        ndz = jnp.where(in_med, pwz, ndz)
        w_r = jnp.where(in_med, 1.0, w_r)
        w_g = jnp.where(in_med, 1.0, w_g)
        w_b = jnp.where(in_med, 1.0, w_b)
        pdf_b = jnp.where(in_med, pdf_ph, pdf_b)
        is_delta = is_delta & ~in_med
        eta_ev = jnp.where(in_med, 1.0, eta_ev)

    tp_r = tpr * w_r
    tp_g = tpg * w_g
    tp_b = tpb * w_b
    alive = event & (pdf_b > 0.0) \
        & ((tp_r > 0.0) | (tp_g > 0.0) | (tp_b > 0.0))
    if max_depth > 0:
        alive = alive & (depth <= float(max_depth))

    # ---- RR --------------------------------------------------------------
    # eta_scale accumulates the sampled events' relative IOR (identity
    # except on dielectric refraction), matching the XLA path's
    # eta_scale_next = eta_scale * bs.eta BEFORE the RR probability
    eta_scale = jnp.where(event, eta_scale * eta_ev, eta_scale)
    u_rr, _ = _rng2(seed, pixel, dim_base + DIM_RR, samp)
    tp_max = jnp.maximum(jnp.maximum(tp_r, tp_g), tp_b)
    q = jnp.minimum(tp_max * eta_scale * eta_scale, 0.95)
    do_rr = depth >= float(rr_depth)
    rr_cont = jnp.logical_or(~do_rr, u_rr < q)
    rs = jnp.where(do_rr & rr_cont, 1.0 / jnp.maximum(q, 1e-6), 1.0)
    tp_r = tp_r * rs
    tp_g = tp_g * rs
    tp_b = tp_b * rs
    alive = alive & rr_cont

    af = alive.astype(jnp.float32)
    sgn_n = jnp.where(ndx * ngx + ndy * ngy + ndz * ngz >= 0.0, 1.0, -1.0)
    o_nx = px_ + sgn_n * eps_o * ngx
    o_ny = py_ + sgn_n * eps_o * ngy
    o_nz = pz_ + sgn_n * eps_o * ngz
    if medium is not None:
        # medium lanes continue from the scatter point, no offset
        o_nx = jnp.where(in_med, pex, o_nx)
        o_ny = jnp.where(in_med, pey, o_ny)
        o_nz = jnp.where(in_med, pez, o_nz)
    new_rows = (
        o_nx, o_ny, o_nz,
        jnp.where(alive, ndx, dx), jnp.where(alive, ndy, dy),
        jnp.where(alive, ndz, dz),
        tp_r * af, tp_g * af, tp_b * af,
        lr, lg, lb,
        af,
        jnp.where(is_delta, 1.0, pdf_b),
        is_delta.astype(jnp.float32),
        eta_scale,
    )
    return (new_rows, active.astype(jnp.float32),
            (nee_ok & (pdf_nee > 0.0)).astype(jnp.float32))


# ---------------------------------------------------------------------------
# per-bounce / whole-path kernels ([16, B] row states; S = 1 sub-block)
# ---------------------------------------------------------------------------

def _state_to_rows(st):
    return tuple(st[i:i + 1] for i in range(16))


def make_bounce_kernel(tc: int, c_clusters: int, em_count: int,
                       families: tuple, rr_depth: int, max_depth: int,
                       m_real: int, et_real: int, smooth: bool,
                       medium=None, textured=False):
    """Single-bounce kernel (one pallas_call per bounce; kept for
    incremental/debug use — run_path/run_persistent are the fast paths)."""

    def kernel(woop_ref, aabb_ref, attr_ref, mat_ref, em_ref,
               em_meta_ref, pix_ref,
               samp_ref, meta_ref, consts_ref, st_in_ref, st_out_ref):
        consts = tuple(consts_ref[i] for i in range(9))
        woop_h = woop_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else woop_ref
        attr_h = attr_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else attr_ref
        new_rows, s_tr, s_sh = _bounce_rows(
            tc, c_clusters, families, rr_depth, max_depth, m_real,
            et_real, em_count, smooth, woop_h, aabb_ref, attr_h,
            mat_ref, em_ref, em_meta_ref, consts, pix_ref[:],
            samp_ref[:], meta_ref[0], meta_ref[2],
            _state_to_rows(st_in_ref[:]), medium=medium,
            textured=textured)
        st_out_ref[:] = jnp.concatenate(list(new_rows) + [s_tr, s_sh],
                                        axis=0)

    return kernel


def make_path_kernel(tc: int, c_clusters: int, em_count: int,
                     families: tuple, rr_depth: int, max_depth: int,
                     m_real: int, et_real: int, smooth: bool,
                     n_bounces: int, medium=None, textured=False):
    """Whole-path megakernel: the ENTIRE bounce loop runs inside one Pallas
    program. Path state lives in VMEM/vector registers for all bounces —
    zero inter-bounce HBM traffic, one dispatch per render pass — and the
    loop exits early once every lane in the block is dead."""

    def kernel(woop_ref, aabb_ref, attr_ref, mat_ref, em_ref,
               em_meta_ref, pix_ref,
               samp_ref, meta_ref, consts_ref, st_in_ref, st_out_ref):
        consts = tuple(consts_ref[i] for i in range(9))
        woop_h = woop_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else woop_ref
        attr_h = attr_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else attr_ref
        pixel = pix_ref[:]
        samp = samp_ref[:]
        seed = meta_ref[0]
        st0 = st_in_ref[:]
        b = st0.shape[1]
        z = jnp.zeros((1, b))

        def cond(carry):
            i, st, _, _ = carry
            any_alive = jnp.sum(st[12:13]) > 0.0
            return (i < n_bounces) & any_alive

        def body(carry):
            i, st, s0, s1 = carry
            new_rows, t0, t1 = _bounce_rows(
                tc, c_clusters, families, rr_depth, max_depth, m_real,
                et_real, em_count, smooth, woop_h, aabb_ref, attr_h,
                mat_ref, em_ref, em_meta_ref, consts, pixel, samp,
                seed, i, _state_to_rows(st), medium=medium,
                textured=textured)
            return i + 1, jnp.concatenate(new_rows, axis=0), s0 + t0, \
                s1 + t1

        _, st, s0, s1 = jax.lax.while_loop(
            cond, body, (jnp.int32(0), st0, z, z))
        st_out_ref[:] = jnp.concatenate([st, s0, s1], axis=0)

    return kernel


N_STATE = 16
N_OUT = 18


def _table_specs(tables: MegaTables):
    """woop/attr in VMEM (trace + one-hot matmul), mat/em in SMEM
    (broadcast-scalar select chains)."""
    full = lambda shape: pl.BlockSpec(shape, lambda *a: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return [
        full(tables.woop.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),    # cluster aabbs
        full(tables.attr.shape),
        pl.BlockSpec(memory_space=pltpu.SMEM),    # mat
        pl.BlockSpec(memory_space=pltpu.SMEM),    # em rows
        pl.BlockSpec(memory_space=pltpu.SMEM),    # em meta
    ]


@functools.partial(jax.jit,
                   static_argnames=("tables", "families", "rr_depth",
                                    "max_depth", "block", "medium"))
def run_bounce(tables: MegaTables, families, rr_depth, max_depth,
               meta_consts, state, pixel, samp, meta_u32,
               block=DEF_BLOCK, medium=None):
    """One fused bounce over the wavefront.

    state: [16, Npad]; pixel/samp [1, Npad] int32; meta_u32 [4] int32
    (seed, _, bounce); meta_consts: [12] f32 scene scalars.
    Returns [18, Npad] (16 new state rows + 2 stats rows).
    """
    n = state.shape[1]
    c_clusters = tables.woop.shape[0]
    kernel = make_bounce_kernel(tables.tc, c_clusters, tables.em_count,
                                families, rr_depth, max_depth,
                                tables.m_real, tables.et_real,
                                tables.smooth, medium=medium,
                                textured=tables.textured)
    grid = (n // block,)
    col = lambda rows: pl.BlockSpec((rows, block), lambda r: (0, r),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_table_specs(tables) + [
            col(1),                                   # pixel
            col(1),                                   # samp
            pl.BlockSpec(memory_space=pltpu.SMEM),    # meta_u32
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scene consts
            col(N_STATE),
        ],
        out_specs=col(N_OUT),
        out_shape=jax.ShapeDtypeStruct((N_OUT, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(tables.woop, tables.aabb, tables.attr, tables.mat, tables.em_rows,
      tables.em_meta, pixel, samp, meta_u32,
      jnp.asarray(meta_consts, jnp.float32), state)
    return out


@functools.partial(jax.jit,
                   static_argnames=("tables", "families", "rr_depth",
                                    "max_depth", "n_bounces", "block",
                                    "medium"))
def run_path(tables: MegaTables, families, rr_depth, max_depth, n_bounces,
             meta_consts, state, pixel, samp, meta_u32, block=DEF_BLOCK,
             medium=None):
    """Full path trace in ONE fused kernel (all bounces, early exit).

    Same inputs as run_bounce minus the per-bounce meta; returns
    [18, Npad] — final state rows + summed trace/shadow stats rows."""
    n = state.shape[1]
    c_clusters = tables.woop.shape[0]
    kernel = make_path_kernel(tables.tc, c_clusters, tables.em_count,
                              families, rr_depth, max_depth,
                              tables.m_real, tables.et_real,
                              tables.smooth, n_bounces, medium=medium,
                              textured=tables.textured)
    grid = (n // block,)
    col = lambda rows: pl.BlockSpec((rows, block), lambda r: (0, r),
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_table_specs(tables) + [
            col(1),                                   # pixel
            col(1),                                   # samp
            pl.BlockSpec(memory_space=pltpu.SMEM),    # meta_u32
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scene consts
            col(N_STATE),
        ],
        out_specs=col(N_OUT),
        out_shape=jax.ShapeDtypeStruct((N_OUT, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(tables.woop, tables.aabb, tables.attr, tables.mat, tables.em_rows,
      tables.em_meta, pixel, samp, meta_u32,
      jnp.asarray(meta_consts, jnp.float32), state)
    return out


# ---------------------------------------------------------------------------
# in-kernel BSDF families (diffuse / conductor / rough-conductor GGX)
# ---------------------------------------------------------------------------
# mat_param(j) returns the [S, B] broadcast of material-parameter row j
# selected per lane (SMEM scalar select chain).

def _rd_terms(mat_param, wix, wiy, wiz, wox, woy, woz):
    """Rough-dielectric (Walter 2007, isotropic GGX, visible-normal
    sampling) shared eval/pdf terms for a (wi, wo) pair — mirrors
    bsdf.py roughdielectric_eval/_pdf (ref: src/bsdfs/
    roughdielectric.cpp). The micronormal is RE-DERIVED from (wi, wo)
    exactly as the XLA path does, so sample-weight parity holds.

    Returns (vs, refl, pdf, ok): vs = scalar f·|cosθo| before the
    spec_r/spec_t tint, refl = reflection-side mask, pdf = solid-angle
    pdf of the visible-normal sampler, ok = chirality/validity mask."""
    eta = jnp.maximum(mat_param(0), 1e-3)
    a = jnp.maximum(mat_param(9), 1e-4)
    ci, co = wiz, woz
    refl = ci * co > 0.0
    eta_it_w = jnp.where(ci > 0.0, eta, 1.0 / eta)
    mrx, mry, mrz = _normalize3(wix + wox, wiy + woy, wiz + woz)
    mtx, mty, mtz = _normalize3(wix + eta_it_w * wox,
                                wiy + eta_it_w * woy,
                                wiz + eta_it_w * woz)
    mx = jnp.where(refl, mrx, mtx)
    my = jnp.where(refl, mry, mty)
    mz = jnp.where(refl, mrz, mtz)
    sgn_m = jnp.where(mz >= 0.0, 1.0, -1.0)
    mx, my, mz = mx * sgn_m, my * sgn_m, mz * sgn_m
    wim = wix * mx + wiy * my + wiz * mz
    wom = wox * mx + woy * my + woz * mz
    # fresnel_dielectric(wim, eta) — signed incidence (core/fresnel.py)
    outs = wim >= 0.0
    eta_itm = jnp.where(outs, eta, 1.0 / eta)
    eta_tim = 1.0 / eta_itm
    cia = jnp.abs(wim)
    sin_t2 = eta_tim * eta_tim * (1.0 - cia * cia)
    tir = sin_t2 >= 1.0
    cts = jnp.where(tir, 0.0, jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12)))
    rs_ = (cia - eta_itm * cts) / jnp.maximum(cia + eta_itm * cts, 1e-4)
    rp_ = (eta_itm * cia - cts) / jnp.maximum(eta_itm * cia + cts, 1e-4)
    fre = jnp.where(tir, 1.0, 0.5 * (rs_ * rs_ + rp_ * rp_))
    d_ndf = _ggx_d(mx, my, mz, a)
    g_both = _ggx_g1(wix, wiy, wiz, mx, my, mz, a) \
        * _ggx_g1(wox, woy, woz, mx, my, mz, a)
    val_r = fre * d_ndf * g_both / jnp.maximum(4.0 * jnp.abs(ci), 1e-7)
    den_t = (wim + eta_itm * wom) ** 2
    val_t = (1.0 - fre) * d_ndf * g_both * jnp.abs(wim * wom) \
        / jnp.maximum(jnp.abs(ci) * den_t, 1e-7)
    vs = jnp.where(refl, val_r, val_t)
    # pdf_visible(wi·side, m): G1(wi_up, m)·|wi·m|·D/|cosθi|
    sw = jnp.where(wiz >= 0.0, 1.0, -1.0)
    g1up = _ggx_g1(wix * sw, wiy * sw, wiz * sw, mx, my, mz, a)
    pdf_m = g1up * jnp.abs(wim) * d_ndf / jnp.maximum(jnp.abs(wiz),
                                                      1e-12)
    jac_r = 1.0 / jnp.maximum(4.0 * jnp.abs(wom), 1e-7)
    jac_t = jnp.abs(wom) * eta_itm * eta_itm / jnp.maximum(den_t, 1e-7)
    pdf = pdf_m * jnp.where(refl, fre * jac_r, (1.0 - fre) * jac_t)
    # no bool-valued select: Mosaic can't truncate i8 vectors to i1
    chir = (refl & (wim * wom > 0.0)) | (~refl & (wim * wom < 0.0))
    ok = (jnp.abs(ci) > 1e-7) & chir
    return vs, refl, pdf, ok


def _rp_terms(mat_param, wix, wiy, wiz, wox, woy, woz):
    """Rough-plastic f·cosθo (rgb) + pdf at a (wi, wo) pair — mirrors
    bsdf.py roughplastic_eval/_pdf (ref: src/bsdfs/roughplastic.cpp):
    GGX specular lobe + diffuse base seen through the rough interface
    (T12·T21 from the per-material rtrans slice rows, α-dependent
    internal Fdr). Caller masks by family + hemisphere validity."""
    eta = jnp.maximum(mat_param(0), 1e-3)
    a = jnp.maximum(mat_param(9), 1e-4)
    hx, hy, hz = _normalize3(wix + wox, wiy + woy, wiz + woz)
    wih = wix * hx + wiy * hy + wiz * hz
    fm = _fresnel_diel_f(wih, eta)
    d_h = _ggx_d(hx, hy, hz, a)
    g1i = _ggx_g1(wix, wiy, wiz, hx, hy, hz, a)
    g1o = _ggx_g1(wox, woy, woz, hx, hy, hz, a)
    spec_base = fm * d_h * g1i * g1o / jnp.maximum(4.0 * wiz, 1e-7)

    c0 = mat_param(RTROW + 1 + RT_KNOTS)
    c1 = mat_param(RTROW + 2 + RT_KNOTS)
    inv_span = float(RT_KNOTS - 1) / jnp.maximum(c1 - c0, 1e-6)
    rows = [mat_param(RTROW + 1 + k) for k in range(RT_KNOTS)]

    def rt_interp(ct):
        xx = (jnp.clip(ct, c0, c1) - c0) * inv_span
        i0 = jnp.clip(jnp.floor(xx), 0.0, float(RT_KNOTS - 2))
        fcv = xx - i0
        v = rows[0] * (1.0 - fcv) + rows[1] * fcv
        for k in range(1, RT_KNOTS - 1):
            vk = rows[k] * (1.0 - fcv) + rows[k + 1] * fcv
            v = jnp.where(i0 == float(k), vk, v)
        return v

    t12 = rt_interp(wiz)
    t21 = rt_interp(woz)
    fdr = mat_param(RTROW)
    inv_eta2 = 1.0 / (eta * eta)
    base_d = INV_PI * t12 * t21 * jnp.maximum(woz, 0.0)
    nonlin = mat_param(7) > 0.5
    fs = []
    for ch in range(3):
        kd = mat_param(1 + ch)
        ks = mat_param(4 + ch)
        den = jnp.where(nonlin, 1.0 - kd * fdr, 1.0 - fdr)
        fs.append(ks * spec_base
                  + kd * inv_eta2 / jnp.maximum(den, 1e-4) * base_d)
    fi = _fresnel_diel_f(wiz, eta)
    prob_s = jnp.clip(fi, 0.25, 0.9)
    pdf_h = g1i * jnp.abs(wih) * d_h / jnp.maximum(wiz, 1e-12)
    woh = wox * hx + woy * hy + woz * hz
    pdf_s = pdf_h / jnp.maximum(4.0 * jnp.abs(woh), 1e-7)
    pdf_d = jnp.maximum(woz, 0.0) * INV_PI
    pdf = prob_s * pdf_s + (1.0 - prob_s) * pdf_d
    return fs[0], fs[1], fs[2], pdf, prob_s


def _leadr_terms(mat_param, wix, wiy, wiz, wox, woy, woz):
    """LEADR anisotropic rough diffuse scalar radiance factor (bsdf.py
    anisoroughdiffuse_eval; ref: src/bsdfs/aniso_roughdiffuse.cpp):
    deterministic 4-point unscented quadrature over the slope Gaussian
    with moments-derived Smith G2. Returns (scale, extra-valid mask);
    f·cosθo = albedo · scale on valid lanes."""
    mux, muy = mat_param(3), mat_param(4)
    sx2 = jnp.maximum(mat_param(5) - mux * mux, 1e-8)
    sy2 = jnp.maximum(mat_param(6) - muy * muy, 1e-8)
    cxy = mat_param(7) - mux * muy
    use_vis = mat_param(11) > 0.5
    ml = jax.lax.rsqrt(mux * mux + muy * muy + 1.0)
    mnx, mny, mnz = -mux * ml, -muy * ml, ml
    win = wix * mnx + wiy * mny + wiz * mnz

    def lam(wx, wy, wz):
        st = jnp.sqrt(jnp.maximum(1.0 - wz * wz, 0.0))
        st_s = jnp.maximum(st, 1e-7)
        cphi, sphi = wx / st_s, wy / st_s
        cot = wz / st_s
        mu_phi = cphi * mux + sphi * muy
        s2phi = jnp.maximum(cphi * cphi * sx2 + sphi * sphi * sy2
                            + 2.0 * cphi * sphi * cxy, 1e-12)
        v = (cot - mu_phi) / jnp.sqrt(2.0 * s2phi)
        lm = jnp.where(
            v < 0.0, 1e8,
            jnp.where(v < 1.6,
                      (1.0 - 1.259 * v + 0.396 * v * v)
                      / jnp.maximum(3.535 * v + 2.181 * v * v, 1e-12),
                      0.0))
        return jnp.where(st < 1e-6, 0.0, lm)

    g2 = 1.0 / (1.0 + lam(wix, wiy, wiz) + lam(wox, woy, woz))
    l11 = jnp.sqrt(sx2)
    l21 = cxy / l11
    l22 = jnp.sqrt(jnp.maximum(sy2 - l21 * l21, 1e-12))
    r = 0.0
    s2c = float(np.sqrt(2.0))
    for (z0, z1) in ((s2c, 0.0), (-s2c, 0.0), (0.0, s2c), (0.0, -s2c)):
        sx = mux + l11 * z0
        sy = muy + l21 * z0 + l22 * z1
        il = jax.lax.rsqrt(sx * sx + sy * sy + 1.0)
        wmx, wmy, wmz = -sx * il, -sy * il, il
        di = jnp.maximum(wmx * wix + wmy * wiy + wmz * wiz, 0.0)
        do = jnp.maximum(wmx * wox + wmy * woy + wmz * woz, 0.0)
        term = di * do / wmz
        term = jnp.where(use_vis & (di > 1e-7) & (do > 1e-7), term * g2,
                         jnp.where(use_vis, 0.0, term))
        r = r + 0.25 * term
    scale = INV_PI * mnz / jnp.maximum(win, 1e-7) * r
    return scale, win > 0.0


def _bsdf_eval_pdf(families, mat_param, mtype, wix, wiy, wiz,
                   wox, woy, woz):
    """f·cosθo (rgb) + solid-angle pdf for the smooth component."""
    f_r = jnp.zeros_like(wix)
    f_g = jnp.zeros_like(wix)
    f_b = jnp.zeros_like(wix)
    pdf = jnp.zeros_like(wix)
    valid = (wiz > 0.0) & (woz > 0.0)
    if MAT_DIFFUSE in families:
        sel = (mtype == float(MAT_DIFFUSE)) & valid
        s = sel.astype(jnp.float32)
        f_r = f_r + s * mat_param(0) * INV_PI * woz
        f_g = f_g + s * mat_param(1) * INV_PI * woz
        f_b = f_b + s * mat_param(2) * INV_PI * woz
        pdf = pdf + s * woz * INV_PI
    if MAT_ROUGH_CONDUCTOR in families:
        sel = (mtype == float(MAT_ROUGH_CONDUCTOR)) & valid
        s = sel.astype(jnp.float32)
        hx, hy, hz = _normalize3(wix + wox, wiy + woy, wiz + woz)
        a = jnp.maximum(mat_param(9), 1e-4)
        d_ndf = _ggx_d(hx, hy, hz, a)
        g1i = _ggx_g1(wix, wiy, wiz, hx, hy, hz, a)
        g1o = _ggx_g1(wox, woy, woz, hx, hy, hz, a)
        wim = wix * hx + wiy * hy + wiz * hz
        fr_r, fr_g, fr_b = _fresnel_cond(mat_param, jnp.abs(wim))
        base = d_ndf * g1i * g1o / jnp.maximum(4.0 * wiz, 1e-7)
        f_r = f_r + s * fr_r * mat_param(6) * base
        f_g = f_g + s * fr_g * mat_param(7) * base
        f_b = f_b + s * fr_b * mat_param(8) * base
        pdf_h = g1i * jnp.abs(wim) * d_ndf / jnp.maximum(wiz, 1e-12)
        pdf = pdf + s * pdf_h / jnp.maximum(
            4.0 * jnp.abs(wox * hx + woy * hy + woz * hz), 1e-7)
    if MAT_ANISO_ROUGHDIFFUSE in families:
        sel = (mtype == float(MAT_ANISO_ROUGHDIFFUSE)) & valid
        sc_l, vl = _leadr_terms(mat_param, wix, wiy, wiz,
                                wox, woy, woz)
        s = (sel & vl).astype(jnp.float32)
        f_r = f_r + s * mat_param(0) * sc_l
        f_g = f_g + s * mat_param(1) * sc_l
        f_b = f_b + s * mat_param(2) * sc_l
        pdf = pdf + sel.astype(jnp.float32) * woz * INV_PI
    if MAT_ROUGH_PLASTIC in families:
        sel = (mtype == float(MAT_ROUGH_PLASTIC)) & valid
        s = sel.astype(jnp.float32)
        rp_r, rp_g, rp_b, rp_pdf, _pr = _rp_terms(
            mat_param, wix, wiy, wiz, wox, woy, woz)
        f_r = f_r + s * rp_r
        f_g = f_g + s * rp_g
        f_b = f_b + s * rp_b
        pdf = pdf + s * rp_pdf
    if MAT_ROUGH_DIELECTRIC in families:
        # Walter rough glass: reflection + transmission lobes, two-sided
        sel = mtype == float(MAT_ROUGH_DIELECTRIC)
        vs, refl_rd, pdf_rd, ok_rd = _rd_terms(
            mat_param, wix, wiy, wiz, wox, woy, woz)
        s = (sel & ok_rd).astype(jnp.float32)
        f_r = f_r + s * vs * jnp.where(refl_rd, mat_param(1),
                                       mat_param(4))
        f_g = f_g + s * vs * jnp.where(refl_rd, mat_param(2),
                                       mat_param(5))
        f_b = f_b + s * vs * jnp.where(refl_rd, mat_param(3),
                                       mat_param(6))
        pdf = pdf + s * pdf_rd
    if MAT_ROUGH_DIFFUSE in families:
        # Oren-Nayar (mirrors bsdf.py roughdiffuse_eval)
        sel = (mtype == float(MAT_ROUGH_DIFFUSE)) & valid
        s = sel.astype(jnp.float32)
        sigma = mat_param(9) * 0.70711
        sigma2 = sigma * sigma
        a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
        bb = 0.45 * sigma2 / (sigma2 + 0.09)
        st_i = jnp.sqrt(jnp.maximum(1.0 - wiz * wiz, 0.0))
        st_o = jnp.sqrt(jnp.maximum(1.0 - woz * woz, 0.0))
        denom = jnp.maximum(st_i * st_o, 1e-7)
        cos_dphi = jnp.clip((wix * wox + wiy * woy) / denom, -1.0, 1.0)
        sin_alpha = jnp.maximum(st_i, st_o)
        tan_beta = jnp.minimum(st_i / jnp.maximum(wiz, 1e-7),
                               st_o / jnp.maximum(woz, 1e-7))
        on = (a + bb * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta) \
            * INV_PI * jnp.maximum(woz, 0.0)
        f_r = f_r + s * mat_param(0) * on
        f_g = f_g + s * mat_param(1) * on
        f_b = f_b + s * mat_param(2) * on
        pdf = pdf + s * woz * INV_PI
    if MAT_PLASTIC in families:
        # smooth plastic's diffuse term (mirrors bsdf.py plastic_eval)
        sel = (mtype == float(MAT_PLASTIC)) & valid
        s = sel.astype(jnp.float32)
        eta = jnp.maximum(mat_param(0), 1e-3)
        fi = _fresnel_diel_f(wiz, eta)
        fo = _fresnel_diel_f(woz, eta)
        fdr_int = _fdr(1.0 / eta)
        inv_eta2 = 1.0 / (eta * eta)
        nonlin = mat_param(7) > 0.5
        base = INV_PI * (1.0 - fi) * (1.0 - fo) * jnp.maximum(woz, 0.0)
        for ch, acc in ((0, "r"), (1, "g"), (2, "b")):
            kd = mat_param(1 + ch)
            den = jnp.where(nonlin, 1.0 - kd * fdr_int, 1.0 - fdr_int)
            dw = kd * inv_eta2 / jnp.maximum(den, 1e-4)
            if ch == 0:
                f_r = f_r + s * dw * base
            elif ch == 1:
                f_g = f_g + s * dw * base
            else:
                f_b = f_b + s * dw * base
        pdf = pdf + s * woz * INV_PI * (1.0 - fi)
    if MAT_PHONG in families:
        sel = (mtype == float(MAT_PHONG)) & valid
        s = sel.astype(jnp.float32)
        nexp = mat_param(6)
        ct_o = jnp.maximum(woz, 0.0)
        # dot(reflect(wi), wo) with reflect = (-x, -y, z)
        alpha = jnp.maximum(-wix * wox - wiy * woy + wiz * woz, 1e-7)
        an = _powf(alpha, nexp)
        glossy = (nexp + 2.0) * (0.5 * INV_PI) * an * ct_o
        diff = INV_PI * ct_o
        f_r = f_r + s * (mat_param(3) * glossy + mat_param(0) * diff)
        f_g = f_g + s * (mat_param(4) * glossy + mat_param(1) * diff)
        f_b = f_b + s * (mat_param(5) * glossy + mat_param(2) * diff)
        sd = jnp.maximum(jnp.maximum(mat_param(0), mat_param(1)),
                         mat_param(2))
        ss = jnp.maximum(jnp.maximum(mat_param(3), mat_param(4)),
                         mat_param(5))
        prob_s = ss / jnp.maximum(sd + ss, 1e-7)
        pdf_s = (nexp + 1.0) * (0.5 * INV_PI) * an
        pdf = pdf + s * (prob_s * pdf_s + (1.0 - prob_s) * woz * INV_PI)
    if MAT_WARD in families:
        sel = (mtype == float(MAT_WARD)) & valid
        s = sel.astype(jnp.float32)
        au = jnp.maximum(mat_param(9), 1e-3)
        av = jnp.maximum(mat_param(10), 1e-3)
        hx, hy, hz = wix + wox, wiy + woy, wiz + woz
        ex = -((hx / au) ** 2 + (hy / av) ** 2) \
            / jnp.maximum(hz * hz, 1e-12)
        # max(·,0) inside the sqrt: wiz·woz < 0 on invalid lanes would
        # give sqrt(NaN), and NaN×0 leaks through the select chain
        spec = (jnp.exp(ex) / (4.0 * np.pi * au * av
                               * jnp.maximum(
                                   jnp.sqrt(jnp.maximum(wiz * woz, 0.0)),
                                   1e-6)))
        f_r = f_r + s * (mat_param(0) * INV_PI * woz
                         + mat_param(3) * spec * woz)
        f_g = f_g + s * (mat_param(1) * INV_PI * woz
                         + mat_param(4) * spec * woz)
        f_b = f_b + s * (mat_param(2) * INV_PI * woz
                         + mat_param(5) * spec * woz)
        # pdf uses the NORMALIZED half vector (bsdf.py ward_pdf)
        hnx, hny, hnz = _normalize3(hx, hy, hz)
        exn = -((hnx / au) ** 2 + (hny / av) ** 2) \
            / jnp.maximum(hnz * hnz, 1e-12)
        pdf_h = jnp.exp(exn) / (np.pi * au * av
                                * jnp.maximum(hnz * hnz * hnz, 1e-6))
        pdf_s = pdf_h / jnp.maximum(
            4.0 * jnp.abs(wox * hnx + woy * hny + woz * hnz), 1e-6)
        sd = jnp.maximum(jnp.maximum(mat_param(0), mat_param(1)),
                         mat_param(2))
        ss = jnp.maximum(jnp.maximum(mat_param(3), mat_param(4)),
                         mat_param(5))
        prob_s = ss / jnp.maximum(sd + ss, 1e-7)
        pdf = pdf + s * (prob_s * pdf_s + (1.0 - prob_s) * woz * INV_PI)
    if MAT_DIFFTRANS in families:
        # opposite-hemisphere validity (bsdf.py difftrans_eval)
        sel = (mtype == float(MAT_DIFFTRANS)) & (wiz * woz < 0.0)
        s = sel.astype(jnp.float32)
        awz = jnp.abs(woz)
        f_r = f_r + s * mat_param(0) * INV_PI * awz
        f_g = f_g + s * mat_param(1) * INV_PI * awz
        f_b = f_b + s * mat_param(2) * INV_PI * awz
        pdf = pdf + s * awz * INV_PI
    return f_r, f_g, f_b, pdf


def _ggx_d(hx, hy, hz, a):
    t = (hx / a) ** 2 + (hy / a) ** 2 + hz * hz
    d = 1.0 / (np.pi * a * a * jnp.maximum(t * t, 1e-12))
    return jnp.where(hz > 0.0, d, 0.0)


def _ggx_g1(vx, vy, vz, hx, hy, hz, a):
    tan2 = jnp.maximum(1.0 - vz * vz, 0.0) / jnp.maximum(vz * vz, 1e-12)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + a * a * tan2))
    g = jnp.where(tan2 < 1e-12, 1.0, g)
    back = (vx * hx + vy * hy + vz * hz) * vz <= 0.0
    return jnp.where(back, 0.0, g)


def _fresnel_cond(mat_param, ci):
    out = []
    c2 = ci * ci
    s2 = 1.0 - c2
    for ch in range(3):
        e = mat_param(0 + ch)
        k = mat_param(3 + ch)
        e2, k2 = e * e, k * k
        t0 = e2 - k2 - s2
        a2pb2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 1e-12))
        t1 = a2pb2 + c2
        a = jnp.sqrt(jnp.maximum(0.5 * (a2pb2 + t0), 1e-12))
        t2 = 2.0 * a * ci
        rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-6)
        t3 = c2 * a2pb2 + s2 * s2
        t4 = t2 * s2
        rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-6)
        out.append(0.5 * (rp + rs))
    return out[0], out[1], out[2]


def _bsdf_sample(families, mat_param, mtype, wix, wiy, wiz, u0, u1, uc):
    """Returns (wo_local xyz, weight rgb, pdf, is_delta, eta_event).
    eta_event is the relative-IOR factor of the sampled event (1 except
    for dielectric refraction) — multiplies the path's eta_scale for RR
    (path.cpp:278-289 via integrator/path.py eta_scale_next)."""
    zero = jnp.zeros_like(wix)
    nwx, nwy, nwz = zero, zero, zero + 1.0
    w_r, w_g, w_b = zero, zero, zero
    pdf = zero
    is_delta = zero > 1.0
    eta_event = zero + 1.0

    # cosine-hemisphere candidate shared by the diffuse-class lobes
    need_cos = bool(MEGA_COS_FAMILIES & set(families))
    if need_cos:
        sxd, syd, szd = _cosine_hemisphere(u0, u1)

    if MAT_DIFFUSE in families:
        sel = mtype == float(MAT_DIFFUSE)
        ok = wiz > 0.0
        s = (sel & ok).astype(jnp.float32)
        nwx = jnp.where(sel, sxd, nwx)
        nwy = jnp.where(sel, syd, nwy)
        nwz = jnp.where(sel, szd, nwz)
        w_r = jnp.where(sel, s * mat_param(0), w_r)
        w_g = jnp.where(sel, s * mat_param(1), w_g)
        w_b = jnp.where(sel, s * mat_param(2), w_b)
        pdf = jnp.where(sel, s * szd * INV_PI, pdf)

    if MAT_ANISO_ROUGHDIFFUSE in families:
        # cosine sample, weight = f/pdf (anisoroughdiffuse_sample)
        sel = mtype == float(MAT_ANISO_ROUGHDIFFUSE)
        sc_l, vl = _leadr_terms(mat_param, wix, wiy, wiz,
                                sxd, syd, szd)
        ok = (wiz > 0.0) & (szd > 0.0) & vl
        pdf_c = szd * INV_PI
        s = (sel & ok).astype(jnp.float32)
        inv_pc = 1.0 / jnp.maximum(pdf_c, 1e-6)
        nwx = jnp.where(sel, sxd, nwx)
        nwy = jnp.where(sel, syd, nwy)
        nwz = jnp.where(sel, szd, nwz)
        w_r = jnp.where(sel, s * mat_param(0) * sc_l * inv_pc, w_r)
        w_g = jnp.where(sel, s * mat_param(1) * sc_l * inv_pc, w_g)
        w_b = jnp.where(sel, s * mat_param(2) * sc_l * inv_pc, w_b)
        pdf = jnp.where(sel,
                        ((wiz > 0.0) & (szd > 0.0)).astype(jnp.float32)
                        * pdf_c, pdf)

    if MAT_CONDUCTOR in families:
        sel = mtype == float(MAT_CONDUCTOR)
        ok = wiz > 0.0
        s = (sel & ok).astype(jnp.float32)
        fr_r, fr_g, fr_b = _fresnel_cond(mat_param, jnp.maximum(wiz, 0.0))
        nwx = jnp.where(sel, -wix, nwx)
        nwy = jnp.where(sel, -wiy, nwy)
        nwz = jnp.where(sel, wiz, nwz)
        w_r = jnp.where(sel, s * fr_r * mat_param(6), w_r)
        w_g = jnp.where(sel, s * fr_g * mat_param(7), w_g)
        w_b = jnp.where(sel, s * fr_b * mat_param(8), w_b)
        pdf = jnp.where(sel, s, pdf)
        is_delta = is_delta | (sel & ok)

    if MAT_ROUGH_CONDUCTOR in families:
        sel = mtype == float(MAT_ROUGH_CONDUCTOR)
        a = jnp.maximum(mat_param(9), 1e-4)
        # GGX VNDF (Heitz 2018), mirrors microfacet.py
        vx, vy, vz = _normalize3(a * wix, a * wiy, wiz)
        lensq = vx * vx + vy * vy
        inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
        big = lensq > 1e-20
        t1x = jnp.where(big, -vy * inv_len, 1.0)
        t1y = jnp.where(big, vx * inv_len, 0.0)
        t1z = jnp.zeros_like(vx)
        t2x = vy * t1z - vz * t1y
        t2y = vz * t1x - vx * t1z
        t2z = vx * t1y - vy * t1x
        rr = jnp.sqrt(jnp.maximum(u0, 0.0))
        ph = 2.0 * np.pi * u1
        p1 = rr * jnp.cos(ph)
        p2 = rr * jnp.sin(ph)
        ss = 0.5 * (1.0 + vz)
        p2 = (1.0 - ss) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) \
            + ss * p2
        p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
        nhx = p1 * t1x + p2 * t2x + p3 * vx
        nhy = p1 * t1y + p2 * t2y + p3 * vy
        nhz = p1 * t1z + p2 * t2z + p3 * vz
        mx, my, mz = _normalize3(a * nhx, a * nhy,
                                 jnp.maximum(nhz, 1e-6))
        wim = wix * mx + wiy * my + wiz * mz
        rx = 2.0 * wim * mx - wix
        ry = 2.0 * wim * my - wiy
        rz = 2.0 * wim * mz - wiz
        d_ndf = _ggx_d(mx, my, mz, a)
        g1i = _ggx_g1(wix, wiy, wiz, mx, my, mz, a)
        g1o = _ggx_g1(rx, ry, rz, mx, my, mz, a)
        pdf_h = g1i * jnp.abs(wim) * d_ndf / jnp.maximum(wiz, 1e-12)
        pdf_c = pdf_h / jnp.maximum(
            4.0 * jnp.abs(rx * mx + ry * my + rz * mz), 1e-7)
        fr_r, fr_g, fr_b = _fresnel_cond(mat_param, jnp.abs(wim))
        ok = (wiz > 1e-7) & (rz > 1e-7) & (pdf_c > 0.0)
        s = (sel & ok).astype(jnp.float32)
        nwx = jnp.where(sel, rx, nwx)
        nwy = jnp.where(sel, ry, nwy)
        nwz = jnp.where(sel, rz, nwz)
        w_r = jnp.where(sel, s * fr_r * mat_param(6) * g1o, w_r)
        w_g = jnp.where(sel, s * fr_g * mat_param(7) * g1o, w_g)
        w_b = jnp.where(sel, s * fr_b * mat_param(8) * g1o, w_b)
        pdf = jnp.where(sel, s * pdf_c, pdf)

    if MAT_ROUGH_DIFFUSE in families:
        # Oren-Nayar: cosine sample, weight = f/pdf (roughdiffuse_sample)
        sel = mtype == float(MAT_ROUGH_DIFFUSE)
        okz = (wiz > 0.0) & (szd > 0.0)
        sigma = mat_param(9) * 0.70711
        sigma2 = sigma * sigma
        a = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
        bb = 0.45 * sigma2 / (sigma2 + 0.09)
        st_i = jnp.sqrt(jnp.maximum(1.0 - wiz * wiz, 0.0))
        st_o = jnp.sqrt(jnp.maximum(1.0 - szd * szd, 0.0))
        denom = jnp.maximum(st_i * st_o, 1e-7)
        cos_dphi = jnp.clip((wix * sxd + wiy * syd) / denom, -1.0, 1.0)
        sin_alpha = jnp.maximum(st_i, st_o)
        tan_beta = jnp.minimum(st_i / jnp.maximum(wiz, 1e-7),
                               st_o / jnp.maximum(szd, 1e-7))
        # f/pdf: the (1/π)·cosθo factors cancel against the cosine pdf
        on = a + bb * jnp.maximum(cos_dphi, 0.0) * sin_alpha * tan_beta
        s = (sel & okz).astype(jnp.float32)
        nwx = jnp.where(sel, sxd, nwx)
        nwy = jnp.where(sel, syd, nwy)
        nwz = jnp.where(sel, szd, nwz)
        w_r = jnp.where(sel, s * mat_param(0) * on, w_r)
        w_g = jnp.where(sel, s * mat_param(1) * on, w_g)
        w_b = jnp.where(sel, s * mat_param(2) * on, w_b)
        pdf = jnp.where(sel, (sel & (wiz > 0.0)).astype(jnp.float32)
                        * szd * INV_PI, pdf)

    if MAT_PLASTIC in families:
        # delta coat over diffuse (bsdf.py plastic_sample)
        sel = mtype == float(MAT_PLASTIC)
        eta = jnp.maximum(mat_param(0), 1e-3)
        fi = _fresnel_diel_f(wiz, eta)
        pick_spec = uc < fi
        pwx = jnp.where(pick_spec, -wix, sxd)
        pwy = jnp.where(pick_spec, -wiy, syd)
        pwz = jnp.where(pick_spec, wiz, szd)
        fo = _fresnel_diel_f(pwz, eta)
        fdr_int = _fdr(1.0 / eta)
        inv_eta2 = 1.0 / (eta * eta)
        nonlin = mat_param(7) > 0.5
        dfac = (1.0 - fi) * (1.0 - fo) / jnp.maximum(1.0 - fi, 1e-7)
        okz = wiz > 0.0
        s = (sel & okz).astype(jnp.float32)
        for ch in range(3):
            kd = mat_param(1 + ch)
            ks = mat_param(4 + ch)
            den = jnp.where(nonlin, 1.0 - kd * fdr_int, 1.0 - fdr_int)
            dw = kd * inv_eta2 / jnp.maximum(den, 1e-4)
            wch = jnp.where(pick_spec, ks, dw * dfac)
            if ch == 0:
                w_r = jnp.where(sel, s * wch, w_r)
            elif ch == 1:
                w_g = jnp.where(sel, s * wch, w_g)
            else:
                w_b = jnp.where(sel, s * wch, w_b)
        nwx = jnp.where(sel, pwx, nwx)
        nwy = jnp.where(sel, pwy, nwy)
        nwz = jnp.where(sel, pwz, nwz)
        pdf = jnp.where(sel, s * jnp.where(pick_spec, fi,
                                           (1.0 - fi) * szd * INV_PI),
                        pdf)
        is_delta = is_delta | (sel & pick_spec)

    if MAT_PHONG in families:
        sel = mtype == float(MAT_PHONG)
        nexp = mat_param(6)
        sd = jnp.maximum(jnp.maximum(mat_param(0), mat_param(1)),
                         mat_param(2))
        ss = jnp.maximum(jnp.maximum(mat_param(3), mat_param(4)),
                         mat_param(5))
        prob_s = ss / jnp.maximum(sd + ss, 1e-7)
        pick_s = uc < prob_s
        # glossy lobe around the mirror direction (phong_sample)
        cos_a = _powf(jnp.maximum(u0, 1e-7), 1.0 / (nexp + 1.0))
        sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
        ph = 2.0 * np.pi * u1
        lx = sin_a * jnp.cos(ph)
        ly = sin_a * jnp.sin(ph)
        rx_, ry_, rz_ = -wix, -wiy, wiz
        (fsx, fsy, fsz), (ftx, fty, ftz) = _coordsys(rx_, ry_, rz_)
        gx = lx * fsx + ly * ftx + cos_a * rx_
        gy = lx * fsy + ly * fty + cos_a * ry_
        gz = lx * fsz + ly * ftz + cos_a * rz_
        pwx = jnp.where(pick_s, gx, sxd)
        pwy = jnp.where(pick_s, gy, syd)
        pwz = jnp.where(pick_s, gz, szd)
        valid = (wiz > 0.0) & (pwz > 0.0)
        alpha = jnp.maximum(-wix * pwx - wiy * pwy + wiz * pwz, 1e-7)
        an = _powf(alpha, nexp)
        pdf_s = (nexp + 1.0) * (0.5 * INV_PI) * an
        pdf_c = jnp.where(valid,
                          prob_s * pdf_s + (1.0 - prob_s) * pwz * INV_PI,
                          0.0)
        ct_o = jnp.maximum(pwz, 0.0)
        glossy = (nexp + 2.0) * (0.5 * INV_PI) * an * ct_o
        diff = INV_PI * ct_o
        vf = valid.astype(jnp.float32)
        inv_p = 1.0 / jnp.maximum(pdf_c, 1e-6)
        wgate = (pdf_c > 1e-6).astype(jnp.float32) * vf * inv_p
        nwx = jnp.where(sel, pwx, nwx)
        nwy = jnp.where(sel, pwy, nwy)
        nwz = jnp.where(sel, pwz, nwz)
        w_r = jnp.where(sel, (mat_param(3) * glossy + mat_param(0) * diff)
                        * wgate, w_r)
        w_g = jnp.where(sel, (mat_param(4) * glossy + mat_param(1) * diff)
                        * wgate, w_g)
        w_b = jnp.where(sel, (mat_param(5) * glossy + mat_param(2) * diff)
                        * wgate, w_b)
        pdf = jnp.where(sel, pdf_c, pdf)

    if MAT_WARD in families:
        sel = mtype == float(MAT_WARD)
        au = jnp.maximum(mat_param(9), 1e-3)
        av = jnp.maximum(mat_param(10), 1e-3)
        sd = jnp.maximum(jnp.maximum(mat_param(0), mat_param(1)),
                         mat_param(2))
        ss = jnp.maximum(jnp.maximum(mat_param(3), mat_param(4)),
                         mat_param(5))
        prob_s = ss / jnp.maximum(sd + ss, 1e-7)
        pick_s = uc < prob_s
        # cos/sin of atan2(av·s0, au·c0) computed directly (no atan2
        # lowering in Mosaic): cp = au·c0/h, sp = av·s0/h
        c0 = jnp.cos(2.0 * np.pi * u1)
        s0 = jnp.sin(2.0 * np.pi * u1)
        hyp = jnp.sqrt(jnp.maximum((au * c0) ** 2 + (av * s0) ** 2,
                                   1e-20))
        cp, sp = au * c0 / hyp, av * s0 / hyp
        t2 = -jnp.log(jnp.maximum(u0, 1e-7)) \
            / ((cp / au) ** 2 + (sp / av) ** 2)
        cth = 1.0 / jnp.sqrt(1.0 + t2)
        sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
        hx_, hy_, hz_ = sth * cp, sth * sp, cth
        wih = wix * hx_ + wiy * hy_ + wiz * hz_
        wsx = 2.0 * wih * hx_ - wix
        wsy = 2.0 * wih * hy_ - wiy
        wsz = 2.0 * wih * hz_ - wiz
        pwx = jnp.where(pick_s, wsx, sxd)
        pwy = jnp.where(pick_s, wsy, syd)
        pwz = jnp.where(pick_s, wsz, szd)
        valid = (wiz > 0.0) & (pwz > 0.0)
        # pdf/eval at the chosen wo (ward_pdf/ward_eval)
        shx, shy, shz = wix + pwx, wiy + pwy, wiz + pwz
        hnx, hny, hnz = _normalize3(shx, shy, shz)
        exn = -((hnx / au) ** 2 + (hny / av) ** 2) \
            / jnp.maximum(hnz * hnz, 1e-12)
        pdf_h = jnp.exp(exn) / (np.pi * au * av
                                * jnp.maximum(hnz * hnz * hnz, 1e-6))
        pdf_s = pdf_h / jnp.maximum(
            4.0 * jnp.abs(pwx * hnx + pwy * hny + pwz * hnz), 1e-6)
        pdf_c = jnp.where(valid,
                          prob_s * pdf_s + (1.0 - prob_s) * pwz * INV_PI,
                          0.0)
        exe = -((shx / au) ** 2 + (shy / av) ** 2) \
            / jnp.maximum(shz * shz, 1e-12)
        spec = (jnp.exp(exe) / (4.0 * np.pi * au * av
                                * jnp.maximum(
                                    jnp.sqrt(jnp.maximum(wiz * pwz, 0.0)),
                                    1e-6)))
        vf = valid.astype(jnp.float32)
        wgate = (pdf_c > 1e-6).astype(jnp.float32) * vf \
            / jnp.maximum(pdf_c, 1e-6)
        nwx = jnp.where(sel, pwx, nwx)
        nwy = jnp.where(sel, pwy, nwy)
        nwz = jnp.where(sel, pwz, nwz)
        w_r = jnp.where(sel, (mat_param(0) * INV_PI * pwz
                              + mat_param(3) * spec * pwz) * wgate, w_r)
        w_g = jnp.where(sel, (mat_param(1) * INV_PI * pwz
                              + mat_param(4) * spec * pwz) * wgate, w_g)
        w_b = jnp.where(sel, (mat_param(2) * INV_PI * pwz
                              + mat_param(5) * spec * pwz) * wgate, w_b)
        pdf = jnp.where(sel, pdf_c, pdf)

    if MAT_THIN_DIELECTRIC in families:
        # thin slab: delta reflect/pass-through with internal-bounce
        # compensation (bsdf.py thindielectric_sample)
        sel = mtype == float(MAT_THIN_DIELECTRIC)
        eta = jnp.maximum(mat_param(0), 1e-3)
        f0 = _fresnel_diel_f(jnp.abs(wiz), eta)
        f = jnp.where(f0 < 1.0,
                      f0 + (1.0 - f0) * (1.0 - f0) * f0
                      / jnp.maximum(1.0 - f0 * f0, 1e-7), f0)
        pick_r = uc < f
        nwx = jnp.where(sel, -wix, nwx)
        nwy = jnp.where(sel, -wiy, nwy)
        nwz = jnp.where(sel, jnp.where(pick_r, wiz, -wiz), nwz)
        s = sel.astype(jnp.float32)
        w_r = jnp.where(sel, s * jnp.where(pick_r, mat_param(1),
                                           mat_param(4)), w_r)
        w_g = jnp.where(sel, s * jnp.where(pick_r, mat_param(2),
                                           mat_param(5)), w_g)
        w_b = jnp.where(sel, s * jnp.where(pick_r, mat_param(3),
                                           mat_param(6)), w_b)
        pdf = jnp.where(sel, jnp.where(pick_r, f, 1.0 - f), pdf)
        is_delta = is_delta | sel

    if MAT_DIFFTRANS in families:
        # diffuse transmitter: cosine lobe on the far side
        sel = mtype == float(MAT_DIFFTRANS)
        sgnw = jnp.where(wiz >= 0.0, 1.0, -1.0)
        okz = jnp.abs(wiz) > 0.0
        s = (sel & okz).astype(jnp.float32)
        nwx = jnp.where(sel, sxd, nwx)
        nwy = jnp.where(sel, syd, nwy)
        nwz = jnp.where(sel, -sgnw * szd, nwz)
        w_r = jnp.where(sel, s * mat_param(0), w_r)
        w_g = jnp.where(sel, s * mat_param(1), w_g)
        w_b = jnp.where(sel, s * mat_param(2), w_b)
        pdf = jnp.where(sel, s * szd * INV_PI, pdf)

    if MAT_NULL in families:
        # pass-through (bsdf.py null_sample)
        sel = mtype == float(MAT_NULL)
        nwx = jnp.where(sel, -wix, nwx)
        nwy = jnp.where(sel, -wiy, nwy)
        nwz = jnp.where(sel, -wiz, nwz)
        one = jnp.ones_like(wix)
        w_r = jnp.where(sel, one, w_r)
        w_g = jnp.where(sel, one, w_g)
        w_b = jnp.where(sel, one, w_b)
        pdf = jnp.where(sel, one, pdf)
        is_delta = is_delta | sel

    if MAT_ROUGH_PLASTIC in families:
        # GGX spec lobe vs cosine diffuse base, picked by the clamped
        # Fresnel weight; weight = f/pdf re-evaluated at the chosen wo
        # (bsdf.py roughplastic_sample)
        sel = mtype == float(MAT_ROUGH_PLASTIC)
        eta = jnp.maximum(mat_param(0), 1e-3)
        a = jnp.maximum(mat_param(9), 1e-4)
        fi = _fresnel_diel_f(wiz, eta)
        prob_s = jnp.clip(fi, 0.25, 0.9)
        pick_s = uc < prob_s
        vx, vy, vz = _normalize3(a * wix, a * wiy, wiz)
        lensq = vx * vx + vy * vy
        inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
        big = lensq > 1e-20
        t1x = jnp.where(big, -vy * inv_len, 1.0)
        t1y = jnp.where(big, vx * inv_len, 0.0)
        t1z = jnp.zeros_like(vx)
        t2x = vy * t1z - vz * t1y
        t2y = vz * t1x - vx * t1z
        t2z = vx * t1y - vy * t1x
        rr_ = jnp.sqrt(jnp.maximum(u0, 0.0))
        ph_ = 2.0 * np.pi * u1
        p1 = rr_ * jnp.cos(ph_)
        p2 = rr_ * jnp.sin(ph_)
        ss_ = 0.5 * (1.0 + vz)
        p2 = (1.0 - ss_) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) \
            + ss_ * p2
        p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
        nhx = p1 * t1x + p2 * t2x + p3 * vx
        nhy = p1 * t1y + p2 * t2y + p3 * vy
        nhz = p1 * t1z + p2 * t2z + p3 * vz
        mx, my, mz = _normalize3(a * nhx, a * nhy,
                                 jnp.maximum(nhz, 1e-6))
        wim = wix * mx + wiy * my + wiz * mz
        csx = jnp.where(pick_s, 2.0 * wim * mx - wix, sxd)
        csy = jnp.where(pick_s, 2.0 * wim * my - wiy, syd)
        csz = jnp.where(pick_s, 2.0 * wim * mz - wiz, szd)
        rp_r, rp_g, rp_b, rp_pdf, _pr = _rp_terms(
            mat_param, wix, wiy, wiz, csx, csy, csz)
        okp = (wiz > 0.0) & (csz > 0.0) & (rp_pdf > 1e-12)
        s = (sel & okp).astype(jnp.float32)
        inv_rp = 1.0 / jnp.maximum(rp_pdf, 1e-12)
        nwx = jnp.where(sel, csx, nwx)
        nwy = jnp.where(sel, csy, nwy)
        nwz = jnp.where(sel, csz, nwz)
        w_r = jnp.where(sel, s * rp_r * inv_rp, w_r)
        w_g = jnp.where(sel, s * rp_g * inv_rp, w_g)
        w_b = jnp.where(sel, s * rp_b * inv_rp, w_b)
        pdf = jnp.where(sel, s * rp_pdf, pdf)

    if MAT_ROUGH_DIELECTRIC in families:
        # rough glass (Walter, GGX visible normals): VNDF micronormal
        # from the upper-hemisphere wi, Fresnel lobe pick, then weight =
        # eval/pdf with the micronormal RE-DERIVED from (wi, wo) — the
        # exact dance of bsdf.py roughdielectric_sample
        sel = mtype == float(MAT_ROUGH_DIELECTRIC)
        eta = jnp.maximum(mat_param(0), 1e-3)
        a = jnp.maximum(mat_param(9), 1e-4)
        sw = jnp.where(wiz >= 0.0, 1.0, -1.0)
        ux, uy, uz = wix * sw, wiy * sw, wiz * sw
        vx, vy, vz = _normalize3(a * ux, a * uy, uz)
        lensq = vx * vx + vy * vy
        inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-20))
        big = lensq > 1e-20
        t1x = jnp.where(big, -vy * inv_len, 1.0)
        t1y = jnp.where(big, vx * inv_len, 0.0)
        t1z = jnp.zeros_like(vx)
        t2x = vy * t1z - vz * t1y
        t2y = vz * t1x - vx * t1z
        t2z = vx * t1y - vy * t1x
        rr = jnp.sqrt(jnp.maximum(u0, 0.0))
        ph = 2.0 * np.pi * u1
        p1 = rr * jnp.cos(ph)
        p2 = rr * jnp.sin(ph)
        ss = 0.5 * (1.0 + vz)
        p2 = (1.0 - ss) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) \
            + ss * p2
        p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
        nhx = p1 * t1x + p2 * t2x + p3 * vx
        nhy = p1 * t1y + p2 * t2y + p3 * vy
        nhz = p1 * t1z + p2 * t2z + p3 * vz
        mx, my, mz = _normalize3(a * nhx, a * nhy,
                                 jnp.maximum(nhz, 1e-6))
        wim = wix * mx + wiy * my + wiz * mz          # signed
        outs = wim >= 0.0
        eta_itm = jnp.where(outs, eta, 1.0 / eta)
        eta_tim = 1.0 / eta_itm
        cia = jnp.abs(wim)
        sin_t2 = eta_tim * eta_tim * (1.0 - cia * cia)
        tir = sin_t2 >= 1.0
        cts = jnp.where(tir, 0.0,
                        jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12)))
        rs_ = (cia - eta_itm * cts) \
            / jnp.maximum(cia + eta_itm * cts, 1e-4)
        rp_ = (eta_itm * cia - cts) \
            / jnp.maximum(eta_itm * cia + cts, 1e-4)
        fre = jnp.where(tir, 1.0, 0.5 * (rs_ * rs_ + rp_ * rp_))
        cos_tt = jnp.where(tir, 0.0, jnp.where(outs, -cts, cts))
        pick_r = uc < fre
        worx = 2.0 * wim * mx - wix
        wory = 2.0 * wim * my - wiy
        worz = 2.0 * wim * mz - wiz
        wtf = eta_tim * wim + cos_tt
        wotx, woty, wotz = _normalize3(-eta_tim * wix + wtf * mx,
                                       -eta_tim * wiy + wtf * my,
                                       -eta_tim * wiz + wtf * mz)
        cx = jnp.where(pick_r, worx, wotx)
        cy = jnp.where(pick_r, wory, woty)
        cz = jnp.where(pick_r, worz, wotz)
        vs, refl_rd, pdf_rd, ok_rd = _rd_terms(
            mat_param, wix, wiy, wiz, cx, cy, cz)
        inv_pdf = 1.0 / jnp.maximum(pdf_rd, 1e-12)
        side_ok = (pick_r & (wiz * cz > 1e-10)) \
            | (~pick_r & (wiz * cz < -1e-10))
        okv = ok_rd & (jnp.abs(wiz) > 1e-7) & (pdf_rd > 1e-12) & side_ok
        s = (sel & okv).astype(jnp.float32)
        nwx = jnp.where(sel, cx, nwx)
        nwy = jnp.where(sel, cy, nwy)
        nwz = jnp.where(sel, cz, nwz)
        w_rd = vs * inv_pdf
        w_r = jnp.where(sel, s * w_rd * jnp.where(refl_rd, mat_param(1),
                                                  mat_param(4)), w_r)
        w_g = jnp.where(sel, s * w_rd * jnp.where(refl_rd, mat_param(2),
                                                  mat_param(5)), w_g)
        w_b = jnp.where(sel, s * w_rd * jnp.where(refl_rd, mat_param(3),
                                                  mat_param(6)), w_b)
        pdf = jnp.where(sel, s * pdf_rd, pdf)
        eta_event = jnp.where(sel, jnp.where(pick_r, 1.0, eta_itm),
                              eta_event)

    if MAT_DIELECTRIC in families:
        # smooth glass: delta reflect/refract, two-sided (mirrors
        # bsdf.py dielectric_sample / core/fresnel.py fresnel_dielectric;
        # ref: src/bsdfs/dielectric.cpp:232 radiance-transport eta²)
        sel = mtype == float(MAT_DIELECTRIC)
        eta_r = jnp.maximum(mat_param(0), 1e-3)
        outside = wiz >= 0.0
        eta_it = jnp.where(outside, eta_r, 1.0 / eta_r)
        eta_ti = 1.0 / eta_it
        cos_i = jnp.abs(wiz)
        sin_t2 = eta_ti * eta_ti * (1.0 - cos_i * cos_i)
        tir = sin_t2 >= 1.0
        cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 1e-12))
        cos_t = jnp.where(tir, 0.0, cos_t)
        rs = (cos_i - eta_it * cos_t) \
            / jnp.maximum(cos_i + eta_it * cos_t, 1e-4)
        rp = (eta_it * cos_i - cos_t) \
            / jnp.maximum(eta_it * cos_i + cos_t, 1e-4)
        f = jnp.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))
        cos_theta_t = jnp.where(tir, 0.0,
                                jnp.where(outside, -cos_t, cos_t))
        pick_r = uc < f
        # refract_local: tangential scale by 1/eta (entering) or eta
        scale = jnp.where(cos_theta_t < 0.0, 1.0 / eta_r, eta_r)
        dwx = jnp.where(pick_r, -wix, -scale * wix)
        dwy = jnp.where(pick_r, -wiy, -scale * wiy)
        dwz = jnp.where(pick_r, wiz, cos_theta_t)
        s = sel.astype(jnp.float32)
        t_fac = eta_ti * eta_ti
        nwx = jnp.where(sel, dwx, nwx)
        nwy = jnp.where(sel, dwy, nwy)
        nwz = jnp.where(sel, dwz, nwz)
        w_r = jnp.where(sel, s * jnp.where(pick_r, mat_param(1),
                                           mat_param(4) * t_fac), w_r)
        w_g = jnp.where(sel, s * jnp.where(pick_r, mat_param(2),
                                           mat_param(5) * t_fac), w_g)
        w_b = jnp.where(sel, s * jnp.where(pick_r, mat_param(3),
                                           mat_param(6) * t_fac), w_b)
        pdf = jnp.where(sel, jnp.where(pick_r, f, 1.0 - f), pdf)
        is_delta = is_delta | sel
        eta_event = jnp.where(sel & ~pick_r, eta_it, eta_event)

    return nwx, nwy, nwz, w_r, w_g, w_b, pdf, is_delta, eta_event


# ---------------------------------------------------------------------------
# persistent kernel with path regeneration ([S, B] layout)
# ---------------------------------------------------------------------------
# The whole-path kernel wastes ~2/3 of its trace slots on dead lanes (RR +
# escape kill most paths well before max_depth, but a block only exits when
# ALL of its lanes die). The persistent kernel keeps every lane busy: each
# lane owns ONE pixel and renders `spp` complete paths back to back,
# re-emitting a fresh camera ray the moment its current path terminates
# (classic "path regeneration" / persistent-threads megakernel design —
# lane↔pixel stays static, so no scatter or compaction is needed and the
# counter RNG stays replayable: draws are keyed by (pixel, sample, bounce)
# exactly as the XLA integrator).

N_PSTATE = 24    # rows 0..15 as the bounce state; 16 bounce, 17 done,
                 # 18:21 L_sum, 21 iter diag, 22 trace count, 23 shadow

DIM_PIXEL = 0    # sensor jitter dim (mirrors integrator/common.py)
DIM_APERTURE = 1  # thin-lens aperture sample dim


def make_persistent_kernel(tc: int, c_clusters: int, em_count: int,
                           families: tuple, rr_depth: int, max_depth: int,
                           m_real: int, et_real: int, smooth: bool,
                           spp: int, iter_cap: int, medium=None,
                           lens=False, textured=False):
    """consts layout: [0:9] scene consts (as the other kernels), then the
    in-kernel camera: [9:18] rot rows r00..r22 (camera→world), [18:21]
    cam position, [21] tan_half, [22] aspect, [23] width, [24] height,
    [25] aperture radius, [26] focus distance (thin lens when `lens`,
    ref: src/sensors/thinlens.cpp via sensor.py sample_ray)."""

    def kernel(woop_ref, aabb_ref, attr_ref, mat_ref, em_ref,
               em_meta_ref, pix_ref,
               samp_ref, meta_ref, consts_ref, st_in_ref, st_out_ref):
        consts = tuple(consts_ref[i] for i in range(9))
        cam = tuple(consts_ref[9 + i] for i in range(18))
        woop_h = woop_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else woop_ref
        attr_h = attr_ref[:] if c_clusters <= MAX_UNROLLED_CLUSTERS \
            else attr_ref
        pixel = pix_ref[:]                    # [S, B] int32: lane's pixel
        samp0 = samp_ref[:]                   # [S, B] int32: sample base
        seed = meta_ref[0]
        st0 = st_in_ref[:]                    # [N_PSTATE, S, B]
        rows0 = tuple(st0[i] for i in range(N_PSTATE))

        (r00, r01, r02, r10, r11, r12, r20, r21, r22,
         cpx, cpy, cpz, tan_half, aspect, wpix, hpix,
         ap_radius, focus_d) = cam

        def cam_ray(samp_new):
            """Fresh primary ray for this lane's pixel at sample index
            samp_new (mirrors PerspectiveCamera.sample_ray + render.py
            pixel jitter). Returns (origin xyz, direction xyz); pinhole
            origins are the camera position."""
            j0, j1 = _rng2(seed, pixel, DIM_PIXEL, samp_new)
            pf = pixel.astype(jnp.float32)
            py_i = jnp.floor(pf / wpix)
            px_i = pf - py_i * wpix
            ndc_x = 1.0 - (px_i + j0) / wpix * 2.0
            ndc_y = 1.0 - (py_i + j1) / hpix * 2.0
            lx = ndc_x * tan_half
            ly = ndc_y * tan_half * aspect
            if not lens:
                dx = lx * r00 + ly * r01 + r02
                dy = lx * r10 + ly * r11 + r12
                dz = lx * r20 + ly * r21 + r22
                one = jnp.ones_like(dx)
                return ((cpx * one, cpy * one, cpz * one),
                        _normalize3(dx, dy, dz))
            # thin lens: Shirley-Chiu concentric disk on the aperture,
            # direction through the focus-plane point (sensor.py
            # sample_ray thin-lens branch; warp.py concentric disk)
            a0, a1 = _rng2(seed, pixel, DIM_APERTURE, samp_new)
            ox_ = 2.0 * a0 - 1.0
            oy_ = 2.0 * a1 - 1.0
            is_zero = (ox_ == 0.0) & (oy_ == 0.0)
            use_x = jnp.abs(ox_) > jnp.abs(oy_)
            r_d = jnp.where(use_x, ox_, oy_)
            ratio = jnp.where(
                is_zero, 0.0,
                jnp.where(use_x,
                          oy_ / jnp.where(ox_ == 0.0, 1.0, ox_),
                          ox_ / jnp.where(oy_ == 0.0, 1.0, oy_)))
            qpi = jnp.float32(np.pi / 4.0)
            phi = jnp.where(use_x, ratio * qpi,
                            jnp.float32(np.pi / 2.0) - ratio * qpi)
            r_d = jnp.where(is_zero, 0.0, r_d)
            lenx = r_d * jnp.cos(phi) * ap_radius
            leny = r_d * jnp.sin(phi) * ap_radius
            dlx = lx * focus_d - lenx
            dly = ly * focus_d - leny
            dlz = focus_d
            dx = dlx * r00 + dly * r01 + dlz * r02
            dy = dlx * r10 + dly * r11 + dlz * r12
            dz = dlx * r20 + dly * r21 + dlz * r22
            o_x = cpx + lenx * r00 + leny * r01
            o_y = cpy + lenx * r10 + leny * r11
            o_z = cpz + lenx * r20 + leny * r21
            return (o_x, o_y, o_z), _normalize3(dx, dy, dz)

        def cond(carry):
            i, rows = carry
            return (i < iter_cap) & (jnp.sum(rows[12]) > 0.0)

        def body(carry):
            i, rows = carry
            bounce = rows[16].astype(jnp.int32)
            done = rows[17]
            samp = samp0 + done.astype(jnp.int32)
            new16, n_tr, n_sh = _bounce_rows(
                tc, c_clusters, families, rr_depth, max_depth, m_real,
                et_real, em_count, smooth, woop_h, aabb_ref, attr_h,
                mat_ref, em_ref, em_meta_ref, consts, pixel, samp,
                seed, bounce, rows[:16], medium=medium,
                textured=textured)
            was_active = rows[12] > 0.5
            now_active = new16[12] > 0.5
            died = was_active & ~now_active

            # on death: bank the finished path's radiance, count it
            df = died.astype(jnp.float32)
            l_sum_r = rows[18] + df * new16[9]
            l_sum_g = rows[19] + df * new16[10]
            l_sum_b = rows[20] + df * new16[11]
            done_new = done + df

            # regenerate: lanes that just died and still owe samples
            regen = died & (done_new < float(spp))
            samp_next = samp0 + done_new.astype(jnp.int32)
            (rox, roy, roz), (ndx, ndy, ndz) = cam_ray(samp_next)
            rf = regen.astype(jnp.float32)
            keep = 1.0 - rf
            zero = jnp.zeros_like(df)
            one = jnp.ones_like(df)
            new_rows = (
                jnp.where(regen, rox, new16[0]),
                jnp.where(regen, roy, new16[1]),
                jnp.where(regen, roz, new16[2]),
                jnp.where(regen, ndx, new16[3]),
                jnp.where(regen, ndy, new16[4]),
                jnp.where(regen, ndz, new16[5]),
                keep * new16[6] + rf, keep * new16[7] + rf,
                keep * new16[8] + rf,                     # throughput = 1
                keep * new16[9], keep * new16[10],
                keep * new16[11],                         # L = 0
                jnp.maximum(new16[12], rf),               # active
                keep * new16[13] + rf,                    # prev_pdf = 1
                jnp.maximum(new16[14], rf),               # prev_delta = 1
                keep * new16[15] + rf,                    # eta = 1
                jnp.where(regen, zero,
                          bounce.astype(jnp.float32) + 1.0),
                done_new,
                l_sum_r, l_sum_g, l_sum_b,
                rows[21] + 1.0,           # iterations executed (diag)
                rows[22] + n_tr, rows[23] + n_sh,
            )
            return i + 1, new_rows

        _, rows = jax.lax.while_loop(cond, body, (jnp.int32(0), rows0))
        st_out_ref[:] = jnp.stack(rows, axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tables", "families", "rr_depth",
                                    "max_depth", "spp", "block",
                                    "sublanes", "iter_cap", "medium",
                                    "lens"))
def run_persistent(tables: MegaTables, families, rr_depth, max_depth, spp,
                   consts_cam, state, pixel, samp0, meta_u32,
                   block=DEF_PBLOCK, sublanes=DEF_SUBLANES, iter_cap=0,
                   medium=None, lens=False):
    """Persistent path-regeneration render: every lane completes exactly
    `spp` paths of its pixel.

    state: [N_PSTATE, S, L] with L = total lanes / S (host-initialised:
    first camera ray in rows 0..15 with active=1, rows 16.. zero);
    pixel/samp0: [S, L] int32. `block` = S·B total lanes per grid step.
    Returns the final [N_PSTATE, S, L] state: L_sum rows 18:21 / spp is
    the per-lane radiance mean; rows 22+23 are exact ray counters."""
    s = sublanes
    assert block % s == 0
    b = block // s
    n = state.shape[2]
    assert state.shape[1] == s and n % b == 0, (state.shape, s, b)
    c_clusters = tables.woop.shape[0]
    if iter_cap <= 0:
        cap = spp * (max_depth if max_depth > 0 else 32) + 8
    else:
        cap = iter_cap
    kernel = make_persistent_kernel(tables.tc, c_clusters,
                                    tables.em_count, families, rr_depth,
                                    max_depth, tables.m_real,
                                    tables.et_real, tables.smooth,
                                    spp, cap, medium=medium, lens=lens,
                                    textured=tables.textured)
    grid = (n // b,)
    col3 = pl.BlockSpec((N_PSTATE, s, b), lambda r: (0, 0, r),
                        memory_space=pltpu.VMEM)
    col2 = pl.BlockSpec((s, b), lambda r: (0, r),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_table_specs(tables) + [
            col2,                                     # pixel
            col2,                                     # samp base
            pl.BlockSpec(memory_space=pltpu.SMEM),    # meta_u32
            pl.BlockSpec(memory_space=pltpu.SMEM),    # consts + camera
        ] + [col3],
        out_specs=col3,
        out_shape=jax.ShapeDtypeStruct((N_PSTATE, s, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )(tables.woop, tables.aabb, tables.attr, tables.mat, tables.em_rows,
      tables.em_meta, pixel, samp0, meta_u32,
      jnp.asarray(consts_cam, jnp.float32), state)
    return out
