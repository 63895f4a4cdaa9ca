"""Rough dielectric transmittance tables — the `rtrans.h` analog.

The reference couples the diffuse base of roughplastic/roughcoating to the
rough dielectric interface through precomputed transmittance data shipped
as binary tables (ref: src/bsdfs/rtrans.h + data/microfacet/*.dat,
loaded by roughplastic.cpp:169-178: `RoughTransmittance(distribution)`
then `eval(cosTheta, alpha)` / `evalDiffuse(alpha)`). Vendoring those
files is unnecessary: the same quantity is a single-scattering microfacet
albedo integral that this module precomputes at import in a few hundred
milliseconds of numpy — T(η, α, cosθ) = E_{m∼VNDF(wi,α)}[(1−F(wi·m, η))
· G₂(wi, wo_t, m)/G₁(wi, m)] with wo_t the refracted direction (TIR
contributes zero), estimated with a scrambled low-discrepancy point set
so the table is deterministic.

Runtime lookups are trilinear fetches from a [NE, NA, NC] constant that
jit bakes into the executable — branchless and wavefront-friendly.
"""
from __future__ import annotations

import functools
import os
import tempfile

import numpy as np

N_ETA, N_ALPHA, N_COS = 24, 16, 32
ETA_MIN, ETA_MAX = 1.0, 4.0          # inverse etas use the 1/η symmetry
ALPHA_MIN, ALPHA_MAX = 0.0, 1.0
N_SAMPLES = 2048


def _r2_sequence(n):
    """Deterministic low-discrepancy 2D points (R2 sequence)."""
    g = 1.32471795724474602596
    a1, a2 = 1.0 / g, 1.0 / (g * g)
    i = np.arange(1, n + 1)
    return np.stack([(0.5 + a1 * i) % 1.0, (0.5 + a2 * i) % 1.0], axis=-1)


def _sample_vndf_ggx(wi, a, u):
    """Heitz 2018 GGX visible-normal sampling (mirrors microfacet.py)."""
    v = np.stack([a * wi[..., 0], a * wi[..., 1], wi[..., 2]], -1)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    lensq = v[..., 0] ** 2 + v[..., 1] ** 2
    t1 = np.where(lensq[..., None] > 1e-20,
                  np.stack([-v[..., 1], v[..., 0],
                            np.zeros_like(v[..., 0])], -1)
                  / np.sqrt(np.maximum(lensq, 1e-20))[..., None],
                  np.array([1.0, 0.0, 0.0]))
    t2 = np.cross(v, t1)
    r = np.sqrt(u[..., 0])
    phi = 2.0 * np.pi * u[..., 1]
    p1 = r * np.cos(phi)
    p2 = r * np.sin(phi)
    s = 0.5 * (1.0 + v[..., 2])
    p2 = (1.0 - s) * np.sqrt(np.maximum(1.0 - p1 ** 2, 0.0)) + s * p2
    p3 = np.sqrt(np.maximum(1.0 - p1 ** 2 - p2 ** 2, 0.0))
    nh = (p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * v)
    m = np.stack([a * nh[..., 0], a * nh[..., 1],
                  np.maximum(nh[..., 2], 1e-6)], -1)
    return m / np.linalg.norm(m, axis=-1, keepdims=True)


def _sample_vndf_beckmann(wi, a, u):
    """Beckmann visible normals via the slope-space method is overkill for
    a table build; classical D-sampling with a cosθ·D pdf converges to the
    same albedo under the G2/G1 weight with a G1(wi) correction, so use
    D-sampling + G1 weight (standard Walter07 estimator)."""
    lr = np.log(np.maximum(1.0 - u[..., 0], 1e-12))
    tan2 = -a * a * lr
    ct = 1.0 / np.sqrt(1.0 + tan2)
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * np.pi * u[..., 1]
    return np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)


def _smith_g1(v, m, a, ggx):
    ct = np.abs(v[..., 2])
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    tan = st / np.maximum(ct, 1e-7)
    if ggx:
        g = 2.0 / (1.0 + np.sqrt(1.0 + (a * tan) ** 2))
    else:
        b = 1.0 / np.maximum(a * tan, 1e-7)
        g = np.where(b < 1.6,
                     (3.535 * b + 2.181 * b * b)
                     / (1.0 + 2.276 * b + 2.577 * b * b), 1.0)
    back = np.sum(v * m, axis=-1) * v[..., 2] <= 0.0
    return np.where(back, 0.0, g)


def _fresnel(ci, eta):
    """Unpolarized dielectric Fresnel with TIR (ci ≥ 0, relative eta)."""
    st2 = np.maximum(1.0 - ci * ci, 0.0) / (eta * eta)
    tir = st2 >= 1.0
    ct = np.sqrt(np.maximum(1.0 - st2, 0.0))
    rs = (ci - eta * ct) / np.maximum(ci + eta * ct, 1e-12)
    rp = (eta * ci - ct) / np.maximum(eta * ci + ct, 1e-12)
    return np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))


def _transmittance_point(eta, alpha, cos_t, u, ggx):
    """Vectorized over a cos_t axis: cos_t [NC] × u [NS, 2] → [NC]."""
    cos_t = np.atleast_1d(np.asarray(cos_t, np.float64))
    wi = np.stack([np.sqrt(np.maximum(1.0 - cos_t ** 2, 0.0)),
                   np.zeros_like(cos_t), cos_t], -1)       # [NC, 3]
    wi = np.broadcast_to(wi[:, None, :],
                         (len(cos_t), u.shape[0], 3))      # [NC, NS, 3]
    u = np.broadcast_to(u[None], (len(cos_t),) + u.shape)
    cos_t = cos_t[:, None]
    if ggx:
        m = _sample_vndf_ggx(wi, alpha, u)
    else:
        m = _sample_vndf_beckmann(wi, alpha, u)
    im = np.maximum(np.sum(wi * m, axis=-1), 0.0)
    f = _fresnel(im, eta)
    # refracted direction for the shadowing term
    inv_eta = 1.0 / eta
    ct2 = 1.0 - (1.0 - im * im) * inv_eta * inv_eta
    ok = ct2 > 0.0
    wo = (-inv_eta * wi
          + (inv_eta * im - np.sqrt(np.maximum(ct2, 0.0)))[..., None] * m)
    g1i = _smith_g1(wi, m, alpha, ggx)
    g1o = _smith_g1(wo, m, alpha, ggx)
    if ggx:
        w = np.where(ok, (1.0 - f) * g1o, 0.0)   # VNDF: weight G2/G1≈G1o
    else:
        # D-sampled: weight (1-F)·G1i·G1o·|wi·m| / (cosθi·cosθm) per
        # Walter07 with the cosθm·D pdf
        w = np.where(
            ok,
            (1.0 - f) * g1i * g1o * im
            / np.maximum(cos_t * np.maximum(m[..., 2], 1e-7), 1e-7), 0.0)
    return np.mean(w, axis=-1)                             # [NC]


def _disk_cached(name, build):
    """Build-once table persistence — the role of the reference's
    data/microfacet/*.dat files, except the data is generated, not
    vendored. Grid parameters are part of the cache key."""
    key = f"{name}_{N_ETA}x{N_ALPHA}x{N_COS}_{N_SAMPLES}"
    for d in (os.path.dirname(__file__), tempfile.gettempdir()):
        path = os.path.join(d, f"_rtrans_{key}.npz")
        if os.path.exists(path):
            try:
                z = np.load(path)
                return tuple(z[k] for k in z.files)
            except Exception:
                pass
    out = build()
    for d in (os.path.dirname(__file__), tempfile.gettempdir()):
        try:
            path = os.path.join(d, f"_rtrans_{key}.npz")
            np.savez(path, *out)
            break
        except OSError:
            continue
    return out


@functools.lru_cache(maxsize=4)
def transmittance_table(ggx: bool = True):
    """T[NE, NA, NC] over (η, α, cosθ) grids; η axis spans [1, 4]
    (for η<1 query the 1/η entry of the paired internal table —
    roughplastic needs exactly external η and internal 1/η)."""
    etas = np.linspace(ETA_MIN + 1e-3, ETA_MAX, N_ETA)
    alphas = np.linspace(ALPHA_MIN + 1e-3, ALPHA_MAX, N_ALPHA)
    coss = np.linspace(1e-2, 1.0, N_COS)

    def build():
        u = _r2_sequence(N_SAMPLES)
        out = np.empty((N_ETA, N_ALPHA, N_COS), np.float32)
        for ie, eta in enumerate(etas):
            for ia, al in enumerate(alphas):
                out[ie, ia] = _transmittance_point(eta, al, coss, u, ggx)
        return (out, etas.astype(np.float32),
                alphas.astype(np.float32), coss.astype(np.float32))

    return _disk_cached(f"ext_{'ggx' if ggx else 'beck'}", build)


@functools.lru_cache(maxsize=4)
def transmittance_table_inv(ggx: bool = True):
    """Internal-side table: T(1/η, α, cosθ) on the same η grid
    (RoughTransmittance::setEta with η<1, rtrans.h)."""
    etas = np.linspace(ETA_MIN + 1e-3, ETA_MAX, N_ETA)
    alphas = np.linspace(ALPHA_MIN + 1e-3, ALPHA_MAX, N_ALPHA)
    coss = np.linspace(1e-2, 1.0, N_COS)

    def build():
        u = _r2_sequence(N_SAMPLES)
        out = np.empty((N_ETA, N_ALPHA, N_COS), np.float32)
        for ie, eta in enumerate(etas):
            for ia, al in enumerate(alphas):
                out[ie, ia] = _transmittance_point(1.0 / eta, al, coss,
                                                   u, ggx)
        return (out, etas.astype(np.float32),
                alphas.astype(np.float32), coss.astype(np.float32))

    return _disk_cached(f"inv_{'ggx' if ggx else 'beck'}", build)


@functools.lru_cache(maxsize=4)
def diffuse_transmittance_inv(ggx: bool = True):
    """evalDiffuse analog on the internal side: cosine-weighted average
    2∫ T(1/η, α, c)·c dc → [NE, NA] (rtrans.h evalDiffuse). Uses its own
    dense cosine-importance grid (c = √u) — the TIR cutoff is too sharp
    for the main table's 32-point cos axis."""
    etas = np.linspace(ETA_MIN + 1e-3, ETA_MAX, N_ETA)
    alphas = np.linspace(ALPHA_MIN + 1e-3, ALPHA_MAX, N_ALPHA)

    def build():
        cs = np.sqrt((np.arange(64) + 0.5) / 64.0)
        u = _r2_sequence(N_SAMPLES)
        out = np.empty((N_ETA, N_ALPHA), np.float32)
        for ie, eta in enumerate(etas):
            for ia, al in enumerate(alphas):
                out[ie, ia] = np.mean(
                    _transmittance_point(1.0 / eta, al, cs, u, ggx))
        return (out, etas.astype(np.float32),
                alphas.astype(np.float32))

    return _disk_cached(f"diff_{'ggx' if ggx else 'beck'}", build)


def lookup(table_pack, eta, alpha, cos_t):
    """Trilinear fetch (jnp). eta clamped into the [1,4] grid; pass the
    external or internal table pack as appropriate."""
    import jax.numpy as jnp
    t, etas, alphas, coss = table_pack
    t = jnp.asarray(t)

    def axis_idx(v, grid):
        g0, g1, n = float(grid[0]), float(grid[-1]), len(grid)
        x = (jnp.clip(v, g0, g1) - g0) / (g1 - g0) * (n - 1)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
        return i0, x - i0

    ie, fe = axis_idx(eta, etas)
    ia, fa = axis_idx(alpha, alphas)
    ic, fc = axis_idx(cos_t, coss)
    out = 0.0
    for de, we in ((0, 1.0 - fe), (1, fe)):
        for da, wa in ((0, 1.0 - fa), (1, fa)):
            for dc, wc in ((0, 1.0 - fc), (1, fc)):
                out = out + we * wa * wc * t[ie + de, ia + da, ic + dc]
    return out


def lookup_diffuse(pack, eta, alpha):
    """Bilinear fetch of the internal diffuse transmittance."""
    import jax.numpy as jnp
    t, etas, alphas = pack
    t = jnp.asarray(t)

    def axis_idx(v, grid):
        g0, g1, n = float(grid[0]), float(grid[-1]), len(grid)
        x = (jnp.clip(v, g0, g1) - g0) / (g1 - g0) * (n - 1)
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
        return i0, x - i0

    ie, fe = axis_idx(eta, etas)
    ia, fa = axis_idx(alpha, alphas)
    return ((1 - fe) * (1 - fa) * t[ie, ia] + fe * (1 - fa) * t[ie + 1, ia]
            + (1 - fe) * fa * t[ie, ia + 1] + fe * fa * t[ie + 1, ia + 1])
