"""Appearance-prefiltering "scaled BSDF" adapters (winmad research).

These wrap a base BSDF and multiply its eval/sample weight by a
data-driven correction factor produced by winmad's downsampling
pipeline; pdf/sampling is delegated to the base BSDF unchanged:

- `sv_tabulated_scaled_bsdf` (ref: src/bsdfs/sv_tabulated_scaled_bsdf.cpp:
  73-165): a per-texel 4D angular table — the spatial uv picks one of
  NY*NX scale matrices; (wi, wo) in the *macro* (base) frame map through
  the concentric hemisphere->square warp and bilinearly interpolate a
  [wiRes^2, woRes^2] RGB matrix (16-tap 4D bilinear).
- `sh_scaled_bsdf` (ref: src/bsdfs/sh_scaled_bsdf.cpp:139-199): scale =
  a spherical-harmonic expansion of the outgoing direction whose
  coefficients are textures over uv.
- `heightmap_bsdf` (ref: src/bsdfs/heightmap_bsdf.cpp:71-120): ground
  truth for the above — stochastically box-filters a high-res BSDF by
  jittering the uv uniformly inside the downsampled texel block.

The reference evaluates these through virtual wrapper objects with
per-thread samplers; here they are pure functions over packed tables so
the whole scale evaluation fuses into the shading kernel, and the jitter
comes from the integrator's counter-based RNG stream (replayable for
path-replay backprop).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import sh

__all__ = [
    "uniform_hemisphere_to_square_concentric",
    "square_to_uniform_hemisphere_concentric",
    "angular_scale_eval", "sh_scale_eval", "uv_block_jitter",
]


def square_to_uniform_hemisphere_concentric(u):
    """Shirley–Chiu concentric square -> uniform hemisphere
    (ref: src/libcore/warp.cpp:130-136)."""
    a = 2.0 * u[..., 0] - 1.0
    b = 2.0 * u[..., 1] - 1.0
    use_a = a * a > b * b
    r = jnp.where(use_a, a, b)
    phi = jnp.where(use_a,
                    (jnp.pi / 4) * jnp.where(a == 0, 0.0, b / jnp.where(a == 0, 1.0, a)),
                    jnp.pi / 2 - (jnp.pi / 4) * jnp.where(b == 0, 0.0, a / jnp.where(b == 0, 1.0, b)))
    phi = jnp.where((a == 0) & (b == 0), 0.0, phi)
    dx = r * jnp.cos(phi)
    dy = r * jnp.sin(phi)
    r2 = dx * dx + dy * dy
    tmp = jnp.sqrt(jnp.maximum(2.0 - r2, 0.0))
    return jnp.stack([dx * tmp, dy * tmp, 1.0 - r2], axis=-1)


def uniform_hemisphere_to_square_concentric(d):
    """Inverse of the above (ref: src/libcore/warp.cpp:104-143):
    hemisphere direction -> concentric square in [0,1]^2."""
    r2 = 1.0 - d[..., 2]
    tmp = jnp.sqrt(jnp.maximum(2.0 - r2, 1e-12))
    px = d[..., 0] / tmp
    py = d[..., 1] / tmp
    r = jnp.sqrt(px * px + py * py)
    phi = jnp.arctan2(py, px)
    phi = jnp.where(phi < -jnp.pi / 4, phi + 2 * jnp.pi, phi)
    q = jnp.pi / 4
    # region index 0..3 by phi quadrant (warp.cpp:114-126)
    reg1 = phi < q
    reg2 = (phi >= q) & (phi < 3 * q)
    reg3 = (phi >= 3 * q) & (phi < 5 * q)
    a = jnp.where(reg1, r,
        jnp.where(reg2, -(phi - jnp.pi / 2) * r / q,
        jnp.where(reg3, -r, -(phi - 3 * jnp.pi / 2) * (-r) / q)))
    b = jnp.where(reg1, phi * r / q,
        jnp.where(reg2, r,
        jnp.where(reg3, (phi - jnp.pi) * (-r) / q, -r)))
    return jnp.stack([0.5 * (a + 1.0), 0.5 * (b + 1.0)], axis=-1)


def _bilinear_idx(t, n_cells):
    """Shared cell/weight computation (sv_tabulated_scaled_bsdf.cpp:
    95-101): index into an n_cells+1 sample lattice."""
    c = jnp.clip(jnp.floor(t * n_cells).astype(jnp.int32), 0, n_cells - 1)
    w = t * n_cells - c
    return c, w


def angular_scale_eval(tables, uv, wi_macro, wo_macro, uv_scale=(1.0, 1.0)):
    """Evaluate the spatially-varying 4D angular scale.

    tables: [NY, NX, wiRes*wiRes, woRes*woRes, 3] — per spatial cell the
    reference's scale bitmap with pixel (x=woIdx, y=wiIdx)
    (sv_tabulated_scaled_bsdf.cpp:103-125). Zero when either direction is
    below the macro horizon (:87-88). wiRes/woRes are the lattice sizes;
    interpolation runs over (res-1) cells exactly as the reference.
    """
    ny, nx, wi_sq, wo_sq, _ = tables.shape
    wi_res = int(round(wi_sq ** 0.5))
    wo_res = int(round(wo_sq ** 0.5))

    u = uv[..., 0] * uv_scale[0]
    v = uv[..., 1] * uv_scale[1]
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    sx = jnp.clip((u * nx).astype(jnp.int32), 0, nx - 1)
    sy = jnp.clip((v * ny).astype(jnp.int32), 0, ny - 1)

    wi_t = uniform_hemisphere_to_square_concentric(wi_macro)
    wo_t = uniform_hemisphere_to_square_concentric(wo_macro)
    c1, wu1 = _bilinear_idx(wi_t[..., 0], wi_res - 1)
    r1, wv1 = _bilinear_idx(wi_t[..., 1], wi_res - 1)
    c2, wu2 = _bilinear_idx(wo_t[..., 0], wo_res - 1)
    r2, wv2 = _bilinear_idx(wo_t[..., 1], wo_res - 1)

    res = 0.0
    for dr1 in (0, 1):
        a1 = jnp.abs(1.0 - dr1 - wv1)
        for dc1 in (0, 1):
            a2 = jnp.abs(1.0 - dc1 - wu1)
            wi_idx = (r1 + dr1) * wi_res + (c1 + dc1)
            for dr2 in (0, 1):
                a3 = jnp.abs(1.0 - dr2 - wv2)
                for dc2 in (0, 1):
                    a4 = jnp.abs(1.0 - dc2 - wu2)
                    wo_idx = (r2 + dr2) * wo_res + (c2 + dc2)
                    val = tables[sy, sx, wi_idx, wo_idx]
                    res = res + val * (a1 * a2 * a3 * a4)[..., None]
    above = (wi_macro[..., 2] > 0) & (wo_macro[..., 2] > 0)
    return jnp.where(above[..., None], res, 0.0)


def sh_scale_eval(coeff_maps, uv, wo_macro):
    """SH-expanded scale (sh_scaled_bsdf.cpp:139-168): coeff_maps
    [n_coeffs, H, W, 3] textures sampled (nearest) at uv give the SH
    coefficients; the scale is the expansion evaluated at the macro-frame
    outgoing direction. n_coeffs = bands^2."""
    n_coeffs, h, w, _ = coeff_maps.shape
    bands = int(round(n_coeffs ** 0.5))
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    coeffs = coeff_maps[:, yi, xi]                # [n_coeffs, ..., 3]
    coeffs = jnp.moveaxis(coeffs, 0, -2)          # [..., n_coeffs, 3]
    basis = sh.eval_basis(bands, wo_macro)        # [..., n_coeffs]
    scale = jnp.einsum('...k,...kc->...c', basis, coeffs)
    return jnp.where((wo_macro[..., 2] > 0)[..., None], scale, 0.0)


def uv_block_jitter(uv, block_uv, u2):
    """Ground-truth downsampling jitter (heightmap_bsdf.cpp:85-92):
    snap uv to its downsampled block and re-sample uniformly inside it.
    `block_uv` is the block size in uv units; `u2` the 2D uniform from
    the integrator's replayable stream (replaces the reference's pool of
    233 per-thread samplers)."""
    b = jnp.asarray(block_uv)
    blk = jnp.floor(uv / b)
    return b * (blk + u2)
