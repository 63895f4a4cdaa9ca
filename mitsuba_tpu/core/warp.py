"""Warping from the unit square to common sampling domains, with pdfs.

Semantics mirror the reference warp library (ref: include/mitsuba/core/
warp.h:40-123, src/libcore/warp.cpp) — each `square_to_X(u)` takes uniform
u ∈ [0,1)² (trailing axis 2) and returns a sample; `square_to_X_pdf` returns
the density in the target measure. All ops broadcast over leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt

INV_PI = float(1.0 / jnp.pi)
INV_TWO_PI = float(1.0 / (2.0 * jnp.pi))
INV_FOUR_PI = float(1.0 / (4.0 * jnp.pi))


def square_to_uniform_sphere(u):
    """warp.h:43 — area-preserving lat-long warp."""
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_FOUR_PI)


def square_to_uniform_hemisphere(u):
    """warp.h:49 — +z hemisphere."""
    z = u[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_TWO_PI)


def square_to_cosine_hemisphere(u):
    """warp.h:55 — cosine-weighted hemisphere via concentric disk + lift."""
    p = square_to_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    """pdf = cosθ/π on the hemisphere (0 below)."""
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(u, cos_cutoff):
    """warp.h:67 — uniform direction in cone around +z with cosθ ≥ cos_cutoff."""
    z = 1.0 - u[..., 0] * (1.0 - cos_cutoff)
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    return jnp.full(d.shape[:-1], INV_TWO_PI / (1.0 - cos_cutoff))


def square_to_uniform_disk(u):
    """warp.h:73 — polar mapping."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(u):
    """warp.h:85 — Shirley-Chiu concentric disk, branchless select form."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    is_zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    ratio = jnp.where(
        is_zero, 0.0,
        jnp.where(use_x, oy / jnp.where(ox == 0, 1.0, ox),
                  ox / jnp.where(oy == 0, 1.0, oy)))
    phi = jnp.where(use_x, ratio * (jnp.pi / 4.0),
                    (jnp.pi / 2.0) - ratio * (jnp.pi / 4.0))
    r = jnp.where(is_zero, 0.0, r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_pdf(p):
    return jnp.full(p.shape[:-1], INV_PI)


def square_to_uniform_triangle(u):
    """warp.h:91 — barycentric warp (a = 1-sqrt(1-u0), b = u1*sqrt(1-u0))."""
    t = safe_sqrt(1.0 - u[..., 0])
    b0 = 1.0 - t
    b1 = u[..., 1] * t
    return jnp.stack([b0, b1], axis=-1)


def square_to_std_normal(u):
    """warp.h:99 — Box-Muller."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-38)))
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_tent(u):
    """warp.h:111 — 2D tent [-1,1]²; inverse-CDF per axis."""

    def tent1(x):
        return jnp.where(x < 0.5, jnp.sqrt(2.0 * x) - 1.0,
                         1.0 - jnp.sqrt(jnp.maximum(2.0 - 2.0 * x, 0.0)))

    return jnp.stack([tent1(u[..., 0]), tent1(u[..., 1])], axis=-1)


def interval_to_nonuniform_tent(a, b, c, sample):
    """warp.h:123 — sample a tent with apex b on [a, c]."""
    w = (b - a) / (c - a)  # probability mass of the left half
    tl = safe_sqrt(sample / jnp.maximum(w, 1e-20))
    tr = safe_sqrt(jnp.maximum((1.0 - sample) / jnp.maximum(1.0 - w, 1e-20), 0.0))
    return jnp.where(sample < w, b + (a - b) * (1.0 - tl), b + (c - b) * (1.0 - tr))
