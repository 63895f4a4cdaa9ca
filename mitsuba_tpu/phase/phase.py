"""Phase functions: isotropic, Henyey-Greenstein, Rayleigh, Kajiya-Kay mix.

Wavefront counterparts of the reference phase plugins (ref: src/phase/
{isotropic,hg,rayleigh}.cpp; interface phase.h:148-193). Conventions match
the reference exactly: wi points back toward the radiance source (wi =
-ray.d, BSDF-style), wo is the new outgoing direction (next ray direction);
HG eval takes dot(wi, wo) so forward scattering (g > 0) peaks at
dot(wi, wo) = -1 (hg.cpp:79-113, SURVEY Appendix A.7). All fns broadcast
over wavefront axes; g may be a per-lane array.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import Frame
from ..core.warp import INV_FOUR_PI

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2


def hg_eval(g, cos_theta):
    """HG phase value (1/4π)(1-g²)/(1+g²+2g·cosθ)^{3/2} (hg.cpp:105-113).

    cos_theta = wi·wo with both along propagation (the reference evaluates
    at dot(wi, wo) with its sign convention folded into the formula)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 + 2.0 * g * cos_theta, 1e-8)
    return INV_FOUR_PI * (1.0 - g2) / (denom * jnp.sqrt(denom))


def hg_sample(g, wi, u2):
    """Exact inverse-CDF HG sampling (hg.cpp:79-90). Returns (wo, pdf)."""
    # cosθ measured from -wi in the reference's derivation; careful below
    safe_g = jnp.where(jnp.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    cos_theta_g = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    cos_theta = jnp.where(jnp.abs(g) < 1e-4,
                          1.0 - 2.0 * u2[..., 0], cos_theta_g)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    # local sample about -wi (hg.cpp builds the frame around -wi)
    local = jnp.stack([sin_theta * jnp.cos(phi),
                       sin_theta * jnp.sin(phi), cos_theta], axis=-1)
    frame = Frame.from_normal(-wi)
    wo = Frame.to_world(frame, local)
    pdf = hg_eval(g, jnp.sum(wi * wo, axis=-1))
    return wo, pdf


def hg_pdf(g, wi, wo):
    return hg_eval(g, jnp.sum(wi * wo, axis=-1))


def isotropic_eval(cos_theta):
    return jnp.full(jnp.shape(cos_theta), INV_FOUR_PI)


def rayleigh_eval(cos_theta):
    """(3/16π)(1+cos²θ) (ref: src/phase/rayleigh.cpp)."""
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)
