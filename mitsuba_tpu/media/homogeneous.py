"""Homogeneous medium: closed-form Beer-Lambert sampling.

Counterpart of the reference's homogeneous medium (ref: src/medium/
homogeneous.cpp:157-223,356-410; SURVEY Appendix A.7), balance sampling
strategy (the reference default): pick a spectral channel uniformly, sample
t ∝ σt_c e^{-σt_c t}, and average the per-channel pdfs:

    pdfSuccess(t)  = (1/3) Σ_c σt_c e^{-σt_c t}
    pdfFailure(ts) = (1/3) Σ_c e^{-σt_c ts}

A medium interaction happens when the sampled t lands before the surface;
the returned weights already include transmittance / pdf so the caller just
multiplies throughput (w_medium carries σs).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MediumSample(NamedTuple):
    """Wavefront analog of MediumSamplingRecord (ref: medium.h:38)."""
    sampled: jnp.ndarray     # [N] bool — medium event before the surface
    t: jnp.ndarray           # [N] sampled medium distance
    w_medium: jnp.ndarray    # [N, 3] σs·Tr(t)/pdfSuccess  (medium lanes)
    w_surface: jnp.ndarray   # [N, 3] Tr(ts)/pdfFailure    (surface lanes)


def sample_distance(sigma_t, albedo, u_channel, u_dist, t_surf,
                    bound=1e30) -> MediumSample:
    """sigma_t, albedo: [3] (or broadcastable); u_*: [N]; t_surf: [N]
    (surface distance; may be huge for escaped rays).

    `bound` is the medium's extent along the ray: the global medium fills
    [0, bound] and vacuum lies beyond — the flat-array stand-in for the
    reference's shape-attached media boundaries (medium.h:121). An escaped
    ray through the whole medium is attenuated by Tr(bound), not Tr(∞).
    """
    sigma_t = jnp.asarray(sigma_t)
    sigma_s = sigma_t * jnp.asarray(albedo)
    n_ch = sigma_t.shape[-1]

    ch = jnp.minimum((u_channel * n_ch).astype(jnp.int32), n_ch - 1)
    sig_c = jnp.maximum(sigma_t[ch], 1e-8)
    t = -jnp.log1p(-jnp.clip(u_dist, 0.0, 1.0 - 1e-7)) / sig_c

    seg_end = jnp.minimum(t_surf, bound)
    sampled = t < seg_end
    # clamp exponents: exp(-700) underflows f32 anyway; avoids inf·0
    tr_t = jnp.exp(-jnp.minimum(sigma_t * t[..., None], 80.0))
    tr_s = jnp.exp(-jnp.minimum(sigma_t * seg_end[..., None], 80.0))
    pdf_success = jnp.mean(sigma_t * tr_t, axis=-1)
    pdf_failure = jnp.mean(tr_s, axis=-1)

    w_medium = sigma_s * tr_t / jnp.maximum(pdf_success, 1e-20)[..., None]
    w_surface = tr_s / jnp.maximum(pdf_failure, 1e-20)[..., None]
    return MediumSample(sampled, t, w_medium, w_surface)


def transmittance(sigma_t, dist, bound=1e30):
    """Beer-Lambert Tr = e^{-σt min(d, bound)} (ref: homogeneous.cpp
    evalTransmittance, clipped to the medium extent)."""
    d_eff = jnp.minimum(dist, bound)
    return jnp.exp(-jnp.minimum(jnp.asarray(sigma_t)
                                * d_eff[..., None], 80.0))
