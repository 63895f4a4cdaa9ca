"""Emitter sampling: direct-illumination (NEE) sampling and pdfs.

Wavefront analog of Scene::sampleEmitterDirect + the emitter plugins
(ref: src/librender/scene.cpp:828-856, src/emitters/{area,point,constant,
envmap}.cpp; SURVEY Appendix A.4/A.5). Emitter choice uses the scene's
discrete distribution with sample-reuse (pmf.h sampleReuse); area emitters
sample a triangle from a per-emitter area CDF stored "globalized" (emitter
index + within-segment cdf) so one vectorized searchsorted serves all
segments at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import dot, normalize, safe_div
from ..core.warp import (INV_FOUR_PI, square_to_uniform_sphere,
                         square_to_uniform_triangle)
from ..scene import scene as S


# sentinel "distance" for environment samples (finite: inf breaks AD)
ENV_DIST = 1e30


class DirectSample(NamedTuple):
    """Result of NEE sampling toward an emitter (ref: DirectSamplingRecord,
    emitter.h:580). All [N, ...]."""
    d: jnp.ndarray          # [N, 3] unit direction ref → emitter
    dist: jnp.ndarray       # [N] distance (ENV_DIST sentinel for env)
    pdf: jnp.ndarray        # [N] solid-angle pdf (0 ⇒ invalid sample)
    value: jnp.ndarray      # [N, 3] radiance / pdf-weighted contribution:
    #                         emitted radiance divided by pdf (incl. emitter pick)
    is_delta: jnp.ndarray   # [N] bool — delta emitter (point): skip BSDF-MIS
    n: jnp.ndarray          # [N, 3] emitter surface normal (env: -d)
    em_id: jnp.ndarray      # [N] int32


def sample_direct(scene: S.SceneData, ref_p, u_sel, u2) -> DirectSample:
    """Pick emitter ∝ samplingWeight and sample a direction toward it.

    u_sel [N]: emitter-selection uniform (reused within the bin).
    u2 [N, 2]: position/direction sample.
    """
    n_lanes = ref_p.shape[0]
    if scene.n_emitters == 0:
        z3 = jnp.zeros((n_lanes, 3))
        z = jnp.zeros((n_lanes,))
        return DirectSample(z3.at[..., 2].set(1.0), z, z, z3,
                            jnp.zeros((n_lanes,), bool), z3,
                            jnp.full((n_lanes,), -1, jnp.int32))

    em_id, u_re, em_pmf_val = scene.em_pmf.sample_reuse(u_sel)
    em_type = scene.em_type[em_id]
    em_rad = scene.em_radiance[em_id]
    em_pos = scene.em_pos[em_id]
    em_area = scene.em_area[em_id]

    # ---- area emitters: triangle pick via globalized CDF ---------------
    has_area_tris = scene.em_tris.shape[0] > 0
    if has_area_tris:
        # strictly increasing across segments: values in (e, e+1]
        key = em_id.astype(jnp.float32) + jnp.clip(u_re, 0.0, 1.0 - 1e-7)
        hi = jnp.searchsorted(scene.em_tri_cdfg, key, side="right")
        hi = jnp.clip(hi, 0, scene.em_tris.shape[0] - 1)
        # one packed-row gather: p0|e1|e2|ng
        row = scene.em_tri_data[hi]
        bar = square_to_uniform_triangle(u2)
        p_l = (row[..., 0:3] + bar[..., 0:1] * row[..., 3:6]
               + bar[..., 1:2] * row[..., 6:9])
        n_l = row[..., 9:12]
    else:
        p_l = jnp.zeros_like(ref_p)
        n_l = jnp.zeros_like(ref_p).at[..., 2].set(1.0)

    to_l = p_l - ref_p
    dist2 = jnp.maximum(jnp.sum(to_l * to_l, axis=-1), 1e-12)
    dist_area = jnp.sqrt(dist2)
    d_area = to_l / dist_area[..., None]
    cos_l = -dot(d_area, n_l)                     # light-side cosine
    # area→solid-angle pdf: (1/area_total) · dist² / cosθ (shape.cpp:102-126)
    pdf_area = safe_div(dist2, cos_l * jnp.maximum(em_area, 1e-12))
    area_valid = cos_l > 1e-6
    pdf_area = jnp.where(area_valid, pdf_area, 0.0)

    # ---- point emitters ------------------------------------------------
    to_p = em_pos - ref_p
    pdist2 = jnp.maximum(jnp.sum(to_p * to_p, axis=-1), 1e-12)
    pdist = jnp.sqrt(pdist2)
    d_point = to_p / pdist[..., None]
    # delta: value = intensity/dist², "pdf" bookkept as 1
    val_point = em_rad / pdist2[..., None]

    # ---- environment: constant (uniform sphere) or envmap (2D CDF) -----
    from .envmap import eval_env_dir, sample_env
    d_const = square_to_uniform_sphere(u2)
    pdf_const = jnp.full((n_lanes,), INV_FOUR_PI)
    d_map, pdf_map, _ = sample_env(scene, u2)

    is_area = em_type == S.EM_AREA
    is_point = (em_type == S.EM_POINT) | (em_type == S.EM_SPOT)
    is_spot = em_type == S.EM_SPOT
    is_directional = em_type == S.EM_DIRECTIONAL
    is_envmap = em_type == S.EM_ENVMAP
    is_env = (em_type == S.EM_CONSTANT) | is_envmap

    d_env = jnp.where(is_envmap[..., None], d_map, d_const)
    pdf_env = jnp.where(is_envmap, pdf_map, pdf_const)

    # spot falloff (spot.cpp falloffCurve): linear in angle between the
    # spot axis and the direction toward the receiver
    em_aux = scene.em_aux[em_id] if scene.em_aux.shape[0] else \
        jnp.zeros(em_id.shape + (8,))
    spot_dir = em_aux[..., 0:3]
    cos_cut = em_aux[..., 3]
    cos_beam = em_aux[..., 4]
    cos_ang = dot(spot_dir, -d_point)
    falloff = jnp.clip((cos_ang - cos_cut)
                       / jnp.maximum(cos_beam - cos_cut, 1e-6), 0.0, 1.0)
    spot_scale = jnp.where(is_spot, falloff, 1.0)

    d = jnp.where(is_area[..., None], d_area,
                  jnp.where(is_point[..., None], d_point,
                            jnp.where(is_directional[..., None],
                                      -em_pos, d_env)))
    # env "distance": large finite sentinel (an inf literal would make the
    # AD transpose produce inf·0 NaNs and trips jax_debug_nans)
    dist = jnp.where(is_area, dist_area,
                     jnp.where(is_point, pdist, ENV_DIST))
    pdf_sa = jnp.where(is_area, pdf_area,
                       jnp.where(is_point | is_directional, 1.0, pdf_env))
    # fold emitter-pick probability into the pdf (scene.cpp:846 dRec.pdf *= emPdf)
    pdf_total = pdf_sa * em_pmf_val
    radiance = jnp.where(is_envmap[..., None], eval_env_dir(scene, d),
                         em_rad)
    # value = radiance/pdf for non-delta; intensity·falloff/(dist²·pmf)
    # for point/spot; irradiance/pmf for directional
    is_delta = is_point | is_directional
    val_delta = jnp.where(
        is_directional[..., None], em_rad,
        val_point * spot_scale[..., None])
    value = jnp.where(
        is_delta[..., None],
        val_delta / jnp.maximum(em_pmf_val, 1e-12)[..., None],
        safe_div(radiance, pdf_total[..., None]))
    value = jnp.where((pdf_total > 0)[..., None], value, 0.0)
    norm = jnp.where(is_area[..., None], n_l, -d)
    return DirectSample(
        d=d, dist=dist, pdf=jnp.where(is_delta, em_pmf_val, pdf_total),
        value=value, is_delta=is_delta, n=norm,
        em_id=em_id.astype(jnp.int32))


def pdf_direct_area(scene: S.SceneData, em_id, d, dist, cos_l):
    """NEE pdf of a direction that hit area-emitter `em_id` at distance
    `dist` with light-side cosine `cos_l` — the MIS counterweight when a
    BSDF-sampled ray hits a light (ref: path.cpp:226-250 + pdfEmitterDirect).
    """
    if scene.n_emitters == 0:
        return jnp.zeros(em_id.shape)
    em_ok = em_id >= 0
    eid = jnp.maximum(em_id, 0)
    em_area = scene.em_area[eid]
    pmf = scene.em_pmf.pmf[eid]
    pdf = safe_div(dist * dist, cos_l * jnp.maximum(em_area, 1e-12)) * pmf
    return jnp.where(em_ok & (cos_l > 1e-6), pdf, 0.0)


def pdf_direct_env(scene: S.SceneData, d):
    """NEE pdf of an escaped ray's direction under the environment emitter."""
    if scene.n_emitters == 0:
        return jnp.zeros(d.shape[:-1])
    from .envmap import pdf_env_dir
    has_env = scene.env_id >= 0
    eid = jnp.maximum(scene.env_id, 0)
    pmf = scene.em_pmf.pmf[eid]
    is_map = scene.em_type[eid] == S.EM_ENVMAP
    pdf_dir = jnp.where(is_map, pdf_env_dir(scene, d), INV_FOUR_PI)
    return jnp.where(has_env, pdf_dir * pmf, jnp.zeros(d.shape[:-1]))


def eval_env(scene: S.SceneData, d):
    """Environment radiance along escaped directions (ref:
    Scene::evalEnvironment) — constant or image-based."""
    if scene.n_emitters == 0:
        return jnp.zeros(d.shape)
    from .envmap import eval_env_dir
    has_env = scene.env_id >= 0
    eid = jnp.maximum(scene.env_id, 0)
    is_map = scene.em_type[eid] == S.EM_ENVMAP
    rad = jnp.where(is_map, eval_env_dir(scene, d),
                    jnp.broadcast_to(scene.em_radiance[eid], d.shape))
    return jnp.where(has_env, rad, 0.0)


def eval_area(scene: S.SceneData, em_id, cos_surface):
    """Radiance of an area emitter seen from direction with surface-side
    cosine `cos_surface` (> 0 ⇒ front side; area.cpp:158-173 one-sided)."""
    if scene.n_emitters == 0:
        return jnp.zeros(em_id.shape + (3,))
    em_ok = em_id >= 0
    eid = jnp.maximum(em_id, 0)
    rad = scene.em_radiance[eid]
    vis = em_ok & (cos_surface > 0)
    return jnp.where(vis[..., None], rad, 0.0)
