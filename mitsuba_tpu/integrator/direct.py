"""Direct illumination integrator with sample splitting.

Counterpart of the reference `direct` plugin (ref: src/integrators/direct/
direct.cpp; SURVEY Appendix A.1): emitterSamples NEE draws + bsdfSamples
BSDF draws per shading point, MIS weights folding in the per-strategy
sample fractions m_weightLum/m_weightBSDF/m_fracLum/m_fracBSDF
(direct.cpp:131-135).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import (eval_bsdf_ex, pdf_bsdf_ex, perturb_shading_frame,
                         resolve_material, sample_bsdf_ex)
from ..core.math import SHADOW_EPSILON, Frame, dot
from ..emitter.emitter import (eval_area, eval_env, pdf_direct_area,
                               pdf_direct_env, sample_direct)
from ..scene.scene import SceneData
from .common import (DIM_BSDF_U1, DIM_BSDF_U2, DIM_NEE_POS, DIM_NEE_SEL,
                     bounce_dim, offset_ray_origin, ray_mint)
from .path import PathTracer


def _mis_frac(pdf_a, pdf_b, frac_a, frac_b):
    """Power heuristic including sample fractions (direct.cpp miWeight)."""
    a = pdf_a * frac_a
    b = pdf_b * frac_b
    r = jnp.clip(b / jnp.maximum(a, 1e-6), 0.0, 1e6)
    return jnp.where(a > 0, 1.0 / (1.0 + r * r), 0.0)


@dataclass(frozen=True)
class DirectIntegrator(PathTracer):
    """emitter_samples/bsdf_samples mirror the plugin's Properties
    (direct.cpp:99-107)."""
    emitter_samples: int = 1
    bsdf_samples: int = 1

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        return self.li_stats(scene, o, d, seed, pixel_id, sample_idx)[0]

    def li_stats(self, scene: SceneData, o, d, seed, pixel_id,
                 sample_idx=0):
        n = o.shape[0]
        ne, nb = self.emitter_samples, self.bsdf_samples
        frac_lum = ne / (ne + nb)
        frac_bsdf = nb / (ne + nb)

        its = self._intersect(scene, o, d, ray_mint(o))
        hit = its.valid
        escaped = ~hit
        L = jnp.where(escaped[..., None], eval_env(scene, d), 0.0)

        # directly visible emitters
        cos_surf = -dot(d, its.ng)
        le = eval_area(scene, its.em_id, cos_surf)
        L = L + jnp.where(hit[..., None], le, 0.0)

        mat = resolve_material(scene, its.mat_id, its.uv, self.families)
        frame = Frame.from_normal(its.ns)
        frame = perturb_shading_frame(scene, mat, frame, its.uv)
        wi_local = Frame.to_local(frame, -d)
        n_rays = jnp.sum(hit.astype(jnp.uint32))

        # ---- emitter sampling strategy --------------------------------
        for k in range(ne):
            u_sel = self._d1(seed, pixel_id, sample_idx,
                             bounce_dim(k, DIM_NEE_SEL))
            u_pos = self._d2(seed, pixel_id, sample_idx,
                             bounce_dim(k, DIM_NEE_POS))
            ds = sample_direct(scene, its.p, u_sel, u_pos)
            wo = Frame.to_local(frame, ds.d)
            f = eval_bsdf_ex(mat, wi_local, wo, self.families)
            ok = hit & (ds.pdf > 0) & jnp.any(f > 0, axis=-1)
            so = offset_ray_origin(its.p, its.ng, ds.d)
            occ = self._occluded(scene, so, ds.d, ray_mint(so),
                                 ds.dist * (1.0 - SHADOW_EPSILON))
            ok = ok & ~occ
            bsdf_pdf = pdf_bsdf_ex(mat, wi_local, wo, self.families)
            w = jnp.where(ds.is_delta, 1.0,
                          _mis_frac(ds.pdf, bsdf_pdf, frac_lum, frac_bsdf))
            L = L + jnp.where(ok[..., None],
                              ds.value * f * (w / ne)[..., None], 0.0)
            n_rays = n_rays + jnp.sum(ok.astype(jnp.uint32))

        # ---- BSDF sampling strategy -----------------------------------
        for k in range(nb):
            u2 = self._d2(seed, pixel_id, sample_idx,
                          bounce_dim(k, DIM_BSDF_U2))
            u1 = self._d1(seed, pixel_id, sample_idx,
                          bounce_dim(k, DIM_BSDF_U1))
            bs = sample_bsdf_ex(mat, wi_local, u2, u1, self.families)
            d2w = Frame.to_world(frame, bs.wo)
            o2 = offset_ray_origin(its.p, its.ng, d2w)
            its2 = self._intersect(scene, o2, d2w, ray_mint(o2))
            ok = hit & (bs.pdf > 0)
            # hit an emitter?
            cos2 = -dot(d2w, its2.ng)
            le2 = eval_area(scene, its2.em_id, cos2)
            nee_pdf = pdf_direct_area(scene, its2.em_id, d2w, its2.t, cos2)
            # or escaped to env
            env2 = eval_env(scene, d2w)
            env_pdf = pdf_direct_env(scene, d2w)
            radiance = jnp.where(its2.valid[..., None], le2, env2)
            counter = jnp.where(its2.valid, nee_pdf, env_pdf)
            w = jnp.where(bs.is_delta, 1.0,
                          _mis_frac(bs.pdf, counter, frac_bsdf, frac_lum))
            L = L + jnp.where(ok[..., None],
                              bs.weight * radiance * (w / nb)[..., None],
                              0.0)
            n_rays = n_rays + jnp.sum(ok.astype(jnp.uint32))

        return L, n_rays
