"""Path-replay backpropagation (PRB): tape-free reverse-mode gradients.

The BASELINE north star: naive AD through the bounce scan stores O(depth ×
wavefront) residuals; PRB (Vicini et al. 2021) stores none — the backward
pass *re-traces* the same paths (exact replay via the counter-based RNG,
core/rng.py) and reconstructs each bounce's adjoint from the multiplicative
path structure:

    L = Σ_k T_k · c_k,   T_{k+1} = T_k ⊙ w_k,   T_0 = 1

with c_k the bounce-local contribution (emission + env + NEE) and w_k the
continuation weight (BSDF weight incl. RR). Carrying the "remaining
radiance" R_k (R_0 = L, R_{k+1} = (R_k − c_k) / w_k) gives

    ∂L/∂θ = Σ_k dL ⊙ T_k · [∂c_k/∂θ + ∂w_k/∂θ ⊙ R_{k+1}]

so each bounce needs only a *local* VJP of (c_k, w_k) w.r.t. the parameter
tables — computed with `jax.vjp` over a function that closes over detached
sampling decisions (detached-sampling estimator: directions, pdfs, MIS
weights, RR and visibility are constants of the replay; parameter
dependence flows through BSDF values and emitted radiance only — the same
estimator family as the reference fork's forward-mode machinery, SURVEY
Appendix A.9, which likewise differentiates shading parameters, not
silhouettes).

Supported parameter leaves: mat_params (albedo/roughness/conductor
eta,k/spec — every family whose lobes are smooth, plus the conductor delta
lobe) and em_radiance. The local VJP differentiates through the table
gathers, so cotangents scatter-accumulate into table rows automatically.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import (conductor_sample, eval_bsdf, pdf_bsdf,
                         resolve_params, sample_bsdf)
from ..core.math import SHADOW_EPSILON, Frame, dot
from ..emitter.emitter import (eval_area, eval_env, pdf_direct_area,
                               pdf_direct_env, sample_direct)
from ..scene.scene import MAT_CONDUCTOR, SceneData
from .common import (DIM_BSDF_U1, DIM_BSDF_U2, DIM_NEE_POS, DIM_NEE_SEL,
                     DIM_RR, bounce_dim, mis_power, offset_ray_origin,
                     ray_mint)
from .path import PathTracer

_SG = jax.lax.stop_gradient


@dataclass(frozen=True)
class PRBPathTracer(PathTracer):
    """PathTracer with a constant-memory custom backward pass."""

    def li_and_grad(self, scene: SceneData, o, d, seed, pixel_id,
                    sample_idx, dL):
        """Forward radiance + parameter gradients in one replay sweep.

        dL: [N, 3] adjoint of the per-lane radiance (e.g. ∂loss/∂L).
        Returns (L [N,3], grads dict with 'mat_params' and 'em_radiance').
        """
        n = o.shape[0]
        sc_det = _SG(scene)

        # ---- pass 1: forward estimate (fully detached) -----------------
        L_total = _SG(self.li(sc_det, o, d, seed, pixel_id, sample_idx))

        # ---- pass 2: replay with per-bounce local VJPs -----------------
        def bounce_body(carry, bounce):
            (o, d, throughput, R, active, eta_scale, prev_pdf, prev_delta,
             g_mat, g_em) = carry

            its = self._intersect(sc_det, o, d, ray_mint(o))
            hit = active & its.valid
            escaped = active & ~its.valid

            first = bounce == 0
            cos_surf = -dot(d, its.ng)
            frame = Frame.from_normal(its.ns)
            wi_local = Frame.to_local(frame, -d)

            # detached decisions -------------------------------------------------
            u_sel = self._d1(seed, pixel_id, sample_idx,
                             bounce_dim(bounce, DIM_NEE_SEL))
            u_pos = self._d2(seed, pixel_id, sample_idx,
                             bounce_dim(bounce, DIM_NEE_POS))
            ds = sample_direct(sc_det, its.p, u_sel, u_pos)
            depth = bounce + 2
            nee_allowed = hit & (depth + 1 <= self.max_depth + 1) \
                if self.max_depth > 0 else hit
            so = offset_ray_origin(its.p, its.ng, ds.d)
            occluded = self._occluded(sc_det, so, ds.d, ray_mint(so),
                                      ds.dist * (1.0 - SHADOW_EPSILON))
            wo_nee = Frame.to_local(frame, ds.d)

            u2 = self._d2(seed, pixel_id, sample_idx,
                          bounce_dim(bounce, DIM_BSDF_U2))
            u1 = self._d1(seed, pixel_id, sample_idx,
                          bounce_dim(bounce, DIM_BSDF_U1))
            mtype_det, params_det = resolve_params(sc_det, its.mat_id,
                                                   its.uv)
            bs = sample_bsdf(mtype_det, params_det, wi_local, u2, u1,
                             self.families)
            wo_det = _SG(bs.wo)
            pdf_det = _SG(bs.pdf)

            # MIS weights (detached pdfs)
            env_pdf = pdf_direct_env(sc_det, d)
            w_env = jnp.where(prev_delta, 1.0, mis_power(prev_pdf, env_pdf))
            w_env = jnp.where(first & self.hide_emitters, 0.0, w_env)
            nee_pdf_hit = pdf_direct_area(sc_det, its.em_id, d, its.t,
                                          cos_surf)
            w_hit = jnp.where(prev_delta, 1.0,
                              mis_power(prev_pdf, nee_pdf_hit))
            w_hit = jnp.where(first & self.hide_emitters, 0.0, w_hit)
            bsdf_pdf_nee = pdf_bsdf(mtype_det, params_det, wi_local, wo_nee,
                                    self.families)
            w_nee = jnp.where(ds.is_delta, 1.0,
                              mis_power(ds.pdf, bsdf_pdf_nee))
            inv_ds_pdf = jnp.where(ds.pdf > 0, 1.0 / jnp.maximum(
                ds.pdf, 1e-20), 0.0)
            nee_live = nee_allowed & ~occluded & (ds.pdf > 0)

            # ---- bounce-local differentiable (c_k, w_k) ----------------
            def local(mat_tbl, em_tbl):
                sc_live = scene._replace(mat_params=mat_tbl,
                                         em_radiance=em_tbl)
                # c: env escape
                c = jnp.where(escaped[..., None],
                              eval_env(sc_live, d) * w_env[..., None], 0.0)
                # c: emitter hit
                le = eval_area(sc_live, its.em_id, cos_surf)
                c = c + jnp.where(hit[..., None], le * w_hit[..., None],
                                  0.0)
                # c: NEE (radiance live; pdf + visibility detached)
                _, params_live = resolve_params(sc_live, its.mat_id,
                                                its.uv)
                f_nee = eval_bsdf(mtype_det, params_live, wi_local, wo_nee,
                                  self.families)
                em_ok = ds.em_id >= 0
                rad_live = sc_live.em_radiance[jnp.maximum(ds.em_id, 0)]
                # point lights: ds.value already includes 1/dist²·1/pmf —
                # scale live radiance by detached (value/radiance_det)
                rad_det = _SG(rad_live)
                val_scale = jnp.where(
                    rad_det > 1e-20, _SG(ds.value) / jnp.maximum(
                        rad_det, 1e-20), 0.0)
                nee_val = rad_live * val_scale
                c = c + jnp.where((nee_live & em_ok)[..., None],
                                  nee_val * f_nee * w_nee[..., None], 0.0)

                # w: continuation weight with detached direction + pdf
                f_cont = eval_bsdf(mtype_det, params_live, wi_local,
                                   wo_det, self.families)
                inv_pdf = jnp.where(pdf_det > 0,
                                    1.0 / jnp.maximum(pdf_det, 1e-20), 0.0)
                w_smooth = f_cont * inv_pdf[..., None]
                # conductor delta lobe: weight = F(wi)·spec, live params
                _, wt_c, _, _, _ = conductor_sample(params_live, wi_local,
                                                    u2, u1)
                is_cond = mtype_det == MAT_CONDUCTOR
                w = jnp.where(is_cond[..., None], wt_c,
                              jnp.where(bs.is_delta[..., None],
                                        _SG(bs.weight), w_smooth))
                return c, w

            mat_tbl = scene.mat_params
            em_tbl = scene.em_radiance
            (c_k, w_raw), vjp = jax.vjp(local, mat_tbl, em_tbl)
            c_k = _SG(c_k)
            w_raw = _SG(w_raw)

            # RR (detached) — folded into w_k
            eta_scale_next = eta_scale * _SG(bs.eta)
            tp_next_raw = throughput * w_raw
            alive = hit & (pdf_det > 0) & jnp.any(tp_next_raw > 0, axis=-1)
            if self.max_depth > 0:
                alive = alive & (depth <= self.max_depth)
            q = jnp.minimum(jnp.max(tp_next_raw, axis=-1)
                            * eta_scale_next ** 2, 0.95)
            u_rr = self._d1(seed, pixel_id, sample_idx,
                            bounce_dim(bounce, DIM_RR))
            do_rr = depth >= self.rr_depth
            rr_continue = ~do_rr | (u_rr < q)
            alive = alive & rr_continue
            rr_scale = jnp.where(do_rr & rr_continue,
                                 1.0 / jnp.maximum(q, 1e-6), 1.0)
            w_k = jnp.where(alive[..., None], w_raw * rr_scale[..., None],
                            0.0)

            # remaining radiance after this bounce (per unit T_{k+1})
            R_after = jnp.where(w_k > 1e-12, (R - c_k) / jnp.maximum(
                w_k, 1e-12), 0.0)
            R_after = jnp.clip(R_after, -1e6, 1e6)

            # local VJP: cotangents for c and w
            cot_c = dL * throughput
            # w_k = w_raw · rr_scale ⇒ ∂/∂w_raw carries rr_scale
            cot_w = dL * throughput * R_after * rr_scale[..., None]
            d_mat, d_em = vjp((cot_c, cot_w))
            g_mat = g_mat + d_mat
            g_em = g_em + d_em

            d_next = Frame.to_world(frame, wo_det)
            return ((offset_ray_origin(its.p, its.ng, d_next),
                     jnp.where(alive[..., None], d_next, d),
                     jnp.where(alive[..., None], throughput * w_k, 0.0),
                     R_after, alive, eta_scale_next,
                     jnp.where(bs.is_delta, 1.0, pdf_det),
                     bs.is_delta, g_mat, g_em), None)

        n_bounces = self.max_depth if self.max_depth > 0 else 32
        zf = o[..., 0] * 0.0
        zero3 = jnp.zeros_like(o)
        init = (o, d, zero3 + 1.0, L_total, zf < 1.0, zf + 1.0, zf + 1.0,
                zf < 1.0, jnp.zeros_like(scene.mat_params),
                jnp.zeros_like(scene.em_radiance))
        (*_, g_mat, g_em), _ = jax.lax.scan(bounce_body, init,
                                            jnp.arange(n_bounces))
        return L_total, {"mat_params": g_mat, "em_radiance": g_em}
