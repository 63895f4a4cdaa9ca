"""Numpy oracle for the volumetric path tracer (matched sample streams).

Mirrors mitsuba_tpu/integrator/volpath.py estimator-for-estimator so the
matched-seed equality test covers BASELINE config 5 (homogeneous media + HG
phase). Reuses the surface machinery from oracle/render.py.
"""
from __future__ import annotations

import numpy as np

from . import rng
from .render import (OracleScene, SHADOW_EPS, _eval_bsdf, _offset,
                     _pdf_bsdf, _pdf_direct_area, _ray_mint, _sample_bsdf,
                     _sample_direct, coordinate_system, dot, mis_power,
                     to_local, to_world)

SENSOR_DIMS = 4
DIMS_PER_BOUNCE = 8
(DIM_NEE_SEL, DIM_NEE_POS, DIM_BSDF_U2, DIM_BSDF_U1, DIM_RR,
 DIM_MEDIUM, DIM_PHASE) = range(7)


def bounce_dim(b, off):
    return SENSOR_DIMS + b * DIMS_PER_BOUNCE + off


def hg_eval(g, cos_theta):
    g2 = g * g
    denom = np.maximum(1.0 + g2 + 2.0 * g * cos_theta, 1e-8)
    return (1.0 / (4 * np.pi)) * (1.0 - g2) / (denom * np.sqrt(denom))


def hg_sample(g, wi, u2):
    safe_g = np.where(np.abs(g) < 1e-4, 1e-4, g)
    sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u2[..., 0])
    ct_g = (1.0 + g * g - sqr * sqr) / (2.0 * safe_g)
    ct = np.where(np.abs(g) < 1e-4, 1.0 - 2.0 * u2[..., 0], ct_g)
    ct = np.clip(ct, -1.0, 1.0)
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * np.pi * u2[..., 1]
    local = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    s, t = coordinate_system(-wi)
    wo = to_world(s, t, -wi, local)
    return wo, hg_eval(g, dot(wi, wo))


def render_volpath_oracle(scene, camera, width, height, spp, seed,
                          max_depth=8, rr_depth=5):
    sc = OracleScene(scene)
    sigma_t = np.asarray(scene.med_sigma_t, np.float64)[0]
    albedo = np.asarray(scene.med_albedo, np.float64)[0]
    g = float(np.asarray(scene.med_g)[0])
    bound = float(np.asarray(scene.med_bound)[0])
    has_med = bool(np.asarray(scene.has_medium))
    sigma_s = sigma_t * albedo

    n = width * height
    px = np.arange(n, dtype=np.uint32)
    pix_x = (px % width).astype(np.float64)
    pix_y = (px // width).astype(np.float64)
    img = np.zeros((height, width, 3))

    for s in range(spp):
        jit = rng.sample_2d(seed, px, 0, s).astype(np.float64)
        pos = np.stack([pix_x + jit[:, 0], pix_y + jit[:, 1]], -1)
        o, d = camera.sample_ray(pos.astype(np.float32))
        L = _li(sc, np.asarray(o, np.float64), np.asarray(d, np.float64),
                seed, px, s, max_depth, rr_depth,
                sigma_t, sigma_s, g, has_med, bound)
        ix = np.clip(np.floor(pos[:, 0]).astype(int), 0, width - 1)
        iy = np.clip(np.floor(pos[:, 1]).astype(int), 0, height - 1)
        np.add.at(img, (iy, ix), L)
    return img / spp


def _li(sc, o, d, seed, pixel, samp, max_depth, rr_depth, sigma_t,
        sigma_s, g, has_med, bound):
    n = o.shape[0]
    L = np.zeros((n, 3))
    throughput = np.ones((n, 3))
    active = np.ones(n, bool)
    prev_pdf = np.ones(n)
    prev_delta = np.ones(n, bool)
    eta_scale = np.ones(n)

    for bounce in range(max_depth):
        t, tri, hit, _, _ = sc.intersect(o, d, _ray_mint(o),
                                         np.full(n, np.inf))
        hit = hit & active
        t_surf = np.where(hit, t, 1e30)

        # medium sampling (balance)
        u_med = rng.sample_2d(seed, pixel,
                              bounce_dim(bounce, DIM_MEDIUM), samp).astype(
                                  np.float64)
        ch = np.minimum((u_med[:, 0] * 3).astype(int), 2)
        sig_c = np.maximum(sigma_t[ch], 1e-8)
        t_med = -np.log1p(-np.clip(u_med[:, 1], 0, 1 - 1e-7)) / sig_c
        seg_end = np.minimum(t_surf, bound)
        sampled = t_med < seg_end
        in_medium = active & has_med & sampled
        on_surface = active & hit & ~(has_med & sampled)
        escaped = active & ~hit & ~(has_med & sampled)

        tr_t = np.exp(-np.minimum(sigma_t * t_med[:, None], 80.0))
        tr_s = np.exp(-np.minimum(sigma_t * seg_end[:, None], 80.0))
        pdf_succ = np.mean(sigma_t * tr_t, axis=-1)
        pdf_fail = np.mean(tr_s, axis=-1)
        w_med = sigma_s * tr_t / np.maximum(pdf_succ, 1e-20)[:, None]
        w_srf = tr_s / np.maximum(pdf_fail, 1e-20)[:, None]
        if has_med:
            throughput = throughput * np.where(in_medium[:, None], w_med,
                                               w_srf)

        # escaped → env
        if sc.env_id >= 0:
            rad = sc.em_radiance[sc.env_id]
            env_pdf = sc.em_pmf[sc.env_id] / (4 * np.pi)
            w = np.where(prev_delta, 1.0, mis_power(prev_pdf, env_pdf))
            L += np.where(escaped[:, None], throughput * rad * w[:, None],
                          0.0)
        # surface emitter hit
        tri_c = np.where(hit, tri, 0)
        ng = sc.ng[tri_c]
        t_safe = np.where(hit, t, 0.0)
        p = o + t_safe[:, None] * d
        em_id = np.where(hit, sc.tri_em[tri_c], -1)
        mat_id = np.where(hit, sc.tri_mat[tri_c], -1)
        cos_surf = -dot(d, ng)
        has_em = on_surface & (em_id >= 0) & (cos_surf > 0)
        le = sc.em_radiance[np.maximum(em_id, 0)]
        nee_pdf = _pdf_direct_area(sc, em_id, t, cos_surf)
        w_hit = np.where(prev_delta, 1.0, mis_power(prev_pdf, nee_pdf))
        L += np.where(has_em[:, None], throughput * le * w_hit[:, None],
                      0.0)

        depth = bounce + 2
        # NEE
        p_med = o + t_med[:, None] * d
        p_event = np.where(in_medium[:, None], p_med, p)
        u_sel = rng.sample_1d(seed, pixel,
                              bounce_dim(bounce, DIM_NEE_SEL), samp).astype(
                                  np.float64)
        u_pos = rng.sample_2d(seed, pixel,
                              bounce_dim(bounce, DIM_NEE_POS), samp).astype(
                                  np.float64)
        ds_d, ds_dist, ds_pdf, ds_val, ds_delta, _ = _sample_direct(
            sc, p_event, u_sel, u_pos)
        nee_ok = (ds_pdf > 0) & (depth + 1 <= max_depth + 1)

        sf, tf_ = coordinate_system(ng)
        wi_l = to_local(sf, tf_, ng, -d)
        wo_nee = to_local(sf, tf_, ng, ds_d)
        f_surf = _eval_bsdf(sc, mat_id, wi_l, wo_nee)
        pdf_surf = _pdf_bsdf(sc, mat_id, wi_l, wo_nee)
        f_phase = hg_eval(g, dot(-d, ds_d))
        f_nee = np.where(in_medium[:, None],
                         np.broadcast_to(f_phase[:, None], f_surf.shape),
                         f_surf)
        counter_pdf = np.where(in_medium, f_phase, pdf_surf)

        so = np.where(in_medium[:, None], p_event, _offset(p, ng, ds_d))
        smax = ds_dist * (1 - SHADOW_EPS)
        occ = sc.occluded(so, ds_d, _ray_mint(so), smax)
        if has_med:
            tr_sh = np.exp(-np.minimum(
                sigma_t * np.minimum(ds_dist, bound)[:, None], 80.0))
        else:
            tr_sh = np.ones((n, 3))
        contributes = (in_medium | on_surface) & nee_ok & ~occ \
            & np.any(f_nee > 0, axis=-1)
        w_nee = np.where(ds_delta, 1.0, mis_power(ds_pdf, counter_pdf))
        L += np.where(contributes[:, None],
                      throughput * ds_val * f_nee * tr_sh * w_nee[:, None],
                      0.0)

        # continuation
        u2 = rng.sample_2d(seed, pixel,
                           bounce_dim(bounce, DIM_BSDF_U2), samp).astype(
                               np.float64)
        u1 = rng.sample_1d(seed, pixel,
                           bounce_dim(bounce, DIM_BSDF_U1), samp).astype(
                               np.float64)
        wo, wgt, bpdf, bdelta = _sample_bsdf(sc, mat_id, wi_l, u2, u1)
        d_bsdf = to_world(sf, tf_, ng, wo)
        u_ph = rng.sample_2d(seed, pixel,
                             bounce_dim(bounce, DIM_PHASE), samp).astype(
                                 np.float64)
        d_phase, pdf_phase = hg_sample(np.full(n, g), -d, u_ph)
        d_next = np.where(in_medium[:, None], d_phase, d_bsdf)
        o_next = np.where(in_medium[:, None], p_event,
                          _offset(p, ng, d_bsdf))
        w_cont = np.where(in_medium[:, None], 1.0, wgt)
        pdf_cont = np.where(in_medium, pdf_phase, bpdf)
        delta_cont = np.where(in_medium, False, bdelta)

        tp_next = throughput * w_cont
        alive = (in_medium | on_surface) & (pdf_cont > 0) \
            & np.any(tp_next > 0, axis=-1) & (depth <= max_depth)
        eta_scale = eta_scale * np.where(in_medium, 1.0,
                                         np.ones(n))  # eta=1 here
        q = np.minimum(np.max(tp_next, -1) * eta_scale ** 2, 0.95)
        u_rr = rng.sample_1d(seed, pixel,
                             bounce_dim(bounce, DIM_RR), samp).astype(np.float64)
        if depth >= rr_depth:
            rr_cont = u_rr < q
            tp_next = np.where(rr_cont[:, None],
                               tp_next / np.maximum(q, 1e-6)[:, None],
                               tp_next)
            alive &= rr_cont
        o = o_next
        d = np.where(alive[:, None], d_next, d)
        throughput = np.where(alive[:, None], tp_next, 0.0)
        active = alive
        prev_pdf = np.where(delta_cont, 1.0, pdf_cont)
        prev_delta = delta_cont.astype(bool)
        if not active.any():
            break
    return L
