"""Dipole subsurface scattering (Jensen et al. 2001 BSSRDF).

Counterpart of the reference `dipole` subsurface plugin (ref:
src/subsurface/dipole.cpp:113,268,442 + irrproc.cpp irradiance sampling,
bluenoise.cpp placement): preprocess distributes irradiance samples over
the target shape's surface and evaluates E there; at render time the
diffusion term is Mo(x) = Σ_i R_d(‖x−x_i‖)·E_i·A_i and the outgoing
radiance adds (Ft/π)·Mo.

TPU-native redesign: the reference gathers through an octree
(irrproc.h); here the gather is a dense [N_pixels, K_samples] distance
matrix contracted against the irradiance table — two MXU-shaped
matmul-like ops, no pointer tree. K ≤ a few thousand keeps it cheap; the
octree's O(log) pruning is unnecessary because R_d decays exponentially
and XLA fuses the mask.

Irradiance preprocess: area-weighted triangle sampling (counter-RNG
stratified) + NEE direct lighting per sample — the wavefront analog of
irrproc.cpp's IrradianceSamplingProcess.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import SHADOW_EPSILON, dot
from ..emitter.emitter import sample_direct
from ..scene.scene import SceneData
from .common import offset_ray_origin, ray_mint
from .path import PathTracer

_DIM_IRR = 1 << 25


def _fresnel_dielectric_cos(cos_i, eta):
    """Unpolarized Fresnel reflectance, scalar eta (ref: util.h
    fresnelDielectricExt)."""
    cos_i = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    sin_t2 = (1.0 / (eta * eta)) * jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    tir = sin_t2 >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    rs = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-9)
    rp = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


class DipoleTable(NamedTuple):
    """Preprocessed irradiance samples on the subsurface shape."""
    p: jax.Array       # [K, 3]
    n: jax.Array       # [K, 3]
    e: jax.Array       # [K, 3] irradiance
    area: jax.Array    # [K] per-sample area weight (A_total / K)
    valid: jax.Array   # [K]


@dataclass(frozen=True)
class DipoleIntegrator(PathTracer):
    """Path tracer + dipole term on surfaces with material `target_mat`
    (give that material zero albedo so surface and subsurface transport
    don't double-count, as index-matched dipole setups do in the
    reference). sigma_s/sigma_a in world units⁻¹; scale as dipole.cpp's
    `scale` property."""
    target_mat: int = -1
    sigma_s: tuple = (2.6, 3.2, 3.9)
    sigma_a: tuple = (0.0021, 0.0041, 0.0071)
    g: float = 0.0
    eta: float = 1.33
    scale: float = 1.0
    irr_samples: int = 1024       # K
    irr_spp: int = 4              # NEE samples per irradiance point

    # -- diffusion profile constants (dipole.cpp configure) -------------
    def _profile(self):
        sig_s = np.asarray(self.sigma_s, np.float64) * self.scale
        sig_a = np.asarray(self.sigma_a, np.float64) * self.scale
        sig_sp = sig_s * (1.0 - self.g)
        sig_tp = sig_sp + sig_a
        alpha_p = sig_sp / np.maximum(sig_tp, 1e-12)
        sig_tr = np.sqrt(3.0 * sig_a * sig_tp)
        fdr = (-1.440 / self.eta ** 2 + 0.710 / self.eta + 0.668
               + 0.0636 * self.eta)
        a_coef = (1.0 + fdr) / (1.0 - fdr)
        zr = 1.0 / np.maximum(sig_tp, 1e-12)
        zv = zr * (1.0 + 4.0 / 3.0 * a_coef)
        return (jnp.asarray(alpha_p, jnp.float32),
                jnp.asarray(sig_tr, jnp.float32),
                jnp.asarray(zr, jnp.float32),
                jnp.asarray(zv, jnp.float32))

    # -- preprocess: irradiance samples ----------------------------------
    def build_table(self, scene: SceneData, seed: int = 0) -> DipoleTable:
        k = self.irr_samples
        kid = jnp.arange(k, dtype=jnp.uint32)
        seed = jnp.asarray(seed, jnp.uint32)

        mask = (scene.tri_mat == self.target_mat) & (scene.tri_area > 0)
        area = jnp.where(mask, scene.tri_area, 0.0)
        cdf = jnp.cumsum(area)
        total = jnp.maximum(cdf[-1], 1e-12)
        u = rng.sample_1d(seed, kid, _DIM_IRR)
        tri = jnp.clip(jnp.searchsorted(cdf, u * total, side="right"),
                       0, scene.p0.shape[0] - 1)
        u2 = rng.sample_2d(seed, kid, _DIM_IRR + 1)
        sq = jnp.sqrt(jnp.maximum(1.0 - u2[..., 0], 0.0))
        b0 = 1.0 - sq
        b1 = u2[..., 1] * sq
        p = (scene.p0[tri] + b0[..., None] * scene.e1[tri]
             + b1[..., None] * scene.e2[tri])
        n = scene.ng[tri]

        # NEE irradiance (multi-sample)
        def one(sidx, e):
            us = rng.sample_1d(seed, kid, _DIM_IRR + 2, sidx)
            up = rng.sample_2d(seed, kid, _DIM_IRR + 3, sidx)
            ds = sample_direct(scene, p, us, up)
            cos_i = jnp.maximum(dot(ds.d, n), 0.0)
            so = offset_ray_origin(p, n, ds.d)
            occ = self._occluded(scene, so, ds.d, ray_mint(so),
                                 ds.dist * (1.0 - SHADOW_EPSILON))
            ok = (ds.pdf > 0) & ~occ & (cos_i > 0)
            return e + jnp.where(ok[..., None],
                                 ds.value * cos_i[..., None], 0.0)

        e = jax.lax.fori_loop(0, self.irr_spp, one, jnp.zeros((k, 3)))
        e = e / self.irr_spp
        return DipoleTable(p, n, e, jnp.full((k,), total / k),
                           mask[tri])

    # -- diffusion gather -------------------------------------------------
    def dipole_mo(self, table: DipoleTable, x):
        """Mo(x) [N, 3] = Σ_i R_d(‖x−x_i‖)·E_i·A_i, dense contraction."""
        alpha_p, sig_tr, zr, zv = self._profile()
        # [N, K] squared distances (MXU: ‖x‖² + ‖y‖² − 2x·y)
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        y2 = jnp.sum(table.p * table.p, axis=-1)[None, :]
        r2 = jnp.maximum(x2 + y2 - 2.0 * (x @ table.p.T), 0.0)

        def rd(r2c, zrc, zvc, sig):
            dr = jnp.sqrt(r2c + zrc * zrc)
            dv = jnp.sqrt(r2c + zvc * zvc)
            c1 = zrc * (sig * dr + 1.0) * jnp.exp(-sig * dr) / (dr ** 3)
            c2 = zvc * (sig * dv + 1.0) * jnp.exp(-sig * dv) / (dv ** 3)
            return (c1 + c2) / (4.0 * np.pi)

        w = table.area * table.valid            # [K]
        ew = table.e * w[:, None]               # [K, 3]
        mo = jnp.stack([
            (rd(r2, zr[c], zv[c], sig_tr[c]) * alpha_p[c]) @ ew[:, c]
            for c in range(3)], axis=-1)
        return mo

    # -- render ------------------------------------------------------------
    def li_with_table(self, scene: SceneData, table: DipoleTable, o, d,
                      seed, pixel_id, sample_idx=0):
        L = super().li(scene, o, d, seed, pixel_id, sample_idx)
        its = self._intersect(scene, o, d, ray_mint(o))
        sel = its.valid & (its.mat_id == self.target_mat)
        mo = self.dipole_mo(table, its.p)
        cos_o = jnp.abs(dot(d, its.ns))
        ft = 1.0 - _fresnel_dielectric_cos(cos_o, self.eta)
        lo = mo * (ft / np.pi)[..., None]
        return L + jnp.where(sel[..., None], lo, 0.0)

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        table = self.build_table(scene, seed)
        return self.li_with_table(scene, table, o, d, seed, pixel_id,
                                  sample_idx)

    def render(self, scene: SceneData, camera, film, spp: int = 8,
               seed: int = 0):
        return _render_dipole(scene, camera, film, self, spp, seed)


@partial(jax.jit, static_argnames=("camera", "film", "integ", "spp"))
def _render_dipole(scene, camera, film, integ: DipoleIntegrator, spp,
                   seed):
    table = integ.build_table(scene, seed)
    h, w = film.height, film.width
    n = h * w
    px = jnp.arange(n, dtype=jnp.uint32)
    pix_x = (px % w).astype(jnp.float32)
    pix_y = (px // w).astype(jnp.float32)

    from .common import DIM_PIXEL

    def sample_pass(s, accum):
        s = jnp.uint32(s)
        jitter = rng.sample_2d(seed, px, DIM_PIXEL, s)
        pos = jnp.stack([pix_x + jitter[..., 0],
                         pix_y + jitter[..., 1]], axis=-1)
        o, d = camera.sample_ray(pos)
        radiance = integ.li_with_table(scene, table, o, d,
                                       jnp.uint32(seed), px, s)
        return film.splat(accum, pos, radiance)

    accum = jax.lax.fori_loop(0, spp, sample_pass, film.new_accumulator())
    return film.develop(accum)
