"""Small integrators: ambient occlusion + AOV fields.

Counterparts of the reference's `ao` and `field` plugins (ref: src/
integrators/direct/ao.cpp, src/integrators/misc/field.cpp).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..bsdf.bsdf import resolve_material
from ..core.math import Frame
from ..core.warp import square_to_cosine_hemisphere
from ..scene.scene import SceneData
from .common import DIM_BSDF_U2, bounce_dim, offset_ray_origin, ray_mint
from .path import PathTracer


@dataclass(frozen=True)
class AmbientOcclusion(PathTracer):
    """Cosine-weighted AO (ref: ao.cpp — shadingSamples, rayLength)."""
    ray_length: float = -1.0        # <0: scene-scale default (ao.cpp)
    shading_samples: int = 1

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        its = self._intersect(scene, o, d, ray_mint(o))
        frame = Frame.from_normal(its.ns)
        length = self.ray_length if self.ray_length > 0 else 1e8
        acc = jnp.zeros(o.shape[:1])
        for k in range(self.shading_samples):
            u2 = self._d2(seed, pixel_id, sample_idx,
                          bounce_dim(k, DIM_BSDF_U2))
            wo = Frame.to_world(frame, square_to_cosine_hemisphere(u2))
            so = offset_ray_origin(its.p, its.ng, wo)
            occ = self._occluded(scene, so, wo, ray_mint(so),
                                 jnp.full(o.shape[:1], length))
            acc = acc + jnp.where(its.valid & ~occ, 1.0, 0.0)
        ao = acc / self.shading_samples
        return jnp.broadcast_to(ao[..., None], o.shape)


@dataclass(frozen=True)
class FieldIntegrator(PathTracer):
    """Geometry AOVs (ref: field.cpp): field ∈ position | relPosition |
    distance | geoNormal | shNormal | uv | albedo | shapeIndex |
    primIndex — plus the winmad research AOVs wiMacro | woMacro (the
    `baseFrameWiWo` integrator, src/integrators/path/baseFrameWiWo.cpp:
    per-pixel view / sampled-light direction expressed in the local
    shading frame; woMacro draws the scene's NEE emitter sample exactly
    as the reference averages dRec directions)."""
    field: str = "shNormal"

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        its = self._intersect(scene, o, d, ray_mint(o))
        f = self.field
        if f == "position":
            out = its.p
        elif f == "relPosition":
            out = its.p - o
        elif f == "distance":
            out = jnp.broadcast_to(
                jnp.where(its.valid, its.t, 0.0)[..., None], o.shape)
        elif f == "geoNormal":
            out = its.ng
        elif f == "shNormal":
            out = its.ns
        elif f == "uv":
            out = jnp.concatenate(
                [its.uv, jnp.zeros(its.uv.shape[:-1] + (1,))], axis=-1)
        elif f == "albedo":
            params = resolve_material(scene, its.mat_id, its.uv).params
            out = params[..., 0:3]
        elif f == "primIndex":
            out = jnp.broadcast_to(
                its.tri_id.astype(jnp.float32)[..., None], o.shape)
        elif f == "shapeIndex":
            out = jnp.broadcast_to(
                its.mat_id.astype(jnp.float32)[..., None], o.shape)
        elif f in ("wiMacro", "woMacro"):
            from ..core.math import Frame
            frame = Frame.from_normal(its.ns)
            if f == "wiMacro":
                out = Frame.to_local(frame, -d)
            else:
                # NEE emitter direction in the local frame
                # (baseFrameWiWo.cpp records dRec.d per valid sample)
                from ..core import rng as _rng
                from ..emitter.emitter import sample_direct
                us = _rng.sample_1d(seed, pixel_id, 1 << 23, sample_idx)
                up = _rng.sample_2d(seed, pixel_id, (1 << 23) + 1,
                                    sample_idx)
                ds = sample_direct(scene, its.p, us, up)
                out = jnp.where((ds.pdf > 0)[..., None],
                                Frame.to_local(frame, ds.d), 0.0)
        else:
            raise ValueError(f"unknown field {f}")
        return jnp.where(its.valid[..., None], out, 0.0)
