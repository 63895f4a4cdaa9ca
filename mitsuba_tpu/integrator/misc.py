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
    primIndex."""
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
        else:
            raise ValueError(f"unknown field {f}")
        return jnp.where(its.valid[..., None], out, 0.0)
