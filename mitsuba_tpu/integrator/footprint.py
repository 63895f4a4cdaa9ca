"""Ray-differential footprints (winmad prefiltering research support).

Counterparts of the fork's `footprint` visualiser (ref: src/integrators/
path/footprint.cpp:9) and the uvFootprint plumbing its LoD path tracer
threads through rays (core/ray.h:53-54, scene.cpp:842-843): camera ray
differentials are transferred to the first hit (Igehy 1999) and expressed
as UV-space derivative vectors using the triangle's (∂p/∂u, ∂p/∂v).

Provides:
  * first_hit_footprint — per-pixel (duv/dx, duv/dy) at the primary hit;
    feeds texture.eval_texture_aniso (the EWA/Feline path) — together
    these are the `path_lod` prefiltered-lookup machinery.
  * FootprintIntegrator — AOV image of log2 footprint size (the
    reference plugin's output).
  * LoDPathTracer — path tracer whose FIRST-HIT texture lookups use the
    footprint-selected mip level (primary-hit LoD is where the
    reference's prefiltering papers measure their wins; secondary
    bounces fall back to level-0 like the base tracer).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import dot
from ..scene.scene import SceneData
from .common import ray_mint
from .path import PathTracer


def first_hit_footprint(scene: SceneData, camera, pixel_xy, integ=None):
    """Returns (its, duv_dx [N,2], duv_dy [N,2]) for primary rays through
    pixel_xy. Igehy transfer: dp/dx = t·dd/dx − d·(dd/dx·n)t/(d·n), then
    solve duv from dp in the triangle's (e1, e2) basis with the corner
    UVs."""
    pt = integ or PathTracer()
    o, d = camera.sample_ray(pixel_xy)
    ox, dxd = camera.sample_ray(pixel_xy + jnp.asarray([1.0, 0.0]))
    oy, dyd = camera.sample_ray(pixel_xy + jnp.asarray([0.0, 1.0]))
    dd_dx = dxd - d                 # pinhole: do/dx = 0
    dd_dy = dyd - d

    its = pt._intersect(scene, o, d, ray_mint(o))
    t = jnp.where(its.valid, its.t, 1.0)
    n = its.ng
    dn = jnp.maximum(jnp.abs(dot(d, n)), 1e-6) * jnp.sign(dot(d, n))

    def transfer(dd):
        # differential of the hit point on the plane (Igehy eq. 10-12)
        dt = -(dot(dd, n) * t) / dn
        return dd * t[..., None] + d * dt[..., None]

    dp_dx = transfer(dd_dx)
    dp_dy = transfer(dd_dy)

    # solve dp = α·e1 + β·e2 (least squares via the 2×2 Gram system),
    # then duv = α·(uv1−uv0) + β·(uv2−uv0)
    tri = jnp.maximum(its.tri_id, 0)
    e1 = scene.e1[tri]
    e2 = scene.e2[tri]
    uv0 = scene.vuv[tri, 0]
    duv1 = scene.vuv[tri, 1] - uv0
    duv2 = scene.vuv[tri, 2] - uv0
    g11 = dot(e1, e1)
    g12 = dot(e1, e2)
    g22 = dot(e2, e2)
    det = jnp.maximum(g11 * g22 - g12 * g12, 1e-18)

    def solve(dp):
        b1 = dot(dp, e1)
        b2 = dot(dp, e2)
        a = (g22 * b1 - g12 * b2) / det
        b = (g11 * b2 - g12 * b1) / det
        return (a[..., None] * duv1 + b[..., None] * duv2)

    return its, solve(dp_dx), solve(dp_dy)


@dataclass(frozen=True)
class FootprintIntegrator(PathTracer):
    """AOV: log2 of the primary-hit UV footprint extent (both derivative
    vectors' max norm) — the reference plugin's visualisation."""

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        raise NotImplementedError("use render(); footprints are "
                                  "pixel-space quantities")

    def render(self, scene: SceneData, camera, film, spp: int = 1,
               seed: int = 0):
        h, w = film.height, film.width
        n = h * w
        px = jnp.arange(n, dtype=jnp.uint32)
        pos = jnp.stack([(px % w).astype(jnp.float32) + 0.5,
                         (px // w).astype(jnp.float32) + 0.5], axis=-1)
        its, duv_dx, duv_dy = first_hit_footprint(scene, camera, pos,
                                                  self)
        ext = jnp.maximum(jnp.linalg.norm(duv_dx, axis=-1),
                          jnp.linalg.norm(duv_dy, axis=-1))
        val = jnp.where(its.valid, jnp.log2(jnp.maximum(ext, 1e-12)),
                        0.0)
        img = jnp.broadcast_to(val[:, None], (n, 3)).reshape(h, w, 3)
        return img


@dataclass(frozen=True)
class LoDPathTracer(PathTracer):
    """path_lod analog: primary-hit texture lookups go through the mip
    level matching the pixel's uv footprint (threaded into the material
    resolve via li_stats(tex_lod=…) — path.py), so minified textures are
    prefiltered instead of point-sampled. Secondary bounces use level 0
    like the base tracer (their footprints are dominated by BSDF spread,
    which prefiltering papers handle with lobe widening — out of scope)."""

    def render_lod(self, scene: SceneData, camera, film, spp: int = 8,
                   seed: int = 0):
        """Render with footprint-driven primary-hit texture LoD."""
        from ..core import rng as _rng
        from .common import DIM_PIXEL

        h, w = film.height, film.width
        n = h * w
        px = jnp.arange(n, dtype=jnp.uint32)
        pos_c = jnp.stack([(px % w).astype(jnp.float32) + 0.5,
                           (px // w).astype(jnp.float32) + 0.5], axis=-1)
        _, duv_dx, duv_dy = first_hit_footprint(scene, camera, pos_c,
                                                self)
        ext = jnp.maximum(jnp.linalg.norm(duv_dx, axis=-1),
                          jnp.linalg.norm(duv_dy, axis=-1))

        accum = film.new_accumulator()
        for s in range(spp):
            su = jnp.uint32(s)
            jitter = _rng.sample_2d(seed, px, DIM_PIXEL, su)
            pos = jnp.stack(
                [(px % w).astype(jnp.float32) + jitter[..., 0],
                 (px // w).astype(jnp.float32) + jitter[..., 1]],
                axis=-1)
            o, d = camera.sample_ray(pos)
            li, _ = self.li_stats(scene, o, d, jnp.uint32(seed), px, su,
                                  tex_lod=ext)
            accum = film.splat(accum, pos, li)
        return film.develop(accum)
