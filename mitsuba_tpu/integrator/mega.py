"""MegaPathTracer: the fused per-bounce megakernel integrator.

Drop-in replacement for PathTracer on scenes that fit the megakernel's
VMEM budget and feature subset — accel.megakernel.MEGA_FAMILIES (14
leaf BSDF families incl. rough dielectric/plastic and LEADR, plus
mixture/mask, coating and roughcoating composites),
area/constant/point/spot/directional emitters, pinhole or thin-lens
perspective sensors, flat or smooth shading, analytic checkerboard/
grid procedural textures, and (MegaVolPathTracer) a global homogeneous
medium with HG phase. `supports()` reports whether a scene qualifies;
construct with `for_scene(scene, ...)` — the scene tables are packed
host-side once and close over the jit.

Estimator and RNG streams are identical to PathTracer/VolPathTracer;
tests assert lane-level agreement.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.megakernel import (DEF_BLOCK, DEF_PBLOCK, DEF_SUBLANES,
                                MEGA_FAMILIES, MegaTables, N_STATE,
                                build_mega_tables, run_path)
from ..scene.scene import (EM_CONSTANT, MAT_COATING, MAT_MIXTURE,
                           MAT_ROUGH_COATING, MAT_ROUGH_DIELECTRIC,
                           MAT_ROUGH_PLASTIC, SceneData)
from .path import PathTracer


@dataclass(frozen=True, eq=False)
class MegaPathTracer(PathTracer):
    """eq=False: jit caches per instance (tables are captured arrays)."""
    tables: MegaTables | None = None
    meta_consts: tuple = ()
    block: int = DEF_BLOCK      # lanes per run_path block ([16, B] rows)
    pblock: int = DEF_PBLOCK    # total lanes (S·B) per persistent block
    sublanes: int = DEF_SUBLANES  # S rows per persistent shading block
    # static (σt rgb, albedo rgb, g, bound) of the global homogeneous
    # medium, or None — compiles in the volpath medium branch
    medium: tuple | None = None

    @staticmethod
    def supports(scene: SceneData, camera=None, film=None,
                 allow_medium=False, tex_procs=None) -> tuple[bool, str]:
        """(ok, reason): can this scene/camera/film run on the fused
        megakernel with results matching PathTracer + box-filter Film?
        Used by the CLI to auto-select the fast path on TPU."""
        from ..accel.megakernel import MEGA_EM_TYPES
        from ..sensor.sensor import PerspectiveCamera
        em_types = np.asarray(scene.em_type)
        n_const = int((em_types == EM_CONSTANT).sum())
        bad_em = set(int(t) for t in em_types) - MEGA_EM_TYPES
        if n_const > 1 or bad_em:
            return False, f"unsupported emitter types {bad_em or 'env×2'}"
        fams = set(int(x) for x in np.unique(np.asarray(scene.mat_type)))
        if fams - MEGA_FAMILIES:
            return False, f"unsupported BSDF families {fams - MEGA_FAMILIES}"
        if MAT_MIXTURE in fams or MAT_COATING in fams \
                or MAT_ROUGH_COATING in fams:
            # in-kernel mixture/blend/mask + smooth coating: one
            # composite level, leaf children only, no weight textures,
            # no child twosided, no textures anywhere (the child chains
            # bypass the texture wrapper)
            mpx = np.asarray(scene.mat_params)
            mtv = np.asarray(scene.mat_type)
            mix = mtv == MAT_MIXTURE
            coat = (mtv == MAT_COATING) | (mtv == MAT_ROUGH_COATING)
            if (np.asarray(scene.mat_tex) >= 0).any():
                return False, "composite + textures"
            if (mpx[mix, 21] >= 0).any():
                return False, "textured mixture weight"
            kids = np.concatenate([mpx[mix, 18].astype(int),
                                   mpx[mix, 19].astype(int),
                                   mpx[coat, 18].astype(int)])
            if (kids < 0).any() or (kids >= mtv.shape[0]).any():
                return False, "composite child out of range"
            kt = set(int(t) for t in mtv[kids])
            if kt - (MEGA_FAMILIES
                     - {MAT_MIXTURE, MAT_COATING, MAT_ROUGH_COATING}):
                return False, "nested/unsupported composite children"
            if (mpx[kids, 15] > 0.5).any():
                return False, "twosided composite child"
        # the in-kernel microfacet branches are isotropic-GGX only
        # (rough conductor + rough dielectric); Beckmann/anisotropic
        # variants stay on the wavefront
        from ..scene.scene import MAT_ROUGH_CONDUCTOR
        for code, nm in ((MAT_ROUGH_DIELECTRIC, "roughdielectric"),
                         (MAT_ROUGH_CONDUCTOR, "roughconductor"),
                         (MAT_ROUGH_COATING, "roughcoating"),
                         (MAT_ROUGH_PLASTIC, "roughplastic")):
            if code in fams:
                mpx = np.asarray(scene.mat_params)
                rd = np.asarray(scene.mat_type) == code
                # roughcoating has no alpha_v slot (builder leaves p10=0)
                aniso = (mpx[rd, 9] != mpx[rd, 10]).any() \
                    if code != MAT_ROUGH_COATING else False
                if (mpx[rd, 11] != 1).any() or aniso:
                    return False, f"non-GGX/anisotropic {nm}"
        if bool(np.asarray(scene.has_medium)):
            if not allow_medium:
                return False, "participating medium"
            if np.asarray(scene.med_grid).size != 1:
                return False, "heterogeneous medium"
            # builder stores all-zero rows for isotropic media
            if (scene.med_sggx is not None
                    and np.any(np.asarray(scene.med_sggx))) or \
                    (scene.med_fiber is not None
                     and np.any(np.asarray(scene.med_fiber))):
                return False, "anisotropic (SGGX/fiber) medium"
        mp = np.asarray(scene.mat_params)
        mt = np.asarray(scene.mat_tex)
        # albedo textures are fine when every referenced slot has
        # procedural (checker/grid) provenance — the kernel evaluates
        # the analytic form; roughness/normal-map textures stay on the
        # wavefront path
        alb_ok = np.array([s < 0 or s in (tex_procs or {})
                           for s in mt[:, 0]])
        if not alb_ok.all() or (mt[:, 1] >= 0).any() or \
                (mp[:, 16] >= 0).any():
            return False, "textured material"
        areas = np.asarray(scene.tri_area)
        n_real = int(np.max(np.nonzero(areas > 0)[0]) + 1) if \
            (areas > 0).any() else 1
        if n_real > 32768:
            return False, f"{n_real} triangles exceed the VMEM budget"
        if camera is not None and not isinstance(camera,
                                                 PerspectiveCamera):
            return False, "non-perspective camera"
        if film is not None and film.filter_name != "box":
            return False, f"{film.filter_name} reconstruction filter"
        return True, ""

    @classmethod
    def for_scene(cls, scene: SceneData, max_depth: int = 8,
                  rr_depth: int = 5, block: int = DEF_BLOCK,
                  pblock: int = DEF_PBLOCK,
                  sublanes: int = DEF_SUBLANES,
                  medium: tuple | None = None,
                  tex_procs: dict | None = None) -> "MegaPathTracer":
        if sublanes <= 0 or sublanes % 8 != 0:
            raise ValueError(
                f"sublanes={sublanes}: must be a positive multiple of 8 "
                "(the TPU f32 sublane tile is 8 rows)")
        if pblock % sublanes != 0:
            raise ValueError(
                f"pblock={pblock} is not divisible by sublanes={sublanes}; "
                "each persistent block is [sublanes, pblock//sublanes] and "
                "needs an exact factorization")
        from ..accel.megakernel import MEGA_EM_TYPES
        em_types = np.asarray(scene.em_type)
        n_const = int((em_types == EM_CONSTANT).sum())
        bad_em = set(int(t) for t in em_types) - MEGA_EM_TYPES
        assert n_const <= 1 and not bad_em, (
            f"megakernel emitter chain lacks types {bad_em} "
            "(area/constant/point/spot/directional supported); use "
            "PathTracer for envmap scenes")
        env = np.zeros(3)
        env_pmf = 0.0
        for i, t in enumerate(em_types):
            if t == EM_CONSTANT:
                env = np.asarray(scene.em_radiance)[i]
                env_pmf = float(np.asarray(scene.em_pmf.pmf)[i])
        fams = tuple(sorted(int(x) for x in
                            np.unique(np.asarray(scene.mat_type))))
        unsupported = set(fams) - MEGA_FAMILIES
        if unsupported:
            raise ValueError(
                f"megakernel BSDF dispatch lacks families {unsupported} "
                f"(supported: {sorted(MEGA_FAMILIES)}); use PathTracer "
                "for this scene")
        consts = (float(env[0]), float(env[1]), float(env[2]),
                  float(env_pmf), 0.0, 0.0, 0.0, 0.0, 0.0,
                  0.0, 0.0, 0.0)
        return cls(
            max_depth=max_depth, rr_depth=rr_depth, families=fams,
            tables=build_mega_tables(scene, tex_procs=tex_procs),
            meta_consts=consts,
            block=block, pblock=pblock, sublanes=sublanes, medium=medium)

    def li(self, scene: SceneData, o, d, seed, pixel_id, sample_idx=0):
        return self.li_stats(scene, o, d, seed, pixel_id, sample_idx)[0]

    def li_stats(self, scene: SceneData, o, d, seed, pixel_id,
                 sample_idx=0):
        n = o.shape[0]
        n_pad = -(-n // self.block) * self.block
        pad = n_pad - n

        def prow(x, fill=0.0):
            x = x.astype(jnp.float32)
            if pad:
                x = jnp.pad(x, (0, pad), constant_values=fill)
            return x[None, :]

        state = jnp.concatenate([
            prow(o[:, 0]), prow(o[:, 1]), prow(o[:, 2]),
            prow(d[:, 0]), prow(d[:, 1]), prow(d[:, 2], 1.0),
            jnp.ones((3, n_pad)),                       # throughput
            jnp.zeros((3, n_pad)),                      # L
            prow(jnp.ones((n,))),                       # active (pad dead)
            jnp.ones((1, n_pad)),                       # prev_pdf
            jnp.ones((1, n_pad)),                       # prev_delta
            jnp.ones((1, n_pad)),                       # eta_scale
        ], axis=0)
        pix = pixel_id.astype(jnp.int32)
        if pad:
            pix = jnp.pad(pix, (0, pad))
        pix = pix[None, :]

        samp = (jnp.asarray(sample_idx, jnp.uint32).astype(jnp.int32)
                * jnp.ones((n,), jnp.int32))
        if pad:
            samp = jnp.pad(samp, (0, pad))
        samp = samp[None, :]

        n_bounces = self.max_depth if self.max_depth > 0 else 32
        meta = jnp.stack([
            jnp.asarray(seed, jnp.uint32).astype(jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32)])
        out = run_path(self.tables, self.families, self.rr_depth,
                       self.max_depth, n_bounces, self.meta_consts, state,
                       pix, samp, meta, block=self.block,
                       medium=self.medium)
        n_rays = (jnp.sum(out[16]) + jnp.sum(out[17])).astype(jnp.uint32)
        L = out[9:12, :n].T
        return L, n_rays


@dataclass(frozen=True, eq=False)
class MegaVolPathTracer(MegaPathTracer):
    """Megakernel VolPathTracer: the global homogeneous medium (balance
    distance sampling + HG phase, ref volpath.cpp:104-181) compiled into
    the fused per-bounce kernel. Same estimator and RNG streams as
    integrator/volpath.py VolPathTracer — tests assert lane parity.
    (Ray counters count ATTEMPTED NEE shadow rays, like PathTracer;
    VolPathTracer's li_stats counts unoccluded ones.)"""

    @staticmethod
    def supports(scene: SceneData, camera=None, film=None,
                 allow_medium=True, tex_procs=None) -> tuple[bool, str]:
        return MegaPathTracer.supports(scene, camera, film,
                                       allow_medium=True,
                                       tex_procs=tex_procs)

    @classmethod
    def for_scene(cls, scene: SceneData, max_depth: int = 8,
                  rr_depth: int = 5, block: int = DEF_BLOCK,
                  pblock: int = DEF_PBLOCK,
                  sublanes: int = DEF_SUBLANES,
                  medium: tuple | None = None,
                  tex_procs: dict | None = None) -> "MegaVolPathTracer":
        if medium is None and bool(np.asarray(scene.has_medium)):
            assert np.asarray(scene.med_grid).size == 1, \
                "megakernel medium branch is homogeneous-only"
            st = np.asarray(scene.med_sigma_t)[0]
            al = np.asarray(scene.med_albedo)[0]
            medium = (float(st[0]), float(st[1]), float(st[2]),
                      float(al[0]), float(al[1]), float(al[2]),
                      float(np.asarray(scene.med_g)[0]),
                      float(np.asarray(scene.med_bound)[0]))
        return super().for_scene(scene, max_depth=max_depth,
                                 rr_depth=rr_depth, block=block,
                                 pblock=pblock, sublanes=sublanes,
                                 medium=medium, tex_procs=tex_procs)


def render_persistent(integ: MegaPathTracer, camera, spp: int,
                      seed: int = 0):
    """Persistent path-regeneration render (accel/megakernel.py
    run_persistent): one lane per pixel, each completing exactly `spp`
    paths with in-kernel camera ray regeneration — no dead-lane waste.
    Returns (image [H, W, 3], n_rays). Pinhole perspective only."""
    return _render_persistent(integ, camera, spp, jnp.uint32(seed))


def _persistent_lanes(integ, camera, spp, seed, pix_flat):
    """Run the persistent kernel over an arbitrary int32 pixel-id lane
    vector (length % pblock == 0; RNG streams are keyed by pixel id, so
    any lane→pixel assignment gives the same per-pixel estimate).
    Returns (L sums / spp [n, 3], per-lane ray counts [n]) in the INPUT
    lane order — the building block for both the single-chip and the
    mesh-sharded renderers."""
    from ..accel.megakernel import N_PSTATE, run_persistent
    from ..core import rng as _rng

    w, h = camera.width, camera.height
    block = integ.pblock
    s = integ.sublanes
    n_pad = pix_flat.shape[0]
    bb = block // s                     # lanes per sub-block row
    rr = n_pad // block                 # grid steps

    r = np.asarray(camera.to_world[:3, :3], np.float32)
    t = np.asarray(camera.to_world[:3, 3], np.float32)
    tan_half = float(np.tan(np.radians(camera.fov_x) / 2.0))
    aspect = h / w
    lens = float(getattr(camera, "aperture_radius", 0.0)) > 0.0
    cam = (float(r[0, 0]), float(r[0, 1]), float(r[0, 2]),
           float(r[1, 0]), float(r[1, 1]), float(r[1, 2]),
           float(r[2, 0]), float(r[2, 1]), float(r[2, 2]),
           float(t[0]), float(t[1]), float(t[2]),
           tan_half, float(aspect), float(w), float(h),
           float(getattr(camera, "aperture_radius", 0.0)),
           float(getattr(camera, "focus_distance", 1.0)))
    consts = tuple(integ.meta_consts[:9]) + cam

    to_sb = lambda x: x.reshape(rr, s, bb).transpose(1, 0, 2) \
        .reshape(s, rr * bb)
    pix = to_sb(pix_flat)
    samp0 = jnp.zeros((s, rr * bb), jnp.int32)
    # first camera ray (sample 0), matching the in-kernel regen
    jitter = _rng.sample_2d(seed, pix_flat.astype(jnp.uint32), 0, 0)
    pos = jnp.stack(
        [(pix_flat % w).astype(jnp.float32) + jitter[..., 0],
         (pix_flat // w).astype(jnp.float32) + jitter[..., 1]], axis=-1)
    ap = _rng.sample_2d(seed, pix_flat.astype(jnp.uint32), 1, 0) \
        if lens else None
    o, d = camera.sample_ray(pos, ap)
    zeros = jnp.zeros((n_pad,))
    ones = jnp.ones((n_pad,))
    rows = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            ones, ones, ones,            # throughput
            zeros, zeros, zeros,         # L
            ones,                        # active
            ones, ones, ones]            # prev_pdf, prev_delta, eta
    rows += [zeros] * (N_PSTATE - 16)
    state = jnp.stack([to_sb(x) for x in rows], axis=0)
    meta = jnp.stack([seed.astype(jnp.int32),
                      jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                      jnp.zeros((), jnp.int32)])

    out = run_persistent(integ.tables, integ.families, integ.rr_depth,
                         integ.max_depth, spp, consts, state,
                         pix, samp0, meta, block=block, sublanes=s,
                         medium=integ.medium, lens=lens)
    # back to input lane order [N_PSTATE, n_pad]
    out_flat = out.reshape(N_PSTATE, s, rr, bb).transpose(0, 2, 1, 3) \
        .reshape(N_PSTATE, n_pad)
    return out_flat[18:21].T / spp, out_flat[22] + out_flat[23]


@functools.partial(jax.jit, static_argnames=("integ", "camera", "spp"))
def _render_persistent(integ, camera, spp, seed):
    w, h = camera.width, camera.height
    n = w * h
    n_pad = -(-n // integ.pblock) * integ.pblock      # total lanes
    # lane i owns pixel i % n — identity for the first n lanes,
    # duplicates beyond (their results are discarded)
    pix_flat = jnp.arange(n_pad, dtype=jnp.int32) % jnp.int32(n)
    l_sum, counts = _persistent_lanes(integ, camera, spp, seed, pix_flat)
    n_rays = jnp.sum(counts[:n]).astype(jnp.uint32)
    return l_sum[:n].reshape(h, w, 3), n_rays


def render_persistent_sharded(integ: MegaPathTracer, camera, spp: int,
                              seed, mesh):
    """Persistent megakernel over a device mesh: lanes (pixels) sharded
    across the 'shard' axis, the scene tables replicated as captured
    constants — the flagship fast path under the same shard_map pattern
    as parallel/dist.py render_sharded (multi-host-ready). In exact
    arithmetic the per-pixel estimate is independent of mesh size (RNG
    streams are keyed by pixel id, not lane placement); in practice
    each compilation unit associates the camera-ray arithmetic slightly
    differently (observed ~1e-3 in normalize() eager vs jit on this
    backend), so compare against render_persistent statistically.
    Returns (image [H, W, 3], n_rays)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from ..parallel.dist import SHARD_AXIS

    w, h = camera.width, camera.height
    n = w * h
    n_dev = mesh.devices.size
    chunk = integ.pblock * n_dev
    n_pad = -(-n // chunk) * chunk
    pix_flat = jnp.arange(n_pad, dtype=jnp.int32) % jnp.int32(n)
    seed = jnp.uint32(seed)

    # check_vma=False: the pallas_call's out_shape carries no varying-
    # mesh-axes annotation; every output here is lane-sharded anyway
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(SHARD_AXIS),),
             out_specs=(P(SHARD_AXIS), P(SHARD_AXIS)), check_vma=False)
    def go(px):
        return _persistent_lanes(integ, camera, spp, seed, px)

    l_sum, counts = go(pix_flat)
    n_rays = jnp.sum(counts[:n]).astype(jnp.uint32)
    return l_sum[:n].reshape(h, w, 3), n_rays
