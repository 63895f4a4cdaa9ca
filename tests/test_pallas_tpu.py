"""Pallas trace kernel parity vs the XLA dense intersector.

Runs only on TPU (the kernel targets Mosaic); the driver's bench environment
exercises it. CPU CI covers the dense path via the oracle tests.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="pallas kernel needs TPU")


def test_pallas_matches_dense():
    import jax.numpy as jnp

    from mitsuba_tpu.accel.dense import ray_intersect, ray_test
    from mitsuba_tpu.accel.pallas_trace import (pallas_intersect,
                                                pallas_occluded)
    from mitsuba_tpu.scene.builder import compile_scene
    from mitsuba_tpu.scene.presets import cornell_box

    scene = compile_scene(cornell_box(), cluster_size=64)
    rs = np.random.RandomState(0)
    n = 4096
    o = jnp.asarray(rs.rand(n, 3), jnp.float32)
    d = rs.randn(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    mint = jnp.full((n,), 1e-4)
    maxt = jnp.full((n,), 1e30)

    ip = jax.jit(lambda: pallas_intersect(scene, o, d, mint, maxt))()
    ix = jax.jit(lambda: ray_intersect(scene, o, d, mint, maxt,
                                       cluster_size=64))()
    assert (np.asarray(ip.valid) == np.asarray(ix.valid)).all()
    both = np.asarray(ip.valid)
    assert np.allclose(np.asarray(ip.t)[both], np.asarray(ix.t)[both],
                       rtol=1e-5)
    # shared-edge exact-tie lanes may pick either triangle
    tri_agree = (np.asarray(ip.tri_id)[both]
                 == np.asarray(ix.tri_id)[both])
    assert tri_agree.mean() > 0.99, tri_agree.mean()
    uv_close = np.abs(np.asarray(ip.uv)[both]
                      - np.asarray(ix.uv)[both]).max(-1) < 1e-5
    assert (uv_close | ~tri_agree).all()

    occ_p = jax.jit(lambda: pallas_occluded(scene, o, d, mint, maxt))()
    occ_x = jax.jit(lambda: ray_test(scene, o, d, mint, maxt,
                                     cluster_size=64))()
    assert (np.asarray(occ_p) == np.asarray(occ_x)).all()


def test_compacted_path_matches_dense():
    """Per-bounce lane compaction + block-liveness skipping + cluster
    culling must not change radiance: PathTracer(accel=pallas) vs
    accel=dense on a >512-triangle scene (the compaction threshold),
    same seeds."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=white)
    d.add_shape(shapes.sphere(16, 32), material=white)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 3, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([1.5] * 3),
                material=white, radiance=(10.0, 9.0, 8.0))
    scene = compile_scene(d, cluster_size=64)
    assert scene.n_tris > 512          # compaction engages

    n = 4096
    rs = np.random.RandomState(1)
    o = jnp.asarray(np.tile([[0.0, 1.0, 5.0]], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.4, 0.4, 0.2] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)

    pt_pallas = PathTracer(max_depth=5,
                           accel="pallas").specialized_for(scene)
    pt_dense = PathTracer(max_depth=5, accel="dense",
                          cluster_size=64).specialized_for(scene)
    l_p = np.asarray(jax.jit(pt_pallas.li)(scene, o, dv, jnp.uint32(7),
                                           px, 0))
    l_d = np.asarray(jax.jit(pt_dense.li)(scene, o, dv, jnp.uint32(7),
                                          px, 0))
    # same RNG streams, same estimator; only shared-edge tie lanes may
    # diverge (different winning triangle → different shading path)
    close = np.isclose(l_p, l_d, rtol=1e-3, atol=1e-4).all(-1)
    assert close.mean() > 0.995, close.mean()


def test_prefix_gated_path_matches_ungated():
    """Prefix gating (path.py gate_sizes): at n >= 2^16 the bounce body
    runs on the narrowest live prefix via lax.switch. Values must be
    IDENTICAL to the ungated path — verified by rendering the same
    (pixel, sample) lanes in sub-threshold chunks (the counter RNG keys
    every draw by lane identity, not position, so chunking is exact)."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=white)
    d.add_shape(shapes.sphere(16, 32), material=white)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 3, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([1.5] * 3),
                material=white, radiance=(10.0, 9.0, 8.0))
    scene = compile_scene(d, cluster_size=64)

    n = 1 << 16                        # gating engages at this size
    rs = np.random.RandomState(2)
    o = jnp.asarray(np.tile([[0.0, 1.0, 5.0]], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.4, 0.4, 0.2] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)

    pt = PathTracer(max_depth=5, accel="pallas").specialized_for(scene)
    l_gated = np.asarray(jax.jit(pt.li)(scene, o, dv, jnp.uint32(3),
                                        px, 0))
    chunk = 8192                       # < 2^16: ungated
    l_ref = np.concatenate([
        np.asarray(jax.jit(pt.li)(scene, o[i:i + chunk],
                                  dv[i:i + chunk], jnp.uint32(3),
                                  px[i:i + chunk], 0))
        for i in range(0, n, chunk)])
    assert np.allclose(l_gated, l_ref, rtol=1e-5, atol=1e-6), \
        np.abs(l_gated - l_ref).max()


def test_fused_shade_matches_xla():
    """The fused shade kernel (accel/shade_kernel.py) must reproduce the
    XLA shading tail: same RNG streams, same NEE/MIS/RR formulas. Small
    float reassociation differences are allowed; boundary flips
    (RR/compare ties) must be statistically negligible."""
    import jax.numpy as jnp

    from mitsuba_tpu.core import transform as tfm
    from mitsuba_tpu.integrator.path import PathTracer
    from mitsuba_tpu.scene import shapes
    from mitsuba_tpu.scene.builder import SceneDesc, compile_scene

    d = SceneDesc()
    white = d.add_material(kind="diffuse", albedo=(0.7, 0.7, 0.7))
    ggx = d.add_material(kind="roughconductor", alpha=0.2)
    glass = d.add_material(kind="dielectric", int_ior=1.5)
    mirror = d.add_material(kind="conductor")
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, -1, 0])
                @ tfm.rotate([1, 0, 0], -90) @ tfm.scale([6] * 3),
                material=white)
    d.add_shape(shapes.sphere(16, 32),
                to_world=tfm.translate([-1.5, 0, 0]), material=ggx)
    d.add_shape(shapes.sphere(16, 32),
                to_world=tfm.translate([1.5, 0, 0]), material=glass)
    d.add_shape(shapes.cube(),
                to_world=tfm.translate([0, 0, -2]) @ tfm.scale([0.7] * 3),
                material=mirror)
    d.add_shape(shapes.rectangle(),
                to_world=tfm.translate([0, 4, 0])
                @ tfm.rotate([1, 0, 0], 90) @ tfm.scale([1.5] * 3),
                material=white, radiance=(10.0, 9.0, 8.0))
    scene = compile_scene(d, cluster_size=64)

    n = 1 << 15                    # below the gating threshold
    rs = np.random.RandomState(5)
    o = jnp.asarray(np.tile([[0.0, 1.0, 6.0]], (n, 1)), jnp.float32)
    dirs = rs.randn(n, 3) * [0.5, 0.4, 0.2] + [0, -0.1, -1.0]
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dv = jnp.asarray(dirs, jnp.float32)
    px = jnp.arange(n, dtype=jnp.uint32)

    base = PathTracer(max_depth=6, accel="pallas").specialized_for(scene)
    import dataclasses
    pt_off = dataclasses.replace(base, fused_shade="off")
    pt_on = dataclasses.replace(base, fused_shade="on")
    l_off = np.asarray(jax.jit(pt_off.li)(scene, o, dv, jnp.uint32(9),
                                          px, 0))
    l_on = np.asarray(jax.jit(pt_on.li)(scene, o, dv, jnp.uint32(9),
                                        px, 0))
    close = np.isclose(l_on, l_off, rtol=2e-3, atol=2e-4).all(-1)
    assert close.mean() > 0.995, close.mean()
    assert np.allclose(l_on.mean(0), l_off.mean(0), rtol=2e-3, atol=1e-4)
