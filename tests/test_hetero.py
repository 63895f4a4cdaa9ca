"""Heterogeneous medium tests: delta tracking vs analytic/homogeneous."""
import numpy as np
import pytest

from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.hetero import HeteroVolPathTracer
from mitsuba_tpu.integrator.volpath import VolPathTracer
from mitsuba_tpu.render import render
from mitsuba_tpu.scene.builder import Medium, SceneDesc, compile_scene
from mitsuba_tpu.scene.presets import cornell_box, cornell_camera


def test_vol_roundtrip(tmp_path):
    from mitsuba_tpu.io.vol import load_vol, save_vol
    data = np.random.rand(8, 6, 5).astype(np.float32)
    p = str(tmp_path / "d.vol")
    save_vol(p, data, [0, 0, 0], [1, 2, 3])
    back, mn, mx = load_vol(p)
    assert np.allclose(back[..., 0], data)
    assert np.allclose(mx, [1, 2, 3])


def test_trilinear():
    import jax.numpy as jnp

    from mitsuba_tpu.media.heterogeneous import trilinear
    grid = jnp.asarray(np.arange(8, dtype=np.float32).reshape(2, 2, 2))
    # corners reproduce grid values (x-fastest layout [z, y, x])
    p = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    v = np.asarray(trilinear(grid, p))
    assert np.allclose(v, [0, 1, 2, 4])
    # center = mean
    c = np.asarray(trilinear(grid, jnp.asarray([[0.5, 0.5, 0.5]])))
    assert np.allclose(c, 3.5)
    # outside → 0
    z = np.asarray(trilinear(grid, jnp.asarray([[1.5, 0.5, 0.5]])))
    assert z[0] == 0.0


def test_constant_grid_matches_homogeneous():
    """A constant-density grid filling the Cornell box must agree with the
    homogeneous volpath (statistically — different tracking estimators)."""
    sigma = 0.6
    albedo = (0.6, 0.6, 0.6)

    # the Cornell box is closed: with the grid/bound covering the whole
    # interior both media are equivalent
    d1 = cornell_box()
    d1.medium = Medium(sigma_t=(sigma,) * 3, albedo=albedo, bound=50.0)
    homo = compile_scene(d1, cluster_size=128)

    d2 = cornell_box()
    d2.medium = Medium(sigma_t=(sigma,) * 3, albedo=albedo,
                       density_grid=np.ones((2, 2, 2), np.float32),
                       grid_min=(-3, -3, -3), grid_max=(4, 4, 5))
    het = compile_scene(d2, cluster_size=128)

    cam = cornell_camera(width=24, height=24)
    film = Film(width=24, height=24)
    # volumetric estimators are noisy — pool several seeds of each
    mh = np.mean([np.asarray(render(
        homo, cam, film, VolPathTracer(max_depth=5, cluster_size=128),
        spp=48, seed=s)).mean() for s in range(4)])
    mg = np.mean([np.asarray(render(
        het, cam, film,
        HeteroVolPathTracer(max_depth=5, cluster_size=128),
        spp=48, seed=s)).mean() for s in range(4)])
    assert np.abs(mh - mg) / mh < 0.06, (mh, mg)


def test_hetero_beer_lambert():
    """Absorption-only constant grid: direct emitter view decays as
    exp(-σ·d)."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    sigma = 0.5
    d = SceneDesc()
    d.add_material(kind="diffuse", albedo=(0, 0, 0))
    d.add_shape(rectangle(), material=0, radiance=(2.0, 2.0, 2.0))
    d.medium = Medium(sigma_t=(sigma,) * 3, albedo=(0.0, 0.0, 0.0),
                      density_grid=np.ones((2, 2, 2), np.float32),
                      grid_min=(-5, -5, -1), grid_max=(5, 5, 5))
    scene = compile_scene(d, cluster_size=128)
    dist = 3.0
    cam = PerspectiveCamera(
        width=8, height=8, fov_x=5.0,
        to_world=tf.look_at([0, 0, dist], [0, 0, 0], [0, 1, 0]))
    film = Film(width=8, height=8)
    img = np.asarray(render(scene, cam, film,
                            HeteroVolPathTracer(max_depth=2,
                                                cluster_size=128),
                            spp=1024, seed=0))
    expect = 2.0 * np.exp(-sigma * dist)
    got = img.mean()
    assert abs(got - expect) / expect < 0.04, (got, expect)


def test_nonuniform_grid_gradient():
    """Density gradient along x: rays through the dense side attenuate
    more than through the thin side."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    g = np.zeros((2, 2, 8), np.float32)
    g[..., :] = np.linspace(0.05, 2.0, 8)    # density rises with +x
    d = SceneDesc()
    d.add_material(kind="diffuse", albedo=(0, 0, 0))
    d.add_shape(rectangle(), to_world=tf.scale(4.0), material=0,
                radiance=(2.0, 2.0, 2.0))
    d.medium = Medium(sigma_t=(1.0, 1.0, 1.0), albedo=(0.0, 0.0, 0.0),
                      density_grid=g, grid_min=(-4, -4, -1),
                      grid_max=(4, 4, 4))
    scene = compile_scene(d, cluster_size=128)
    cam = PerspectiveCamera(
        width=32, height=32, fov_x=60.0,
        to_world=tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]))
    film = Film(width=32, height=32)
    img = np.asarray(render(scene, cam, film,
                            HeteroVolPathTracer(max_depth=2,
                                                cluster_size=128),
                            spp=256, seed=0))
    lum = img.mean(-1)
    left = lum[12:20, 2:10].mean()    # image-left = +x (camera convention)
    right = lum[12:20, 22:30].mean()
    assert (left < right * 0.8) or (right < left * 0.8)


def test_sggx_medium_anisotropic_transmittance():
    """winmad SGGX medium (heterogeneous2/3): extinction must vary with
    direction — a fiber-like S (flakes aligned so σ(z) ≈ 0) lets light
    pass along z but attenuates it perpendicular; also the render must be
    finite and energy-plausible."""
    import jax.numpy as jnp
    import numpy as np

    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.hetero import HeteroVolPathTracer
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import Medium, SceneDesc, compile_scene
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    from mitsuba_tpu.util.appearance import sggx_from_normals

    # fiber along z: normals in the xy plane
    ang = np.linspace(0, 2 * np.pi, 256, endpoint=False)
    s6 = sggx_from_normals(
        np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], -1))

    grid = np.ones((4, 4, 4), np.float32)
    desc = SceneDesc()
    desc.add_material(kind="diffuse", albedo=(0.8, 0.8, 0.8))
    # emissive backdrop behind the medium
    desc.add_shape(rectangle(), to_world=tf.translate([0, 0, -1.5])
                   @ tf.scale(4.0), material=0,
                   radiance=(5.0, 5.0, 5.0))
    desc.medium = Medium(sigma_t=(8.0, 8.0, 8.0), albedo=(0.1, 0.1, 0.1),
                         density_grid=grid, grid_min=(-1, -1, -1),
                         grid_max=(1, 1, 1), sggx_s=s6)
    scene = compile_scene(desc, cluster_size=128)

    # near-axial rays: σ(d) of a z-fiber grows with the ray's tilt
    # (σ = σ_max·sinθ), so a wide fov would re-attenuate off-axis pixels
    cam_z = PerspectiveCamera(width=8, height=8, fov_x=2.0,
                              to_world=tf.look_at([0, 0, 3], [0, 0, 0],
                                                  [0, 1, 0]))
    integ = HeteroVolPathTracer(max_depth=4, sggx=True, cluster_size=128)
    img_z = np.asarray(render(scene, cam_z, Film(width=8, height=8),
                              integ, spp=48, seed=0))
    assert np.isfinite(img_z).all()
    # σ(z) ≈ 0 for z-aligned fibers ⇒ looking along z the backdrop is
    # nearly unattenuated
    assert img_z.mean() > 3.0, img_z.mean()

    # isotropic medium of the same σ_t attenuates strongly (contrast)
    desc.medium = Medium(sigma_t=(8.0, 8.0, 8.0), albedo=(0.1, 0.1, 0.1),
                         density_grid=grid, grid_min=(-1, -1, -1),
                         grid_max=(1, 1, 1))
    scene_iso = compile_scene(desc, cluster_size=128)
    integ_iso = HeteroVolPathTracer(max_depth=4, cluster_size=128)
    img_iso = np.asarray(render(scene_iso, cam_z, Film(width=8, height=8),
                                integ_iso, spp=48, seed=0))
    assert img_iso.mean() < 0.5 * img_z.mean(), (img_iso.mean(),
                                                 img_z.mean())


def test_microflake_phase_consistency():
    """Gaussian-fiber microflake phase (ref: src/phase/microflake.cpp):
    sample() distribution matches eval()==pdf (chi2), phase integrates
    to 1, σT table is monotone from axis to perpendicular."""
    import jax.numpy as jnp
    import numpy as np
    from mitsuba_tpu.core import chi2
    from mitsuba_tpu.phase import phase as P

    sd = 0.25
    tab_np = P.fiber_sigma_t_table(sd)
    tab = jnp.asarray(tab_np)
    # flakes perpendicular to the fiber: σT largest broadside
    assert tab_np[0] > tab_np[-1] > 0
    fiber1 = jnp.asarray([0.0, 0.0, 1.0])
    wi1 = np.array([0.3, 0.1, 0.95], np.float32)
    wi1 /= np.linalg.norm(wi1)

    # normalization: ∫ f dω = 1 by uniform-sphere MC
    rs = np.random.RandomState(5)
    d = rs.randn(100000, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wib = jnp.broadcast_to(jnp.asarray(wi1), d.shape)
    f = np.asarray(P.microflake_eval(sd, tab, fiber1, wib,
                                     jnp.asarray(d)))
    assert abs(f.mean() * 4 * np.pi - 1.0) < 0.02

    def sample_fn(n):
        wib = jnp.broadcast_to(jnp.asarray(wi1), (n, 3))
        fib = jnp.broadcast_to(fiber1, (n, 3))
        u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
        u1 = jnp.asarray(rs.rand(n), jnp.float32)
        wo, pdf = P.microflake_sample(sd, tab, fib, wib, u2, u1)
        return np.asarray(jnp.where((pdf > 0)[..., None], wo, 0.0))

    def pdf_fn(dirs):
        n = dirs.shape[0]
        wib = jnp.broadcast_to(jnp.asarray(wi1), (n, 3))
        fib = jnp.broadcast_to(fiber1, (n, 3))
        return np.asarray(P.microflake_eval(sd, tab, fib, wib,
                                            jnp.asarray(dirs)))

    passed, stats = chi2.chi2_test(sample_fn, pdf_fn, n_samples=200_000)
    assert passed, stats


def test_microflake_medium_renders():
    """Fiber microflake medium end-to-end: directional extinction (clear
    along the fiber axis, opaque broadside) and finite output."""
    import jax.numpy as jnp
    import numpy as np
    from mitsuba_tpu.film.film import Film
    from mitsuba_tpu.integrator.hetero import HeteroVolPathTracer
    from mitsuba_tpu.render import render
    from mitsuba_tpu.scene.builder import Medium, SceneDesc, compile_scene
    from mitsuba_tpu.scene.shapes import rectangle
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera

    grid = np.ones((4, 4, 4), np.float32)
    desc = SceneDesc()
    desc.add_material(kind="diffuse", albedo=(0.8, 0.8, 0.8))
    desc.add_shape(rectangle(), to_world=tf.translate([0, 0, -1.5])
                   @ tf.scale(4.0), material=0,
                   radiance=(5.0, 5.0, 5.0))
    desc.medium = Medium(sigma_t=(6.0, 6.0, 6.0), albedo=(0.2,) * 3,
                         density_grid=grid, grid_min=(-1, -1, -1),
                         grid_max=(1, 1, 1),
                         fiber_orientation=(0.0, 0.0, 1.0))
    scene = compile_scene(desc, cluster_size=128)
    cam = PerspectiveCamera(width=8, height=8, fov_x=2.0,
                            to_world=tf.look_at([0, 0, 3], [0, 0, 0],
                                                [0, 1, 0]))
    integ = HeteroVolPathTracer(max_depth=4, fiber=True,
                                fiber_stddev=0.2, cluster_size=128)
    img_axis = np.asarray(render(scene, cam, Film(width=8, height=8),
                                 integ, spp=48, seed=0))
    assert np.isfinite(img_axis).all()
    # along the fiber axis σ ≈ 2·σT(1)·σt — much clearer than isotropic
    integ_iso = HeteroVolPathTracer(max_depth=4, cluster_size=128)
    img_iso = np.asarray(render(scene, cam, Film(width=8, height=8),
                                integ_iso, spp=48, seed=0))
    assert img_axis.mean() > 1.3 * img_iso.mean(), (img_axis.mean(),
                                                    img_iso.mean())
