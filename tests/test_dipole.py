"""Dipole BSSRDF tests: diffusion-profile invariants + end-to-end render.

The reference validates dipole qualitatively (scene renders); here we
additionally check the R_d profile's analytic properties: total diffuse
reflectance ∫2πr·Rd dr ≤ α' and monotone decay."""
import numpy as np
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.dipole import DipoleIntegrator
from mitsuba_tpu.scene.builder import SceneDesc, compile_scene
from mitsuba_tpu.scene.shapes import rectangle, sphere


def _scene():
    desc = SceneDesc()
    skin = desc.add_material(kind="diffuse", albedo=(0.0, 0.0, 0.0))
    desc.add_material(kind="diffuse", albedo=(0.5, 0.5, 0.5))
    desc.add_shape(sphere(16, 24), to_world=tf.scale(0.5)
                   @ tf.translate([0, 0, 0]), material=skin)
    desc.add_shape(rectangle(),
                   to_world=tf.translate([0, 2.0, 0])
                   @ tf.rotate([1, 0, 0], 90),
                   material=1, radiance=(12.0, 12.0, 12.0))
    return compile_scene(desc, cluster_size=128), skin


def test_profile_energy_bound():
    di = DipoleIntegrator(target_mat=0, sigma_s=(1.0, 1.0, 1.0),
                          sigma_a=(0.05, 0.05, 0.05), eta=1.3)
    alpha_p, sig_tr, zr, zv = (np.asarray(x) for x in di._profile())
    r = np.linspace(1e-4, 60.0, 200_000)
    import jax.numpy as jnp
    dr = np.sqrt(r ** 2 + zr[0] ** 2)
    dv = np.sqrt(r ** 2 + zv[0] ** 2)
    rd = (zr[0] * (sig_tr[0] * dr + 1) * np.exp(-sig_tr[0] * dr) / dr ** 3
          + zv[0] * (sig_tr[0] * dv + 1) * np.exp(-sig_tr[0] * dv)
          / dv ** 3) / (4 * np.pi) * alpha_p[0]
    total = np.trapezoid(2 * np.pi * r * rd, r)
    assert 0.0 < total <= 1.0001      # diffuse albedo bound
    assert (np.diff(rd) < 0).all()    # monotone decay


def test_irradiance_table_on_surface():
    scene, skin = _scene()
    di = DipoleIntegrator(target_mat=skin, irr_samples=256, irr_spp=2,
                          cluster_size=128)
    t = di.build_table(scene, seed=0)
    p = np.asarray(t.p)
    # all samples on the sphere of radius 0.5 (within tessellation error)
    r = np.linalg.norm(p, axis=-1)
    assert (np.abs(r - 0.5) < 0.02).all()
    e = np.asarray(t.e)
    assert np.isfinite(e).all() and (e >= 0).all()
    # the top of the sphere faces the light: irradiance decreases with
    # polar angle (statistically)
    top = e[p[:, 1] > 0.35].mean()
    bottom = e[p[:, 1] < -0.35].mean()
    assert top > 4 * max(bottom, 1e-9)


def test_dipole_render_translucent():
    scene, skin = _scene()
    from mitsuba_tpu.sensor.sensor import PerspectiveCamera
    cam = PerspectiveCamera(
        width=24, height=24, fov_x=40.0,
        to_world=tf.look_at([0, 0, 2.2], [0, 0, 0], [0, 1, 0]))
    di = DipoleIntegrator(target_mat=skin, irr_samples=512, irr_spp=2,
                          max_depth=2, cluster_size=128,
                          sigma_s=(6.0, 6.0, 6.0),
                          sigma_a=(0.05, 0.1, 0.2))
    img = np.asarray(di.render(scene, cam, Film(width=24, height=24),
                               spp=4, seed=0))
    assert np.isfinite(img).all()
    center = img[8:16, 8:16]
    assert center.mean() > 1e-3       # translucency shows (black albedo!)
    # wavelength-dependent sigma_a: red scatters out more than blue
    assert center[..., 0].mean() > center[..., 2].mean()
