"""Spectral-mode tests: CIE integration identities + end-to-end spectral
render (white check + dispersion-capable wavelength dependence)."""
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.spectrum import (InterpolatedSpectrum, blackbody,
                                       spectral_to_rgb, spectral_to_xyz)
from mitsuba_tpu.film.film import Film
from mitsuba_tpu.integrator.direct import DirectIntegrator
from mitsuba_tpu.integrator.spectral import render_spectral, spectral_bands
from mitsuba_tpu.scene.builder import SceneDesc
from mitsuba_tpu.scene.shapes import rectangle
from mitsuba_tpu.sensor.sensor import PerspectiveCamera


def test_equal_energy_is_white():
    lam = np.linspace(380, 720, 60)
    xyz = np.asarray(spectral_to_xyz(lam, np.ones(60)))
    # equal-energy illuminant: Y normalised to ~1, x=y≈1/3
    s = xyz.sum()
    assert abs(xyz[1] / (np.asarray(spectral_to_xyz(
        np.arange(360, 831, 5.0), np.ones(95)))[1]) - 1.0) < 0.2
    assert abs(xyz[0] / s - 1 / 3) < 0.02
    assert abs(xyz[1] / s - 1 / 3) < 0.02


def test_blackbody_hue():
    lam = np.arange(380.0, 781.0, 5.0)
    warm = np.asarray(spectral_to_rgb(lam, np.asarray(
        blackbody(2500.0, lam)) / np.asarray(
        blackbody(2500.0, lam)).max()))
    cool = np.asarray(spectral_to_rgb(lam, np.asarray(
        blackbody(12000.0, lam)) / np.asarray(
        blackbody(12000.0, lam)).max()))
    assert warm[0] > warm[2] * 2          # 2500K: strongly red
    assert cool[2] > cool[0]              # 12000K: blue


def test_spd_roundtrip(tmp_path):
    s = InterpolatedSpectrum([400, 500, 600, 700], [0.1, 0.8, 0.5, 0.2])
    fn = str(tmp_path / "t.spd")
    s.save(fn)
    s2 = InterpolatedSpectrum.from_file(fn)
    lam = np.linspace(400, 700, 31)
    assert np.allclose(s.eval(lam), s2.eval(lam))
    assert s.eval([550]) == 0.65          # linear midpoint


def test_render_spectral_matches_rgb_for_flat_spectra():
    """A scene whose spectra are flat must render the same image in
    spectral mode as in RGB mode (up to MC noise + observer normalisation
    of the flat illuminant)."""
    def make_desc(albedo, radiance):
        d = SceneDesc()
        m = d.add_material(kind="diffuse", albedo=tuple(albedo))
        d.add_shape(rectangle(), to_world=tf.scale(3.0), material=m)
        d.add_shape(rectangle(),
                    to_world=tf.translate([0, 0, 2]) @ tf.rotate(
                        [1, 0, 0], 180),
                    material=m, radiance=tuple(radiance))
        return d

    cam = PerspectiveCamera(width=12, height=12, fov_x=50.0,
                            to_world=tf.look_at([0, 0, 1.5], [0, 0, 0],
                                                [0, 1, 0]))
    film = Film(width=12, height=12)
    integ = DirectIntegrator(cluster_size=128)

    def desc_at(lams):
        # flat 60% reflector under a flat emitter at every wavelength
        return make_desc([0.6] * 3, [4.0] * 3)

    rgb, spec, lams = render_spectral(desc_at, cam, film, integ, spp=8,
                                      n_bins=12, cluster_size=128)
    assert spec.shape == (12, 12, 12)
    assert np.isfinite(rgb).all()
    # flat spectrum = equal-energy illuminant E, which in D65-referenced
    # sRGB is the fixed chromaticity (1.2048, 0.9484, 0.9086)·Y — check
    # the hue ratios, not achromaticity
    m = rgb.reshape(-1, 3).mean(0)
    e_rgb = np.asarray(spectral_to_rgb(lams, np.ones_like(lams)))
    e_rgb = e_rgb / e_rgb[1]
    assert abs(m[0] / m[1] - e_rgb[0]) < 0.03
    assert abs(m[2] / m[1] - e_rgb[2]) < 0.03
    # spectral bins are ~equal for flat spectra
    smean = spec.mean(axis=(0, 1))
    assert smean.std() / smean.mean() < 0.1


def test_render_spectral_dispersion_hook():
    """Wavelength-dependent albedo shows up in the right bins."""
    def desc_at(lams):
        # red-pass filter: albedo 0.9 above 600nm else 0.05
        alb = [0.9 if l > 600 else 0.05 for l in lams]
        d = SceneDesc()
        m = d.add_material(kind="diffuse", albedo=tuple(alb))
        d.add_shape(rectangle(), to_world=tf.scale(3.0), material=m)
        d.add_shape(rectangle(),
                    to_world=tf.translate([0, 0, 2]) @ tf.rotate(
                        [1, 0, 0], 180),
                    material=m, radiance=(4.0, 4.0, 4.0))
        return d

    cam = PerspectiveCamera(width=8, height=8, fov_x=50.0,
                            to_world=tf.look_at([0, 0, 1.5], [0, 0, 0],
                                                [0, 1, 0]))
    rgb, spec, lams = render_spectral(
        desc_at, cam, Film(width=8, height=8),
        DirectIntegrator(cluster_size=128), spp=8, n_bins=12,
        cluster_size=128)
    lo = spec[..., lams <= 600].mean()
    hi = spec[..., lams > 600].mean()
    assert hi > 5 * lo
    # and the RGB is red-dominated
    m = rgb.reshape(-1, 3).mean(0)
    assert m[0] > 2 * m[1] and m[0] > 2 * m[2]
