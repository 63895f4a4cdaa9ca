"""Color/spectrum utilities (linear-RGB mode, SPECTRUM_SAMPLES = 3).

The reference compiles with a configurable channel count (ref: include/
mitsuba/core/spectrum.h:25-33,663); this build keeps the channel axis generic
(trailing axis N_CHANNELS) but ships RGB=3 like the reference default.
"""
from __future__ import annotations

import jax.numpy as jnp

N_CHANNELS = 3

# ITU-R BT.709 luminance weights (ref: spectrum.cpp `getLuminance`)
_LUM = jnp.array([0.212671, 0.715160, 0.072169], dtype=jnp.float32)

# sRGB <-> XYZ matrices (ref: spectrum.cpp:toLinearRGB/fromLinearRGB)
_XYZ_TO_RGB = jnp.array(
    [[3.240479, -1.537150, -0.498535],
     [-0.969256, 1.875991, 0.041556],
     [0.055648, -0.204043, 1.057311]], dtype=jnp.float32)
_RGB_TO_XYZ = jnp.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], dtype=jnp.float32)


def luminance(c):
    return jnp.sum(c * _LUM, axis=-1)


def rgb_to_xyz(c):
    return c @ _RGB_TO_XYZ.T


def xyz_to_rgb(c):
    return c @ _XYZ_TO_RGB.T


def to_srgb(c):
    """Linear → sRGB gamma (ref: spectrum.cpp toSRGBComponent)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, 12.92 * c,
                     1.055 * jnp.power(jnp.maximum(c, 1e-8), 1.0 / 2.4) - 0.055)


def from_srgb(c):
    return jnp.where(c <= 0.04045, c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))


def blackbody(temperature_k, lambdas_nm):
    """Planck's law, W/(m² · sr · nm) scale (ref: spectrum.cpp BlackBodySpectrum)."""
    h = 6.62607015e-34
    c = 2.99792458e8
    kb = 1.380649e-23
    lam = lambdas_nm * 1e-9
    return (2.0 * h * c * c) / (
        lam ** 5 * (jnp.exp(h * c / (lam * kb * temperature_k)) - 1.0)) * 1e-9
