"""Sun / sky / sunsky environment emitters (analytic daylight model).

Counterpart of the reference `sky`/`sun`/`sunsky` plugins (ref:
src/emitters/sunsky/{sky.cpp,sun.cpp,sunsky.cpp}). The reference
rasterises the Hošek-Wilkie model into a lat-long bitmap and then behaves
exactly like `envmap` (sky.cpp `resolution` property + MIPMap path); this
build does the same rasterise-to-envmap step — the image feeds the
existing 2D-CDF importance-sampled environment emitter — but evaluates
the **Preetham et al. 1999** analytic model ("A Practical Analytic Model
for Daylight") instead: it is fully closed-form (no 10MB coefficient
tables like the reference's skymodeldata.h), which keeps the scene
compiler dependency-free. Same interface: turbidity, sun direction,
scale, resolution, sun radius scale.

The sun disc is painted into the same raster with its angular radius
(0.2665° ± sunRadiusScale, sun.cpp:37) at a radiance that reproduces the
Preetham solar irradiance after attenuation by the optical air mass —
the envmap CDF concentrates samples onto those texels automatically.

All host-side numpy at scene-compile time (device code sees an ordinary
envmap).
"""
from __future__ import annotations

import numpy as np

# Perez function coefficient fits in turbidity T (Preetham Table A.1/A.2)
# rows: A..E; columns: (slope vs T, offset)
_PEREZ_Y = np.array([[0.1787, -1.4630], [-0.3554, 0.4275],
                     [-0.0227, 5.3251], [0.1206, -2.5771],
                     [-0.0670, 0.3703]])
_PEREZ_x = np.array([[-0.0193, -0.2592], [-0.0665, 0.0008],
                     [-0.0004, 0.2125], [-0.0641, -0.8989],
                     [-0.0033, 0.0452]])
_PEREZ_y = np.array([[-0.0167, -0.2608], [-0.0950, 0.0092],
                     [-0.0079, 0.2102], [-0.0441, -1.6537],
                     [-0.0109, 0.0529]])

# zenith chromaticity fits (Preetham A.2): cubic in sun zenith angle θs,
# linear/quadratic in T
_ZENITH_x = np.array([
    [0.00166, -0.00375, 0.00209, 0.0],
    [-0.02903, 0.06377, -0.03202, 0.00394],
    [0.11693, -0.21196, 0.06052, 0.25886]])
_ZENITH_y = np.array([
    [0.00275, -0.00610, 0.00317, 0.0],
    [-0.04214, 0.08970, -0.04153, 0.00516],
    [0.15346, -0.26756, 0.06670, 0.26688]])

SUN_APP_RADIUS_DEG = 0.2665     # ref: sun.cpp:37 (half-angle, degrees)


def _perez(theta, gamma, coef):
    A, B, C, D, E = coef
    cos_t = np.maximum(np.cos(theta), 1e-3)
    return ((1.0 + A * np.exp(B / cos_t))
            * (1.0 + C * np.exp(D * gamma) + E * np.cos(gamma) ** 2))


def _zenith_luminance(T, theta_s):
    """Zenith luminance Yz in kcd/m² (Preetham A.2)."""
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    return ((4.0453 * T - 4.9710) * np.tan(chi)
            - 0.2155 * T + 2.4192)


def _zenith_chroma(mat, T, theta_s):
    tv = np.array([T * T, T, 1.0])
    sv = np.array([theta_s ** 3, theta_s ** 2, theta_s, 1.0])
    return float(tv @ (mat @ sv))


def _xyY_to_rgb(x, y, Y):
    """xyY → linear sRGB (D65)."""
    y = np.maximum(y, 1e-6)
    X = x / y * Y
    Z = (1.0 - x - y) / y * Y
    r = 3.240479 * X - 1.537150 * Y - 0.498535 * Z
    g = -0.969256 * X + 1.875991 * Y + 0.041556 * Z
    b = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    return np.stack([r, g, b], axis=-1).clip(0.0)


def sky_image(turbidity: float = 3.0,
              sun_direction=(0.0, 1.0, 0.2),
              resolution: int = 512,
              scale: float = 1.0,
              stretch: float = 1.0,
              albedo_ground: float = 0.15,
              with_sun: bool = False,
              sun_radius_scale: float = 1.0,
              sun_scale: float = 1.0) -> np.ndarray:
    """Rasterise the Preetham sky (optionally + sun disc) to a lat-long
    [H, 2H, 3] image in the envmap mapping d = (sinφ sinθ, cosθ,
    -cosφ sinθ) (ref: envmap.cpp:595-600).

    Units follow the reference's convention of returning radiance in
    arbitrary-but-consistent linear-RGB units scaled so a turbidity-3
    zenith is O(1) — `scale` multiplies on top (sky.cpp `scale`).
    """
    T = float(turbidity)
    sd = np.asarray(sun_direction, np.float64)
    sd = sd / np.linalg.norm(sd)
    theta_s = float(np.arccos(np.clip(sd[1], -1.0, 1.0)))
    theta_s = min(theta_s, np.pi / 2 - 1e-3)    # model defined above horizon

    h = resolution
    w = 2 * resolution
    theta = (np.arange(h) + 0.5) / h * np.pi / max(stretch, 1e-3)
    phi = (np.arange(w) + 0.5) / w * 2.0 * np.pi
    st, ct = np.sin(theta)[:, None], np.cos(theta)[:, None]
    sp, cp = np.sin(phi)[None, :], np.cos(phi)[None, :]
    # direction grid [H, W, 3]
    d = np.stack([np.broadcast_to(st * sp, (h, w)),
                  np.broadcast_to(ct, (h, w)),
                  np.broadcast_to(-st * cp, (h, w))], axis=-1)

    cos_gamma = np.clip(d @ sd, -1.0, 1.0)
    gamma = np.arccos(cos_gamma)
    th = np.minimum(np.broadcast_to(theta[:, None], (h, w)),
                    np.pi / 2 - 1e-3)

    # Perez coefficients at this turbidity
    cY = _PEREZ_Y @ [T, 1.0]
    cx = _PEREZ_x @ [T, 1.0]
    cy = _PEREZ_y @ [T, 1.0]

    Yz = _zenith_luminance(T, theta_s)
    xz = _zenith_chroma(_ZENITH_x, T, theta_s)
    yz = _zenith_chroma(_ZENITH_y, T, theta_s)

    def ratio(coef, zenith):
        return zenith * (_perez(th, gamma, coef)
                         / _perez(0.0, theta_s, coef))

    Y = ratio(cY, Yz)
    x = ratio(cx, xz)
    y = ratio(cy, yz)

    img = _xyY_to_rgb(x, y, np.maximum(Y, 0.0) / 10.0)  # O(1) zenith units
    below = np.broadcast_to(theta[:, None] > np.pi / 2, (h, w))
    img = np.where(below[..., None], albedo_ground * img.mean(), img)
    img = (img * scale).astype(np.float32)

    if with_sun:
        # sun radiance from broadband attenuated irradiance (Preetham §A.1
        # simplified to RGB): E_sun ≈ E0 · exp(-τ·m), m = rel. air mass
        m = 1.0 / (np.cos(theta_s) + 0.15
                   * (93.885 - np.degrees(theta_s)) ** -1.253)
        # broadband optical depths: rayleigh + aerosol (β from turbidity);
        # both scale as λ^-n so BLUE attenuates hardest (sunset reddening)
        beta = 0.04608 * T - 0.04586
        tau = (np.array([0.06, 0.12, 0.27])          # rayleigh-ish RGB
               + beta * np.array([0.85, 1.05, 1.30]))
        e_sun = 60.0 * np.exp(-tau * m) * sun_scale   # matches sky units
        half_angle = np.radians(SUN_APP_RADIUS_DEG) * sun_radius_scale
        # paint over at least one texel: widen the disc to the texel
        # radius when the raster is coarse, normalising by the covered
        # solid angle so ∫_disc L dω = E_sun at ANY resolution
        texel_ang = np.pi / h
        r_eff = max(half_angle, 0.75 * texel_ang)
        in_disc = gamma <= r_eff
        dtheta = np.pi / h / max(stretch, 1e-3)
        dphi = 2.0 * np.pi / w
        omega = np.broadcast_to(np.sin(theta)[:, None] * dtheta * dphi,
                                (h, w))
        covered = float((omega * in_disc).sum())
        if covered > 0:
            l_sun = e_sun / covered
            img = np.where(in_disc[..., None],
                           img + l_sun.astype(np.float32), img)

    return img


def sun_image(turbidity: float = 3.0, sun_direction=(0.0, 1.0, 0.2),
              resolution: int = 512, **kw) -> np.ndarray:
    """Sun disc only on a black sky (ref: sun.cpp)."""
    img = sky_image(turbidity, sun_direction, resolution, scale=0.0,
                    with_sun=True, **kw)
    return img


def sunsky_image(turbidity: float = 3.0, sun_direction=(0.0, 1.0, 0.2),
                 resolution: int = 512, **kw) -> np.ndarray:
    """Combined sun + sky (ref: sunsky.cpp)."""
    return sky_image(turbidity, sun_direction, resolution, with_sun=True,
                     **kw)
