"""Full-spectral rendering (SPECTRUM_SAMPLES > 3 mode).

The reference switches channel count at compile time (spectrum.h:25-33)
and re-runs the whole renderer with K spectral bins. This build gets the
same capability by BATCHING bins through the existing 3-channel
pipeline: `render_spectral` compiles the scene ⌈K/3⌉ times, each time
asking the caller's `desc_at(lams)` for a SceneDesc whose "RGB" values
are the materials'/emitters' spectra sampled at those 3 wavelengths —
dispersion included, since wavelength-dependent IOR just changes the
per-band scene. Band images integrate against the CIE observer into XYZ
→ linear sRGB (core/spectrum.py).

Cost: K/3 renders. Variance: bands are rendered with INDEPENDENT seeds,
which trades the reference's correlated-channel noise for slightly more
chroma noise — stratified over bands, unbiased either way.
"""
from __future__ import annotations

import numpy as np

from ..core.spectrum import (SPECTRUM_MAX_NM, SPECTRUM_MIN_NM, cie_xyz_at,
                             xyz_to_rgb)
from ..film.film import Film
from ..render import render
from ..scene.builder import compile_scene


def spectral_bands(n_bins: int):
    """Bin-center wavelengths of an equal-width partition of the visible
    range (the reference's SPECTRUM_SAMPLES binning, spectrum.h:663)."""
    edges = np.linspace(SPECTRUM_MIN_NM, SPECTRUM_MAX_NM, n_bins + 1)
    return 0.5 * (edges[:-1] + edges[1:]), np.diff(edges)


def render_spectral(desc_at, camera, film: Film, integrator, spp: int,
                    n_bins: int = 12, seed: int = 0,
                    cluster_size: int = 512):
    """Render with K spectral bins. desc_at(lams[3]) -> SceneDesc with
    values sampled at those wavelengths. Returns (rgb [H,W,3],
    spectral [H,W,K], lambdas [K])."""
    assert n_bins % 3 == 0, "n_bins must be a multiple of 3"
    lams, _widths = spectral_bands(n_bins)
    bands = []
    for g in range(n_bins // 3):
        lam3 = lams[3 * g:3 * g + 3]
        desc = desc_at(lam3)
        scene = compile_scene(desc, cluster_size)
        integ = (integrator.specialized_for(scene)
                 if hasattr(integrator, "specialized_for")
                 and integrator.families is None else integrator)
        img = np.asarray(render(scene, camera, film, integ, spp,
                                seed + g * 6151))
        bands.append(img)                        # [H, W, 3] = 3 bins
    spec = np.concatenate(bands, axis=-1)        # [H, W, K]

    # integrate: XYZ = Σ_k S_k · cmf(λ_k) · Δλ, normalised to Y(E)=1
    cmf = np.asarray(cie_xyz_at(lams))           # [K, 3]
    norm = cmf[:, 1].sum()
    xyz = np.einsum("hwk,kc->hwc", spec, cmf) / norm
    rgb = np.asarray(xyz_to_rgb(xyz))
    return rgb, spec, lams
