"""Volume-grid utilities — analogs of the winmad `.vol` processing tools
(ref: src/utils/{clampVolume,fillEmptyVoxels,downSampleAlbedo,
splitGridVolume}.cpp; volume up/down-sampling lives in
util/appearance.py). All operate on numpy [Z, Y, X] or [Z, Y, X, C]
grids as loaded by io/vol.py and are vectorized — the reference's
triple-nested voxel loops become whole-array ops.
"""
from __future__ import annotations

import numpy as np


def clamp_volume(grid: np.ndarray, threshold: float) -> np.ndarray:
    """Zero voxels below `threshold` (ref: clampVolume.cpp — denoises
    low-density CT artifacts before delta tracking)."""
    grid = np.asarray(grid, np.float32)
    mag = grid if grid.ndim == 3 else np.linalg.norm(grid, axis=-1)
    mask = mag >= threshold
    return np.where(mask if grid.ndim == 3 else mask[..., None],
                    grid, 0.0).astype(np.float32)


def fill_empty_voxels(grid: np.ndarray, max_iters: int = 1000
                      ) -> np.ndarray:
    """Flood-fill zero voxels with the average of their non-zero
    6-neighbors, iterating until no zero voxel remains (ref:
    fillEmptyVoxels.cpp — fills albedo/orientation holes so trilinear
    lookups near the medium boundary don't blend with zeros)."""
    g = np.asarray(grid, np.float32).copy()
    scalar = g.ndim == 3
    if scalar:
        g = g[..., None]
    for _ in range(max_iters):
        mag = np.abs(g).sum(-1)
        empty = mag == 0.0
        if not empty.any():
            break
        filled = ~empty
        acc = np.zeros_like(g)
        cnt = np.zeros(g.shape[:3], np.float32)
        for axis in range(3):
            for off in (-1, 1):
                nb = np.roll(g, off, axis=axis)
                nb_ok = np.roll(filled, off, axis=axis)
                # roll wraps; mask out the wrapped slice
                sl = [slice(None)] * 3
                sl[axis] = 0 if off == 1 else -1
                nb_ok = nb_ok.copy()
                nb_ok[tuple(sl)] = False
                acc += np.where(nb_ok[..., None], nb, 0.0)
                cnt += nb_ok
        newly = empty & (cnt > 0)
        vals = acc / np.maximum(cnt, 1.0)[..., None]
        g = np.where(newly[..., None], vals, g)
        if not newly.any():
            break                        # isolated zeros: nothing nearby
    return g[..., 0] if scalar else g


def downsample_albedo(albedo: np.ndarray, density: np.ndarray,
                      factor: int = 2) -> np.ndarray:
    """Density-weighted block average of an albedo grid (ref:
    downSampleAlbedo.cpp — plain averaging would let empty voxels dilute
    the albedo; weighting by density keeps the radiative transfer of the
    coarse volume consistent)."""
    a = np.asarray(albedo, np.float32)
    d = np.asarray(density, np.float32)
    if d.ndim == 4:
        d = d[..., 0]
    z, y, x = d.shape
    f = factor
    zc, yc, xc = z // f, y // f, x // f
    a = a[: zc * f, : yc * f, : xc * f]
    d = d[: zc * f, : yc * f, : xc * f]
    if a.ndim == 3:
        a = a[..., None]
    ab = a.reshape(zc, f, yc, f, xc, f, -1)
    db = d.reshape(zc, f, yc, f, xc, f)
    num = (ab * db[..., None]).sum(axis=(1, 3, 5))
    den = db.sum(axis=(1, 3, 5))
    out = num / np.maximum(den, 1e-20)[..., None]
    out = np.where(den[..., None] > 0, out, 0.0)
    return out.astype(np.float32)


def downsample_error(fine_albedo, fine_density, coarse_albedo,
                     factor: int = 2) -> float:
    """Density-weighted RMS error of a downsampled albedo vs the fine
    grid (ref: calcDownSampleError.cpp)."""
    a = np.asarray(fine_albedo, np.float32)
    d = np.asarray(fine_density, np.float32)
    if d.ndim == 4:
        d = d[..., 0]
    if a.ndim == 3:
        a = a[..., None]
    c = np.asarray(coarse_albedo, np.float32)
    if c.ndim == 3:
        c = c[..., None]
    up = np.repeat(np.repeat(np.repeat(c, factor, 0), factor, 1),
                   factor, 2)
    z, y, x = d.shape
    up = up[:z, :y, :x]
    w = d[..., None]
    err = ((a - up) ** 2 * w).sum() / np.maximum(w.sum(), 1e-20)
    return float(np.sqrt(err))


def split_grid_volume(grid: np.ndarray, bbox_min, bbox_max):
    """Split a grid into 2×2 xy sub-volumes that SHARE their boundary
    layer, with matching sub-bboxes (ref: splitGridVolume.cpp — feeds
    hgridvolume block dictionaries; the one-voxel overlap keeps
    trilinear lookups seamless across block seams)."""
    g = np.asarray(grid, np.float32)
    z, y, x = g.shape[:3]
    mn = np.asarray(bbox_min, np.float64)
    mx = np.asarray(bbox_max, np.float64)
    step = (mx - mn) / np.maximum([x - 1, y - 1, z - 1], 1)
    out = []
    for j in range(2):
        for i in range(2):
            imin = i * x // 2
            imax = (i + 1) * x // 2 - i + 1   # inclusive hi + shared col
            jmin = j * y // 2
            jmax = (j + 1) * y // 2 - j + 1
            sub = g[:, jmin:jmax, imin:imax]
            sub_min = (mn[0] + step[0] * imin, mn[1] + step[1] * jmin,
                       mn[2])
            sub_max = (mn[0] + step[0] * (imax - 1),
                       mn[1] + step[1] * (jmax - 1), mx[2])
            out.append(((i, j), sub.copy(), sub_min, sub_max))
    return out
