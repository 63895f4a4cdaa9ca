"""Volume-grid utilities (ref: src/utils/{clampVolume,fillEmptyVoxels,
downSampleAlbedo,splitGridVolume,calcDownSampleError}.cpp)."""
import os

import numpy as np

from mitsuba_tpu.media import voltools


def test_clamp_volume():
    g = np.array([[[0.005, 0.5], [0.02, 0.0]]], np.float32)
    out = voltools.clamp_volume(g, 0.01)
    assert out[0, 0, 0] == 0.0 and out[0, 0, 1] == 0.5
    assert out[0, 1, 0] == np.float32(0.02)
    # vector grids clamp on magnitude
    gv = np.zeros((1, 1, 2, 3), np.float32)
    gv[0, 0, 1] = (0.1, 0.0, 0.0)
    outv = voltools.clamp_volume(gv, 0.05)
    assert np.all(outv[0, 0, 0] == 0) and outv[0, 0, 1, 0] == np.float32(
        0.1)


def test_fill_empty_voxels():
    g = np.zeros((1, 3, 3, 3), np.float32)
    g[0, 1, 1] = (0.6, 0.3, 0.1)
    out = voltools.fill_empty_voxels(g)
    # every voxel eventually receives the propagated color
    assert (np.abs(out).sum(-1) > 0).all()
    assert np.allclose(out[0, 1, 1], (0.6, 0.3, 0.1))
    # first ring = exact neighbor average = the single source value
    assert np.allclose(out[0, 0, 1], (0.6, 0.3, 0.1))


def test_downsample_albedo_density_weighted():
    albedo = np.zeros((2, 2, 2, 3), np.float32)
    density = np.zeros((2, 2, 2), np.float32)
    albedo[0, 0, 0] = (1.0, 0.0, 0.0)
    density[0, 0, 0] = 3.0
    albedo[1, 1, 1] = (0.0, 1.0, 0.0)
    density[1, 1, 1] = 1.0
    out = voltools.downsample_albedo(albedo, density, 2)
    assert out.shape == (1, 1, 1, 3)
    # weights 3:1 → (0.75, 0.25, 0)
    assert np.allclose(out[0, 0, 0], (0.75, 0.25, 0.0), atol=1e-6)
    err = voltools.downsample_error(albedo, density, out, 2)
    assert err > 0.0


def test_split_grid_volume_shares_boundary():
    g = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    parts = voltools.split_grid_volume(g, (0, 0, 0), (3, 3, 3))
    assert len(parts) == 4
    (_, s00, mn00, mx00) = parts[0]
    (_, s10, mn10, mx10) = parts[1]
    assert s00.shape == (4, 3, 3)
    # shared boundary column: last x-column of block (0,·) equals first
    # of block (1,·)
    np.testing.assert_array_equal(s00[:, :, -1], s10[:, :, 0])
    assert mx00[0] == mn10[0]


def test_vol_cli_roundtrip(tmp_path):
    from mitsuba_tpu import tools
    from mitsuba_tpu.io.vol import load_vol, save_vol
    g = np.random.default_rng(0).uniform(
        0, 1, (4, 4, 4)).astype(np.float32)
    g[g < 0.3] = 0.0
    src = os.path.join(str(tmp_path), "g.vol")
    save_vol(src, g, (0, 0, 0), (1, 1, 1))
    dst = os.path.join(str(tmp_path), "c.vol")
    rc = tools.main(["vol", "clamp", src, dst, "--threshold", "0.5"])
    assert rc == 0
    out, mn, mx = load_vol(dst)
    assert (out[out > 0] >= 0.5).all()
    # split writes 4 block files
    sp = os.path.join(str(tmp_path), "s.vol")
    rc = tools.main(["vol", "split", src, sp])
    assert rc == 0
    assert len([f for f in os.listdir(str(tmp_path))
                if f.startswith("s_")]) == 4
