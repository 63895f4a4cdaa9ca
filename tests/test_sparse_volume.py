"""Block-sparse volume grids vs the dense trilinear oracle, and the
reference hgridvolume dictionary round-trip (SURVEY §2.4 volumes:
hgridvolume/volcache/tiledvol/instancedvol)."""
import numpy as np
import pytest

import jax.numpy as jnp

from mitsuba_tpu.media.heterogeneous import trilinear as dense_trilinear
from mitsuba_tpu.media.sparse import (SparseGrid, instanced_lookup,
                                      load_hgrid, save_hgrid,
                                      tiled_lookup)


def _smoke_grid(rng, shape):
    """Dense grid with large empty regions (sparse-friendly)."""
    g = rng.random(shape, dtype=np.float32)
    g[g < 0.7] = 0.0
    g[: shape[0] // 2] = 0.0
    return g


def test_sparse_matches_dense_trilinear():
    rng = np.random.default_rng(0)
    dense = _smoke_grid(rng, (19, 13, 27))
    sg = SparseGrid.from_dense(dense, block=8)
    assert sg.n_resident < np.prod([(-(-s // 8)) for s in dense.shape])
    p = rng.random((500, 3), dtype=np.float32)
    p = np.concatenate([p, [[0, 0, 0], [1, 1, 1], [0.5, 1.0, 0.0]]])
    want = np.asarray(dense_trilinear(jnp.asarray(dense), jnp.asarray(p)))
    got = np.asarray(sg.trilinear(jnp.asarray(p)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # outside → 0
    out = np.asarray(sg.trilinear(jnp.asarray([[1.5, 0.5, 0.5]])))
    assert out[0] == 0.0


def test_sparse_roundtrip_and_multichannel():
    rng = np.random.default_rng(1)
    dense = _smoke_grid(rng, (16, 16, 16))
    sg = SparseGrid.from_dense(dense, block=4)
    np.testing.assert_array_equal(sg.to_dense()[..., 0], dense)
    # 3-channel grid
    d3 = np.stack([dense, dense * 2, dense * 3], axis=-1)
    sg3 = SparseGrid.from_dense(d3, block=4)
    p = rng.random((64, 3), dtype=np.float32)
    got = np.asarray(sg3.trilinear(jnp.asarray(p)))
    want0 = np.asarray(dense_trilinear(jnp.asarray(dense),
                                       jnp.asarray(p)))
    np.testing.assert_allclose(got[:, 0], want0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, 2], 3 * want0, rtol=1e-5, atol=2e-6)


def test_hgrid_dictionary_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    dense = _smoke_grid(rng, (8, 8, 8))
    dict_path = str(tmp_path / "vol_dict")
    save_hgrid(dict_path, "blk_", ".vol", dense,
               bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1), cells=(2, 2, 2))
    sg, bb_min, bb_max = load_hgrid(dict_path, "blk_", ".vol", block=4)
    np.testing.assert_allclose(bb_min, [-1, -1, -1])
    np.testing.assert_allclose(bb_max, [1, 1, 1])
    np.testing.assert_array_equal(sg.to_dense()[..., 0], dense)
    # empty cells were not written as files
    n_files = len(list(tmp_path.glob("blk_*.vol")))
    assert n_files < 8  # top half of the volume is all-zero


def test_tiled_lookup_periodicity():
    rng = np.random.default_rng(3)
    base = rng.random((5, 5, 5), dtype=np.float32)
    sg = SparseGrid.from_dense(base, block=4)
    p = jnp.asarray([[0.1, 0.2, 0.3]])
    v0 = np.asarray(tiled_lookup(sg, p, tiles=(2, 2, 2)))
    v1 = np.asarray(tiled_lookup(sg, p + jnp.asarray([0.5, 0.0, 0.5]),
                                 tiles=(2, 2, 2)))
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)
    want = np.asarray(sg.trilinear(jnp.asarray([[0.2, 0.4, 0.6]])))
    np.testing.assert_allclose(v0, want, rtol=1e-5, atol=1e-6)


def test_instanced_lookup_selects_exemplar():
    a = SparseGrid.from_dense(np.full((4, 4, 4), 1.0, np.float32),
                              block=4)
    c = SparseGrid.from_dense(np.full((4, 4, 4), 3.0, np.float32),
                              block=4)
    pages = jnp.stack([a.page, c.page])
    blocks = jnp.stack([a.blocks, c.blocks])
    index = jnp.asarray(np.array([[[0, 1]]], np.int32))  # [1,1,2] x-split
    p = jnp.asarray([[0.1, 0.5, 0.5], [0.9, 0.5, 0.5]])
    v = np.asarray(instanced_lookup(blocks, pages, index, p,
                                    block=4, res=(4, 4, 4)))
    np.testing.assert_allclose(v, [1.0, 3.0], rtol=1e-5)
