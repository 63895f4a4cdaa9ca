"""Shell-mapped volume tests (ref: src/volume/shellmap.cpp, tetra.h)."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.media.shellmap import (build_shell, extrude_shell,
                                        load_shell, shell_lookup,
                                        shell_lookup_full,
                                        shellmapped_lookup)


def _flat_quad_shell(thickness=0.5):
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = pos[:, :2].copy()
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    return extrude_shell(pos, uv, nrm, faces, thickness=thickness)


def test_flat_shell_texture_coords():
    data = _flat_quad_shell(0.5)
    shell = build_shell(*data, grid_res=8)
    rng = np.random.default_rng(0)
    p = rng.uniform([0.02, 0.02, 0.02], [0.98, 0.98, 0.48],
                    (256, 3)).astype(np.float32)
    tex, inside = shell_lookup(shell, jnp.asarray(p))
    assert bool(inside.all())
    # analytic: tex = (x, y, z / thickness) for a flat +z extrusion
    expect = np.stack([p[:, 0], p[:, 1], p[:, 2] / 0.5], -1)
    np.testing.assert_allclose(np.asarray(tex), expect, atol=2e-4)


def test_outside_shell_is_masked():
    shell = build_shell(*_flat_quad_shell(0.5), grid_res=8)
    p = jnp.array([[0.5, 0.5, 0.9], [0.5, 0.5, -0.2], [2.5, 0.5, 0.2]])
    _, inside = shell_lookup(shell, p)
    assert not bool(inside.any())
    # shellmapped density must read exactly 0 outside (shellmap.cpp:109)
    val = shellmapped_lookup(shell, p, lambda q: q[..., 2] + 1.0)
    np.testing.assert_allclose(np.asarray(val), 0.0)


def test_full_lookup_normals_and_embedded():
    shell = build_shell(*_flat_quad_shell(0.25), grid_res=8)
    p = jnp.array([[0.3, 0.6, 0.1], [0.7, 0.2, 0.2]])
    tex, nrm, dpdu, dpdv, inside = shell_lookup_full(shell, p)
    assert bool(inside.all())
    np.testing.assert_allclose(np.asarray(nrm),
                               [[0, 0, 1], [0, 0, 1]], atol=1e-5)
    # tangents orthogonal to the normal
    assert float(jnp.abs((nrm * dpdu).sum(-1)).max()) < 1e-4
    # embedded volume: density = texture z -> p.z / thickness
    val = shellmapped_lookup(shell, p, lambda q: q[..., 2])
    np.testing.assert_allclose(np.asarray(val), [0.4, 0.8], atol=1e-3)


def test_shell_file_roundtrip(tmp_path):
    pos, tex, nrm, dpdu, dpdv, tets = _flat_quad_shell(0.5)
    path = tmp_path / "quad.shell"
    with open(path, "w") as f:
        f.write(f"{len(pos)} {len(tets)}\n")
        for i in range(len(pos)):
            row = np.concatenate([pos[i], tex[i], nrm[i], dpdu[i], dpdv[i]])
            f.write(" ".join(f"{v:.7g}" for v in row) + "\n")
        for t in tets:
            f.write(" ".join(str(int(v)) for v in t) + "\n")
    loaded = load_shell(str(path))
    shell = build_shell(*loaded, grid_res=8)
    p = jnp.array([[0.25, 0.75, 0.3]])
    texp, inside = shell_lookup(shell, p)
    assert bool(inside.all())
    np.testing.assert_allclose(np.asarray(texp), [[0.25, 0.75, 0.6]],
                               atol=2e-4)
