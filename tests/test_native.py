"""Native runtime (C++ via ctypes) parity tests: the compiled OBJ
parser / RGBE codec / Woop precompute must agree exactly with the pure
Python fallbacks (tests cover both paths by monkeypatching
native.available)."""
import os

import numpy as np
import pytest

from mitsuba_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")

_OBJ = """mtllib none.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vn 0 0 1
vn 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl matA
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl matB
f -5//2 -4//2 -1//2
"""


def test_obj_native_matches_python(tmp_path, monkeypatch):
    p = tmp_path / "t.obj"
    p.write_text(_OBJ)
    from mitsuba_tpu.io.obj import load_obj
    groups_n, _ = load_obj(str(p))
    monkeypatch.setattr(native, "available", lambda: False)
    groups_p, _ = load_obj(str(p))
    assert [g.material_name for g in groups_n] == \
        [g.material_name for g in groups_p]
    for gn, gp in zip(groups_n, groups_p):
        # same triangles as vertex-position sets (index order may differ)
        tn = np.sort(gn.mesh.vertices[gn.mesh.faces].reshape(-1, 9), 0)
        tp = np.sort(gp.mesh.vertices[gp.mesh.faces].reshape(-1, 9), 0)
        assert np.allclose(tn, tp)
        assert (gn.mesh.normals is None) == (gp.mesh.normals is None)


def test_obj_negative_and_fan():
    r = native.parse_obj(_OBJ.encode())
    verts, norms, uvs, tv, tt, tn, gid, names = r
    assert names == ["default", "matA", "matB"]
    assert len(tv) == 3            # quad fan = 2 tris + 1 tri
    assert gid.tolist() == [1, 1, 2]
    assert tv[2].tolist() == [0, 1, 4]      # negative indices resolved
    assert tn[2].tolist() == [1, 1, 1]
    assert tt[2].tolist() == [-1, -1, -1]   # v//vn has no uv


def test_rgbe_roundtrip_native_and_python(tmp_path):
    from mitsuba_tpu.io.image import read_hdr, write_hdr
    rng = np.random.default_rng(7)
    img = (rng.random((24, 37, 3)).astype(np.float32) ** 2) * 40.0
    img[3, 4] = 0.0                          # zero pixel
    img[5, :] = 2.5                          # constant run (exercises RLE)
    fn = str(tmp_path / "x.hdr")
    write_hdr(fn, img)
    back = read_hdr(fn)
    # RGBE quantization: value step is 2^(e-8) with mantissa ∈ [0.5, 1)
    # ⇒ truncation error ≤ max_channel / 128 (shared exponent)
    tol = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert (np.abs(back - img) <= tol).all()
    # python decoder agrees with the native one bit-for-bit
    from mitsuba_tpu.io.image import _rgbe_decode_py
    with open(fn, "rb") as f:
        blob = f.read()
    data = blob[blob.index(b"\n\n") + 2:]
    data = data[data.index(b"\n") + 1:]
    back_py = _rgbe_decode_py(data, 37, 24)
    assert np.array_equal(back, back_py)


def test_woop_invert_matches_numpy():
    rng = np.random.default_rng(3)
    p0 = rng.standard_normal((257, 3))
    e1 = rng.standard_normal((257, 3))
    e2 = rng.standard_normal((257, 3))
    # inject degenerate rows (zero area — the padded soup)
    e1[10] = 0.0
    e2[200] = e1[200]
    minv, trans = native.woop_invert(p0, e1, e2)
    n = np.cross(e1, e2)
    good = np.linalg.norm(n, axis=-1) > 1e-18
    m = np.stack([e1, e2, n], axis=-1)
    m_safe = np.where(good[:, None, None], m, np.eye(3)[None])
    ref = np.where(good[:, None, None], np.linalg.inv(m_safe), 0.0)
    reft = -np.einsum("tij,tj->ti", ref, p0)
    reft = np.where(good[:, None], reft, np.array([0.0, 0.0, 1.0]))
    assert np.allclose(minv, ref, rtol=1e-9, atol=1e-9)
    assert np.allclose(trans, reft, rtol=1e-9, atol=1e-9)
    assert (minv[10] == 0).all() and tuple(trans[10]) == (0.0, 0.0, 1.0)


def test_build_woop_uses_native_consistently():
    """build_woop output must be identical with and without the native
    path (the scene compiler's correctness doesn't depend on which ran)."""
    from mitsuba_tpu.accel import dense
    rng = np.random.default_rng(11)
    p0 = rng.random((64, 3))
    e1 = rng.random((64, 3))
    e2 = rng.random((64, 3))
    wo_n, wd_n = dense.build_woop(p0, e1, e2)
    os.environ["MITSUBA_TPU_NO_NATIVE"] = "1"
    try:
        import mitsuba_tpu.native as nat
        old = nat.available
        nat.available = lambda: False
        wo_p, wd_p = dense.build_woop(p0, e1, e2)
        nat.available = old
    finally:
        del os.environ["MITSUBA_TPU_NO_NATIVE"]
    assert np.allclose(wo_n, wo_p, rtol=1e-6, atol=1e-7)
    assert np.allclose(wd_n, wd_p, rtol=1e-6, atol=1e-7)


def test_ply_face_list_tiers(tmp_path):
    """Binary PLY face lists: the uniform-count numpy fast path, the
    native variable-count parser, and the Python fallback must agree
    (ref: the vendored C parser under src/shapes/ply/)."""
    import os
    import struct

    import numpy as np

    from mitsuba_tpu.io.ply import load_ply

    hdr = (b"ply\nformat binary_little_endian 1.0\n"
           b"element vertex 5\n"
           b"property float x\nproperty float y\nproperty float z\n"
           b"element face 2\n"
           b"property list uchar int vertex_indices\nend_header\n")
    verts = np.arange(15, dtype="<f4").tobytes()
    mixed = (struct.pack("<B3i", 3, 0, 1, 2)
             + struct.pack("<B4i", 4, 1, 2, 3, 4))
    p = os.path.join(str(tmp_path), "mixed.ply")
    with open(p, "wb") as f:
        f.write(hdr + verts + mixed)
    want = [[0, 1, 2], [1, 2, 3], [1, 3, 4]]

    m_native = load_ply(p)
    assert m_native.faces.tolist() == want

    import mitsuba_tpu.native as native_mod
    orig = native_mod.ply_parse_faces
    try:
        native_mod.ply_parse_faces = lambda *a, **k: None
        m_py = load_ply(p)
    finally:
        native_mod.ply_parse_faces = orig
    assert np.asarray(m_py.faces).tolist() == want

    # uniform-count triangles take the vectorized tier
    tri = (struct.pack("<B3i", 3, 0, 1, 2)
           + struct.pack("<B3i", 3, 2, 3, 4))
    p2 = os.path.join(str(tmp_path), "tris.ply")
    with open(p2, "wb") as f:
        f.write(hdr + verts + tri)
    assert load_ply(p2).faces.tolist() == [[0, 1, 2], [2, 3, 4]]


def test_exr_zip_half_roundtrips(tmp_path):
    """EXR ZIP/ZIPS/none × float/half round trips, native<->python file
    cross-parity, and half-conversion parity with numpy float16
    (ref: bitmap.cpp readOpenEXR/writeOpenEXR — the compressed subset)."""
    import os

    import numpy as np

    from mitsuba_tpu import native
    from mitsuba_tpu.io import image as im

    rng = np.random.default_rng(7)
    img = (rng.standard_normal((37, 53, 3)) * 3).astype(np.float32)
    p = str(tmp_path / "t.exr")

    for comp in ("zip", "zips", "none"):
        im.write_exr(p, img, compression=comp)
        assert np.array_equal(im.read_exr(p), img), comp

    # half is lossy but must match numpy float16 quantization exactly
    im.write_exr(p, img, pixel_type="half")
    back = im.read_exr(p)
    want = img.astype(np.float16).astype(np.float32)
    assert np.array_equal(back, want)

    # annotations survive compression
    im.write_exr(p, img, annotations={"renderTime": 2.5, "spp": 8})
    ann = im.read_exr_annotations(p)
    assert ann["spp"] == 8 and abs(ann["renderTime"] - 2.5) < 1e-6

    # tail chunk shorter than 16 scanlines
    i3 = (rng.standard_normal((33, 20, 3))).astype(np.float32)
    im.write_exr(p, i3)
    assert np.array_equal(im.read_exr(p), i3)

    if native.available():
        # native chunk codec agrees with the numpy fallback bit-for-bit
        raw = rng.integers(0, 256, 10001).astype(np.uint8)
        cz = native.exr_zip_compress(raw)
        assert np.array_equal(native.exr_zip_uncompress(cz, len(raw)),
                              raw)
        h = native.float_to_half(img)
        assert np.array_equal(h, img.astype(np.float16).view(np.uint16))
        f = native.half_to_float(h)
        assert np.array_equal(f, h.view(np.float16).astype(np.float32))

    # smooth gradients compress (the point of ZIP)
    sm = np.tile(np.linspace(0, 1, 256, dtype=np.float32),
                 (64, 1))[:, :, None]
    im.write_exr(p, sm, compression="zip")
    assert os.path.getsize(p) < sm.nbytes // 4
    assert np.array_equal(im.read_exr(p), sm)
