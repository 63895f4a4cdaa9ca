"""Mesh loader tests: OBJ, PLY (ascii+binary), .serialized roundtrip."""
import numpy as np

from mitsuba_tpu.io.obj import load_obj
from mitsuba_tpu.io.ply import load_ply
from mitsuba_tpu.io.serialized import load_serialized, save_serialized
from mitsuba_tpu.scene.shapes import sphere

OBJ = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
"""

MTL = """
newmtl red
Kd 0.8 0.1 0.1
Ks 0.2 0.2 0.2
Ns 40
"""

PLY_ASCII = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
property float nx
property float ny
property float nz
element face 2
property list uchar int vertex_indices
end_header
0 0 0 0 0 1
1 0 0 0 0 1
1 1 0 0 0 1
0 1 0 0 0 1
3 0 1 2
3 2 3 0
"""


def test_obj(tmp_path):
    (tmp_path / "q.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    groups, mats = load_obj(str(tmp_path / "q.obj"))
    assert len(groups) == 1
    m = groups[0].mesh
    assert len(m.vertices) == 4
    assert len(m.faces) == 2          # quad fan-triangulated
    assert m.normals is not None and np.allclose(m.normals[0], [0, 0, 1])
    assert m.uvs is not None
    assert groups[0].material_name == "red"
    assert mats["red"]["kd"] == (0.8, 0.1, 0.1)
    assert mats["red"]["ns"] == 40


def test_obj_negative_indices(tmp_path):
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    (tmp_path / "n.obj").write_text(obj)
    groups, _ = load_obj(str(tmp_path / "n.obj"))
    assert len(groups[0].mesh.faces) == 1
    assert np.allclose(groups[0].mesh.vertices[groups[0].mesh.faces[0]],
                       [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_ply_ascii(tmp_path):
    (tmp_path / "q.ply").write_text(PLY_ASCII)
    m = load_ply(str(tmp_path / "q.ply"))
    assert len(m.vertices) == 4 and len(m.faces) == 2
    assert np.allclose(m.normals, [[0, 0, 1]] * 4)


def test_ply_binary(tmp_path):
    import struct
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 3\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 1\n"
              b"property list uchar int vertex_indices\n"
              b"end_header\n")
    body = b""
    for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
        body += struct.pack("<fff", *v)
    body += struct.pack("<Biii", 3, 0, 1, 2)
    (tmp_path / "b.ply").write_bytes(header + body)
    m = load_ply(str(tmp_path / "b.ply"))
    assert len(m.vertices) == 3 and len(m.faces) == 1
    assert np.allclose(m.vertices[1], [1, 0, 0])


def test_serialized_roundtrip(tmp_path):
    mesh = sphere(8, 16)
    p = str(tmp_path / "m.serialized")
    save_serialized(p, mesh)
    back = load_serialized(p)
    assert np.allclose(back.vertices, mesh.vertices, atol=1e-6)
    assert (back.faces == mesh.faces).all()
    assert np.allclose(back.normals, mesh.normals, atol=1e-6)
    assert np.allclose(back.uvs, mesh.uvs, atol=1e-6)
