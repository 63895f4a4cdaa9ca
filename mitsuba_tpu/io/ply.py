"""PLY mesh loader: ascii + binary little/big-endian (ref: src/shapes/ply).

Supports vertex properties x/y/z, nx/ny/nz, u/v (or s/t), red/green/blue,
and face vertex_indices lists (triangulated by fan).
"""
from __future__ import annotations

import struct

import numpy as np

from ..scene.shapes import Mesh

_TYPES = {
    "char": ("b", 1), "int8": ("b", 1),
    "uchar": ("B", 1), "uint8": ("B", 1),
    "short": ("h", 2), "int16": ("h", 2),
    "ushort": ("H", 2), "uint16": ("H", 2),
    "int": ("i", 4), "int32": ("i", 4),
    "uint": ("I", 4), "uint32": ("I", 4),
    "float": ("f", 4), "float32": ("f", 4),
    "double": ("d", 8), "float64": ("d", 8),
}


def load_ply(path: str) -> Mesh:
    with open(path, "rb") as f:
        magic = f.readline().strip()
        assert magic == b"ply", "not a PLY file"
        fmt = None
        elements = []  # (name, count, [(prop_name, type) or ('list', ct, t, name)])
        while True:
            line = f.readline().decode("ascii", "replace").strip()
            if line.startswith("comment") or line.startswith("obj_info"):
                continue
            parts = line.split()
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3],
                                            parts[4]))
                else:
                    elements[-1][2].append((parts[2], parts[1]))
            elif parts[0] == "end_header":
                break
        data = f.read()

    endian = {"binary_little_endian": "<", "binary_big_endian": ">"}.get(fmt)
    verts = norms = uvs = colors = None
    faces = []
    pos = 0

    for (name, count, props) in elements:
        if fmt == "ascii":
            rows = []
            text = data.decode("ascii", "replace").split("\n")
            for i in range(count):
                rows.append(text[i].split())
            text_rest = "\n".join(text[count:])
            data = text_rest.encode()
            if name == "vertex":
                cols = {p[0]: j for j, p in enumerate(props)}
                arr = np.array([[float(x) for x in r] for r in rows])
                verts, norms, uvs, colors = _extract_vertex(
                    arr, cols, props)
            elif name == "face":
                for r in rows:
                    k = int(r[0])
                    idx = [int(x) for x in r[1:1 + k]]
                    for j in range(1, k - 1):
                        faces.append([idx[0], idx[j], idx[j + 1]])
        else:
            if name == "vertex" and all(p[0] != "list" for p in props):
                fmt_str = endian + "".join(_TYPES[p[1]][0] for p in props)
                size = struct.calcsize(fmt_str)
                arr = np.array([
                    struct.unpack_from(fmt_str, data, pos + i * size)
                    for i in range(count)])
                pos += count * size
                cols = {p[0]: j for j, p in enumerate(props)}
                verts, norms, uvs, colors = _extract_vertex(
                    arr, cols, props)
            elif name == "face":
                for _ in range(count):
                    for p in props:
                        if p[0] == "list":
                            cf, cs = _TYPES[p[1]]
                            vf, vs = _TYPES[p[2]]
                            (k,) = struct.unpack_from(endian + cf, data, pos)
                            pos += cs
                            idx = struct.unpack_from(endian + vf * k, data,
                                                     pos)
                            pos += vs * k
                            for j in range(1, k - 1):
                                faces.append([idx[0], idx[j], idx[j + 1]])
                        else:
                            pos += _TYPES[p[1]][1]
            else:
                # skip unknown fixed-size element
                row = sum(_TYPES[p[1]][1] for p in props if p[0] != "list")
                pos += count * row

    return Mesh(vertices=np.asarray(verts),
                faces=np.asarray(faces, np.int64),
                normals=norms, uvs=uvs, colors=colors)


def _extract_vertex(arr, cols, props):
    verts = arr[:, [cols["x"], cols["y"], cols["z"]]]
    norms = None
    uvs = None
    colors = None
    if all(k in cols for k in ("nx", "ny", "nz")):
        norms = arr[:, [cols["nx"], cols["ny"], cols["nz"]]]
    for (a, b) in (("u", "v"), ("s", "t")):
        if a in cols and b in cols:
            uvs = arr[:, [cols[a], cols[b]]]
            break
    if all(k in cols for k in ("red", "green", "blue")):
        colors = arr[:, [cols["red"], cols["green"], cols["blue"]]]
        # integer color channels are 0..255 (ply.cpp normalizes uchar)
        ptypes = {p[0]: p[1] for p in props if p[0] != "list"}
        if ptypes.get("red", "float") not in ("float", "float32",
                                              "double", "float64"):
            colors = colors / 255.0
    return verts, norms, uvs, colors
