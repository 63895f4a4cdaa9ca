"""Minimal COLLADA (.dae) scene importer.

Counterpart of the reference's `mtsimport` COLLADA converter
(ref: src/converter/collada.cpp, src/converter/converter.cpp) — reads the
subset that matters for render scenes and hands the caller plain numpy
meshes plus material/camera descriptions:

  * library_geometries: <mesh> with <triangles>/<polylist> primitives
    (POSITION/NORMAL/TEXCOORD inputs, polygon fan triangulation);
  * library_visual_scenes: node hierarchies with matrix/translate/
    rotate/scale stacks, <instance_geometry> material bindings and
    <instance_camera>;
  * library_effects/materials: lambert/phong/blinn diffuse + specular
    colors (textures resolved through library_images);
  * library_cameras: perspective xfov/yfov + aspect.

COLLADA is Y-up or Z-up per <up_axis>; everything is returned in the
file's native axis convention along with the up-axis tag so the caller
(tools.py `import` command) can bake the fix-up transform.

Implemented from the COLLADA 1.4 spec; no reference code is used.
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

from ..scene.shapes import Mesh

__all__ = ["load_collada", "ColladaScene", "ColladaInstance",
           "ColladaCamera"]


def _tag(el) -> str:
    """Local tag name without the namespace URI."""
    t = el.tag
    return t.split("}", 1)[1] if "}" in t else t


def _children(el, name):
    return [c for c in el if _tag(c) == name]


def _find(el, name):
    for c in el:
        if _tag(c) == name:
            return c
    return None


def _find_deep(el, *names):
    cur = el
    for n in names:
        if cur is None:
            return None
        cur = _find(cur, n)
    return cur


def _floats(text) -> np.ndarray:
    return np.array([float(x) for x in (text or "").split()], np.float64)


def _ints(text) -> np.ndarray:
    return np.array([int(x) for x in (text or "").split()], np.int64)


@dataclass
class ColladaCamera:
    xfov: float = 45.0            # degrees
    aspect: float | None = None
    znear: float = 0.01
    zfar: float = 1e4
    to_world: np.ndarray = field(
        default_factory=lambda: np.eye(4))


@dataclass
class ColladaInstance:
    mesh: Mesh
    to_world: np.ndarray          # [4, 4]
    material: str | None          # material symbol bound at instancing
    name: str = ""


@dataclass
class ColladaScene:
    instances: list               # [ColladaInstance]
    materials: dict               # name -> {kd, ks, ns, map_kd}
    camera: ColladaCamera | None
    up_axis: str                  # "Y_UP" (default) or "Z_UP"/"X_UP"


def _parse_sources(mesh_el):
    """id -> [N, stride] float arrays for every <source> in a mesh."""
    sources = {}
    for src in _children(mesh_el, "source"):
        arr_el = _find(src, "float_array")
        if arr_el is None:
            continue
        data = _floats(arr_el.text)
        acc = _find_deep(src, "technique_common", "accessor")
        stride = int(acc.get("stride", "1")) if acc is not None else 1
        n = len(data) // stride
        sources["#" + src.get("id", "")] = data[:n * stride] \
            .reshape(n, stride)
    # <vertices> indirection: its POSITION input aliases a source
    verts = _find(mesh_el, "vertices")
    if verts is not None:
        for inp in _children(verts, "input"):
            if inp.get("semantic") == "POSITION":
                sources["#" + verts.get("id", "")] = \
                    sources.get(inp.get("source"), None)
    return sources


def _prim_inputs(prim):
    """[(semantic, offset, source_url)] sorted by offset; max offset."""
    inputs = []
    max_off = 0
    for inp in _children(prim, "input"):
        off = int(inp.get("offset", "0"))
        inputs.append((inp.get("semantic"), off, inp.get("source")))
        max_off = max(max_off, off)
    return inputs, max_off + 1


def _build_mesh(pos, nrm, uv, idx_p, idx_n, idx_t):
    """De-index into a flat vertex list (one vertex per corner ref)."""
    v = pos[idx_p, :3]
    n = nrm[idx_n, :3] if nrm is not None else None
    t = uv[idx_t, :2] if uv is not None else None
    faces = np.arange(len(v), dtype=np.int64).reshape(-1, 3)
    return Mesh(v, faces, n, t)


def _parse_geometry(geo_el):
    """geometry element -> [(material_symbol, Mesh)]."""
    mesh_el = _find(geo_el, "mesh")
    if mesh_el is None:
        return []
    sources = _parse_sources(mesh_el)
    out = []
    for prim in mesh_el:
        kind = _tag(prim)
        if kind not in ("triangles", "polylist", "polygons"):
            continue
        inputs, stride = _prim_inputs(prim)
        sem = {}
        for semantic, off, url in inputs:
            if semantic in ("VERTEX", "POSITION"):
                sem["P"] = (off, url)
            elif semantic == "NORMAL" and "N" not in sem:
                sem["N"] = (off, url)
            elif semantic == "TEXCOORD" and "T" not in sem:
                sem["T"] = (off, url)
        if "P" not in sem:
            continue
        p_el = _children(prim, "p")
        if not p_el:
            continue
        idx = np.concatenate([_ints(p.text) for p in p_el])
        idx = idx.reshape(-1, stride)

        if kind == "polylist":
            vcount = _ints(_find(prim, "vcount").text)
        elif kind == "triangles":
            vcount = np.full(len(idx) // 3, 3, np.int64)
        else:  # polygons: one <p> per polygon
            vcount = np.array([len(_ints(p.text)) // stride
                               for p in p_el], np.int64)
        # fan-triangulate corner index rows
        tri_rows = []
        base = 0
        for vc in vcount:
            for k in range(1, vc - 1):
                tri_rows += [base, base + k, base + k + 1]
            base += vc
        rows = idx[np.array(tri_rows, np.int64)]

        pos = sources.get(sem["P"][1])
        nrm = sources.get(sem["N"][1]) if "N" in sem else None
        uv = sources.get(sem["T"][1]) if "T" in sem else None
        if pos is None:
            continue
        mesh = _build_mesh(
            pos, nrm, uv,
            rows[:, sem["P"][0]],
            rows[:, sem["N"][0]] if "N" in sem else rows[:, 0],
            rows[:, sem["T"][0]] if "T" in sem else rows[:, 0])
        out.append((prim.get("material"), mesh))
    return out


def _node_transform(node):
    """Compose matrix/translate/rotate/scale children in document order
    (COLLADA: apply top to bottom, i.e. left-multiply each in turn)."""
    m = np.eye(4)
    for c in node:
        t = _tag(c)
        if t == "matrix":
            m = m @ _floats(c.text).reshape(4, 4)
        elif t == "translate":
            x = _floats(c.text)
            tm = np.eye(4)
            tm[:3, 3] = x[:3]
            m = m @ tm
        elif t == "rotate":
            x = _floats(c.text)
            axis = x[:3]
            norm = np.linalg.norm(axis)
            if norm < 1e-12:
                continue
            axis = axis / norm
            a = np.radians(x[3])
            c_, s_ = np.cos(a), np.sin(a)
            ux, uy, uz = axis
            r = np.array([
                [c_ + ux * ux * (1 - c_), ux * uy * (1 - c_) - uz * s_,
                 ux * uz * (1 - c_) + uy * s_],
                [uy * ux * (1 - c_) + uz * s_, c_ + uy * uy * (1 - c_),
                 uy * uz * (1 - c_) - ux * s_],
                [uz * ux * (1 - c_) - uy * s_,
                 uz * uy * (1 - c_) + ux * s_, c_ + uz * uz * (1 - c_)]])
            rm = np.eye(4)
            rm[:3, :3] = r
            m = m @ rm
        elif t == "scale":
            x = _floats(c.text)
            sm = np.diag([x[0], x[1], x[2], 1.0])
            m = m @ sm
    return m


def _parse_effects(root):
    """effect id -> {kd, ks, ns, map_kd(sampler->image path)}."""
    images = {}
    lib_img = _find(root, "library_images")
    if lib_img is not None:
        for img in _children(lib_img, "image"):
            init = _find(img, "init_from")
            if init is not None and init.text:
                images[img.get("id")] = init.text.strip()

    effects = {}
    lib_fx = _find(root, "library_effects")
    if lib_fx is not None:
        for fx in _children(lib_fx, "effect"):
            profile = _find(fx, "profile_COMMON")
            if profile is None:
                continue
            # sampler param -> image id chains
            surf_img, samplers = {}, {}
            for par in _children(profile, "newparam"):
                sid = par.get("sid")
                surf = _find(par, "surface")
                samp = _find(par, "sampler2D")
                if surf is not None:
                    init = _find(surf, "init_from")
                    if init is not None and init.text:
                        surf_img[sid] = init.text.strip()
                elif samp is not None:
                    src = _find(samp, "source")
                    if src is not None and src.text:
                        samplers[sid] = src.text.strip()
            tech = _find(profile, "technique")
            shader = None
            for name in ("lambert", "phong", "blinn", "constant"):
                shader = _find(tech, name) if tech is not None else None
                if shader is not None:
                    break
            mat = {"kd": (0.5, 0.5, 0.5), "ks": (0.0, 0.0, 0.0),
                   "ns": 0.0, "map_kd": None}
            if shader is not None:
                diff = _find(shader, "diffuse")
                if diff is not None:
                    col = _find(diff, "color")
                    tex = _find(diff, "texture")
                    if col is not None:
                        mat["kd"] = tuple(_floats(col.text)[:3])
                    if tex is not None:
                        sid = tex.get("texture")
                        img_id = samplers.get(sid, sid)
                        img_id = surf_img.get(img_id, img_id)
                        mat["map_kd"] = images.get(img_id, img_id)
                spec = _find(shader, "specular")
                if spec is not None:
                    col = _find(spec, "color")
                    if col is not None:
                        mat["ks"] = tuple(_floats(col.text)[:3])
                shin = _find(shader, "shininess")
                if shin is not None:
                    fl = _find(shin, "float")
                    if fl is not None:
                        mat["ns"] = float(fl.text)
            effects[fx.get("id")] = mat
    return effects


def _parse_materials(root, effects):
    mats = {}
    lib = _find(root, "library_materials")
    if lib is not None:
        for m in _children(lib, "material"):
            inst = _find(m, "instance_effect")
            url = inst.get("url", "").lstrip("#") if inst is not None \
                else ""
            mats[m.get("id")] = effects.get(
                url, {"kd": (0.5, 0.5, 0.5), "ks": (0, 0, 0),
                      "ns": 0.0, "map_kd": None})
    return mats


def _parse_cameras(root):
    cams = {}
    lib = _find(root, "library_cameras")
    if lib is not None:
        for cam in _children(lib, "camera"):
            persp = _find_deep(cam, "optics", "technique_common",
                               "perspective")
            if persp is None:
                continue
            c = ColladaCamera()
            xf = _find(persp, "xfov")
            yf = _find(persp, "yfov")
            ar = _find(persp, "aspect_ratio")
            if ar is not None and ar.text:
                c.aspect = float(ar.text)
            if xf is not None and xf.text:
                c.xfov = float(xf.text)
            elif yf is not None and yf.text:
                yfov = float(yf.text)
                aspect = c.aspect or (4.0 / 3.0)
                c.xfov = float(np.degrees(2 * np.arctan(
                    np.tan(np.radians(yfov) / 2) * aspect)))
            zn = _find(persp, "znear")
            zf = _find(persp, "zfar")
            if zn is not None and zn.text:
                c.znear = float(zn.text)
            if zf is not None and zf.text:
                c.zfar = float(zf.text)
            cams[cam.get("id")] = c
    return cams


def load_collada(path: str) -> ColladaScene:
    """Parse a .dae file into meshes + materials + camera."""
    root = ET.parse(path).getroot()
    asset = _find(root, "asset")
    up = "Y_UP"
    if asset is not None:
        up_el = _find(asset, "up_axis")
        if up_el is not None and up_el.text:
            up = up_el.text.strip()

    geoms = {}
    lib_geo = _find(root, "library_geometries")
    if lib_geo is not None:
        for geo in _children(lib_geo, "geometry"):
            geoms[geo.get("id")] = _parse_geometry(geo)

    effects = _parse_effects(root)
    materials = _parse_materials(root, effects)
    cameras = _parse_cameras(root)

    # node library for <instance_node>
    node_lib = {}
    lib_nodes = _find(root, "library_nodes")
    if lib_nodes is not None:
        for nd in _children(lib_nodes, "node"):
            node_lib[nd.get("id")] = nd

    instances: list[ColladaInstance] = []
    camera_out: ColladaCamera | None = None

    def walk(node, parent_m):
        nonlocal camera_out
        m = parent_m @ _node_transform(node)
        for c in node:
            t = _tag(c)
            if t == "instance_geometry":
                gid = c.get("url", "").lstrip("#")
                # material binding: symbol -> material id
                binds = {}
                bm = _find_deep(c, "bind_material", "technique_common")
                if bm is not None:
                    for im in _children(bm, "instance_material"):
                        binds[im.get("symbol")] = \
                            im.get("target", "").lstrip("#")
                for symbol, mesh in geoms.get(gid, []):
                    instances.append(ColladaInstance(
                        mesh=mesh, to_world=m.copy(),
                        material=binds.get(symbol, symbol),
                        name=node.get("name", gid)))
            elif t == "instance_camera":
                cid = c.get("url", "").lstrip("#")
                if cid in cameras and camera_out is None:
                    camera_out = cameras[cid]
                    camera_out.to_world = m.copy()
            elif t == "instance_node":
                ref = node_lib.get(c.get("url", "").lstrip("#"))
                if ref is not None:
                    walk(ref, m)
            elif t == "node":
                walk(c, m)

    scene_el = _find_deep(root, "scene", "instance_visual_scene")
    lib_vs = _find(root, "library_visual_scenes")
    vs = None
    if lib_vs is not None:
        want = scene_el.get("url", "").lstrip("#") if scene_el is not None \
            else None
        for v in _children(lib_vs, "visual_scene"):
            if want is None or v.get("id") == want:
                vs = v
                break
    if vs is not None:
        for node in _children(vs, "node"):
            walk(node, np.eye(4))
    else:
        # no visual scene: instance every geometry at identity
        for gid, pairs in geoms.items():
            for symbol, mesh in pairs:
                instances.append(ColladaInstance(
                    mesh=mesh, to_world=np.eye(4), material=symbol,
                    name=gid))

    return ColladaScene(instances=instances, materials=materials,
                        camera=camera_out, up_axis=up)
