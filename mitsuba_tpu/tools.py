"""Utility launcher — the `mtsutil` analog (ref: src/mitsuba/mtsutil.cpp
+ src/utils/{tonemap,addimages}.cpp, cmp.cpp image diff) plus the
`mtsimport` scene converter (ref: src/converter/collada.cpp, obj →
scene XML + .serialized geometry).

    python -m mitsuba_tpu.tools tonemap in.exr out.png [--exposure E]
    python -m mitsuba_tpu.tools addimages a.exr b.exr out.exr [--weights ...]
    python -m mitsuba_tpu.tools cmp a.exr b.exr [--rtol R]
    python -m mitsuba_tpu.tools info img.exr
    python -m mitsuba_tpu.tools import scene.dae out.xml [--res WxH]
    python -m mitsuba_tpu.tools import mesh.obj out.xml
    python -m mitsuba_tpu.tools joinrgb r.exr g.exr b.exr out.exr
    python -m mitsuba_tpu.tools tracebench scene.xml [--rays N]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _read(path):
    from .io.image import read_exr, read_pfm
    low = path.lower()
    if low.endswith(".exr"):
        return read_exr(path)
    if low.endswith(".pfm"):
        return read_pfm(path)
    if low.endswith(".npy"):
        return np.load(path)
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return np.where(img <= 0.04045, img / 12.92,
                    np.power((img + 0.055) / 1.055, 2.4))


def tonemap(args):
    from .io.image import write_image
    img = _read(args.input) * (2.0 ** args.exposure)
    if args.reinhard:
        # Reinhard global operator (ref: ldrfilm.cpp / tonemap.cpp)
        img = img / (1.0 + img)
    write_image(args.output, np.clip(img, 0.0, 1.0))
    print(f"wrote {args.output}")
    return 0


def addimages(args):
    from .io.image import write_image
    imgs = [_read(p) for p in args.inputs]
    ws = args.weights or [1.0] * len(imgs)
    out = sum(w * i for w, i in zip(ws, imgs))
    write_image(args.output, out)
    print(f"wrote {args.output}")
    return 0


def cmp(args):
    a, b = _read(args.a), _read(args.b)
    if a.shape != b.shape:
        print(f"DIFFER: shapes {a.shape} vs {b.shape}")
        return 1
    diff = np.abs(a - b)
    rel = diff / np.maximum(np.abs(a), 1e-3)
    print(f"max abs diff: {diff.max():.6g}   mean: {diff.mean():.6g}")
    print(f"max rel diff: {rel.max():.6g}   "
          f"pixels >{args.rtol:g} rel: {(rel > args.rtol).mean():.4%}")
    ok = rel.max() <= args.rtol
    print("MATCH" if ok else "DIFFER")
    return 0 if ok else 1


def joinrgb(args):
    """Merge channel 0 of three images into one RGB image
    (ref: src/utils/joinrgb.cpp — R/G/B EXRs → RGB EXR)."""
    from .io.image import write_image
    chans = []
    for p in (args.r, args.g, args.b):
        img = _read(p)
        chans.append(img[..., 0] if img.ndim == 3 else img)
    if not (chans[0].shape == chans[1].shape == chans[2].shape):
        print(f"DIFFER: shapes {[c.shape for c in chans]}")
        return 1
    write_image(args.output, np.stack(chans, axis=-1))
    print(f"wrote {args.output}")
    return 0


def tracebench(args):
    """Accel build + trace throughput on a scene — the `mtsutil kdbench`
    analog (ref: src/utils/kdbench.cpp:60: builds the kd-tree, then
    reports rays/s for coherent + incoherent ray batches). Here: scene
    compile (Woop cluster packing) time, then rays/s for camera-coherent
    and randomly-shuffled ray batches through accel/dense.ray_intersect."""
    import time

    import jax
    import jax.numpy as jnp

    from .accel.dense import ray_intersect
    from .scene.xml import load_xml

    loaded = load_xml(args.scene)
    t0 = time.perf_counter()
    scene = loaded.compile()
    build_s = time.perf_counter() - t0
    print(f"scene compile (accel build): {build_s * 1e3:.1f} ms, "
          f"{scene.n_tris} triangles")

    n = args.rays
    cam = loaded.camera
    px = np.random.default_rng(0).uniform(
        0, [cam.width, cam.height], (n, 2)).astype(np.float32)
    o, d = cam.sample_ray(jnp.asarray(px))
    perm = np.random.default_rng(1).permutation(n)

    @jax.jit
    def trace(o, d):
        its = ray_intersect(scene, o, d)
        return its.valid.sum()

    for label, oo, dd in (("coherent", o, d),
                          ("incoherent", o[perm], d[perm])):
        trace(oo, dd).block_until_ready()           # compile
        t0 = time.perf_counter()
        reps = 5
        outs = [trace(oo, dd) for _ in range(reps)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"{label}: {n * reps / dt / 1e6:.1f} M rays/s "
              f"({int(outs[0])}/{n} hit)")
    return 0


def vol(args):
    """Volume-grid processing (ref: src/utils/{clampVolume,
    fillEmptyVoxels,downSampleAlbedo,splitGridVolume,upSampleVolume,
    downSampleVolume}.cpp) on .vol files."""
    import os

    from .io.vol import load_vol, save_vol
    from .media import voltools

    grid, bmin, bmax = load_vol(args.input)
    act = args.action
    if act == "clamp":
        out = voltools.clamp_volume(grid, args.threshold)
    elif act == "fill":
        out = voltools.fill_empty_voxels(grid)
    elif act == "downalbedo":
        dgrid, _, _ = load_vol(args.density)
        out = voltools.downsample_albedo(grid, dgrid, args.factor)
    elif act == "down":
        from .util.appearance import volume_downsample
        out = volume_downsample(grid, args.factor)
    elif act == "up":
        from .util.appearance import volume_upsample
        out = volume_upsample(grid, args.factor)
    elif act == "split":
        stem, ext = os.path.splitext(args.output)
        for (i, j), sub, smin, smax in voltools.split_grid_volume(
                grid, bmin, bmax):
            p = f"{stem}_{i:03d}_{j:03d}{ext}"
            save_vol(p, sub, smin, smax)
            print(f"wrote {p} {sub.shape}")
        return 0
    else:
        print(f"unknown action {act}")
        return 1
    save_vol(args.output, out, bmin, bmax)
    print(f"wrote {args.output} {np.asarray(out).shape}")
    return 0


def info(args):
    img = _read(args.input)
    print(f"{args.input}: shape {img.shape} dtype {img.dtype}")
    print(f"  min {img.min():.6g}  max {img.max():.6g}  "
          f"mean {img.mean():.6g}")
    print(f"  NaN {np.isnan(img).sum()}  Inf {np.isinf(img).sum()}")
    return 0


def _xml_esc(s):
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace('"', "&quot;"))


def _mat_xml(mid, mat):
    """MTL/COLLADA material dict -> scene-XML bsdf block (the same
    Kd/Ks/Ns mapping the OBJ loader applies, ref: obj.cpp addMaterial)."""
    kd = mat.get("kd", (0.5, 0.5, 0.5))
    ks = mat.get("ks", (0.0, 0.0, 0.0))
    ns = float(mat.get("ns", 0.0))
    kd_s = f"{kd[0]:g} {kd[1]:g} {kd[2]:g}"
    lines = [f'    <bsdf type="{"phong" if max(ks) > 0 and ns > 1 else "diffuse"}" id="{_xml_esc(mid)}">']
    if mat.get("map_kd"):
        lines.append('        <texture type="bitmap" name="reflectance">')
        lines.append(f'            <string name="filename" '
                     f'value="{_xml_esc(mat["map_kd"])}"/>')
        lines.append("        </texture>")
    else:
        lines.append(f'        <rgb name="reflectance" value="{kd_s}"/>')
    if max(ks) > 0 and ns > 1:
        ks_s = f"{ks[0]:g} {ks[1]:g} {ks[2]:g}"
        lines.append(f'        <rgb name="specularReflectance" '
                     f'value="{ks_s}"/>')
        lines.append(f'        <float name="exponent" value="{ns:g}"/>')
    lines.append("    </bsdf>")
    return "\n".join(lines)


def import_scene(args):
    """COLLADA/OBJ → scene XML + .serialized geometry (mtsimport)."""
    import os

    from .io.serialized import save_serialized

    src = args.input
    out_xml = args.output
    out_dir = os.path.dirname(os.path.abspath(out_xml))
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(out_xml))[0]
    width, height = (int(x) for x in args.res.lower().split("x"))

    mats: dict = {}
    shapes = []          # (serialized_rel, to_world 4x4 or None, mat_id)
    cam_xml = None

    low = src.lower()
    if low.endswith(".dae"):
        from .io.collada import load_collada
        dae = load_collada(src)
        mats = dict(dae.materials)
        # bake the up-axis change into a root fix-up (converter.cpp
        # handles Z_UP scenes the same way)
        if dae.up_axis == "Z_UP":
            fix = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                            [0, -1, 0, 0], [0, 0, 0, 1]], np.float64)
        elif dae.up_axis == "X_UP":
            # +90 deg about Z maps the old up axis (1,0,0) -> (0,1,0)
            # (converter.cpp's X_UP fix-up; the transpose would flip
            # the scene upside down).
            fix = np.array([[0, -1, 0, 0], [1, 0, 0, 0],
                            [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
        else:
            fix = np.eye(4)
        for k, inst in enumerate(dae.instances):
            rel = f"{stem}_{k:03d}.serialized"
            save_serialized(os.path.join(out_dir, rel), inst.mesh)
            shapes.append((rel, fix @ inst.to_world, inst.material))
        if dae.camera is not None:
            c = dae.camera
            # COLLADA cameras look down local -Z; our perspective sensor
            # looks down local +Z (transform.py look_at).  The reference
            # converter bakes the handedness flip into the node transform
            # (collada.cpp loadCamera: transform * scale(1,1,-1)); do the
            # same so the exported sensor faces the right way and is not
            # left/right mirrored.
            m = fix @ c.to_world @ np.diag([1.0, 1.0, -1.0, 1.0])
            rows = " ".join(f"{v:.9g}" for v in m.reshape(-1))
            cam_xml = (
                f'    <sensor type="perspective">\n'
                f'        <float name="fov" value="{c.xfov:g}"/>\n'
                f'        <transform name="toWorld">\n'
                f'            <matrix value="{rows}"/>\n'
                f'        </transform>\n')
    elif low.endswith(".obj"):
        from .io.obj import load_obj
        groups, mtls = load_obj(src)
        mats = dict(mtls)
        for k, g in enumerate(groups):
            rel = f"{stem}_{k:03d}.serialized"
            save_serialized(os.path.join(out_dir, rel), g.mesh)
            shapes.append((rel, None, g.material_name))
    else:
        print(f"unsupported input {src} (need .dae or .obj)")
        return 1

    lines = ['<?xml version="1.0" encoding="utf-8"?>',
             '<scene version="0.5.0">',
             '    <integrator type="path"/>']
    if cam_xml is None:
        cam_xml = ('    <sensor type="perspective">\n'
                   '        <float name="fov" value="45"/>\n')
    lines.append(
        cam_xml
        + '        <film type="hdrfilm">\n'
        + f'            <integer name="width" value="{width}"/>\n'
        + f'            <integer name="height" value="{height}"/>\n'
        + '        </film>\n'
        + '        <sampler type="independent">\n'
        + f'            <integer name="sampleCount" value='
          f'"{args.spp}"/>\n'
        + '        </sampler>\n    </sensor>')

    used = {m for _, _, m in shapes if m}
    for mid in sorted(used):
        lines.append(_mat_xml(
            mid, mats.get(mid, {"kd": (0.5, 0.5, 0.5)})))
    for rel, to_world, mid in shapes:
        lines.append('    <shape type="serialized">')
        lines.append(f'        <string name="filename" '
                     f'value="{_xml_esc(rel)}"/>')
        if to_world is not None and not np.allclose(to_world, np.eye(4)):
            rows = " ".join(f"{v:.9g}" for v in to_world.reshape(-1))
            lines.append('        <transform name="toWorld">')
            lines.append(f'            <matrix value="{rows}"/>')
            lines.append("        </transform>")
        if mid and mid in used:
            lines.append(f'        <ref id="{_xml_esc(mid)}"/>')
        lines.append("    </shape>")
    lines.append("</scene>")
    with open(out_xml, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_xml} + {len(shapes)} .serialized meshes")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="mitsuba_tpu.tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tonemap", help="HDR → LDR")
    t.add_argument("input")
    t.add_argument("output")
    t.add_argument("--exposure", type=float, default=0.0)
    t.add_argument("--reinhard", action="store_true")
    t.set_defaults(fn=tonemap)

    a = sub.add_parser("addimages", help="weighted image sum")
    a.add_argument("inputs", nargs="+")
    a.add_argument("output")
    a.add_argument("--weights", nargs="*", type=float)
    a.set_defaults(fn=addimages)

    c = sub.add_parser("cmp", help="image diff")
    c.add_argument("a")
    c.add_argument("b")
    c.add_argument("--rtol", type=float, default=1e-3)
    c.set_defaults(fn=cmp)

    i = sub.add_parser("info", help="image statistics")
    i.add_argument("input")
    i.set_defaults(fn=info)

    j = sub.add_parser("joinrgb", help="merge R/G/B images into RGB")
    j.add_argument("r")
    j.add_argument("g")
    j.add_argument("b")
    j.add_argument("output")
    j.set_defaults(fn=joinrgb)

    tb = sub.add_parser("tracebench",
                        help="accel build + trace rays/s (kdbench)")
    tb.add_argument("scene")
    tb.add_argument("--rays", type=int, default=1 << 20)
    tb.set_defaults(fn=tracebench)

    v = sub.add_parser("vol", help=".vol grid processing")
    v.add_argument("action",
                   choices=("clamp", "fill", "downalbedo", "down", "up",
                            "split"))
    v.add_argument("input")
    v.add_argument("output")
    v.add_argument("--threshold", type=float, default=0.01)
    v.add_argument("--factor", type=int, default=2)
    v.add_argument("--density", help="density .vol for downalbedo")
    v.set_defaults(fn=vol)

    imp = sub.add_parser(
        "import", help="COLLADA/OBJ → scene XML (+.serialized)")
    imp.add_argument("input")
    imp.add_argument("output")
    imp.add_argument("--res", default="512x512")
    imp.add_argument("--spp", type=int, default=64)
    imp.set_defaults(fn=import_scene)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
