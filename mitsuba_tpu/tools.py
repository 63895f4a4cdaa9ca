"""Utility launcher — the `mtsutil` analog (ref: src/mitsuba/mtsutil.cpp
+ src/utils/{tonemap,addimages}.cpp, cmp.cpp image diff).

    python -m mitsuba_tpu.tools tonemap in.exr out.png [--exposure E]
    python -m mitsuba_tpu.tools addimages a.exr b.exr out.exr [--weights ...]
    python -m mitsuba_tpu.tools cmp a.exr b.exr [--rtol R]
    python -m mitsuba_tpu.tools info img.exr
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


def info(args):
    img = _read(args.input)
    print(f"{args.input}: shape {img.shape} dtype {img.dtype}")
    print(f"  min {img.min():.6g}  max {img.max():.6g}  "
          f"mean {img.mean():.6g}")
    print(f"  NaN {np.isnan(img).sum()}  Inf {np.isinf(img).sum()}")
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

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
