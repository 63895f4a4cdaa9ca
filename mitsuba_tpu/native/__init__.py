"""Native runtime bindings (ctypes over mitsuba_native.cpp).

The reference keeps host-side hot paths native (obj.cpp mesh parsing,
bitmap.cpp codecs); this package compiles the C++ equivalents on first
use with the system g++ (cached next to the source, keyed by a source
hash) and exposes them via ctypes. Every entry point has a pure-Python
fallback — `available()` is False and callers fall back silently when no
compiler exists.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mitsuba_native.cpp")
_lib = None
_tried = False


def _build() -> str | None:
    # -ffp-contract=off: no FMA contraction, so e.g. cross(e, e) is
    # exactly 0 as in numpy — the Woop degenerate-triangle test depends
    # on bitwise-IEEE arithmetic parity with the Python fallback.
    flags = ["-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC"]
    libs = ["-lz"]          # must follow the source on the command line
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha256(f.read()
                                 + " ".join(flags + libs).encode()
                                 ).hexdigest()[:16]
    except OSError:
        return None
    so = os.path.join(_DIR, f"_mitsuba_native_{tag}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", *flags, "-o", tmp, _SRC, *libs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)            # atomic vs concurrent builders
        return so
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MITSUBA_TPU_NO_NATIVE"):
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    c_i64 = ctypes.c_int64
    c_i32 = ctypes.c_int32
    p = ctypes.POINTER
    lib.obj_count.argtypes = [ctypes.c_char_p, c_i64, p(c_i64)]
    lib.obj_count.restype = None
    lib.obj_parse.argtypes = [
        ctypes.c_char_p, c_i64,
        p(ctypes.c_double), p(ctypes.c_double), p(ctypes.c_double),
        p(c_i64), p(c_i64), p(c_i64), p(c_i32), p(c_i64), p(c_i64)]
    lib.obj_parse.restype = c_i64
    lib.rgbe_encode.argtypes = [p(ctypes.c_float), c_i64, c_i64,
                                p(ctypes.c_uint8)]
    lib.rgbe_encode.restype = c_i64
    lib.rgbe_decode.argtypes = [p(ctypes.c_uint8), c_i64, c_i64, c_i64,
                                p(ctypes.c_float)]
    lib.rgbe_decode.restype = c_i32
    lib.woop_invert.argtypes = [p(ctypes.c_double), p(ctypes.c_double),
                                p(ctypes.c_double), c_i64,
                                p(ctypes.c_double), p(ctypes.c_double)]
    lib.woop_invert.restype = c_i32
    lib.ply_parse_faces.argtypes = [p(ctypes.c_uint8), c_i64, c_i64,
                                    c_i32, c_i32, c_i32, p(c_i64),
                                    p(c_i64)]
    lib.ply_parse_faces.restype = c_i64
    lib.exr_zip_uncompress.argtypes = [p(ctypes.c_uint8), c_i64,
                                       p(ctypes.c_uint8), c_i64]
    lib.exr_zip_uncompress.restype = c_i32
    lib.exr_zip_compress.argtypes = [p(ctypes.c_uint8), c_i64,
                                     p(ctypes.c_uint8)]
    lib.exr_zip_compress.restype = c_i64
    lib.half_to_float.argtypes = [p(ctypes.c_uint16), c_i64,
                                  p(ctypes.c_float)]
    lib.half_to_float.restype = None
    lib.float_to_half.argtypes = [p(ctypes.c_float), c_i64,
                                  p(ctypes.c_uint16)]
    lib.float_to_half.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


# ---------------------------------------------------------------------------
# OBJ
# ---------------------------------------------------------------------------

def parse_obj(text: bytes):
    """Parse OBJ text → (verts [V,3], norms [N,3], uvs [T,2],
    tri_v/tri_t/tri_n [F,3] int64 (-1 = absent), group_id [F] int32,
    group_names list[str]). None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    counts = np.zeros(5, np.int64)
    n = len(text)
    lib.obj_count(text, n, _ptr(counts, ctypes.c_int64))
    nv, nvn, nvt, ntri, ngroups = (int(x) for x in counts)
    verts = np.zeros((max(nv, 1), 3), np.float64)
    norms = np.zeros((max(nvn, 1), 3), np.float64)
    uvs = np.zeros((max(nvt, 1), 2), np.float64)
    tri_v = np.zeros((max(ntri, 1), 3), np.int64)
    tri_t = np.zeros((max(ntri, 1), 3), np.int64)
    tri_n = np.zeros((max(ntri, 1), 3), np.int64)
    gid = np.zeros(max(ntri, 1), np.int32)
    gb = np.zeros(max(ngroups, 1), np.int64)
    ge = np.zeros(max(ngroups, 1), np.int64)
    used = lib.obj_parse(
        text, n,
        _ptr(verts, ctypes.c_double), _ptr(norms, ctypes.c_double),
        _ptr(uvs, ctypes.c_double),
        _ptr(tri_v, ctypes.c_int64), _ptr(tri_t, ctypes.c_int64),
        _ptr(tri_n, ctypes.c_int64), _ptr(gid, ctypes.c_int32),
        _ptr(gb, ctypes.c_int64), _ptr(ge, ctypes.c_int64))
    names = ["default"] + [
        text[gb[i]:ge[i]].decode("utf-8", "replace")
        for i in range(1, int(used))]
    return (verts[:nv], norms[:nvn], uvs[:nvt], tri_v[:ntri],
            tri_t[:ntri], tri_n[:ntri], gid[:ntri], names)


# ---------------------------------------------------------------------------
# RGBE
# ---------------------------------------------------------------------------

def rgbe_encode(img: np.ndarray) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    out = np.zeros(h * (4 + w * 8), np.uint8)
    n = lib.rgbe_encode(_ptr(img, ctypes.c_float), w, h,
                        _ptr(out, ctypes.c_uint8))
    return out[:n].tobytes()


def rgbe_decode(data: bytes, w: int, h: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    img = np.zeros((h, w, 3), np.float32)
    rc = lib.rgbe_decode(_ptr(buf, ctypes.c_uint8), len(data), w, h,
                         _ptr(img, ctypes.c_float))
    if rc != 0:
        raise ValueError(f"corrupt RGBE data (rc={rc})")
    return img


# ---------------------------------------------------------------------------
# PLY face lists
# ---------------------------------------------------------------------------

def ply_parse_faces(data: bytes, count: int, count_size: int,
                    idx_size: int, big_endian: bool):
    """Triangulated faces [F, 3] int64 + bytes consumed, or None if the
    native lib is unavailable. Raises on corrupt input."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    consumed = np.zeros(1, np.int64)
    n = lib.ply_parse_faces(_ptr(buf, ctypes.c_uint8), len(data), count,
                            count_size, idx_size, int(big_endian), None,
                            _ptr(consumed, ctypes.c_int64))
    if n < 0:
        raise ValueError("corrupt PLY face list")
    out = np.zeros((max(int(n), 1), 3), np.int64)
    lib.ply_parse_faces(_ptr(buf, ctypes.c_uint8), len(data), count,
                        count_size, idx_size, int(big_endian),
                        _ptr(out, ctypes.c_int64),
                        _ptr(consumed, ctypes.c_int64))
    return out[:int(n)], int(consumed[0])


# ---------------------------------------------------------------------------
# OpenEXR ZIP chunks + half conversion
# ---------------------------------------------------------------------------

def exr_zip_uncompress(src: bytes, raw_size: int) -> np.ndarray | None:
    """Decode one EXR ZIP/ZIPS chunk → uint8 array of raw_size bytes.
    None if the native lib is unavailable; raises on corrupt data."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(src, np.uint8)
    out = np.zeros(raw_size, np.uint8)
    rc = lib.exr_zip_uncompress(_ptr(buf, ctypes.c_uint8), len(src),
                                _ptr(out, ctypes.c_uint8), raw_size)
    if rc != 0:
        raise ValueError(f"corrupt EXR ZIP chunk (rc={rc})")
    return out


def exr_zip_compress(raw: np.ndarray) -> bytes | None:
    """Encode one EXR ZIP/ZIPS chunk. Returns the compressed bytes, or
    the raw bytes verbatim when incompressible (per the EXR spec), or
    None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.zeros(len(raw) + 1024, np.uint8)
    n = lib.exr_zip_compress(_ptr(raw, ctypes.c_uint8), len(raw),
                             _ptr(out, ctypes.c_uint8))
    if n < 0:
        raise ValueError("EXR ZIP compression failed")
    if n == len(raw):
        return raw.tobytes()
    return out[:n].tobytes()


def half_to_float(h: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    h = np.ascontiguousarray(h, np.uint16)
    out = np.zeros(h.shape, np.float32)
    lib.half_to_float(_ptr(h, ctypes.c_uint16), h.size,
                      _ptr(out, ctypes.c_float))
    return out


def float_to_half(f: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(f, np.float32)
    out = np.zeros(f.shape, np.uint16)
    lib.float_to_half(_ptr(f, ctypes.c_float), f.size,
                      _ptr(out, ctypes.c_uint16))
    return out


# ---------------------------------------------------------------------------
# Woop precompute
# ---------------------------------------------------------------------------

def woop_invert(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """(minv [T,3,3], trans [T,3]) or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    p0 = np.ascontiguousarray(p0, np.float64)
    e1 = np.ascontiguousarray(e1, np.float64)
    e2 = np.ascontiguousarray(e2, np.float64)
    t = p0.shape[0]
    minv = np.zeros((t, 3, 3), np.float64)
    trans = np.zeros((t, 3), np.float64)
    lib.woop_invert(_ptr(p0, ctypes.c_double), _ptr(e1, ctypes.c_double),
                    _ptr(e2, ctypes.c_double), t,
                    _ptr(minv, ctypes.c_double),
                    _ptr(trans, ctypes.c_double))
    return minv, trans
