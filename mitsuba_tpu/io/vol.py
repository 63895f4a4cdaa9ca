"""Mitsuba .vol grid volume format: reader + writer.

Format per the reference (ref: src/volume/gridvolume.cpp): ASCII 'VOL',
version byte 3, encoding int32 (1 = float32, 2 = float16, 3 = uint8,
4 = quantized directions), res xyz int32, channels int32, bbox 6×float32,
then x-fastest data.
"""
from __future__ import annotations

import struct

import numpy as np


def load_vol(path: str):
    """Returns (data [Z, Y, X, C] float32, bbox_min [3], bbox_max [3])."""
    with open(path, "rb") as f:
        magic = f.read(3)
        assert magic == b"VOL", "not a .vol file"
        (version,) = struct.unpack("<B", f.read(1))
        assert version == 3, f"unsupported .vol version {version}"
        enc, xr, yr, zr, ch = struct.unpack("<iiiii", f.read(20))
        bbox = struct.unpack("<6f", f.read(24))
        n = xr * yr * zr * ch
        if enc == 1:
            data = np.frombuffer(f.read(4 * n), np.float32, n)
        elif enc == 2:
            data = np.frombuffer(f.read(2 * n), np.float16, n).astype(
                np.float32)
        elif enc == 3:
            data = (np.frombuffer(f.read(n), np.uint8, n)
                    .astype(np.float32) / 255.0)
        else:
            raise ValueError(f"unsupported .vol encoding {enc}")
    data = data.reshape(zr, yr, xr, ch)
    return (data, np.array(bbox[:3], np.float32),
            np.array(bbox[3:], np.float32))


def save_vol(path: str, data: np.ndarray, bbox_min, bbox_max):
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        data = data[..., None]
    zr, yr, xr, ch = data.shape
    with open(path, "wb") as f:
        f.write(b"VOL")
        f.write(struct.pack("<B", 3))
        f.write(struct.pack("<iiiii", 1, xr, yr, zr, ch))
        f.write(struct.pack("<6f", *bbox_min, *bbox_max))
        f.write(data.tobytes())
