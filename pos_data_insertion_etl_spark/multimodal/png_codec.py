"""Pure-stdlib PNG codec (zlib + struct + numpy).

The container ships no image libraries (PIL/libjpeg), but PNG's format
is fully public (W3C PNG spec / RFC 2083) and its only compression is
zlib -- which IS in the stdlib. This codec makes the multimodal decode
kernels real instead of stubbed:

* `decode_png`: 8-bit greyscale/RGB/RGBA, non-interlaced, all five
  scanline filters (None/Sub/Up/Average/Paeth), chunk CRC validation.
* `encode_png`: filter-0 scanlines (the decoder hot path for engine-
  generated images is therefore fully vectorized).

Scope note: palette images, 16-bit depth, and Adam7 interlace raise
NotImplementedError -- the honest boundary of a dependency-free codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TO_CHANNELS = {0: 1, 2: 3, 6: 4}
_CHANNELS_TO_COLOR = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """HxW (grey) or HxWx{1,3,4} uint8 array -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _CHANNELS_TO_COLOR:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_TO_COLOR[ch], 0, 0, 0)
    # filter byte 0 per scanline, then one zlib stream over all scanlines
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 array (C in {1,3,4})."""
    if bytes(data[:8]) != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = bytes(data[pos + 4 : pos + 8])
        payload = bytes(data[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace not supported")
    ch = _COLOR_TO_CHANNELS.get(color)
    if ch is None:
        raise NotImplementedError(f"color type {color} (palette?) not supported")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((h, w, ch), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up -- vectorized
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            cur = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    pred = _paeth(a, b, c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur.astype(np.uint8).reshape(w, ch)
        prev = cur
    return out
