"""Pure-python image codecs for the ``bytes``/``fmt`` columns.

The container has no image libraries (no PIL/cv2), so the multimodal
plumbing required by BASELINE.json ``input_hint`` is backed by real,
dependency-free codecs:

- ``bmp``  — standard 24-bit uncompressed Windows BMP (BGR, bottom-up,
  4-byte row padding). Lossless; readable by any external viewer.
- ``png``  — standard 8-bit RGB PNG, zlib-compressed, filter type 0.
  Lossless; spec-conformant output (decoder here handles filters 0-4,
  so externally produced PNGs of this shape decode too).
- ``raw``  — trivial header + raw RGB bytes. Lossless.
- ``qnt5`` — deterministic *lossy* codec standing in for JPEG (which
  cannot be encoded without native libs): 5-bit/channel quantization.
  Max per-channel error 4/255 → PSNR ≈ 40.9 dB, exercising the
  "decoded-pixel allclose (PSNR>=40dB for lossy)" gate for real.

All functions are (H, W, 3) uint8 <-> bytes. Stateful decode stages hold
a codec registry per actor (stages/decode.py); nothing here touches Ray.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode", "decode", "psnr", "FORMATS"]


# ------------------------------------------------------------------- BMP

def _encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    padded[:, :row_bytes] = px[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up, BGR
    data = padded.tobytes()
    file_size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def _decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", buf, 10)
    size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", buf, 14)
    if bpp != 24 or size != 40:
        raise ValueError(f"unsupported BMP variant bpp={bpp}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    arr = np.frombuffer(buf, np.uint8, count=stride * abs(h), offset=offset)
    arr = arr.reshape(abs(h), stride)[:, :row_bytes].reshape(abs(h), w, 3)
    if h > 0:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4) for 3-byte RGB pixels."""
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for r in range(h):
        ftype = raw[r, 0]
        line = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ftype == 0:
            res = line
        elif ftype == 2:  # Up
            res = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need a sequential pass
            res = np.zeros(stride, np.int32)
            for i in range(stride):
                a = res[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    res[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    res[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    res[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[r] = res.astype(np.uint8)
    return out.reshape(h, w, 3)


def _decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    return _unfilter(raw, h, w)


# ------------------------------------------------------------------- RAW / QNT5

_RAW_MAGIC = b"GORW"
_QNT_MAGIC = b"GOQ5"


def _encode_raw(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return _RAW_MAGIC + struct.pack("<II", w, h) + px.tobytes()


def _decode_raw(buf: bytes) -> np.ndarray:
    if buf[:4] != _RAW_MAGIC:
        raise ValueError("not a GORW buffer")
    w, h = struct.unpack_from("<II", buf, 4)
    return np.frombuffer(buf, np.uint8, count=h * w * 3, offset=12).reshape(h, w, 3).copy()


def _encode_qnt5(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = (px >> 3).astype(np.uint8)  # 5 bits/channel
    return _QNT_MAGIC + struct.pack("<II", w, h) + zlib.compress(q.tobytes(), 6)


def _decode_qnt5(buf: bytes) -> np.ndarray:
    if buf[:4] != _QNT_MAGIC:
        raise ValueError("not a GOQ5 buffer")
    w, h = struct.unpack_from("<II", buf, 4)
    q = np.frombuffer(zlib.decompress(buf[12:]), np.uint8).reshape(h, w, 3)
    return ((q << 3) | 3).astype(np.uint8)  # mid-bucket reconstruction


FORMATS = {
    "bmp": (_encode_bmp, _decode_bmp, True),
    "png": (_encode_png, _decode_png, True),
    "raw": (_encode_raw, _decode_raw, True),
    "qnt5": (_encode_qnt5, _decode_qnt5, False),  # lossy
}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return FORMATS[fmt][0](np.ascontiguousarray(px, dtype=np.uint8))


def decode(buf: bytes, fmt: str) -> np.ndarray:
    return FORMATS[fmt][1](buf)


def is_lossless(fmt: str) -> bool:
    return FORMATS[fmt][2]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def ahash64(px: np.ndarray, side: int = 8) -> int:
    """Average-hash fingerprint of an (H, W, 3) uint8 image as a signed
    int64 (two's complement).  A shared PRIMITIVE (like the codec
    functions): the per-image float semantics — nearest-neighbor
    subsample, per-cell channel mean, threshold at the global cell mean —
    must be BIT-IDENTICAL between the engine's actor-pool stage and the
    scalar python-oracle, so both call this one definition.  What the
    oracle gate then exercises is everything around it: batching, the
    actor pool, id alignment, and the signature-group exchange."""
    h, w, _ = px.shape
    yi = (np.arange(side) * h // side)
    xi = (np.arange(side) * w // side)
    small = px[yi][:, xi].mean(axis=2)
    bits = (small > small.mean()).ravel()
    acc = np.bitwise_or.reduce(
        np.where(bits, np.uint64(1) << np.arange(side * side, dtype=np.uint64),
                 np.uint64(0)))
    v = int(acc)
    return v - (1 << 64) if v >= (1 << 63) else v


def nn_thumb(px: np.ndarray, side: int) -> np.ndarray:
    """Nearest-neighbor thumbnail of an (H, W, 3) uint8 image as a
    (side, side, 3) uint8 array — the same index rule as ahash64's
    subsample (yi = arange(side) * h // side).  A shared PRIMITIVE:
    engine mosaic stages and the scalar python-oracle both call this
    one definition; what the oracle gate exercises around it is the
    selection, exchange and canvas assembly."""
    h, w, _ = px.shape
    yi = np.arange(side) * h // side
    xi = np.arange(side) * w // side
    return px[yi][:, xi]
