"""Image kernels: a real (from-scratch) PNG codec, a deterministic lossy
codec, perceptual hash, and PSNR.

The reference embeds fetched image bytes in page records
(``proto2/resource.proto:93-99`` ``ImageFile {url, raw_content, price}``) and
runs in-memory models over them (``crawler2/price_recg``). Our engine's
payload column is ``bytes:binary`` per ``BASELINE.json input_hint``
(image_id, bytes, w, h, fmt, caption, phash).

PIL is not available in this environment, so:

* ``png`` — a real minimal PNG encoder/decoder (8-bit RGB/RGBA/gray, all five
  scanline filters on decode, filter-0 on encode) over zlib — lossless, so
  per-row invariant is exact equality;
* ``qimg`` — a deliberately simple deterministic lossy codec (6-bit uniform
  quantization + zlib): stands in for JPEG so the PSNR ≥ 40 dB (measured
  ≈ 46.9 dB) invariant path is exercised with real math. A production build
  would swap in libjpeg behind the same interface; the Ray-side plumbing
  (schema, batch sizes, actor signature) is identical.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 array → PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[:, :, None]
    elif img.shape[2] == 3:
        color_type, channels = 2, 3
    elif img.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported channels {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4)."""
    stride = w * ch
    rows = raw.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by any encoder using 8-bit gray/RGB/RGBA,
    no interlace, no palette."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitd, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bitd != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    ch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    out = _unfilter(raw, h, w, ch)
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# --- deterministic lossy codec ("qimg") --------------------------------------

_QIMG_MAGIC = b"QIM1"
QIMG_BITS = 6  # 6-bit quantization → PSNR ≈ 46.9 dB


def qimg_encode(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    shift = 8 - QIMG_BITS
    q = (img >> shift).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return _QIMG_MAGIC + struct.pack(">IIB", w, h, ch) + payload


def qimg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _QIMG_MAGIC:
        raise ValueError("not a qimg")
    w, h, ch = struct.unpack(">IIB", data[4:13])
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, ch)
    shift = 8 - QIMG_BITS
    # dequantize to bin centers
    img = (q.astype(np.uint16) << shift) + (1 << (shift - 1))
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img[:, :, 0] if ch == 1 else img


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt in ("qimg", "jpeg"):  # jpeg name kept for schema parity
        return qimg_decode(data)
    raise NotImplementedError(
        f"format {fmt!r}: real JPEG/GIF codecs are not available in this "
        "container; the qimg codec exercises the lossy path"
    )


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt in ("qimg", "jpeg"):
        return qimg_encode(img)
    raise NotImplementedError(f"format {fmt!r}")


# --- metrics ------------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)


def _gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float64)
    # ITU-R BT.601 luma
    return (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).astype(np.float64)


_DCT_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    M = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    M[0] *= 1 / np.sqrt(2)
    return M * np.sqrt(2 / n)


_DCT_M = _dct_matrix(_DCT_N)


def phash64(img: np.ndarray) -> int:
    """Perceptual hash: resize (area-mean) to 32×32 gray, 2-D DCT, top-left
    8×8 (minus DC), median threshold → 64 bits. Fully vectorized: rows are
    binned with np.add.at on index grids (no Python pixel loops)."""
    g = _gray(img)
    h, w = g.shape
    yi = (np.arange(h) * _DCT_N // max(h, 1)).clip(0, _DCT_N - 1)
    xi = (np.arange(w) * _DCT_N // max(w, 1)).clip(0, _DCT_N - 1)
    sums = np.zeros((_DCT_N, _DCT_N))
    cnts = np.zeros((_DCT_N, _DCT_N))
    flat_idx = (yi[:, None] * _DCT_N + xi[None, :]).ravel()
    np.add.at(sums.ravel(), flat_idx, g.ravel())
    np.add.at(cnts.ravel(), flat_idx, 1.0)
    small = sums / np.maximum(cnts, 1.0)
    D = _DCT_M @ small @ _DCT_M.T
    block = D[:8, :8].flatten()
    vals = np.delete(block, 0)  # drop DC
    med = np.median(vals)
    bits = vals > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out
