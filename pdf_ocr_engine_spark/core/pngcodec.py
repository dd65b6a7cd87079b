"""Pure-stdlib PNG codec — real pixel decode with no external library.

The reference pipeline leans on ``sharp`` for all raster work
(``/root/reference/src/lib/ocr/ocr.ts:67-71``); this sandbox ships no
image library at all, so the multimodal tier used to stop at header
probing and raise ``NotImplementedError`` for real-format pixels.  PNG,
however, is fully decodable with ``zlib`` + the public W3C PNG spec
(inflate, five scanline filters, bit unpacking) — so the most common
lossless web format gets a *real* decoder here, and only JPEG/GIF pixel
decode remains behind the optional-PIL plug point.

Decoder coverage (PNG spec, third edition):

* bit depths 1 / 2 / 4 / 8 / 16 (16-bit reduced to its high byte, the
  spec's own sample-depth-scaling approximation)
* color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
* scanline filters 0-4 (None / Sub / Up / Average / Paeth); Sub is
  vectorized as a per-byte-class cumulative sum, Up as one vector add
* Adam7 interlace: each of the seven passes is an independently
  filtered sub-image (PNG spec §8.2), unfiltered with the same kernel
  and scattered into the full grid by strided assignment

The encoder is deliberately minimal (8-bit gray / RGB / RGBA, selectable
filter) — enough to author test fixtures and to re-emit rasters, with
CRCs so external tools accept the output.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: {1, 2, 4, 8, 16},
    2: {8, 16},
    3: {1, 2, 4, 8},
    4: {8, 16},
    6: {8, 16},
}


class PngError(ValueError):
    """Malformed or unsupported PNG — a data problem, never a task crash."""


def _iter_chunks(data: bytes):
    if data[:8] != PNG_MAGIC:
        raise PngError("not a PNG (bad signature)")
    pos, n = 8, len(data)
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise PngError(f"truncated {ctype!r} chunk")
        yield ctype, body
        pos += 12 + clen  # 4 len + 4 type + data + 4 crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(raw: bytes, h: int, stride: int, fu: int) -> np.ndarray:
    """Invert the five PNG scanline filters → (h, stride) uint8.

    ``fu`` is the filter unit (bytes per complete pixel, min 1).  Filter 1
    (Sub) is a cumulative sum within each byte class mod ``fu`` — addition
    mod 256 distributes, so ``cumsum() & 255`` vectorizes it exactly;
    filter 2 (Up) is one vector add.  Average/Paeth carry a true sequential
    dependency and run as per-byte loops (they are rare in encoder output
    and bounded by the row width).
    """
    need = (stride + 1) * h
    if len(raw) < need:
        raise PngError(f"IDAT too short: {len(raw)} < {need}")
    rows = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    if filters.max(initial=0) > 4:
        raise PngError(f"bad filter byte {int(filters.max())}")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pad = (-stride) % fu
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:]
        if f == 0:
            rec = cur.copy()
        elif f == 2:  # Up
            rec = cur + prev  # uint8 wraps == mod 256
        elif f == 1:  # Sub: cumsum within each byte class mod fu
            padded = np.concatenate(
                [cur, np.zeros(pad, dtype=np.uint8)]) if pad else cur
            csum = padded.reshape(-1, fu).astype(np.int64).cumsum(axis=0)
            rec = (csum & 255).astype(np.uint8).reshape(-1)[:stride]
        else:  # Average / Paeth: sequential
            rec = np.zeros(stride, dtype=np.uint8)
            c_i = cur.astype(np.int64)
            p_i = prev.astype(np.int64)
            for i in range(stride):
                a = int(rec[i - fu]) if i >= fu else 0
                b = int(p_i[i])
                if f == 3:  # Average
                    rec[i] = (c_i[i] + ((a + b) >> 1)) & 255
                else:  # Paeth
                    c = int(p_i[i - fu]) if i >= fu else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    rec[i] = (c_i[i] + pred) & 255
        out[y] = rec
        prev = rec
    return out


def _unpack_samples(row_bytes: np.ndarray, w: int, depth: int,
                    channels: int) -> np.ndarray:
    """(h, stride) filtered-out bytes → (h, w*channels) uint8 samples
    scaled to 8-bit."""
    h = row_bytes.shape[0]
    n_samp = w * channels
    if depth == 8:
        return row_bytes[:, :n_samp]
    if depth == 16:
        return row_bytes[:, :2 * n_samp:2]  # high byte (spec's scale approx)
    # 1/2/4-bit: unpack bits per row, group into depth-wide samples
    bits = np.unpackbits(row_bytes, axis=1)
    groups = bits[:, :n_samp * depth].reshape(h, n_samp, depth)
    weights = (1 << np.arange(depth - 1, -1, -1, dtype=np.uint8))
    return (groups * weights).sum(axis=2).astype(np.uint8)


#: Adam7 pass origins and strides: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_samples(raw: bytes, w: int, h: int, depth: int,
                    channels: int, interlace: int) -> np.ndarray:
    """Inflated IDAT → (h, w*channels) uint8 samples, both interlace
    methods.  Adam7 passes are consumed in spec order, each with its own
    scanline filtering, and scattered by strided assignment."""
    bpp_bits = depth * channels
    fu = max(1, bpp_bits // 8)
    if interlace == 0:
        stride = (w * bpp_bits + 7) // 8
        recon = _unfilter(raw, h, stride, fu)
        return _unpack_samples(recon, w, depth, channels)
    out = np.zeros((h, w, channels), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue  # empty pass contributes zero bytes (spec §8.2)
        stride_p = (wp * bpp_bits + 7) // 8
        need = (stride_p + 1) * hp
        recon = _unfilter(raw[pos:pos + need], hp, stride_p, fu)
        pos += need
        sp = _unpack_samples(recon, wp, depth, channels) \
            .reshape(hp, wp, channels)
        out[y0::dy, x0::dx] = sp
    return out.reshape(h, w * channels)


def decode_png(data: bytes) -> tuple[np.ndarray, int]:
    """PNG bytes → ``(pixels, color_type)``.

    ``pixels`` is uint8 with shape ``(h, w, channels)``; palette images are
    expanded to RGB (channels=3); sub-8-bit gray is scaled to full 8-bit
    range; both interlace methods (none / Adam7) decode.  Raises
    :class:`PngError` on malformed input.
    """
    ihdr = plte = None
    idat: list[bytes] = []
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing/short IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise PngError(f"unknown compression/filter method {comp}/{filt}")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if color not in _CHANNELS or depth not in _VALID_DEPTHS[color]:
        raise PngError(f"bad color/depth {color}/{depth}")
    if not idat:
        raise PngError("no IDAT")
    if w == 0 or h == 0 or w > 1 << 24 or h > 1 << 24:
        raise PngError(f"bad dimensions {w}x{h}")
    channels = _CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    samples = _decode_samples(raw, w, h, depth, channels, interlace)
    if color == 3:  # palette → RGB
        if plte is None or len(plte) % 3:
            raise PngError("palette image without valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise PngError("palette index out of range")
        return pal[idx], color
    px = samples.reshape(h, w, channels)
    if depth < 8:  # scale 1/2/4-bit gray to the full 8-bit range
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))) \
            .astype(np.uint8)
    return px, color


def to_gray(px: np.ndarray, color: int) -> np.ndarray:
    """(h, w, c) → (h, w) uint8 luma.  Integer BT.601 weights
    (``(r*299 + g*587 + b*114 + 500) // 1000``) keep the result
    deterministic across platforms; alpha is ignored (decode is about
    content, not compositing)."""
    if px.shape[2] in (1, 2):  # gray / gray+alpha
        return px[:, :, 0]
    r = px[:, :, 0].astype(np.uint32)
    g = px[:, :, 1].astype(np.uint32)
    b = px[:, :, 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114 + 500) // 1000).astype(np.uint8)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + \
        struct.pack(">I", crc32(ctype + body) & 0xFFFFFFFF)


def _filter_row(cur: np.ndarray, prev: np.ndarray, fu: int,
                f: int) -> np.ndarray:
    """Apply filter ``f`` forward (encoder side)."""
    c = cur.astype(np.int64)
    a = np.zeros_like(c)
    a[fu:] = c[:-fu]
    b = prev.astype(np.int64)
    cc = np.zeros_like(b)
    cc[fu:] = b[:-fu]
    if f == 0:
        out = c
    elif f == 1:
        out = c - a
    elif f == 2:
        out = c - b
    elif f == 3:
        out = c - ((a + b) >> 1)
    else:  # Paeth
        p = a + b - cc
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
        out = c - pred
    return (out & 255).astype(np.uint8)


def encode_png(px: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """uint8 array (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA → PNG bytes
    (8-bit, one IDAT).  ``filter_type`` selects the same scanline filter
    for every row — 0 for plain fixtures, 1-4 to exercise the decoder's
    unfilter paths; ``interlace`` emits Adam7 (each pass filtered
    independently, per spec)."""
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad filter_type {filter_type}")
    arr = np.ascontiguousarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    fu = channels
    body = bytearray()

    def filter_rows(sub: np.ndarray) -> None:
        hp, wp = sub.shape[:2]
        flat = np.ascontiguousarray(sub).reshape(hp, wp * channels)
        prev = np.zeros(wp * channels, dtype=np.uint8)
        for y in range(hp):
            body.append(filter_type)
            body.extend(_filter_row(flat[y], prev, fu,
                                    filter_type).tobytes())
            prev = flat[y]

    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                filter_rows(sub)
    else:
        filter_rows(arr)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0,
                       1 if interlace else 0)
    return PNG_MAGIC + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(bytes(body), 6)) + _chunk(b"IEND", b"")
