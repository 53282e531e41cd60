"""Pure-stdlib PNG codec — closes the "codec branch never executed
in-sandbox" seam (r8-VERDICT lead #6).

The multimodal operators gate real pixel work behind PIL
(multimodal.py decode/resize closures); this container ships no PIL,
so until r9 the ``batch_decode=True`` branch had never run here.  PNG
is the one raster format decodable with nothing but ``zlib`` +
``struct``, both stdlib — so this module implements enough of the
spec (ISO/IEC 15948) for the executor-side decode path to run REAL
pixels anywhere Python runs:

- decode: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters; no interlace.
  RGB→gray uses PIL's exact fixed-point ITU-R 601-2 luma
  ``(R*19595 + G*38470 + B*7471 + 2^15) >> 16`` so the stdlib and
  PIL branches are bit-identical on the same bytes.
- encode: 8-bit grayscale, filter 0 (so re-decoding our own output
  hits the fully-vectorized unfilter path).
- resize: integer-stride downsample ``a[::s, ::s]`` — the documented
  geometry contract of ``multimodal.resize_images`` (new dim =
  ceil(dim / stride)) as an actual pixel operation.

Filters 0/2 (the encoder's output and the common screenshot case)
unfilter as whole-row numpy ops; 1/3/4 fall back to a per-pixel loop
(left-neighbor dependency is inherently sequential).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIGNATURE


def _chunks(payload: bytes):
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> np.ndarray:
    """Reverse per-scanline filtering → (height, width*ch) uint8."""
    stride = width * ch
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=pos + 1)
        pos += 1 + stride
        up = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 2:
            out[y] = row + up  # uint8 wraps = mod 256, per spec
        elif ftype == 1:
            cur = out[y]
            cur[:ch] = row[:ch]
            for x in range(ch, stride):
                cur[x] = (int(row[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 3:
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(row[x]) + (left + int(up[x])) // 2) & 0xFF
        elif ftype == 4:
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(out[y - 1][x - ch]) if (x >= ch and y) else 0
                cur[x] = (int(row[x])
                          + _paeth(left, int(up[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown scanline filter {ftype}")
    return out


def decode_gray(payload: bytes) -> np.ndarray:
    """Decode PNG bytes to a (height, width) uint8 grayscale array —
    the stdlib twin of ``PIL.Image.open(...).convert('L')`` (same
    fixed-point luma, bit-identical output)."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type, _comp, _filt,
             interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"PNG: unsupported (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); "
            "this decoder handles 8-bit non-interlaced types 0/2/3/4/6")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * ch)
    if len(raw) != expect:
        raise ValueError(
            f"PNG: IDAT size mismatch ({len(raw)} != {expect})")
    px = _unfilter(raw, width, height, ch).reshape(height, width, ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        px = plte[px[:, :, 0]]  # → (h, w, 3) RGB
        ch = 3
    if ch == 1:
        return px[:, :, 0]
    if ch == 2:  # gray + alpha
        return px[:, :, 0]
    rgb = px[:, :, :3].astype(np.uint32)
    luma = (rgb[:, :, 0] * 19595 + rgb[:, :, 1] * 38470
            + rgb[:, :, 2] * 7471 + 0x8000) >> 16
    return luma.astype(np.uint8)


def encode_gray(a: np.ndarray, compresslevel: int = 6) -> bytes:
    """Encode a (height, width) uint8 array as an 8-bit grayscale
    PNG (filter 0 scanlines)."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected 2-D gray array, got shape {a.shape}")
    h, w = a.shape
    raw = (np.hstack([np.zeros((h, 1), dtype=np.uint8), a])
           .tobytes())  # filter byte 0 + row, per scanline

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, compresslevel))
            + chunk(b"IEND", b""))


def resize_gray(a: np.ndarray, stride: int) -> np.ndarray:
    """Integer-stride downsample — the geometry contract of
    ``multimodal.resize_images`` (new dim = ceil(dim / stride)) as a
    real pixel op."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    return a[::stride, ::stride]
