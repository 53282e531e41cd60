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
  4 (gray+alpha), 6 (RGBA); all five scanline filters; progressive
  (Adam7-interlaced) images reassemble pass-by-pass (r10).
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

r10 widens the real-pixel family to the OTHER struct-only raster
formats: BMP (uncompressed 8/24/32-bit, bottom-up/top-down, palette)
and binary Netpbm PGM/PPM; r11 adds GIF (87a/89a, global/local color
tables, interlace, the ~80-line public-spec LZW) — ``decode_gray_auto``
dispatches on magic bytes, every format shares the same fixed-point
luma, and only genuinely-impossible-in-stdlib formats (JPEG) remain
behind the PIL stub.
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


# Adam7 pass grid: (x_start, x_step, y_start, y_step) per pass
_ADAM7 = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
          (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))


def _deinterlace(raw: bytes, width: int, height: int,
                 ch: int) -> np.ndarray:
    """Reassemble an Adam7-interlaced image (r10 — the codec's last
    documented stub): each of the 7 passes is an independently
    filtered sub-image; unfilter it with the shared scanline code and
    scatter it onto its strided grid positions."""
    out = np.empty((height, width, ch), dtype=np.uint8)
    pos = 0
    for x0, xs, y0, ys in _ADAM7:
        wp = (width - x0 + xs - 1) // xs
        hp = (height - y0 + ys - 1) // ys
        if wp <= 0 or hp <= 0:
            continue
        need = hp * (1 + wp * ch)
        sub = _unfilter(raw[pos:pos + need], wp, hp, ch)
        pos += need
        out[y0::ys, x0::xs, :] = sub.reshape(hp, wp, ch)
    if pos != len(raw):
        raise ValueError(
            f"PNG: interlaced IDAT size mismatch ({len(raw)} != {pos})")
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
    if bit_depth != 8 or interlace not in (0, 1) \
            or color_type not in _CHANNELS:
        raise NotImplementedError(
            f"PNG: unsupported (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); "
            "this decoder handles 8-bit types 0/2/3/4/6, "
            "non-interlaced or Adam7")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    if interlace == 1:
        px = _deinterlace(raw, width, height, ch)
    else:
        expect = height * (1 + width * ch)
        if len(raw) != expect:
            raise ValueError(
                f"PNG: IDAT size mismatch ({len(raw)} != {expect})")
        px = _unfilter(raw, width, height, ch).reshape(
            height, width, ch)
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


# --- BMP (r10): the other struct-only raster format -------------------

def is_bmp(payload: bytes) -> bool:
    return payload[:2] == b"BM"


def _luma_rgb(rgb: np.ndarray) -> np.ndarray:
    """(…, 3) uint8 RGB → uint8 luma, PIL's exact fixed-point ITU-R
    601-2 rounding (shared by every decoder here so all formats are
    bit-identical to ``convert('L')`` on the same pixels)."""
    r = rgb.astype(np.uint32)
    return ((r[..., 0] * 19595 + r[..., 1] * 38470 + r[..., 2] * 7471
             + 0x8000) >> 16).astype(np.uint8)


def decode_bmp_gray(payload: bytes) -> np.ndarray:
    """Decode BMP bytes to (height, width) uint8 grayscale — stdlib
    ``struct`` only.  Supports the overwhelmingly common on-disk
    shapes: BITMAPINFOHEADER-or-later DIB, uncompressed (BI_RGB),
    8-bit paletted / 24-bit BGR / 32-bit BGRX, bottom-up or top-down
    rows, 4-byte row padding.  RLE/1/4/16-bit raise the documented
    NotImplementedError (rare as pipeline payloads; PIL handles them
    where installed)."""
    if not is_bmp(payload):
        raise ValueError("not a BMP (bad signature)")
    if len(payload) < 54:
        raise ValueError("BMP: truncated header")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size < 40:
        raise NotImplementedError(
            f"BMP: pre-BITMAPINFOHEADER DIB (size {dib_size}) unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError(f"BMP: bad dimensions {width}x{height}")
    if compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP: unsupported (bpp={bpp}, compression={compression}); "
            "this decoder handles uncompressed 8/24/32-bit")
    row_stride = ((bpp * width + 31) // 32) * 4
    need = data_off + row_stride * height
    if len(payload) < need:
        raise ValueError(f"BMP: pixel data truncated "
                         f"({len(payload)} < {need})")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height,
                         offset=data_off).reshape(height, row_stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(-1, 4)
        rgb = pal[rows[:, :width]][:, :, [2, 1, 0]]  # BGRA → RGB
        return _luma_rgb(rgb)
    ch = bpp // 8
    px = rows[:, :width * ch].reshape(height, width, ch)
    rgb = px[:, :, [2, 1, 0]]  # BGR(X) → RGB
    return _luma_rgb(rgb)


def encode_gray_bmp(a: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 array as an 8-bit paletted BMP
    with the identity gray palette (entry i = (i,i,i), whose
    fixed-point luma is exactly i — 19595+38470+7471 = 2^16), so
    encode → decode is the identity, like ``encode_gray``."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected 2-D gray array, got shape {a.shape}")
    h, w = a.shape
    row_stride = ((w + 3) // 4) * 4
    padded = np.zeros((h, row_stride), dtype=np.uint8)
    padded[:, :w] = a
    body = padded[::-1].tobytes()          # bottom-up rows
    pal = bytes(v for i in range(256) for v in (i, i, i, 0))
    data_off = 14 + 40 + len(pal)
    return (b"BM"
            + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                          2835, 2835, 256, 0)
            + pal + body)


def encode_gray_pgm(a: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 array as binary PGM (P5)."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected 2-D gray array, got shape {a.shape}")
    h, w = a.shape
    return f"P5\n{w} {h}\n255\n".encode() + a.tobytes()


# --- PNM / Netpbm (r10): header-plus-raster, trivially stdlib ----------

def is_pnm(payload: bytes) -> bool:
    return payload[:2] in (b"P5", b"P6")


def decode_pnm_gray(payload: bytes) -> np.ndarray:
    """Decode binary PGM (P5) / PPM (P6) to (height, width) uint8
    grayscale.  maxval must be 255 (the universal 8-bit case; 16-bit
    Netpbm raises the documented NotImplementedError).  Header
    whitespace/comments per the Netpbm spec."""
    if not is_pnm(payload):
        raise ValueError("not a binary PGM/PPM (P5/P6)")
    magic = payload[:2]
    pos = 2
    vals = []
    while len(vals) < 3:
        # skip whitespace and '#' comments, then read one ASCII int
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("PNM: unterminated comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("PNM: malformed header")
        vals.append(int(payload[start:pos]))
    width, height, maxval = vals
    if maxval != 255:
        raise NotImplementedError(
            f"PNM: maxval {maxval} unsupported (8-bit only)")
    # exactly one whitespace byte before the raster, per spec — but
    # VALIDATE it (a non-whitespace byte here means a malformed
    # header, not raster data), and tolerate the common CRLF writer:
    # after skipping a '\r', consume the paired '\n' only when the
    # remaining length proves it is separator, not the first pixel
    # (r10 review catch: blind pos += 1 shifted every pixel by one)
    sep = payload[pos:pos + 1]
    if not sep.isspace():
        raise ValueError("PNM: expected whitespace after maxval, got "
                         f"{sep!r}")
    pos += 1
    ch = 1 if magic == b"P5" else 3
    need = width * height * ch
    if sep == b"\r" and payload[pos:pos + 1] == b"\n":
        # '\r' then '\n': either a CRLF separator (common Windows
        # writers) or a lone-'\r' separator (old-Mac, essentially
        # extinct) whose first PIXEL is 0x0A.  The raster length
        # picks the reading: exact-fit-without-skip wins (provably
        # lone '\r'), else exact-fit-with-skip (CRLF), else REFUSE —
        # with extra trailing bytes both readings fit and guessing
        # silently shifts every pixel (r10 review catch).  The one
        # undecidable corner (lone '\r' + 0x0A first pixel + exactly
        # one trailing byte) resolves to CRLF by this order, the
        # overwhelmingly more common writer.
        rest = len(payload) - pos
        if rest == need:
            pass                      # the \n is the first pixel
        elif rest - 1 == need:
            pos += 1                  # CRLF separator
        else:
            raise ValueError(
                "PNM: ambiguous \\r\\n after maxval with trailing "
                "bytes — cannot locate the raster start")
    if len(payload) - pos < need:
        raise ValueError(f"PNM: raster truncated "
                         f"({len(payload) - pos} < {need})")
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    if ch == 1:
        return px.reshape(height, width)
    return _luma_rgb(px.reshape(height, width, 3))


# --- GIF (r11): LZW is ~80 lines of public spec (GIF89a, CompuServe
# 1990) — the last stdlib-feasible raster format, shrinking the PIL
# stub surface to JPEG only -------------------------------------------

def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, limit: int) -> bytes:
    """GIF-variant LZW: variable-width codes read LSB-first, CLEAR
    resets the dictionary, codes cap at 12 bits.  Decodes at most
    ``limit`` index bytes (a frame is width*height — data past that is
    padding some encoders emit).  Pure stdlib, O(output)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = bits = pos = 0
    while len(out) < limit:
        while bits < code_size:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: LZW code {code} before any "
                                 "output")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):        # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range "
                             f"(table size {len(table)})")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:limit])


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace row order


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-LZW encoder, the exact inverse pairing of
    :func:`_lzw_decode` (width bump after registering code
    2^width — the giflib convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wb] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:                           # table full: reset (rare)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gray_gif(a: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 array as a GIF89a with the
    identity gray global color table (entry i = (i,i,i), luma exactly
    i — like ``encode_gray_bmp``), so encode → decode is the
    identity."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"expected 2-D gray array, got shape {a.shape}")
    h, w = a.shape
    data = _lzw_encode(a.tobytes(), 8)
    blocks = b"".join(bytes([len(data[i:i + 255])]) + data[i:i + 255]
                      for i in range(0, len(data), 255)) + b"\x00"
    pal = bytes(v for i in range(256) for v in (i, i, i))
    return (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | 7, 0, 0]) + pal
            + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + b"\x08" + blocks + b"\x3b")


def decode_gif_gray(payload: bytes) -> np.ndarray:
    """Decode GIF bytes to (height, width) uint8 grayscale — stdlib
    only.  Supports global/local color tables, interlaced row order,
    87a and 89a (extensions skipped); decodes the FIRST frame of an
    animation.  Fails loudly on a first frame that doesn't cover the
    logical screen (compositing partial frames is animation
    territory, PIL's job where installed).  Transparency is ignored —
    the transparent index decodes to its palette color, matching
    PIL's ``convert('L')`` on a fresh frame."""
    if not is_gif(payload):
        raise ValueError("not a GIF (bad signature)")
    if len(payload) < 14:
        raise ValueError("GIF: truncated header")
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:               # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:             # image descriptor
            if pos + 11 > len(payload):
                raise ValueError("GIF: truncated image descriptor")
            left, top, fw, fh = struct.unpack_from("<HHHH", payload,
                                                   pos + 1)
            ipacked = payload[pos + 9]
            pos += 10
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                if pos + 3 * n + 1 > len(payload):
                    raise ValueError("GIF: truncated local color table")
                lct = np.frombuffer(payload, dtype=np.uint8, count=3 * n,
                                    offset=pos).reshape(n, 3)
                pos += 3 * n
            if (left, top, fw, fh) != (0, 0, width, height):
                raise NotImplementedError(
                    f"GIF: first frame {fw}x{fh}@({left},{top}) does "
                    f"not cover the {width}x{height} screen — partial-"
                    "frame compositing unsupported without PIL")
            table = lct if lct is not None else gct
            if table is None:
                raise ValueError("GIF: frame has no color table")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code_size, fw * fh),
                dtype=np.uint8)
            if idx.size < fw * fh:
                raise ValueError(f"GIF: frame data truncated "
                                 f"({idx.size} < {fw * fh} pixels)")
            if idx.max(initial=0) >= len(table):
                raise ValueError("GIF: pixel index outside color table")
            a = idx.reshape(fh, fw)
            if ipacked & 0x40:          # interlaced: reorder rows
                d = np.empty_like(a)
                src = 0
                for start, step in _GIF_PASSES:
                    rows = range(start, fh, step)
                    d[list(rows)] = a[src:src + len(rows)]
                    src += len(rows)
                a = d
            return _luma_rgb(table[a])
        elif block == 0x3B:             # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image data")


def decode_gray_auto(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes across every raster format this repo
    decodes without PIL (PNG via zlib+struct, GIF via its ~80-line
    public-spec LZW, BMP and PGM/PPM via struct alone, baseline JPEG
    via jpeg_codec's Huffman + fixed-point islow IDCT) — the one entry
    point the multimodal decode/resize closures call.  r12 closes the
    codec family: only genuinely exotic streams (progressive JPEG,
    JPEG 2000, WebP/AVIF...) remain behind the documented
    NotImplementedError the PIL branch absorbs where PIL exists."""
    if is_png(payload):
        return decode_gray(payload)
    if is_gif(payload):
        return decode_gif_gray(payload)
    if is_bmp(payload):
        return decode_bmp_gray(payload)
    if is_pnm(payload):
        return decode_pnm_gray(payload)
    from nosql_join_stream_spark.operators import jpeg_codec
    if jpeg_codec.is_jpeg(payload):
        return jpeg_codec.decode_jpeg_gray(payload)
    raise NotImplementedError(
        "image decode without PIL supports PNG/GIF/BMP/PGM/PPM and "
        "baseline JPEG (progressive JPEG / JPEG 2000 / WebP require "
        "PIL or libvips, not in this environment)")
