"""Pure-stdlib PNG codec (operators/png_codec.py, r9) — the branch
that makes the multimodal decode seam REAL in this PIL-less sandbox.
Covers: gray round-trip, all five scanline filters on a hand-built
RGB image, PIL-formula luma, palette images, unsupported-shape
errors, resize geometry, and the full Spark path (planted PNGs
through extract_features / resize_images / decode_image with
batch_decode=True — previously PIL-gated and never executed here)."""

from __future__ import annotations

import math
import struct
import zlib

import numpy as np
import pytest

from nosql_join_stream_spark.operators import multimodal, png_codec


def test_gray_roundtrip_exact():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(23, 39), dtype=np.uint8)
    png = png_codec.encode_gray(a)
    assert png_codec.is_png(png)
    assert (png_codec.decode_gray(png) == a).all()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _build_png(ihdr_fields, raw, extra=b""):
    return (b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
            + extra
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def _filter_rows(px: np.ndarray, ch: int, ftypes) -> bytes:
    """Forward-filter scanlines (the encoder side of filters 1-4,
    implemented independently here so the test is not the code)."""
    h, stride = px.shape[0], px.shape[1]
    rows, prev = [], np.zeros(stride, dtype=int)
    for y in range(h):
        cur = px[y].astype(int)
        f = ftypes[y % len(ftypes)]
        filt = np.empty(stride, dtype=int)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (left if pa <= pb and pa <= pc
                        else (up if pb <= pc else ul))
            filt[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    return b"".join(rows)


def test_rgb_all_filters_and_pil_luma():
    rng = np.random.default_rng(11)
    w, h = 7, 10
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raw = _filter_rows(rgb.reshape(h, w * 3), 3, [0, 1, 2, 3, 4])
    png = _build_png((w, h, 8, 2, 0, 0, 0), raw)
    got = png_codec.decode_gray(png)
    r = rgb.astype(np.uint32)
    exp = ((r[:, :, 0] * 19595 + r[:, :, 1] * 38470
            + r[:, :, 2] * 7471 + 0x8000) >> 16).astype(np.uint8)
    assert (got == exp).all()


def test_palette_and_gray_alpha():
    # palette: 4 colors, 3x2 image
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                     [128, 128, 128]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + bytes(row) for row in idx)
    png = _build_png((3, 2, 8, 3, 0, 0, 0), raw,
                     extra=_chunk(b"PLTE", plte.tobytes()))
    got = png_codec.decode_gray(png)
    r = plte[idx].astype(np.uint32)
    exp = ((r[:, :, 0] * 19595 + r[:, :, 1] * 38470
            + r[:, :, 2] * 7471 + 0x8000) >> 16).astype(np.uint8)
    assert (got == exp).all()
    # gray+alpha: luma channel passes through, alpha ignored
    ga = np.array([[10, 255, 20, 128], [30, 0, 40, 64]], dtype=np.uint8)
    raw = b"".join(b"\x00" + bytes(row) for row in ga)
    png = _build_png((2, 2, 8, 4, 0, 0, 0), raw)
    assert (png_codec.decode_gray(png)
            == np.array([[10, 20], [30, 40]])).all()


def test_unsupported_shapes_fail_loudly():
    with pytest.raises(ValueError, match="signature"):
        png_codec.decode_gray(b"not a png at all")
    a = np.zeros((2, 2), dtype=np.uint8)
    png16 = _build_png((2, 2, 16, 0, 0, 0, 0),
                       b"\x00" * (2 * (1 + 4)))
    with pytest.raises(NotImplementedError, match="bit_depth=16"):
        png_codec.decode_gray(png16)
    with pytest.raises(ValueError, match="2-D gray"):
        png_codec.encode_gray(np.zeros((2, 2, 3), dtype=np.uint8))


def _interlace_raw(px: np.ndarray, ch: int, ftypes) -> bytes:
    """Forward Adam7: extract each pass's sub-image and filter its
    scanlines independently (an independent encoder, so the test is
    not the code)."""
    grid = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
            (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
    h, w = px.shape[0], px.shape[1] // ch
    out = b""
    for x0, xs, y0, ys in grid:
        sub = px.reshape(h, w, ch)[y0::ys, x0::xs, :]
        hp, wp = sub.shape[0], sub.shape[1]
        if hp == 0 or wp == 0:
            continue
        out += _filter_rows(sub.reshape(hp, wp * ch), ch, ftypes)
    return out


def test_adam7_interlaced_decode():
    """Progressive PNGs (the codec's last r9 stub): every color type
    x all five filters, odd dimensions (partial passes), tiny images
    where some passes are EMPTY."""
    rng = np.random.default_rng(23)
    for w, h in ((13, 9), (8, 8), (3, 2), (1, 1), (2, 5)):
        # grayscale
        g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        raw = _interlace_raw(g.reshape(h, w), 1, [0, 1, 2, 3, 4])
        png = _build_png((w, h, 8, 0, 0, 0, 1), raw)
        assert (png_codec.decode_gray(png) == g).all(), (w, h, "gray")
        # RGB through the shared luma
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        raw = _interlace_raw(rgb.reshape(h, w * 3), 3, [4, 3, 2, 1, 0])
        png = _build_png((w, h, 8, 2, 0, 0, 1), raw)
        r = rgb.astype(np.uint32)
        exp = ((r[:, :, 0] * 19595 + r[:, :, 1] * 38470
                + r[:, :, 2] * 7471 + 0x8000) >> 16).astype(np.uint8)
        assert (png_codec.decode_gray(png) == exp).all(), (w, h, "rgb")
    # truncated interlaced stream fails loudly
    g = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    raw = _interlace_raw(g, 1, [0])
    png = _build_png((13, 9, 8, 0, 0, 0, 1), raw[:-4])
    with pytest.raises(Exception):
        png_codec.decode_gray(png)


def test_resize_stride_geometry():
    a = np.arange(23 * 39, dtype=np.uint64).reshape(23, 39) % 256
    a = a.astype(np.uint8)
    for s in (1, 2, 3, 7):
        out = png_codec.resize_gray(a, s)
        assert out.shape == (math.ceil(23 / s), math.ceil(39 / s))
        assert (out == a[::s, ::s]).all()


def test_spark_batch_decode_executes_stdlib_codec(spark):
    """The previously PIL-gated codec branch now runs for REAL in
    this sandbox: planted stdlib PNGs flow through the same
    mapInPandas stages with batch_decode=True and come back with true
    pixel statistics and true resized pixels."""
    flat = np.full((6, 8), 128, dtype=np.uint8)
    grad = (np.arange(6 * 8, dtype=np.uint64).reshape(6, 8)
            % 256).astype(np.uint8)
    rows = [(1, bytearray(png_codec.encode_gray(flat)),
             "image/png", 8, 6, 1),
            (2, bytearray(png_codec.encode_gray(grad)),
             "image/png", 8, 6, 1)]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string, "
              "width int, height int, n_frames int")
    feats = {r.doc_id: r.mean_luma
             for r in multimodal.extract_features(
                 media, batch_decode=True).collect()}
    assert feats[1] == 128.0
    assert feats[2] == pytest.approx(float(grad.mean()), abs=1e-6)
    out = {r.doc_id: r for r in multimodal.resize_images(
        media, target_w=4, batch_decode=True).collect()}
    # stride 2: ceil(8/2) x ceil(6/2); payload is a real re-encoded PNG
    assert (out[2].width, out[2].height) == (4, 3)
    back = png_codec.decode_gray(bytes(out[2].payload))
    assert (back == grad[::2, ::2]).all()
    # module-level decode contract, no PIL anywhere
    arr = multimodal.decode_image(bytes(rows[1][1]))
    assert arr.shape == (6, 8) and (arr == grad).all()
