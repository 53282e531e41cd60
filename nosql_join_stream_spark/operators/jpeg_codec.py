"""Baseline JFIF (JPEG) codec — stdlib + numpy, no PIL/libjpeg.

Closes the LAST raster-codec stub (r11 VERDICT lead #6): after PNG
(zlib+struct), BMP/PGM/PPM (struct), and GIF (public-spec LZW), JPEG
was the one format ``multimodal``'s decode path still gated behind a
PIL branch this container can't execute.  This module implements
enough of ITU-T T.81 for the decode path to run REAL pixels anywhere
Python+numpy runs:

- **decode** (:func:`decode_jpeg_gray`): baseline sequential DCT
  (SOF0), 8-bit precision, 1 or 3 components, any chroma subsampling,
  restart markers (DRI/RSTn), multiple DQT/DHT segments, 16-bit quant
  tables.  Returns the LUMA plane: for grayscale JPEGs that is the
  image; for YCbCr it is the Y component — the spec's own BT.601 luma
  signal — so no chroma upsampling enters the luma path at all (chroma
  blocks are still entropy-decoded to advance the bitstream, their
  IDCT is skipped).  r13: PROGRESSIVE (SOF2) streams decode too —
  spectral selection, successive approximation, EOB-run coding,
  interleaved DC / non-interleaved AC scans, restarts (T.81 Annex G;
  control flow per the public stb_image/libjpeg-jdphuff algorithm) —
  only arithmetic coding and 12-bit precision still raise
  ``NotImplementedError``.
- **full-color decode** (:func:`decode_jpeg_rgb`, r13): every
  component IDCTs, chroma upsamples with libjpeg's FANCY triangular
  filters (``h2v1``/``h2v2_fancy_upsample``, the do_fancy_upsampling
  default PIL runs; replication for exotic factors, libjpeg's own
  dispatch), then the fixed-point BT.601 inverse (``ycc_rgb_convert``)
  — bit-comparable to ``PIL.Image.open(...)`` RGB output on the same
  bytes (asserted when PIL is importable).  Grayscale streams
  replicate luma ×3 (``convert("RGB")`` semantics).
- **IDCT**: a vectorized numpy port of libjpeg's ``jidct_islow``
  (Loeffler-Ligtenberg-Moshovitz fixed-point, CONST_BITS=13/
  PASS1_BITS=2, constants derived with the same FIX() rounding) — the
  algorithm libjpeg/PIL use by default, so grayscale decode is
  bit-comparable to ``PIL.Image.convert("L")`` on the same bytes
  (asserted when PIL is importable; libjpeg's wrap-around range-limit
  table is replaced by a clamp, which agrees on any non-garbage
  stream).  Cross-checked in-sandbox against the exact float IDCT
  (|Δ| ≤ 1 on random blocks, pytest).
- **encode** (:func:`encode_gray_jpeg`): baseline grayscale, float
  fDCT, single-length canonical Huffman tables built per image (valid
  per the spec — the all-ones code stays unassigned; compression is
  not the point, a decodable self-test stream is), optional restart
  intervals, optional planted 4:2:0 three-component wrapping with
  zeroed chroma (:func:`encode_gray_jpeg_as_ycbcr420`) so the
  interleaved-MCU + chroma-skip decode path executes in-sandbox.
- **color encode** (:func:`encode_rgb_jpeg`, r13): RGB → fixed-point
  BT.601 YCbCr, 4:4:4 or box-downsampled 4:2:0 — real (non-zero)
  chroma content so the full-color decode path has an in-sandbox
  source.

Entropy decoding is a pure-Python bit reader — fine for the
mapInPandas batch sizes this feeds (a few KB per payload); the IDCT,
the only O(pixels) arithmetic, is whole-array numpy.

Reference seam: the reference engine has no media surface at all
(SURVEY.md §2.8) — this belongs to the beyond-reference multimodal
family (multimodal.py), which treats payloads as opaque binary plus
typed metadata.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables ---------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# ITU-T T.81 Annex K.1 luminance quantization table (row-major)
STD_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


# --- fixed-point IDCT (jidct_islow port) -----------------------------------

_CONST_BITS = 13
_PASS1_BITS = 2


def _fix(x: float) -> int:
    return int(round(x * (1 << _CONST_BITS)))


_F0_298631336 = _fix(0.298631336)
_F0_390180644 = _fix(0.390180644)
_F0_541196100 = _fix(0.541196100)
_F0_765366865 = _fix(0.765366865)
_F0_899976223 = _fix(0.899976223)
_F1_175875602 = _fix(1.175875602)
_F1_501321110 = _fix(1.501321110)
_F1_847759065 = _fix(1.847759065)
_F1_961570560 = _fix(1.961570560)
_F2_053119869 = _fix(2.053119869)
_F2_562915447 = _fix(2.562915447)
_F3_072711026 = _fix(3.072711026)


def _descale(x: np.ndarray, n: int) -> np.ndarray:
    return (x + (1 << (n - 1))) >> n


def _idct_pass(cols: list[np.ndarray], shift: int) -> list[np.ndarray]:
    """One 8-point Loeffler pass over vectorized lanes.  ``cols`` is
    the 8 frequency lanes (each an int64 array of any shape); returns
    the 8 spatial lanes descaled by ``shift`` — exactly libjpeg's
    column/row pass with the all-AC-zero shortcut dropped (the general
    path is arithmetic-identical to the shortcut, see jidctint.c)."""
    c0, c1, c2, c3, c4, c5, c6, c7 = cols
    # even part
    z1 = (c2 + c6) * _F0_541196100
    tmp2 = z1 - c6 * _F1_847759065
    tmp3 = z1 + c2 * _F0_765366865
    tmp0 = (c0 + c4) << _CONST_BITS
    tmp1 = (c0 - c4) << _CONST_BITS
    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
    # odd part
    t0, t1, t2, t3 = c7, c5, c3, c1
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * _F1_175875602
    t0 = t0 * _F0_298631336
    t1 = t1 * _F2_053119869
    t2 = t2 * _F3_072711026
    t3 = t3 * _F1_501321110
    z1 = -z1 * _F0_899976223
    z2 = -z2 * _F2_562915447
    z3 = -z3 * _F1_961570560 + z5
    z4 = -z4 * _F0_390180644 + z5
    t0 += z1 + z3
    t1 += z2 + z4
    t2 += z2 + z3
    t3 += z1 + z4
    return [_descale(tmp10 + t3, shift), _descale(tmp11 + t2, shift),
            _descale(tmp12 + t1, shift), _descale(tmp13 + t0, shift),
            _descale(tmp13 - t0, shift), _descale(tmp12 - t1, shift),
            _descale(tmp11 - t2, shift), _descale(tmp10 - t3, shift)]


def idct_blocks(coefs: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized fixed-point IDCT → (n, 8, 8) uint8 samples
    (+128 level shift, clamped — libjpeg's range-limit table minus its
    garbage-stream wraparound)."""
    blk = coefs.astype(np.int64) * quant.astype(np.int64)
    # pass 1 over columns: lanes are blk[:, k, :] (frequency index k)
    cols = _idct_pass([blk[:, k, :] for k in range(8)],
                      _CONST_BITS - _PASS1_BITS)
    ws = np.stack(cols, axis=1)              # (n, 8row, 8col) workspace
    # pass 2 over rows: lanes are ws[:, :, k]
    rows = _idct_pass([ws[:, :, k] for k in range(8)],
                      _CONST_BITS + _PASS1_BITS + 3)
    out = np.stack(rows, axis=2) + 128
    return np.clip(out, 0, 255).astype(np.uint8)


# --- Huffman ---------------------------------------------------------------

_FAST_BITS = 9


class _HuffTable:
    """Canonical JPEG Huffman table: ``bits[i]`` = #codes of length
    i+1, ``values`` = symbols in code order (T.81 C.2).  Decoding is
    table-driven: a 2^9 first-level lookup resolves every code of ≤9
    bits in one peek (covers both this repo's flat encoder tables and
    the bulk of Annex K's), longer codes walk the per-length map."""

    def __init__(self, bits: list[int], values: bytes):
        if sum(bits) != len(values):
            raise ValueError("DHT: counts do not match value list")
        self.lookup: dict[tuple[int, int], int] = {}
        self.fast: list[tuple[int, int] | None] = [None] * (1 << _FAST_BITS)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = values[k]
                if ln <= _FAST_BITS:
                    base = code << (_FAST_BITS - ln)
                    entry = (values[k], ln)
                    for x in range(1 << (_FAST_BITS - ln)):
                        self.fast[base + x] = entry
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, pads 1-bits at a
    terminating marker (T.81 F.2.2.5), and byte-aligns across restart
    markers.  Bits are consumed in bulk (peek-and-drop), not one at a
    time — the decode hot loop is one dict-free table hit per symbol."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG: entropy data ran out")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker-terminated segment (RSTn / EOI / anything
                # non-stuffed): pad with 1-bits WITHOUT advancing —
                # bulk peeks legitimately reach past the last symbol's
                # real bits (T.81 F.2.2.5 pads segments with 1s);
                # align_restart still finds the marker at self.pos
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def decode(self, table: _HuffTable) -> int:
        while self.nbits < _FAST_BITS:
            self._fill()
        peek = (self.bitbuf >> (self.nbits - _FAST_BITS)) \
            & ((1 << _FAST_BITS) - 1)
        entry = table.fast[peek]
        if entry is not None:
            sym, ln = entry
            self.nbits -= ln
            self.bitbuf &= (1 << self.nbits) - 1
            return sym
        # long codes (10..16 bits): extend the 9-bit prefix
        code = peek
        self.nbits -= _FAST_BITS
        self.bitbuf &= (1 << self.nbits) - 1
        for ln in range(_FAST_BITS + 1, 17):
            code = (code << 1) | self.receive(1)
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def align_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        # skip stuffing/fill bytes up to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                break
            self.pos += 1
        marker = d[self.pos + 1]
        if marker != 0xD0 + (n & 7):
            raise ValueError(
                f"JPEG: expected RST{n & 7}, found 0xFF{marker:02x}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ---------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac", "coef", "pred",
                 "bw", "bh", "nbw", "nbh")


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a JPEG's LUMA plane to uint8 (H, W) — baseline (SOF0) or
    progressive (SOF2, r13: spectral selection + successive
    approximation + EOBRUN, T.81 Annex G).

    Grayscale files: the image, bit-comparable to PIL (same islow
    IDCT).  YCbCr files: the Y component (the BT.601 luma the encoder
    measured), at full image resolution — chroma never upsamples into
    this path (its IDCT is skipped; see :func:`decode_jpeg_rgb` for
    the full-color path).  Raises ``NotImplementedError`` for
    arithmetic/12-bit/hierarchical streams and ``ValueError`` for
    malformed ones.
    """
    comps, quant, width, height, mcus_x, mcus_y = _parse_decode(payload)
    y = comps[0]
    return _assemble_plane(y, quant)[:height, :width]


def _parse_decode(payload: bytes):
    """Parse headers and entropy-decode every scan's coefficients into
    per-component block grids.  Returns (comps, quant, width, height,
    mcus_x, mcus_y); per-component IDCT/assembly is the caller's (so
    the luma-only path never IDCTs chroma).  Baseline = one full scan;
    progressive accumulates DC/AC bands and approximation bits across
    scans into the same grids (the IDCT sees finished coefficients
    either way)."""
    if not is_jpeg(payload):
        raise ValueError("JPEG: bad signature (no FFD8)")
    d = payload
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    mcus_x = mcus_y = 0
    scans_seen = 0

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:                       # EOI
            break
        seglen = struct.unpack(">H", d[pos + 2:pos + 4])[0]
        if seglen < 2:
            raise ValueError(f"JPEG: bad segment length at {pos}")
        seg = d[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen

        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG: SOF{marker - 0xC0} (extended/arithmetic/"
                f"hierarchical) — baseline SOF0 / progressive SOF2 only")
        if marker in (0xC0, 0xC2):               # SOF0 / SOF2
            progressive = marker == 0xC2
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("JPEG: 8-bit precision only")
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                c = _Component()
                c.cid, c.h, c.v, c.tq = cid, hv >> 4, hv & 15, tq
                c.pred = 0
                comps.append(c)
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            if (comps[0].h, comps[0].v) != (hmax, vmax):
                raise NotImplementedError(
                    "JPEG: luma subsampled below another component")
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for c in comps:
                c.bw, c.bh = mcus_x * c.h, mcus_y * c.v
                # non-interleaved scans cover only the REAL block grid
                # of the component's downsampled dims (T.81 A.2.2)
                cw = -(-width * c.h // hmax)
                ch = -(-height * c.v // vmax)
                c.nbw, c.nbh = -(-cw // 8), -(-ch // 8)
                c.coef = np.zeros((c.bh * c.bw, 64), dtype=np.int64)
        elif marker == 0xDB:                     # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i:i + n]
                i += n
                vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if pq else
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                quant[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                values = seg[i + 17:i + 17 + nvals]
                i += 17 + nvals
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _HuffTable(bits, values)
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            sel = {}
            order = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel[cs] = (tt >> 4, tt & 15)
                order.append(cs)
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            scan = [c for c in comps if c.cid in sel]
            scan.sort(key=lambda c: order.index(c.cid))
            if not progressive:
                if len(scan) != len(comps):
                    raise NotImplementedError(
                        "JPEG: baseline multi-scan streams")
                ss, se, ah, al = 0, 63, 0, 0
            for c in scan:
                c.dc, c.ac = sel[c.cid]
            pos = _scan_entropy(d, pos, scan, dc_tabs, ac_tabs,
                                mcus_x, mcus_y, restart_interval,
                                progressive, ss, se, ah, al)
            scans_seen += 1
            if not progressive:
                # baseline: single scan is the whole image
                return comps, quant, width, height, mcus_x, mcus_y
        # APPn/COM/DNL etc.: skipped
    if not comps or not scans_seen:
        raise ValueError("JPEG: no SOS marker found")
    return comps, quant, width, height, mcus_x, mcus_y


def _scan_entropy(d: bytes, pos: int, scan, dc_tabs, ac_tabs,
                  mcus_x: int, mcus_y: int, restart_interval: int,
                  progressive: bool, ss: int, se: int, ah: int,
                  al: int) -> int:
    """Entropy-decode one scan into the components' coefficient grids
    and return the byte offset of the next marker segment.

    Baseline: the full interleaved DC+AC walk.  Progressive (T.81
    Annex G.2): DC scans (Ss=0) may be interleaved; AC scans are
    single-component over the component's REAL (non-MCU-padded) block
    grid; first scans (Ah=0) deliver value·2^Al with EOB-run coding;
    refinement scans (Ah>0) deliver one correction bit per
    already-nonzero coefficient plus newly-significant ±2^Al values —
    the control flow is the public stb_image/jpgd/libjpeg-jdphuff
    algorithm restated in numpy/python."""
    reader = _BitReader(d, pos)
    rst = 0
    zz = ZIGZAG
    eobrun = [0]
    for c in scan:
        c.pred = 0

    def restart():
        nonlocal rst
        reader.align_restart(rst)
        rst = (rst + 1) & 7
        eobrun[0] = 0
        for c in scan:
            c.pred = 0

    def block_baseline(c, idx):
        coef = c.coef[idx]
        dc_t, ac_t = dc_tabs[c.dc], ac_tabs[c.ac]
        t = reader.decode(dc_t)
        c.pred += _extend(reader.receive(t), t)
        coef[0] = c.pred
        k = 1
        while k < 64:
            rs = reader.decode(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:                      # EOB
                    break
                k += 16                          # ZRL
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG: AC index past 63")
            coef[zz[k]] = _extend(reader.receive(s), s)
            k += 1

    def block_dc_first(c, idx):
        t = reader.decode(dc_tabs[c.dc])
        c.pred += _extend(reader.receive(t), t)
        c.coef[idx, 0] = c.pred << al

    def block_dc_refine(c, idx):
        if reader.receive(1):
            c.coef[idx, 0] |= (1 << al)

    def block_ac_first(c, idx):
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        coef = c.coef[idx]
        ac_t = ac_tabs[c.ac]
        k = ss
        while k <= se:
            rs = reader.decode(ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:                      # EOBn
                    eobrun[0] = (1 << r) - 1
                    if r:
                        eobrun[0] += reader.receive(r)
                    break
                k += 16                          # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG: AC index past band end")
            coef[zz[k]] = _extend(reader.receive(s), s) << al
            k += 1

    def _refine_nonzero(coef, p, bit):
        # correction bit for an already-significant coefficient:
        # magnitude grows toward ±(2·|v|+1)·2^al one bit at a time
        if reader.receive(1) and not (coef[p] & bit):
            coef[p] += bit if coef[p] > 0 else -bit

    def block_ac_refine(c, idx):
        coef = c.coef[idx]
        bit = 1 << al
        if eobrun[0] > 0:
            eobrun[0] -= 1
            for k in range(ss, se + 1):
                p = zz[k]
                if coef[p]:
                    _refine_nonzero(coef, p, bit)
            return
        ac_t = ac_tabs[c.ac]
        k = ss
        while k <= se:
            rs = reader.decode(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:                       # EOBn: corrections to
                    eobrun[0] = (1 << r) - 1     # the rest of THIS block,
                    if r:                        # run applies to the NEXT
                        eobrun[0] += reader.receive(r)
                    r = 1 << 30
                # else ZRL: skip 16 not-yet-significant zeros
            else:
                if s != 1:
                    raise ValueError("JPEG: bad AC-refine size")
                val = bit if reader.receive(1) else -bit
            while k <= se:
                p = zz[k]
                if coef[p]:
                    _refine_nonzero(coef, p, bit)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[zz[k]] = val
            k += 1

    if progressive and ss == 0 and se != 0:
        raise ValueError("JPEG: progressive DC scan must have Se=0")
    if progressive and ss != 0 and len(scan) != 1:
        raise ValueError("JPEG: progressive AC scan must be "
                         "single-component (T.81 G.1.1.1.1)")

    interleaved = len(scan) > 1 or not progressive
    if progressive:
        if ss == 0:
            block = block_dc_first if ah == 0 else block_dc_refine
        else:
            block = block_ac_first if ah == 0 else block_ac_refine
    else:
        block = block_baseline

    if interleaved:
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                restart()
            my, mx = divmod(m, mcus_x)
            for c in scan:
                for by in range(c.v):
                    for bx in range(c.h):
                        block(c, (my * c.v + by) * c.bw
                              + mx * c.h + bx)
    else:
        c = scan[0]
        # non-interleaved: the component's real block grid, row-major,
        # indexed into the MCU-padded storage grid
        n = c.nbh * c.nbw
        for i in range(n):
            if restart_interval and i and i % restart_interval == 0:
                restart()
            r, col = divmod(i, c.nbw)
            block(c, r * c.bw + col)

    # locate the next marker (skip entropy padding, stuffed FF00s and
    # any trailing RST the reader did not consume)
    p = reader.pos
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 \
                and not (0xD0 <= d[p + 1] <= 0xD7):
            break
        p += 1
    return p


def _assemble_plane(c, quant, *_ignored) -> np.ndarray:
    """IDCT one component's coefficient grid and assemble its plane at
    its OWN (possibly subsampled) resolution.  The grid is stored
    block-row-major (absolute block position, not MCU-major), so
    assembly is a single transpose."""
    pix = idct_blocks(c.coef.reshape(-1, 8, 8), quant[c.tq])
    grid = pix.reshape(c.bh, c.bw, 8, 8)
    return grid.transpose(0, 2, 1, 3).reshape(c.bh * 8, c.bw * 8)


# --- full-color decode (r13: chroma upsample + YCbCr→RGB) -------------------

_SCALEBITS = 16
_ONE_HALF = 1 << (_SCALEBITS - 1)


def _fix16(x: float) -> int:
    return int(x * (1 << _SCALEBITS) + 0.5)


def _h2v1_fancy(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v1_fancy_upsample (jdsample.c, public algorithm):
    horizontal 2× triangular filter — out pixels are 3/4·nearer +
    1/4·further, edges replicated.  Bit-exact with libjpeg's scalar
    path (what PIL runs with do_fancy_upsampling, the default)."""
    p = p.astype(np.int64)
    n, m = p.shape
    out = np.empty((n, 2 * m), dtype=np.int64)
    if m == 1:
        out[:, 0] = out[:, 1] = p[:, 0]
        return out
    out[:, 0] = p[:, 0]
    out[:, 2::2] = (p[:, 1:] * 3 + p[:, :-1] + 1) >> 2
    out[:, 1:-1:2] = (p[:, :-1] * 3 + p[:, 1:] + 2) >> 2
    out[:, -1] = p[:, -1]
    return out


def _expand_h_v2(cs: np.ndarray) -> np.ndarray:
    """Horizontal half of h2v2_fancy_upsample over per-column sums
    (each sum is 3·near_row + far_row, so the >>4 folds both axes);
    libjpeg's exact +8/+7 bias pattern."""
    n, m = cs.shape
    out = np.empty((n, 2 * m), dtype=np.int64)
    if m == 1:
        out[:, 0] = (cs[:, 0] * 4 + 8) >> 4
        out[:, 1] = (cs[:, 0] * 4 + 7) >> 4
        return out
    out[:, 0] = (cs[:, 0] * 4 + 8) >> 4
    out[:, 1] = (cs[:, 0] * 3 + cs[:, 1] + 7) >> 4
    if m > 2:
        out[:, 2:-2:2] = (cs[:, 1:-1] * 3 + cs[:, :-2] + 8) >> 4
        out[:, 3:-2:2] = (cs[:, 1:-1] * 3 + cs[:, 2:] + 7) >> 4
    out[:, -2] = (cs[:, -1] * 3 + cs[:, -2] + 8) >> 4
    out[:, -1] = (cs[:, -1] * 4 + 7) >> 4
    return out


def _h2v2_fancy(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v2_fancy_upsample: 2×2 triangular filter.  Output row
    2r blends input row r (weight 3) with the row ABOVE, row 2r+1 with
    the row BELOW; edge rows replicate (libjpeg's duplicated context
    rows)."""
    p = p.astype(np.int64)
    up = np.vstack([p[0:1], p[:-1]])
    dn = np.vstack([p[1:], p[-1:]])
    a = _expand_h_v2(p * 3 + up)
    b = _expand_h_v2(p * 3 + dn)
    out = np.empty((2 * p.shape[0], a.shape[1]), dtype=np.int64)
    out[0::2] = a
    out[1::2] = b
    return out


def _upsample(p: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Upsample one chroma plane by integral factors, libjpeg's
    dispatch: 1×1 passthrough, h2v1/h2v2 fancy (triangular), anything
    else plain replication (libjpeg int_upsample)."""
    if fx == 1 and fy == 1:
        return p.astype(np.int64)
    if fx == 2 and fy == 1:
        return _h2v1_fancy(p)
    if fx == 2 and fy == 2:
        return _h2v2_fancy(p)
    return np.repeat(np.repeat(p.astype(np.int64), fy, axis=0), fx, axis=1)


def _ycc_to_rgb(y: np.ndarray, cb: np.ndarray,
                cr: np.ndarray) -> np.ndarray:
    """libjpeg ycc_rgb_convert (jdcolor.c): BT.601 inverse in 16-bit
    fixed point, arithmetic right shifts, clamp to [0, 255]."""
    y = y.astype(np.int64)
    xb = cb.astype(np.int64) - 128
    xr = cr.astype(np.int64) - 128
    r = y + ((_fix16(1.40200) * xr + _ONE_HALF) >> _SCALEBITS)
    b = y + ((_fix16(1.77200) * xb + _ONE_HALF) >> _SCALEBITS)
    g = y + ((-_fix16(0.34414) * xb - _fix16(0.71414) * xr
              + _ONE_HALF) >> _SCALEBITS)
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


def decode_jpeg_rgb(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to uint8
    RGB (H, W, 3) — the full-color
    path (r12 VERDICT lead #7; decode_jpeg_gray stays the luma fast
    path).  Grayscale streams replicate the luma into three channels
    (``PIL.convert("RGB")`` semantics); 3-component YCbCr streams IDCT
    every component, upsample chroma with libjpeg's FANCY (triangular)
    filters for the standard 4:2:2/4:2:0 layouts — replication for
    exotic factors, libjpeg's own dispatch — and convert via the
    fixed-point BT.601 inverse, so output is bit-comparable to PIL on
    the same bytes (asserted when PIL is importable).
    """
    comps, quant, width, height, mcus_x, mcus_y = _parse_decode(payload)
    if len(comps) == 1:
        g = _assemble_plane(comps[0], quant, mcus_x, mcus_y)[:height,
                                                             :width]
        return np.stack([g, g, g], axis=2)
    if len(comps) != 3:
        raise NotImplementedError(
            f"JPEG: {len(comps)}-component color (CMYK/YCCK) — "
            "1 (gray) or 3 (YCbCr) only")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        fx, fy = hmax // c.h, vmax // c.v
        if c.h * fx != hmax or c.v * fy != vmax:
            raise NotImplementedError(
                "JPEG: non-integral subsampling ratios")
        p = _assemble_plane(c, quant, mcus_x, mcus_y)
        cw = -(-width * c.h // hmax)         # ceil(width·h/hmax): T.81 A.1.1
        ch = -(-height * c.v // vmax)
        planes.append(_upsample(p[:ch, :cw], fx, fy)[:height, :width])
    return _ycc_to_rgb(*planes)


# --- encoder (grayscale baseline, self-test oriented) ----------------------

def _flat_huff(nsyms: int) -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """Single-length canonical table for symbols 0..nsyms-1: length L =
    the smallest with nsyms < 2^L (strict, so the all-ones code — the
    one T.81 reserves — is never assigned)."""
    ln = 1
    while (1 << ln) <= nsyms:
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = nsyms
    enc = {s: (ln, s) for s in range(nsyms)}
    return bits, bytes(range(nsyms)), enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:             # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= (8 - self.n)
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s (F.1.2.3)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


_DCT_N = np.arange(8)
_DCT_COS = np.cos((2 * _DCT_N[:, None] + 1) * _DCT_N[None, :] * np.pi / 16)
_DCT_CF = np.full(8, 0.5)
_DCT_CF[0] = 0.5 / np.sqrt(2.0)
_DCT_SCALE = _DCT_CF[:, None] * _DCT_CF[None, :]


def _fdct_quant_many(tiles: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Float 2-D DCT-II of (n, 8, 8) level-shifted tiles in one einsum,
    quantized half-away-from-zero (encoder fidelity only needs a valid
    stream — decoder parity is the tested contract)."""
    x = tiles.astype(np.float64) - 128.0
    f = _DCT_SCALE * np.einsum("ki,nkl,lj->nij", _DCT_COS, x, _DCT_COS)
    q = f / quant
    return (np.floor(np.abs(q) + 0.5) * np.sign(q)).astype(np.int64)


def _mag_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, coef: np.ndarray, pred: int,
                  dc_enc, ac_enc) -> int:
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = _mag_cat(diff)
    ln, code = dc_enc[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]              # ZRL
            w.write(code, ln)
            run -= 16
        s = _mag_cat(v)
        ln, code = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]                  # EOB
        w.write(code, ln)
    return int(zz[0])


def _tile(a: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicated (H, W) → (bh*8, bw*8) tiling, (n, 8, 8) blocks
    in MCU raster order."""
    h, w = a.shape
    padded = np.pad(a, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    return (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def encode_gray_jpeg(a: np.ndarray, quant: np.ndarray | None = None,
                     restart_interval: int = 0) -> bytes:
    """Baseline grayscale JPEG of a uint8 (H, W) array."""
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("encode_gray_jpeg expects a uint8 (H, W) array")
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant,
                                                        dtype=np.int64)
    h, w = a.shape
    bh, bw = -(-h // 8), -(-w // 8)
    dc_bits, dc_vals, dc_enc = _flat_huff(12)
    ac_bits, ac_vals, ac_enc = _flat_huff(251)   # covers (15<<4)|10
    out = bytearray(b"\xff\xd8")
    zzq = q.reshape(64)[ZIGZAG.argsort()]        # natural → zigzag
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q.reshape(64)[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         tc << 4) + bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0,
                                                           63, 0])
    wtr = _BitWriter()
    pred = 0
    rst = 0
    blocks = _fdct_quant_many(_tile(a, bh, bw), q)
    for i in range(blocks.shape[0]):
        if restart_interval and i and i % restart_interval == 0:
            wtr.flush()
            out_piece = bytes(wtr.out)
            wtr.out.clear()
            out += out_piece + bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            pred = 0
        pred = _encode_block(wtr, blocks[i], pred, dc_enc, ac_enc)
    wtr.flush()
    out += bytes(wtr.out) + b"\xff\xd9"
    return bytes(out)


def encode_gray_jpeg_as_ycbcr420(a: np.ndarray,
                                 quant: np.ndarray | None = None) -> bytes:
    """The same gray pixels wrapped as a 3-component 4:2:0 YCbCr
    baseline stream with ZERO chroma (Cb=Cr=128 ⇒ all-zero chroma
    blocks) — planted coverage for the interleaved-MCU decode path
    (4 Y + 1 Cb + 1 Cr per MCU) without needing a color source."""
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("expects a uint8 (H, W) array")
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant,
                                                        dtype=np.int64)
    h, w = a.shape
    mx, my = -(-w // 16), -(-h // 16)
    dc_bits, dc_vals, dc_enc = _flat_huff(12)
    ac_bits, ac_vals, ac_enc = _flat_huff(251)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q.reshape(64)[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) \
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         tc << 4) + bytes(bits) + vals
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) \
        + bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    tiles = _tile(a, my * 2, mx * 2)
    coefs = _fdct_quant_many(tiles, q).reshape(my * 2, mx * 2, 8, 8)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    zero = np.zeros((8, 8), dtype=np.int64)
    for yy in range(my):
        for xx in range(mx):
            for by in range(2):
                for bx in range(2):
                    preds[0] = _encode_block(
                        wtr, coefs[2 * yy + by, 2 * xx + bx],
                        preds[0], dc_enc, ac_enc)
            for ci in (1, 2):                    # zero chroma blocks
                preds[ci] = _encode_block(wtr, zero, preds[ci],
                                          dc_enc, ac_enc)
    wtr.flush()
    out += bytes(wtr.out) + b"\xff\xd9"
    return bytes(out)


# --- color encoder (r13: RGB → YCbCr 4:4:4 / 4:2:0) -------------------------

def _rgb_to_ycc(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
    """libjpeg rgb_ycc_convert (jccolor.c): BT.601 forward in 16-bit
    fixed point (Cb/Cr use ONE_HALF-1 so exact halves round toward the
    128 center, libjpeg's own bias)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    off = 128 << _SCALEBITS
    y = (_fix16(0.29900) * r + _fix16(0.58700) * g
         + _fix16(0.11400) * b + _ONE_HALF) >> _SCALEBITS
    cb = (-_fix16(0.16874) * r - _fix16(0.33126) * g
          + _fix16(0.50000) * b + off + _ONE_HALF - 1) >> _SCALEBITS
    cr = (_fix16(0.50000) * r - _fix16(0.41869) * g
          - _fix16(0.08131) * b + off + _ONE_HALF - 1) >> _SCALEBITS
    return (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))


def _box_down2(p: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """2×2 box-mean chroma downsample (round half up), edge-replicated
    to even padded dims first — encoder-side only (decoder parity is
    the tested contract, the downsampler just has to preserve means)."""
    pad = np.pad(p.astype(np.int64),
                 ((0, 2 * out_h - p.shape[0]), (0, 2 * out_w - p.shape[1])),
                 mode="edge")
    return ((pad[0::2, 0::2] + pad[0::2, 1::2]
             + pad[1::2, 0::2] + pad[1::2, 1::2] + 2) >> 2).astype(np.uint8)


def encode_rgb_jpeg(a: np.ndarray, quant: np.ndarray | None = None,
                    subsampling: str = "444") -> bytes:
    """Baseline COLOR JPEG of a uint8 (H, W, 3) RGB array — real
    chroma content (encode_gray_jpeg_as_ycbcr420 plants zero chroma),
    so the full-color decode path (chroma IDCT + fancy upsample +
    YCbCr→RGB) has an in-sandbox source.  ``subsampling``: "444"
    (every component full resolution, 3 blocks per MCU) or "420"
    (chroma 2×2 box-downsampled, 4 Y + Cb + Cr per MCU)."""
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_rgb_jpeg expects a uint8 (H, W, 3) array")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant,
                                                        dtype=np.int64)
    h, w = a.shape[:2]
    yp, cbp, crp = _rgb_to_ycc(a)
    dc_bits, dc_vals, dc_enc = _flat_huff(12)
    ac_bits, ac_vals, ac_enc = _flat_huff(251)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q.reshape(64)[ZIGZAG])
    samp = 0x22 if subsampling == "420" else 0x11
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) \
        + bytes([1, samp, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         tc << 4) + bytes(bits) + vals
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) \
        + bytes([1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    wtr = _BitWriter()
    preds = [0, 0, 0]
    if subsampling == "444":
        bh, bw = -(-h // 8), -(-w // 8)
        coefs = [_fdct_quant_many(_tile(p, bh, bw), q)
                 for p in (yp, cbp, crp)]
        for i in range(bh * bw):
            for ci in range(3):
                preds[ci] = _encode_block(wtr, coefs[ci][i], preds[ci],
                                          dc_enc, ac_enc)
    else:
        mx, my = -(-w // 16), -(-h // 16)
        ycoef = _fdct_quant_many(_tile(yp, my * 2, mx * 2), q) \
            .reshape(my * 2, mx * 2, 8, 8)
        ccoef = [_fdct_quant_many(
                     _tile(_box_down2(p, my * 8, mx * 8), my, mx), q)
                 .reshape(my, mx, 8, 8) for p in (cbp, crp)]
        for yy in range(my):
            for xx in range(mx):
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            wtr, ycoef[2 * yy + by, 2 * xx + bx],
                            preds[0], dc_enc, ac_enc)
                for ci in (1, 2):
                    preds[ci] = _encode_block(wtr, ccoef[ci - 1][yy, xx],
                                              preds[ci], dc_enc, ac_enc)
    wtr.flush()
    out += bytes(wtr.out) + b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (r13: spectral selection + EOB-run batching) -------

def _emit_eobn(wtr: _BitWriter, ac_enc, eobrun: int) -> None:
    """EOBn symbol: run of 2^n..2^(n+1)-1 all-done blocks in one code
    (T.81 G.1.2.2) — n magnitude bits carry eobrun - 2^n."""
    n = eobrun.bit_length() - 1
    ln, code = ac_enc[n << 4]
    wtr.write(code, ln)
    if n:
        wtr.write(eobrun - (1 << n), n)


def _encode_ac_band(wtr: _BitWriter, zz_blocks, ss: int, se: int,
                    ac_enc, restart_interval: int, out: bytearray,
                    rst_state: list) -> None:
    """One progressive AC scan (Ah=Al=0): per-block run/size coding
    inside the band, all-zero tails batched into EOB runs across
    blocks.  Restart intervals flush the pending EOB run first (the
    run never crosses a restart, T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            _emit_eobn(wtr, ac_enc, eobrun)
            eobrun = 0

    for i, z in enumerate(zz_blocks):
        if restart_interval and i and i % restart_interval == 0:
            flush_eob()
            _flush_restart(wtr, out, rst_state)
        band = z[ss:se + 1]
        nz = np.nonzero(band)[0]
        if len(nz) == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(int(nz[-1]) + 1):
            v = int(band[j])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_enc[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _mag_cat(v)
            ln, code = ac_enc[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if int(nz[-1]) < se - ss:
            eobrun += 1
    flush_eob()


def _flush_restart(wtr: _BitWriter, out: bytearray, rst_state: list) -> None:
    wtr.flush()
    out += bytes(wtr.out)
    wtr.out.clear()
    out += bytes([0xFF, 0xD0 + rst_state[0]])
    rst_state[0] = (rst_state[0] + 1) & 7


def _sos_header(comp_specs, ss: int, se: int, ah: int = 0,
                al: int = 0) -> bytes:
    ns = len(comp_specs)
    body = bytes([ns])
    for cid, tsel in comp_specs:
        body += bytes([cid, tsel])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _encode_progressive_scans(out: bytearray, comps, dc_enc, ac_enc,
                              bands, restart_interval: int) -> None:
    """Append the scan sequence: one interleaved DC scan (all
    components, baseline DC diff coding), then per component one AC
    scan per (Ss, Se) band over the component's REAL block grid in
    row-major (non-interleaved) order — T.81 G.1.1.1.1.

    ``comps``: list of dicts with cid, h, v, zz (bh, bw, 64)
    zigzag-order coefficient grid, nbw, nbh, mcus_x, mcus_y."""
    # DC scan, interleaved
    out += _sos_header([(c["cid"], 0x00) for c in comps], 0, 0)
    wtr = _BitWriter()
    rst_state = [0]
    preds = {c["cid"]: 0 for c in comps}
    mcus_x = comps[0]["mcus_x"]
    mcus_y = comps[0]["mcus_y"]
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            _flush_restart(wtr, out, rst_state)
            preds = {c["cid"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    dc = int(c["zz"][my * c["v"] + by,
                                     mx * c["h"] + bx, 0])
                    diff = dc - preds[c["cid"]]
                    preds[c["cid"]] = dc
                    t = _mag_cat(diff)
                    ln, code = dc_enc[t]
                    wtr.write(code, ln)
                    if t:
                        wtr.write(diff if diff >= 0
                                  else diff + (1 << t) - 1, t)
    wtr.flush()
    out += bytes(wtr.out)
    # AC scans, non-interleaved, per component per band
    for c in comps:
        real = [c["zz"][r, col]
                for r in range(c["nbh"]) for col in range(c["nbw"])]
        for ss, se in bands:
            out += _sos_header([(c["cid"], 0x00)], ss, se)
            wtr = _BitWriter()
            rst_state = [0]
            _encode_ac_band(wtr, real, ss, se, ac_enc,
                            restart_interval, out, rst_state)
            wtr.flush()
            out += bytes(wtr.out)


def encode_gray_jpeg_progressive(a: np.ndarray,
                                 quant: np.ndarray | None = None,
                                 bands=((1, 63),),
                                 restart_interval: int = 0) -> bytes:
    """PROGRESSIVE (SOF2) grayscale JPEG: same coefficients as
    encode_gray_jpeg, delivered as one DC scan + one AC scan per
    spectral band — so a correct progressive decoder reconstructs the
    EXACT pixels the baseline stream yields (the bit-equality witness
    the tests pin).  Spectral selection only (Ah=Al=0); EOB runs are
    batched across all-zero blocks, exercising the decoder's EOBn
    skip path on flat regions."""
    if a.dtype != np.uint8 or a.ndim != 2:
        raise ValueError("encode_gray_jpeg_progressive expects a uint8 "
                         "(H, W) array")
    _validate_bands(bands)
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant,
                                                        dtype=np.int64)
    h, w = a.shape
    bh, bw = -(-h // 8), -(-w // 8)
    dc_bits, dc_vals, dc_enc = _flat_huff(12)
    ac_bits, ac_vals, ac_enc = _flat_huff(251)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q.reshape(64)[ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + bytes([1, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         tc << 4) + bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    coefs = _fdct_quant_many(_tile(a, bh, bw), q)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG].reshape(bh, bw, 64)
    comps = [{"cid": 1, "h": 1, "v": 1, "zz": zz, "nbw": bw, "nbh": bh,
              "mcus_x": bw, "mcus_y": bh}]
    _encode_progressive_scans(out, comps, dc_enc, ac_enc, bands,
                              restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def _validate_bands(bands) -> None:
    for ss, se in bands:
        if not (1 <= ss <= se <= 63):
            raise ValueError(f"bad spectral band ({ss}, {se})")


def encode_rgb_jpeg_progressive(a: np.ndarray,
                                quant: np.ndarray | None = None,
                                subsampling: str = "444",
                                bands=((1, 63),)) -> bytes:
    """PROGRESSIVE color JPEG: the same YCbCr coefficients as
    encode_rgb_jpeg (same forward conversion, same 4:4:4/4:2:0
    downsample, same fDCT+quant), delivered as an interleaved DC scan
    + per-component AC band scans over each component's REAL block
    grid — decoded output is bit-equal to the baseline stream's (MCU
    pad blocks receive DC only; their pixels crop away)."""
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_rgb_jpeg_progressive expects a uint8 "
                         "(H, W, 3) array")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    _validate_bands(bands)
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant,
                                                        dtype=np.int64)
    h, w = a.shape[:2]
    yp, cbp, crp = _rgb_to_ycc(a)
    dc_bits, dc_vals, dc_enc = _flat_huff(12)
    ac_bits, ac_vals, ac_enc = _flat_huff(251)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q.reshape(64)[ZIGZAG])
    samp = 0x22 if subsampling == "420" else 0x11
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3) \
        + bytes([1, samp, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    for tc, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals),
                                         tc << 4) + bytes(bits) + vals

    def grid(plane, gh, gw):
        coefs = _fdct_quant_many(_tile(plane, gh, gw), q)
        return coefs.reshape(-1, 64)[:, ZIGZAG].reshape(gh, gw, 64)

    if subsampling == "444":
        mx, my = -(-w // 8), -(-h // 8)
        comps = [
            {"cid": 1, "h": 1, "v": 1, "zz": grid(yp, my, mx),
             "nbw": mx, "nbh": my, "mcus_x": mx, "mcus_y": my},
            {"cid": 2, "h": 1, "v": 1, "zz": grid(cbp, my, mx),
             "nbw": mx, "nbh": my, "mcus_x": mx, "mcus_y": my},
            {"cid": 3, "h": 1, "v": 1, "zz": grid(crp, my, mx),
             "nbw": mx, "nbh": my, "mcus_x": mx, "mcus_y": my},
        ]
    else:
        mx, my = -(-w // 16), -(-h // 16)
        cb_d = _box_down2(cbp, my * 8, mx * 8)
        cr_d = _box_down2(crp, my * 8, mx * 8)
        comps = [
            {"cid": 1, "h": 2, "v": 2, "zz": grid(yp, my * 2, mx * 2),
             "nbw": -(-w // 8), "nbh": -(-h // 8),
             "mcus_x": mx, "mcus_y": my},
            {"cid": 2, "h": 1, "v": 1, "zz": grid(cb_d, my, mx),
             "nbw": -(-(-(-w // 2)) // 8), "nbh": -(-(-(-h // 2)) // 8),
             "mcus_x": mx, "mcus_y": my},
            {"cid": 3, "h": 1, "v": 1, "zz": grid(cr_d, my, mx),
             "nbw": -(-(-(-w // 2)) // 8), "nbh": -(-(-(-h // 2)) // 8),
             "mcus_x": mx, "mcus_y": my},
        ]
    _encode_progressive_scans(out, comps, dc_enc, ac_enc, bands,
                              restart_interval=0)
    out += b"\xff\xd9"
    return bytes(out)
