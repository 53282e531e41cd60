"""Pure-stdlib WAV (RIFF) PCM codec — the audio sibling of
``jpeg_codec``/``png_codec`` (r13 VERDICT lead #5).

The multimodal audio story previously stopped at synthetic byte
chunking (multimodal.py ``chunk_payload``); this module makes the
decode step REAL for the dominant uncompressed interchange format:
RIFF/WAVE with integer PCM samples (8-bit unsigned, 16-bit signed
little-endian), mono or multi-channel.  Like the image codecs it is
numpy + ``struct`` only — no audio libraries exist in the sandbox —
and mirrors their discipline exactly:

- a real CHUNK WALK (not offset math): RIFF header, then iterate
  ``<fourcc, size>`` chunks honoring the spec's odd-size pad byte, so
  streams carrying LIST/INFO, ``fact``, cue or vendor chunks decode
  the same as minimal ones;
- loud, tested failure for documented format limits (non-PCM codecs
  such as float/ADPCM/µ-law, bit depths other than 8/16) via
  ``NotImplementedError`` — never a silent wrong waveform;
- a sibling encoder so tests and planted fixtures can round-trip
  self-encoded streams, plus hand-built foreign-layout streams
  (extra chunks, pad bytes) pinning the walker.

PCM is lossless, so unlike JPEG the planted-fixture witness is exact
hash equality of decoded per-channel statistics against a closed-form
oracle (see ``multimodal_decode_wav`` in queries_pipeline).

Reference parity note: the reference repo has no codecs at all — its
binary columns stop at opaque payloads (SURVEY §2.7); this is part of
the beyond-reference multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1  # WAVE_FORMAT_PCM; everything else is a documented limit


def encode_wav_pcm(samples: np.ndarray, sample_rate: int,
                   bits: int = 16, extra_chunks: bool = False) -> bytes:
    """Encode samples to a RIFF/WAVE stream.

    ``samples``: int array shaped (n,) mono or (n, channels);
    values must fit the target depth (int16 for ``bits=16``; for
    ``bits=8`` the SIGNED value range -128..127, stored unsigned
    per the WAV convention ``u8 = s + 128``).  ``extra_chunks=True``
    inserts a LIST/INFO chunk with an odd-sized payload (forcing a
    pad byte) BEFORE ``data`` — the foreign-layout shape real
    encoders produce and naive offset-math readers break on.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 16:
        frames = arr.astype("<i2").tobytes()
    elif bits == 8:
        if arr.min() < -128 or arr.max() > 127:
            raise ValueError("8-bit samples must be in -128..127")
        frames = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise NotImplementedError(f"bits={bits}: only 8/16-bit PCM")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, sample_rate,
                      sample_rate * block, block, bits)
    chunks = [(b"fmt ", fmt)]
    if extra_chunks:
        # odd-length INFO comment => spec requires a pad byte
        info = b"INFOICMT" + struct.pack("<I", 5) + b"five\x00"
        assert len(info) % 2 == 1
        chunks.append((b"LIST", info))
    chunks.append((b"data", frames))
    body = b"WAVE"
    for cc, payload in chunks:
        body += cc + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"  # RIFF pad byte, not counted in size
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM stream to (samples, sample_rate).

    ``samples`` is int16 shaped (n, channels) regardless of stored
    depth — 8-bit unsigned is centered and scaled ``(u8-128)*256``
    (the exact inverse of the natural 16->8 truncation, so round-trip
    through 8-bit is bit-exact for 8-bit-representable values).
    Walks every chunk with pad-byte handling; unknown chunks are
    skipped.  Raises ``ValueError`` on malformed containers and
    ``NotImplementedError`` on non-PCM formats or unsupported depths.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cc!r} chunk")
        if cc == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cc == b"data":
            data = body
        pos += 8 + size + (size % 2)  # spec pad byte on odd sizes
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if audio_fmt != _FMT_PCM:
        raise NotImplementedError(
            f"audio format {audio_fmt}: only integer PCM (1) — "
            "float/ADPCM/mu-law are documented limits")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    if bits == 16:
        n = len(data) // (2 * ch)
        arr = np.frombuffer(data[:n * 2 * ch], dtype="<i2") \
                .reshape(n, ch).astype(np.int16)
    elif bits == 8:
        n = len(data) // ch
        arr = ((np.frombuffer(data[:n * ch], dtype=np.uint8)
                .reshape(n, ch).astype(np.int16)) - 128) * 256
    else:
        raise NotImplementedError(
            f"bits={bits}: only 8/16-bit integer PCM")
    return arr, rate


def waveform_stats(samples: np.ndarray) -> list[dict]:
    """Exact per-channel statistics of an int16 waveform — the
    planted-fixture witness surface (all int64, engine-portable):
    n_samples, min/max, sum, sum of |s|, and a position-weighted
    checksum ``sum((i+1) * s_i)`` that pins sample ORDER (catching
    interleave/endianness bugs a plain sum cannot)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    idx = np.arange(1, n + 1, dtype=np.int64)
    return [{
        "channel": c,
        "n_samples": int(n),
        "min_s": int(arr[:, c].min()) if n else 0,
        "max_s": int(arr[:, c].max()) if n else 0,
        "sum_s": int(arr[:, c].sum()),
        "sum_abs": int(np.abs(arr[:, c]).sum()),
        "checksum": int((idx * arr[:, c]).sum()),
    } for c in range(arr.shape[1])]


def window_features(samples: np.ndarray, window: int) -> list[dict]:
    """Fixed-window waveform features per (channel, window) — the
    VAD/spectrogram prelude, exact in int64: sum of squares (energy;
    RMS's radicand, left unrooted to stay engine-portable), peak
    |amplitude|, and the zero-crossing count under the deterministic
    rule ``(prev < 0) != (s < 0)`` for consecutive samples WITHIN the
    window (the first sample of each window has no predecessor).
    Trailing partial windows are emitted with their true length."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    w = int(window)
    if w < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    out = []
    for c in range(arr.shape[1]):
        col = arr[:, c]
        for wi in range(0, (n + w - 1) // w):
            seg = col[wi * w:(wi + 1) * w]
            neg = seg < 0
            out.append({
                "channel": c,
                "window_id": wi,
                "win_len": int(len(seg)),
                "sum_sq": int((seg * seg).sum()),
                "peak": int(np.abs(seg).max()),
                "zero_cross": int((neg[1:] != neg[:-1]).sum()),
            })
    return out


# ---------------------------------------------------------------------------
# Sibling audio containers (r14): AIFF (big-endian IFF) and Sun AU,
# plus ITU-T G.711 mu-law expansion — together with RIFF/WAV these
# cover the classic uncompressed interchange formats, each with
# foreign CPython-test-suite fixtures and (where the deprecated
# stdlib modules exist) independent-decoder parity tests.

def _mulaw_table() -> np.ndarray:
    """G.711 mu-law byte -> linear int16, the public-spec expansion
    (sign/exponent/mantissa after ones'-complement; bias 0x84).
    Bit-identical to audioop.ulaw2lin (asserted when importable)."""
    out = np.empty(256, dtype=np.int16)
    for code in range(256):
        u = ~code & 0xFF
        exponent = (u >> 4) & 0x07
        mantissa = u & 0x0F
        sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
        out[code] = -sample if u & 0x80 else sample
    return out


MULAW_TABLE = _mulaw_table()


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """Vectorized G.711 mu-law expansion: uint8 codes -> int16."""
    return MULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def _alaw_table() -> np.ndarray:
    """G.711 A-law byte -> linear int16 (even-bit inversion 0x55,
    chord/step expansion; bit-identical to audioop.alaw2lin)."""
    out = np.empty(256, dtype=np.int16)
    for code in range(256):
        a = code ^ 0x55
        exponent = (a >> 4) & 0x07
        mantissa = a & 0x0F
        if exponent == 0:
            sample = (mantissa << 4) + 8
        else:
            sample = ((mantissa << 4) + 0x108) << (exponent - 1)
        out[code] = sample if a & 0x80 else -sample
    return out


ALAW_TABLE = _alaw_table()


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """Vectorized G.711 A-law expansion: uint8 codes -> int16."""
    return ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def _f80_to_int(b: bytes) -> int:
    """80-bit IEEE 754 extended float -> int (AIFF sample rates are
    small positive integers stored in this format, COMM chunk)."""
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    if se == 0 and mant == 0:
        return 0
    exponent = (se & 0x7FFF) - 16383 - 63
    val = mant * (2.0 ** exponent)
    return int(round(-val if se & 0x8000 else val))


def _int_to_f80(n: int) -> bytes:
    """int -> 80-bit extended float (AIFF COMM writer)."""
    if n == 0:
        return b"\x00" * 10
    e = n.bit_length() - 1
    mant = n << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def encode_aiff_pcm(samples: np.ndarray, sample_rate: int,
                    bits: int = 16) -> bytes:
    """Encode an AIFF stream (big-endian PCM; 8-bit AIFF is SIGNED,
    unlike WAV's unsigned convention)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bits == 16:
        frames = arr.astype(">i2").tobytes()
    elif bits == 8:
        if arr.min() < -128 or arr.max() > 127:
            raise ValueError("8-bit AIFF samples must be in -128..127")
        frames = arr.astype(np.int8).tobytes()
    else:
        raise NotImplementedError(f"bits={bits}: only 8/16-bit PCM")
    comm = struct.pack(">hLh", ch, n, bits) + _int_to_f80(sample_rate)
    ssnd = struct.pack(">LL", 0, 0) + frames
    body = b"AIFF"
    for cc, payload in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cc + struct.pack(">L", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"  # IFF pad byte, like RIFF
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an AIFF (FORM/AIFF) PCM stream to (int16 samples,
    sample_rate) — the big-endian IFF sibling of :func:`decode_wav`:
    same chunk walk with pad bytes, COMM carries the 80-bit-float
    sample rate, SSND carries offset/blocksize before the frames.
    8-bit AIFF is SIGNED (scaled ``s8*256``); AIFC compression types
    other than raw PCM are documented limits."""
    if len(payload) < 12 or payload[:4] != b"FORM" \
            or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not a FORM/AIFF stream")
    pos, end = 12, 8 + struct.unpack(">L", payload[4:8])[0]
    end = min(end, len(payload))
    comm = None
    frames = None
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        size = struct.unpack(">L", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cc!r} chunk")
        if cc == b"COMM":
            ch, n, bits = struct.unpack(">hLh", body[:8])
            rate = _f80_to_int(body[8:18])
            compr = body[18:22] if size >= 22 else b"NONE"
            comm = (ch, n, bits, rate, compr)
        elif cc == b"SSND":
            off, _block = struct.unpack(">LL", body[:8])
            frames = body[8 + off:]
        pos += 8 + size + (size % 2)
    if comm is None or frames is None:
        raise ValueError("missing COMM or SSND chunk")
    ch, n, bits, rate, compr = comm
    if compr not in (b"NONE", b"\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"AIFC compression {compr!r}: only raw PCM (NONE)")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    block = ch * bits // 8
    if len(frames) < n * block:
        # COMM declares more frames than SSND carries: data loss, not
        # a layout variant — fail loudly like the WAV walker does
        raise ValueError(
            f"AIFF SSND holds {len(frames)} bytes but COMM declares "
            f"{n} frames x {block} bytes")
    if bits == 16:
        arr = np.frombuffer(frames[:n * 2 * ch], dtype=">i2") \
                .reshape(n, ch).astype(np.int16)
    elif bits == 8:
        arr = np.frombuffer(frames[:n * ch], dtype=np.int8) \
                .reshape(n, ch).astype(np.int16) * 256
    else:
        raise NotImplementedError(
            f"bits={bits}: only 8/16-bit integer PCM")
    return arr, rate


_AU_MAGIC = b".snd"
_AU_ENC_MULAW, _AU_ENC_PCM8, _AU_ENC_PCM16 = 1, 2, 3
_AU_ENC_ALAW = 27


def encode_au(samples: np.ndarray, sample_rate: int,
              encoding: int = _AU_ENC_PCM16) -> bytes:
    """Encode a Sun AU stream (big-endian header; PCM16, signed PCM8,
    or G.711 mu-law — for mu-law, ``samples`` are the raw uint8
    CODES, the exact bytes a telephony source emits)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    ch = arr.shape[1]
    if encoding == _AU_ENC_PCM16:
        data = arr.astype(">i2").tobytes()
    elif encoding == _AU_ENC_PCM8:
        data = arr.astype(np.int8).tobytes()
    elif encoding in (_AU_ENC_MULAW, _AU_ENC_ALAW):
        data = arr.astype(np.uint8).tobytes()
    else:
        raise NotImplementedError(f"AU encoding {encoding}")
    hdr = struct.pack(">4sLLLLL", _AU_MAGIC, 28, len(data),
                      encoding, sample_rate, ch) + b"nsjs"
    return hdr + data


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a Sun AU stream to (int16 samples, sample_rate):
    16-bit big-endian PCM, signed 8-bit PCM (``s8*256``), and the G.711
    companded pair — mu-law (:data:`MULAW_TABLE`) and A-law
    (:data:`ALAW_TABLE`), both spec-exact real COMPRESSED telephony
    codecs.  Other encodings (float, ADPCM) are documented limits."""
    if len(payload) < 24 or payload[:4] != _AU_MAGIC:
        raise ValueError("not a Sun AU stream")
    off, dsize, enc, rate, ch = struct.unpack(">LLLLL", payload[4:24])
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    data = payload[off:off + dsize]
    if len(data) < dsize:
        raise ValueError("truncated AU data")
    if enc == _AU_ENC_PCM16:
        n = len(data) // (2 * ch)
        arr = np.frombuffer(data[:n * 2 * ch], dtype=">i2") \
                .reshape(n, ch).astype(np.int16)
    elif enc == _AU_ENC_PCM8:
        n = len(data) // ch
        arr = np.frombuffer(data[:n * ch], dtype=np.int8) \
                .reshape(n, ch).astype(np.int16) * 256
    elif enc in (_AU_ENC_MULAW, _AU_ENC_ALAW):
        n = len(data) // ch
        table = MULAW_TABLE if enc == _AU_ENC_MULAW else ALAW_TABLE
        arr = table[np.frombuffer(data[:n * ch], dtype=np.uint8)] \
            .reshape(n, ch)
    else:
        raise NotImplementedError(
            f"AU encoding {enc}: only PCM16/PCM8/mu-law/A-law")
    return arr, rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int, str]:
    """Container-sniffing audio decode: RIFF/WAVE, FORM/AIFF, or Sun
    AU by magic -> (int16 samples (n, ch), sample_rate, container).
    The single entry point a mixed-corpus pipeline calls on an opaque
    ``binary`` column."""
    if payload[:4] == b"RIFF":
        arr, rate = decode_wav(payload)
        return arr, rate, "wav"
    if payload[:4] == b"FORM":
        arr, rate = decode_aiff(payload)
        return arr, rate, "aiff"
    if payload[:4] == _AU_MAGIC:
        arr, rate = decode_au(payload)
        return arr, rate, "au"
    raise ValueError("unrecognized audio container "
                     f"(magic {payload[:4]!r})")
