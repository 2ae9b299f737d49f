"""Real media codecs from the standard library + numpy — no external
image/audio packages.

The multimodal plumbing (multimodal.py) needs decoders that actually
run; this module provides them for every format the stdlib can carry:

* WAV  — PCM 8/16-bit via `wave`; returns float32 (n_frames, ch) in [-1, 1)
* BMP  — uncompressed 24-bit bottom-up; returns uint8 (H, W, 3) RGB
* PGM/PPM — binary netpbm P5/P6, maxval ≤ 255; uint8 (H, W) / (H, W, 3)
* PNG  — via `zlib`: 8-bit gray / RGB / RGBA, non-interlaced, all five
  scanline filters (None/Sub/Up/Average/Paeth); uint8 (H, W[, C])
* JPEG — baseline DCT (SOF0) in pure numpy: file-parsed Huffman/quant
  tables, 4:4:4 / 4:2:2 / 4:2:0 sampling, DRI/RST; uint8 (H, W[, 3])

Remaining compressed codecs (Opus, AV1, progressive JPEG, …) genuinely
need external libraries and stay behind the `decode=` hook in
multimodal.py.

Encoders for the same formats exist so tests and the synthetic media
table produce REAL files (round-trip = decode(encode(x)) == x), the
analog of the reference generating its own test imagery
(/root/reference/testing/fmask-generate-test-data.py).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# Decode-size ceiling for PNG reconstruction: Average/Paeth scanlines
# are a per-pixel left-recurrence, so decode cost is O(pixels) of
# interpreted work even with the channel lanes vectorized — bound it so
# a single adversarial image fails fast into the per-row error channel
# instead of stalling a whole Arrow batch. 16 MP ≈ a 4000×4000 photo.
MAX_PNG_PIXELS = 16_000_000

# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV → float32 (n_frames, n_channels) in [-1, 1)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            ch, sw, n = w.getnchannels(), w.getsampwidth(), w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        # the stdlib wave module leaks its own error types on corrupt
        # RIFF — the codec contract is ValueError for a recognized-
        # but-corrupt payload (fuzz-pinned in test_codecs)
        raise ValueError(f"corrupt WAV: {type(e).__name__}: {e}") from e
    if sw == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:  # signed little-endian 16-bit
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return arr.reshape(-1, ch)


def encode_wav(
    samples: np.ndarray, rate: int = 16000, sampwidth: int = 2
) -> bytes:
    """float array in [-1, 1) (n,) or (n, ch) → 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if sampwidth != 2:
        raise ValueError("encoder emits 16-bit PCM only")
    ints = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → uint8 (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    try:
        return _decode_bmp_inner(payload)
    except (struct.error, IndexError) as e:
        # truncated header → ValueError, per the codec error contract
        raise ValueError(f"corrupt BMP: {type(e).__name__}: {e}") from e


def _decode_bmp_inner(payload: bytes) -> np.ndarray:
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, np.uint8, count=height * stride, offset=data_off
    ).reshape(height, stride)[:, : width * 3]
    img = rows.reshape(height, width, 3)[..., ::-1]  # BGR → RGB
    return img[::-1].copy() if bottom_up else img.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit bottom-up BMP bytes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("24-bit BMP needs (H, W, 3)")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


# ---------------------------------------------------------------------------
# netpbm (binary P5 gray / P6 RGB)
# ---------------------------------------------------------------------------


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Binary PGM (P5) / PPM (P6), maxval ≤ 255 → uint8 (H,W[,3])."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm file")
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, with '#' comments running to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 1 if magic == b"P5" else 3
    arr = np.frombuffer(payload, np.uint8, count=h * w * ch, offset=pos)
    return arr.reshape((h, w) if ch == 1 else (h, w, 3)).copy()


def encode_netpbm(img: np.ndarray) -> bytes:
    """uint8 (H,W) → P5, (H,W,3) → P6."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    else:
        raise ValueError("netpbm needs (H,W) or (H,W,3)")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# PNG (zlib from the stdlib; filters reconstructed here)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray / RGB / RGBA


def _png_chunks(payload: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
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


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced gray/RGB/RGBA PNG → uint8 (H, W[, C])."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = idat = None
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat = data if idat is None else idat + data
    if ihdr is None or idat is None:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype_i not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG depth={depth} colortype={ctype_i} "
            f"interlace={interlace}"
        )
    ch = _PNG_CHANNELS[ctype_i]
    stride = w * ch
    if w * h > MAX_PNG_PIXELS:
        # cap before even DECOMPRESSING: Average/Paeth rows are a true
        # left-recurrence (O(W) interpreted steps per row even after
        # vectorizing the channel lanes), so one huge adversarial image
        # must surface as a per-row decode ERROR in the mapInPandas
        # error channel, not a minutes-long worker stall — and a
        # declared-huge header never inflates its IDAT (ADVICE r3)
        raise ValueError(
            f"PNG {w}x{h} exceeds MAX_PNG_PIXELS={MAX_PNG_PIXELS}"
        )
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint16)
    zeros_ch = np.zeros(ch, np.int32)
    for y in range(h):
        f, line = int(raw[y, 0]), raw[y, 1:].astype(np.uint16)
        prev = out[y - 1] if y else np.zeros(stride, np.uint16)
        if f == 0:  # None
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif f == 1:  # Sub: cur[x] = line[x] + cur[x-ch] — a per-
            # channel prefix sum; mod 256 commutes with the sum, so one
            # vectorized cumsum replaces the interpreted left-recurrence
            # (int64 accumulator: stride*255 can't overflow)
            out[y] = (
                np.cumsum(
                    line.reshape(w, ch).astype(np.int64), axis=0
                ).ravel()
                & 0xFF
            )
        elif f in (3, 4):  # Average / Paeth: true left-recurrence (the
            # >>1 / predictor needs the mod-256 left PIXEL) — loop per
            # pixel, but with all channel lanes as one numpy op
            line2 = line.reshape(w, ch).astype(np.int32)
            prev2 = prev.reshape(w, ch).astype(np.int32)
            cur2 = np.empty((w, ch), np.int32)
            a = zeros_ch
            if f == 3:
                for x in range(w):
                    a = (line2[x] + ((a + prev2[x]) >> 1)) & 0xFF
                    cur2[x] = a
            else:
                c = zeros_ch
                for x in range(w):
                    b = prev2[x]
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        a,
                        np.where(pb <= pc, b, c),
                    )
                    a = (line2[x] + pred) & 0xFF
                    cur2[x] = a
                    c = b
            out[y] = cur2.ravel()
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0].copy() if ch == 1 else img


def png_filter_row(
    f: int, line: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """FORWARD application of PNG filter `f` to a raw scanline — used
    by the encoder and by tests to exercise the decoder's inverse on
    every filter type."""
    line = line.astype(np.int16)
    prev = prev.astype(np.int16)
    a = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
    c = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
    if f == 0:
        out = line
    elif f == 1:
        out = line - a
    elif f == 2:
        out = line - prev
    elif f == 3:
        out = line - ((a + prev) >> 1)
    elif f == 4:
        pred = np.fromiter(
            (_paeth(int(ai), int(bi), int(ci)) for ai, bi, ci in zip(a, prev, c)),
            np.int16,
            len(line),
        )
        out = line - pred
    else:
        raise ValueError(f"bad PNG filter {f}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(img: np.ndarray, row_filter: int = 0) -> bytes:
    """uint8 (H,W) / (H,W,3) / (H,W,4) → PNG bytes (8-bit,
    non-interlaced, every row using `row_filter`)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError("PNG needs 1, 3 or 4 channels")
    flat = img.reshape(h, w * ch)
    rows = []
    for y in range(h):
        prev = flat[y - 1] if y else np.zeros(w * ch, np.uint8)
        rows.append(bytes([row_filter]))
        rows.append(png_filter_row(row_filter, flat[y], prev, ch).tobytes())
    raw = b"".join(rows)

    def chunk(ctype_b: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype_b
            + data
            + struct.pack(">I", zlib.crc32(ctype_b + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# JPEG (baseline DCT) — pure numpy + stdlib, no external codec.
#
# Decoder: baseline sequential (SOF0), 8-bit, 1 or 3 components, any
# sampling factors whose ratios divide the max (covers 4:4:4, 4:2:2,
# 4:2:0 grayscale), DRI/RSTn restart markers. Huffman tables are read
# from the FILE's DHT segments (not assumed), IDCT is one vectorized
# einsum over all blocks, chroma upsampling is np.repeat.
# Encoder: SOF0 with the JPEG spec Annex K quantization + Huffman
# tables, 4:4:4 or 4:2:0, used by tests/synthetic media for real
# round-trip files (decode(encode(x)) ≈ x within quantization loss).
# ---------------------------------------------------------------------------

MAX_JPEG_PIXELS = 4_000_000  # entropy decode is interpreted per symbol

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int32)

# JPEG spec (ITU T.81) Annex K reference tables
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)
_HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: forward D = C·b·Cᵀ, inverse
    b = Cᵀ·D·C."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    c = np.cos((2 * x + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT_C = _dct_matrix()


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman → {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman → {symbol: (code, length)}."""
    return {
        sym: (code, ln)
        for (ln, code), sym in _huff_decode_table(bits, vals).items()
    }


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs FF00, surfaces RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data, self.pos, self.acc, self.n = data, pos, 0, 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.data[self.pos] if self.pos < len(self.data) else 0
                if m == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    raise ValueError(f"unexpected marker FF{m:02X} in scan")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2

    def decode_huff(self, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: a `size`-bit magnitude to a signed coefficient."""
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-DCT JPEG → uint8 (H, W) gray or (H, W, 3) RGB."""
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, KeyError, OverflowError, struct.error) as e:
        # a corrupt-but-parseable stream must surface as ValueError
        # (the per-row error-channel contract), never an internal
        # error type: truncation → IndexError/struct.error, an SOS/SOF
        # referencing an undefined Huffman/quant table id → KeyError,
        # a corrupt DHT driving an oversized magnitude → OverflowError
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg_inner(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tq] = np.frombuffer(
                    seg[i + 1 : i + 65], np.uint8
                ).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                hts[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if depth != 8 or nc not in (1, 3):
                raise ValueError(f"unsupported JPEG depth={depth} nc={nc}")
            if w * h > MAX_JPEG_PIXELS:
                raise ValueError(
                    f"JPEG {w}x{h} exceeds MAX_JPEG_PIXELS={MAX_JPEG_PIXELS}"
                )
            comps = [
                (seg[6 + 3 * k], seg[7 + 3 * k] >> 4, seg[7 + 3 * k] & 0xF,
                 seg[8 + 3 * k])
                for k in range(nc)
            ]  # (id, hs, vs, tq)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF{marker & 0xF})")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}  # comp id → (dc table, ac table)
            for k in range(ns):
                cid, tabs = seg[1 + 2 * k], seg[2 + 2 * k]
                sel[cid] = (tabs >> 4, tabs & 0xF)
            return _jpeg_scan(
                payload, pos + seglen, comps, sel, qts, hts, h, w, restart
            )
        pos += seglen
    raise ValueError("JPEG has no scan")


def _jpeg_scan(data, pos, comps, sel, qts, hts, h, w, restart):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    blocks = {}  # cid → list of (by, bx, zig-coeff int32[64])
    for cid, hs, vs, _tq in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)
        blocks[cid] = []
    r = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    since_restart = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and since_restart == restart:
                r.sync_restart()
                pred = {cid: 0 for cid, *_ in comps}
                since_restart = 0
            since_restart += 1
            for cid, hs, vs, tq in comps:
                dc_t = hts[(0, sel[cid][0])]
                ac_t = hts[(1, sel[cid][1])]
                q = qts[tq]
                for v in range(vs):
                    for u in range(hs):
                        zz = np.zeros(64, np.int32)
                        size = r.decode_huff(dc_t)
                        pred[cid] += _extend(r.bits(size), size)
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = r.decode_huff(ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC overflow")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        blocks[cid].append(
                            (my * vs + v, mx * hs + u, zz * q)
                        )
    # one vectorized inverse pass per component: inverse zigzag →
    # IDCT over all blocks at once → scatter into the plane
    for cid, hs, vs, _tq in comps:
        if not blocks[cid]:
            continue
        zz = np.stack([b[2] for b in blocks[cid]])
        coeff = np.zeros((len(zz), 64), np.float64)
        coeff[:, _ZIGZAG] = zz
        spatial = np.einsum(
            "ij,njk,kl->nil",
            _DCT_C.T,
            coeff.reshape(-1, 8, 8),
            _DCT_C,
        ) + 128.0
        p = planes[cid]
        for (by, bx, _), blk in zip(blocks[cid], spatial):
            p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    out = []
    for cid, hs, vs, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, 0), hmax // hs, 1)
        out.append(p[:h, :w])
    img = np.clip(np.stack(out, -1), 0, 255).astype(np.uint8)
    if img.shape[-1] == 1:
        return img[:, :, 0].copy()
    y, cb, cr = img[:, :, 0].astype(np.float64), img[:, :, 1].astype(
        np.float64
    ), img[:, :, 2].astype(np.float64)
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        -1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def write(self, code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (pre-marker alignment)."""
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _mag(v: int) -> tuple[int, int]:
    """Signed coefficient → (size, size-bit magnitude code)."""
    size = int(v != 0 and int(abs(v)).bit_length())
    return size, v if v >= 0 else v + (1 << size) - 1


def _encode_component_blocks(plane: np.ndarray, q: np.ndarray):
    """float plane (multiple-of-8 dims, level-shifted) → zigzag-
    quantized int blocks in raster order."""
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8
    )
    coeff = np.einsum("ij,njk,kl->nil", _DCT_C, blocks, _DCT_C.T)
    zz = coeff.reshape(-1, 64)[:, _ZIGZAG]
    return np.round(zz / q).astype(np.int32).reshape(hb, wb, 64)


def _pad_edge(p: np.ndarray, mult: int) -> np.ndarray:
    ph = (-p.shape[0]) % mult
    pw = (-p.shape[1]) % mult
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Baseline JPEG encoder (Annex K tables): gray or RGB, 4:4:4 by
    default, 4:2:0 with ``subsample=True``, optional DRI/RSTn restart
    markers — exists so tests exercise the decoder on real compressed
    files, the same encoder-for-tests pattern as encode_png."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    samp = [(1, 1)] * len(planes)
    if subsample and not gray:
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0]] + [
            _pad_edge(p, 2)
            .reshape(-(-h // 2), 2, -(-w // 2), 2)
            .mean((1, 3))
            for p in planes[1:]
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qids = [0] + [1] * (len(planes) - 1)
    # zigzag-serialize the Annex K tables ONCE: both the coefficient
    # division (which runs in zigzag order) and the DQT segment (which
    # the spec defines as zigzag-serialized) use the same array, so
    # position (1,0) really gets Annex K's 12, not raster-read 10
    qtabs = {0: _QT_LUM[_ZIGZAG], 1: _QT_CHROM[_ZIGZAG]}
    comp_blocks = []
    for p, (hs, vs), qid in zip(planes, samp, qids):
        target = (mcuy * vs * 8, mcux * hs * 8)
        p = _pad_edge(p, 8)[: target[0], : target[1]]
        if p.shape != target:  # image smaller than the MCU grid
            p = np.pad(
                p,
                ((0, target[0] - p.shape[0]), (0, target[1] - p.shape[1])),
                mode="edge",
            )
        comp_blocks.append(
            _encode_component_blocks(p - 128.0, qtabs[qid])
        )
    dc_tabs = [
        _huff_encode_table(*t)
        for t in (_HT_DC_LUM, _HT_DC_CHROM)
    ]
    ac_tabs = [
        _huff_encode_table(*t)
        for t in (_HT_AC_LUM, _HT_AC_CHROM)
    ]
    tids = [0] + [1] * (len(planes) - 1)
    wtr = _BitWriter()
    pred = [0] * len(planes)
    mcu_i = rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                wtr.marker(0xD0 + rst_n % 8)
                rst_n += 1
                pred = [0] * len(planes)
            mcu_i += 1
            for ci, ((hs, vs), zb) in enumerate(zip(samp, comp_blocks)):
                dc_t, ac_t = dc_tabs[tids[ci]], ac_tabs[tids[ci]]
                for v in range(vs):
                    for u in range(hs):
                        zz = zb[my * vs + v, mx * hs + u]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, code = _mag(diff)
                        hc, hl = dc_t[size]
                        wtr.write(hc, hl)
                        if size:
                            wtr.write(code, size)
                        run = 0
                        last = 63
                        while last > 0 and zz[last] == 0:
                            last -= 1
                        for k in range(1, last + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                hc, hl = ac_t[0xF0]
                                wtr.write(hc, hl)
                                run -= 16
                            size, code = _mag(int(zz[k]))
                            hc, hl = ac_t[(run << 4) | size]
                            wtr.write(hc, hl)
                            wtr.write(code, size)
                            run = 0
                        if last < 63:
                            hc, hl = ac_t[0x00]
                            wtr.write(hc, hl)
    scan = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for tq in range(1 if gray else 2):
        out += seg(0xDB, bytes([tq]) + bytes(qtabs[tq].astype(np.uint8)))
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for k in range(nc):
        sof += bytes([k + 1, (samp[k][0] << 4) | samp[k][1], qids[k]])
    out += seg(0xC0, sof)
    dhts = [(0, 0, _HT_DC_LUM), (1, 0, _HT_AC_LUM)]
    if not gray:
        dhts += [(0, 1, _HT_DC_CHROM), (1, 1, _HT_AC_CHROM)]
    for tc, th, (bits, vals) in dhts:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for k in range(nc):
        sos += bytes([k + 1, (tids[k] << 4) | tids[k]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# dispatch + pure-numpy image ops
# ---------------------------------------------------------------------------


def sniff_decode(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch to the real decoders above.

    Raises NotImplementedError for formats that genuinely need
    external libraries (Opus/AV1/progressive-JPEG — a PERMANENT,
    documented boundary, see COVERAGE.md "Closed boundaries"),
    ValueError for corrupt payloads of a recognized format.
    """
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg(payload)
    head = payload[:8].hex() if payload else "<empty>"
    raise NotImplementedError(
        f"no stdlib codec for payload starting {head}; compressed formats "
        "(Opus/AV1/...) need external libraries — pass a custom decode="
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width[, C]) — pure numpy
    fancy indexing, the resize kernel for decoded images."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]
