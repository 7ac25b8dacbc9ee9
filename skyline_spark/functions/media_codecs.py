"""Real stdlib media codecs: 24-bpp BMP and 16-bit PCM WAV.

Round 3 shipped the multimodal plumbing with an honest decode stub (no
Pillow/ffmpeg in the container). Round 4 replaces the stub boundary for two
formats whose codecs are pure ``struct`` arithmetic — no third-party
libraries, fully implementable from the public format specifications:

- BMP (Windows DIB, BITMAPINFOHEADER, uncompressed 24-bpp): 14-byte file
  header + 40-byte info header + bottom-up pixel rows padded to 4 bytes.
- WAV (RIFF/WAVE, PCM mono 16-bit): 12-byte RIFF header + ``fmt `` chunk +
  ``data`` chunk of little-endian int16 samples.

The encoders and decoders are independent code paths (the decoder walks the
headers it finds; it does not assume the encoder's layout beyond the
format), so an encode→decode round trip genuinely exercises both. The
catalog queries (catalog/pipeline_queries.py) synthesize payloads whose
pixel/sample values follow closed-form integer rules, which lets the DuckDB
oracle verify the DECODED statistics analytically — without any decoding on
the oracle side.

Scale: both codecs are numpy-vectorized per payload and run inside
Arrow-batched ``mapInPandas`` — bytes in, typed stats out, no per-row
Python in the Spark plan.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp",
    "encode_wav",
    "decode_wav",
    "resize_bmp_nearest",
]


# ---------------------------------------------------------------------------
# BMP — 24-bpp uncompressed, BITMAPINFOHEADER
# ---------------------------------------------------------------------------

def _bmp_row_size(width: int) -> int:
    return ((3 * width + 3) // 4) * 4


def encode_bmp(gray: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 gray image as a 24-bpp BMP (r = g = b = v).

    Rows are stored bottom-up with 4-byte padding, per the DIB spec.
    """
    if gray.ndim != 2:
        raise ValueError("expected (h, w) array")
    h, w = gray.shape
    row_size = _bmp_row_size(w)
    img_size = row_size * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + img_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up: file row r holds image row h-1-r; BGR triplets, all equal
    px = gray[::-1, :, None].repeat(3, axis=2).reshape(h, 3 * w)
    rows[:, : 3 * w] = px
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bpp uncompressed BMP to a (h, w) uint8 gray array.

    Walks the real headers (magic, pixel offset, BITMAPINFOHEADER dims/
    bpp/compression); raises ValueError on anything that is not plain
    24-bpp bottom-up. Gray value = blue channel (the encoder writes r = g =
    b, and a cross-channel mismatch would surface in the oracle sums).
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported DIB header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h <= 0:
        raise ValueError("only uncompressed 24-bpp bottom-up BMPs supported")
    row_size = _bmp_row_size(w)
    need = offset + row_size * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    return rows[::-1, :, 0].copy()  # undo bottom-up; blue channel


def resize_bmp_nearest(payload: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Real nearest-neighbor downscale of a BMP, re-encoded as BMP.

    Integer-exact geometry so the SQL oracle can restate it:
    out_w = max(1, w*max_side // max(w, h)) (downscale only — an image
    already within bounds is returned unchanged), source pixel of output
    (i, j) is ((i*w) // out_w, (j*h) // out_h).
    """
    gray = decode_bmp(payload)
    h, w = gray.shape
    if max(w, h) <= max_side:
        return payload, w, h
    out_w = max(1, (w * max_side) // max(w, h))
    out_h = max(1, (h * max_side) // max(w, h))
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return encode_bmp(gray[np.ix_(ys, xs)]), out_w, out_h


# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM mono 16-bit
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM mono 16-bit WAV to (sample_rate, int16 array).

    Walks the RIFF chunk list (tolerating extra chunks in any order, with
    the spec's odd-size padding rule); raises ValueError for non-PCM,
    non-mono or non-16-bit streams.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # a declared chunk size past the payload end is corruption —
            # reject it instead of silently truncating the sample stream
            raise ValueError("truncated WAV chunk")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM mono 16-bit supported")
        elif cid == b"data":
            if size & 1:
                raise ValueError("odd data chunk size for 16-bit samples")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2")
