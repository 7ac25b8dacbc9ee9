"""Multimodal (binary-column) plumbing: decode / feature-extract over Arrow.

Images, audio and video ride through the engine as opaque ``binary``
columns with typed metadata — exactly how the subject table carries
``html:binary``. The decode step itself needs codec libraries that are not
in this container, so it is STUBBED behind ``decode_image`` (documented,
deterministic fake); everything Spark-side — schema, ``mapInPandas``
batching, Arrow transport, partition-preserving iteration — is real and
tested.

Scale notes: ``mapInPandas`` streams Arrow record batches through the
Python worker without materializing a partition; binary payloads dominate
the batch size, so ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in
session.py) is the knob that bounds worker memory at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "MEDIA_FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
    "decode_image",
    "extract_media_features",
    "resize_images",
    "resize_payload",
    "sample_frames",
]

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """STUB decode: (width, height, n_frames) for a binary media payload.

    A real deployment plugs Pillow/ffmpeg in here; this container has
    neither, so the decode is a deterministic fake derived from the payload
    length (keeps tests reproducible and the UDF signature honest). The
    Spark-side contract — bytes in, fixed-typed metadata out — is the part
    under test.
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder required for codecs")
    n = len(payload)
    return (n % 1920 + 1, n % 1080 + 1, n % 30 + 1)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import zlib

    for pdf in batches:
        payloads = pdf["html"]
        dims = [
            decode_image(p) if p is not None else (0, 0, 0) for p in payloads
        ]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                "content_hash": [
                    zlib.crc32(p) if p is not None else 0 for p in payloads
                ],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_frames": [d[2] for d in dims],
            }
        )


def extract_media_features(pages: DataFrame) -> DataFrame:
    """binary column → typed media-feature rows via Arrow-batched mapInPandas."""
    return pages.select("url", "html").mapInPandas(
        _feature_batches, MEDIA_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# resize (1→1 binary transform) and frame-sample (1→N explode)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_payload(payload: bytes, max_side: int) -> tuple[bytes, int, int, float]:
    """STUB resize: (resized_bytes, out_w, out_h, scale), bounded by max_side.

    A real deployment re-encodes via Pillow/libvips here; the deterministic
    fake scales the stub-decoded dims and hands back a proportional byte
    slice so output size tracks output area the way a re-encode would. The
    contract under test: bytes in → (bytes, typed dims) out, downscale only.
    """
    w, h, _ = decode_image(payload)
    scale = min(1.0, max_side / max(w, h))
    out_w = max(1, round(w * scale))
    out_h = max(1, round(h * scale))
    n_out = max(1, int(len(payload) * scale * scale)) if payload else 0
    return payload[:n_out], out_w, out_h, scale


def resize_images(pages: DataFrame, max_side: int = 256) -> DataFrame:
    """1→1 binary transform: bound each media payload to max_side px.

    Plumbing notes for 100 TB: the stage is a pure map (no shuffle), binary
    in / binary out, so executor memory is bounded by one Arrow batch of
    payloads on each side of the worker — halve maxRecordsPerBatch before
    doubling payload size.
    """
    if max_side < 1:
        raise ValueError("max_side must be >= 1")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (None, None, None, None)
                if p is None
                else resize_payload(p, max_side)
                for p in pdf["html"]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "out_w": [r[1] for r in rows],
                    "out_h": [r[2] for r in rows],
                    "scale": [r[3] for r in rows],
                    "resized": [r[0] for r in rows],
                }
            )

    return pages.select("url", "html").mapInPandas(_batches, RESIZE_SCHEMA)


def sample_frames(pages: DataFrame, stride: int = 5) -> DataFrame:
    """1→N explode: emit every stride-th frame of each video payload.

    A real deployment seeks with ffmpeg; the deterministic fake slices the
    payload into n_frames equal chunks and emits every stride-th chunk.
    The plumbing is the part that matters at scale: output cardinality
    multiplies inside the worker, so each *input* batch must stay small
    enough that its ~n_frames/stride output rows fit one Arrow batch —
    mapInPandas yields per input batch, never materializing a partition.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            totals: list[int] = []
            frames: list[bytes] = []
            for url, p in zip(pdf["url"], pdf["html"]):
                if p is None or len(p) == 0:
                    continue
                _, _, n_frames = decode_image(p)
                chunk = max(1, len(p) // n_frames)
                for i in range(0, n_frames, stride):
                    piece = p[i * chunk : (i + 1) * chunk]
                    if not piece:
                        # payload shorter than the decoded frame count
                        # (possible only for degenerate tiny stubs): never
                        # emit zero-byte frame rows
                        continue
                    urls.append(url)
                    idxs.append(i)
                    totals.append(n_frames)
                    frames.append(piece)
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "n_frames": totals, "frame": frames}
            )

    return pages.select("url", "html").mapInPandas(_batches, FRAME_SCHEMA)
