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

__all__ = ["MEDIA_FEATURE_SCHEMA", "decode_image", "extract_media_features"]

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
