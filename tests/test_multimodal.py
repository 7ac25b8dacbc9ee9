"""Multimodal binary-column plumbing: decode / feature / resize / frame-sample.

The decode itself is an honest stub (no codec libs in the container); these
tests pin the Spark-side contract — schemas, Arrow batch iteration,
1→1 vs 1→N cardinality, null-payload handling, determinism across runs.
"""

import pytest

from skyline_spark.functions.multimodal import (
    FRAME_SCHEMA,
    MEDIA_FEATURE_SCHEMA,
    RESIZE_SCHEMA,
    decode_image,
    extract_media_features,
    resize_images,
    resize_payload,
    sample_frames,
)
from skyline_spark.sources.synth import synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, n_rows=200, n_days=3, defects=False).cache()


def test_media_features_schema_and_cardinality(pages):
    out = extract_media_features(pages)
    assert out.schema == MEDIA_FEATURE_SCHEMA
    rows = out.collect()
    assert len(rows) == pages.count()  # 1→1
    for r in rows:
        assert r.width >= 1 and r.height >= 1 and r.n_frames >= 1


def test_resize_bounds_and_determinism(pages):
    out = resize_images(pages, max_side=64)
    assert out.schema == RESIZE_SCHEMA
    rows = out.collect()
    assert len(rows) == pages.count()
    for r in rows:
        assert 1 <= r.out_w <= 64 and 1 <= r.out_h <= 64
        assert 0.0 < r.scale <= 1.0
        # stub re-encode: output bytes track output area (never grows)
        assert r.resized is not None
    # downscale only: a payload already within bounds is untouched
    big = resize_images(pages, max_side=10_000).collect()
    by_url = {r.url: r for r in big}
    for (url, html) in pages.select("url", "html").collect():
        r = by_url[url]
        w, h, _ = decode_image(bytes(html))
        assert (r.out_w, r.out_h) == (w, h)
        assert r.scale == 1.0
        assert bytes(r.resized) == bytes(html)
    # deterministic across runs
    again = sorted(
        (r.url, r.out_w, r.out_h, bytes(r.resized))
        for r in resize_images(pages, max_side=64).collect()
    )
    first = sorted((r.url, r.out_w, r.out_h, bytes(r.resized)) for r in rows)
    assert again == first


def test_resize_payload_pure():
    payload = bytes(range(256)) * 40  # 10240 bytes → stub dims derived from len
    w, h, _ = decode_image(payload)
    out, ow, oh, s = resize_payload(payload, max_side=max(w, h) // 2)
    assert s == pytest.approx((max(w, h) // 2) / max(w, h))
    assert ow == max(1, round(w * s)) and oh == max(1, round(h * s))
    assert len(out) == max(1, int(len(payload) * s * s))
    assert out == payload[: len(out)]


def test_frame_sample_explodes_every_stride(pages):
    stride = 5
    out = sample_frames(pages, stride=stride)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    per_url = {}
    for r in rows:
        per_url.setdefault(r.url, []).append(r)
    src = {r.url: bytes(r.html) for r in pages.select("url", "html").collect()}
    assert set(per_url) == set(src)  # every page with a payload emits frames
    for url, frames in per_url.items():
        n_frames = frames[0].n_frames
        _, _, expect_n = decode_image(src[url])
        assert n_frames == expect_n
        idxs = sorted(f.frame_idx for f in frames)
        assert idxs == list(range(0, n_frames, stride))
        # frame payloads are the stub's contiguous chunks of the source
        chunk = max(1, len(src[url]) // n_frames)
        for f in frames:
            lo = f.frame_idx * chunk
            assert bytes(f.frame) == src[url][lo : lo + chunk]


def test_frame_sample_stride_one_and_validation(pages):
    one = sample_frames(pages.limit(20), stride=1)
    counts = {r.url: r.cnt for r in one.groupBy("url").count().withColumnRenamed("count", "cnt").collect()}
    metas = {r.url: r.n_frames for r in extract_media_features(pages.limit(20)).collect()}
    assert counts == metas  # stride=1 emits every frame
    with pytest.raises(ValueError):
        sample_frames(pages, stride=0)


def test_null_payload_paths(spark):
    import pyspark.sql.functions as F

    pages = synth_pages(spark, n_rows=20, n_days=2, defects=False).withColumn(
        "html", F.when(F.col("url").endswith("0"), F.col("html"))
    )
    n_null = pages.where(F.col("html").isNull()).count()
    assert n_null > 0
    feats = extract_media_features(pages).collect()
    assert len(feats) == 20
    assert sum(1 for r in feats if r.n_bytes == 0) == n_null
    res = {r.url: r for r in resize_images(pages).collect()}
    assert len(res) == 20
    assert sum(1 for r in res.values() if r.resized is None) == n_null
    # frame sampling skips null payloads entirely (no empty frame rows)
    frames = sample_frames(pages).select("url").distinct().count()
    assert frames == 20 - n_null


def test_resize_rejects_bad_max_side(spark):
    pages = synth_pages(spark, n_rows=5, n_days=1, defects=False)
    with pytest.raises(ValueError):
        resize_images(pages, max_side=0)


def test_frame_sample_never_emits_empty_frames(spark):
    # a payload shorter than its decoded frame count (len 5 → stub
    # n_frames 6) must not emit zero-byte tail frame rows
    p = b"abcde"
    assert decode_image(p)[2] > len(p)
    df = spark.createDataFrame([("u", bytearray(p))], "url string, html binary")
    rows = sample_frames(df, stride=1).collect()
    assert rows, "short payload still yields its non-empty frames"
    assert all(len(bytes(r.frame)) > 0 for r in rows)
    assert len(rows) == len(p)  # exactly the frames that have bytes


# ---------------------------------------------------------------------------
# real stdlib codecs (round 4): BMP / WAV round trips and malformed inputs
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_and_padding():
    import numpy as np

    from skyline_spark.functions.media_codecs import decode_bmp, encode_bmp

    for w, h in [(1, 1), (3, 5), (4, 4), (16, 11), (13, 2)]:
        g = ((np.arange(w)[None, :] * 7 + np.arange(h)[:, None] * 11 + 42) % 256
             ).astype(np.uint8)
        payload = encode_bmp(g)
        # spec size: headers + padded bottom-up rows
        assert len(payload) == 54 + ((3 * w + 3) // 4 * 4) * h
        assert np.array_equal(decode_bmp(payload), g)


def test_bmp_rejects_malformed():
    import numpy as np
    import pytest as pt

    from skyline_spark.functions.media_codecs import decode_bmp, encode_bmp

    good = encode_bmp(np.zeros((4, 4), dtype=np.uint8))
    with pt.raises(ValueError):
        decode_bmp(b"notabmp" + good[7:])
    with pt.raises(ValueError):
        decode_bmp(good[:40])       # truncated header
    with pt.raises(ValueError):
        decode_bmp(good[:-5])       # truncated pixel data
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8                 # biBitCount -> 8
    with pt.raises(ValueError):
        decode_bmp(bytes(bad_bpp))


def test_wav_roundtrip_and_chunk_walk():
    import numpy as np
    import pytest as pt

    from skyline_spark.functions.media_codecs import decode_wav, encode_wav

    s = (((np.arange(250) * 37 + 999) % 65536) - 32768).astype(np.int16)
    payload = encode_wav(s, 8000)
    assert len(payload) == 44 + 2 * 250
    rate, s2 = decode_wav(payload)
    assert rate == 8000 and np.array_equal(s, s2)
    # decoder walks chunks: an extra LIST chunk before fmt must be skipped
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = payload[:12] + extra + payload[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, s3 = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(s, s3)
    with pt.raises(ValueError):
        decode_wav(b"RIFX" + payload[4:])
    stereo = bytearray(payload)
    stereo[22] = 2                  # channels -> 2
    with pt.raises(ValueError):
        decode_wav(bytes(stereo))


def test_resize_bmp_nearest_geometry():
    import numpy as np

    from skyline_spark.functions.media_codecs import (
        decode_bmp,
        encode_bmp,
        resize_bmp_nearest,
    )

    g = ((np.arange(16)[None, :] * 7 + np.arange(10)[:, None] * 11 + 5) % 256
         ).astype(np.uint8)
    payload = encode_bmp(g)
    resized, ow, oh = resize_bmp_nearest(payload, 8)
    assert (ow, oh) == (16 * 8 // 16, 10 * 8 // 16) == (8, 5)
    got = decode_bmp(resized)
    xs = (np.arange(ow) * 16) // ow
    ys = (np.arange(oh) * 10) // oh
    assert np.array_equal(got, g[np.ix_(ys, xs)])
    # within bounds -> byte-identical passthrough
    same, w2, h2 = resize_bmp_nearest(payload, 64)
    assert same == payload and (w2, h2) == (16, 10)


def test_wav_rejects_truncated_and_short_chunks():
    import struct

    import numpy as np
    import pytest as pt

    from skyline_spark.functions.media_codecs import decode_wav, encode_wav

    good = encode_wav(np.zeros(8, dtype=np.int16), 8000)
    # data chunk declaring a size past the payload end
    oversize = bytearray(good)
    data_pos = good.index(b"data")
    struct.pack_into("<I", oversize, data_pos + 4, 0xFFFF)
    with pt.raises(ValueError, match="truncated"):
        decode_wav(bytes(oversize))
    # fmt chunk shorter than the 16-byte PCM header
    short_fmt = (
        good[:12]
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        + good[12:]
    )
    short_fmt = short_fmt[:4] + struct.pack("<I", len(short_fmt) - 8) + short_fmt[8:]
    with pt.raises(ValueError, match="fmt chunk too short"):
        decode_wav(bytes(short_fmt))
