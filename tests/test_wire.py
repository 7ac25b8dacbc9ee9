"""Wire-format parity: Graphite pickle frames + msgpack datagrams
(reference `horizon/listen.py:110-264`; SURVEY §2.4).

The msgpack codec is validated against fixed byte vectors from the public
msgpack.org spec, the SafeUnpickler against a gadget pickle, and both
bridges end-to-end: real bytes over real sockets → staging files → the
TCP_WIRE_SCHEMA parse the streaming readers use.
"""

from __future__ import annotations

import glob
import pickle
import socket
import time as _time

import pytest

from skyline_spark.streaming.wire import (
    SafeUnpickler,
    iter_frames,
    msgpack_packb,
    msgpack_unpackb,
    pack_frames,
    rows_to_json_lines,
)


# ---------------------------------------------------------------------------
# msgpack codec vs spec byte vectors
# ---------------------------------------------------------------------------

SPEC_VECTORS = [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (2**32, b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"),
    (-33, b"\xd0\xdf"),
    (-200, b"\xd1\xff\x38"),
    (-70000, b"\xd2\xff\xfe\xee\x90"),
    (-(2**40), b"\xd3\xff\xff\xff\x00\x00\x00\x00\x00"),
    (2.5, b"\xcb\x40\x04\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    ("a" * 32, b"\xd9\x20" + b"a" * 32),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, "a"], b"\x92\x01\xa1a"),
    ({}, b"\x80"),
    ({"k": 1}, b"\x81\xa1k\x01"),
]


@pytest.mark.parametrize("obj,encoded", SPEC_VECTORS)
def test_msgpack_spec_vectors(obj, encoded):
    assert msgpack_packb(obj) == encoded
    assert msgpack_unpackb(encoded) == obj


def test_msgpack_roundtrip_metric_shapes():
    # the reference's (metric, (ts, value)) and the page-row analog
    for obj in [
        ["stats.host1.cpu", [1400000000, 42.5]],
        ["https://h7.example.org/p/9", 1722470400.0, "doc text", "eng"],
        {"url": "u", "nested": [1, [2, [3, None]], {"b": b"\x00" * 300}]},
        ["s" * 70000, -(2**35), 2**20],
    ]:
        assert msgpack_unpackb(msgpack_packb(obj)) == obj


def test_msgpack_rejects_trailing_and_unknown():
    with pytest.raises(ValueError):
        msgpack_unpackb(b"\x01\x01")  # trailing byte
    with pytest.raises(ValueError):
        msgpack_unpackb(b"\xc1")  # never-used type byte


# ---------------------------------------------------------------------------
# restricted unpickler + frame codec
# ---------------------------------------------------------------------------


def test_safe_unpickler_accepts_metric_tuples():
    batch = [("https://h1.example.org/p/1", (1722470400.0, "t", "eng"))]
    assert SafeUnpickler.loads(pickle.dumps(batch, protocol=2)) == batch


def test_safe_unpickler_rejects_gadget_pickle():
    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("true",))

    with pytest.raises(pickle.UnpicklingError, match="unsafe"):
        SafeUnpickler.loads(pickle.dumps(Evil()))


def test_frame_codec_roundtrip_and_truncation():
    batches = [[("u1", 1.0, "a", "eng")], [("u2", 2.0, "b", "deu"), ("u3", 3.0, "c", "fra")]]
    wire = pack_frames(batches)
    assert [b for b in iter_frames(wire)] == [
        [tuple(r) for r in batch] for batch in batches
    ]
    # truncated tail ends iteration without raising (listen.py read_all break)
    assert list(iter_frames(wire[:-3])) == [[("u1", 1.0, "a", "eng")]]


def test_rows_to_json_lines_drops_malformed():
    lines = rows_to_json_lines(
        [
            ("https://ok.example.org/", 1722470400.0, "txt", "eng"),
            ("short",),  # wrong arity
            (123, 1.0, "t", "eng"),  # non-str url
            "not a tuple at all",
        ]
    )
    assert len(lines) == 1 and b"ok.example.org" in lines[0]


# ---------------------------------------------------------------------------
# end-to-end: real sockets → staging → TCP_WIRE_SCHEMA parse
# ---------------------------------------------------------------------------


def _wait_staged(staging: str, min_rows: int, timeout: float = 10.0) -> int:
    deadline = _time.time() + timeout
    n = 0
    while _time.time() < deadline:
        n = sum(
            1 for f in glob.glob(staging + "/batch-*.json") for _ in open(f, "rb")
        )
        if n >= min_rows:
            break
        _time.sleep(0.1)
    return n


def _parse_staging(spark, staging: str):
    from pyspark.sql import functions as F

    from skyline_spark.streaming.ingest import TCP_WIRE_SCHEMA

    raw = spark.read.format("text").load(staging)
    return (
        raw.select(F.from_json("value", TCP_WIRE_SCHEMA).alias("p"))
        .select("p.*")
        .where(F.col("url").isNotNull())
    )


def test_tcp_pickle_bridge_end_to_end(spark, tmp_path):
    from skyline_spark.streaming.ingest import TcpPickleBridge

    staging = str(tmp_path / "pickle_staging")
    bridge = TcpPickleBridge(staging)
    rows = [
        (f"https://h{i}.example.org/p/{i}", 1722470400.0 + i, f"doc {i}", "eng")
        for i in range(5)
    ]
    try:
        cli = socket.create_connection((bridge.host, bridge.port), timeout=5)
        cli.sendall(pack_frames([rows[:2], rows[2:]]))
        cli.close()
        # a second connection sends a gadget pickle: the bridge must drop the
        # connection without publishing anything and keep serving
        evil = socket.create_connection((bridge.host, bridge.port), timeout=5)
        payload = pickle.dumps(eval, protocol=2)  # builtins.eval not allowlisted
        import struct as _struct

        evil.sendall(_struct.pack("!I", len(payload)) + payload)
        evil.close()
        cli2 = socket.create_connection((bridge.host, bridge.port), timeout=5)
        extra = ("https://h9.example.org/p/9", 1722470409.0, "doc 9", "deu")
        cli2.sendall(pack_frames([[extra]]))
        cli2.close()
        assert _wait_staged(staging, len(rows) + 1) == len(rows) + 1
    finally:
        bridge.stop()

    got = _parse_staging(spark, staging)
    assert got.count() == len(rows) + 1
    urls = {r["url"] for r in got.collect()}
    assert "https://h9.example.org/p/9" in urls
    assert {r[0] for r in rows} <= urls


def test_udp_msgpack_bridge_end_to_end(spark, tmp_path):
    from skyline_spark.streaming.ingest import UdpMsgpackBridge

    staging = str(tmp_path / "msgpack_staging")
    bridge = UdpMsgpackBridge(staging, flush_rows=3, flush_secs=0.1)
    rows = [
        [f"https://m{i}.example.org/p/{i}", 1722470400.0 + i, f"mp doc {i}", "fra"]
        for i in range(6)
    ]
    try:
        cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for r in rows:
            cli.sendto(msgpack_packb(r), (bridge.host, bridge.port))
        cli.sendto(b"\xc1 garbage", (bridge.host, bridge.port))  # dropped
        cli.close()
        assert _wait_staged(staging, len(rows)) == len(rows)
    finally:
        bridge.stop()

    got = _parse_staging(spark, staging)
    assert got.count() == len(rows)
    assert {r["lang"] for r in got.collect()} == {"fra"}
