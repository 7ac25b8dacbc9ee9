"""Streaming ingest tests: skip-list filter, watermarked incremental stats,
exactly-once availableNow drains, and batch/stream stat-row equivalence.

Append-mode semantics note: a windowed aggregate only emits once the
watermark passes the window end, so a bounded drain holds back the newest
open windows — they flush when later data arrives. The equivalence test
therefore stages an extra later-day batch to close the compared windows,
which is exactly how a production backfill behaves.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyline_spark.sources.synth import synth_pages
from skyline_spark.streaming.ingest import (
    apply_skip_list,
    read_page_stream,
    run_to_sink,
    streaming_partition_stats,
)


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """Six days of pages: days 0-3 are the payload, days 4-5 the sentinel
    batch that advances the watermark past day 3's window end."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    pages = synth_pages(spark, n_rows=2000, n_days=6, defects=False).withColumn(
        "_day", F.datediff(F.to_date("warc_ts"), F.lit("2026-08-01").cast("date"))
    )
    payload = pages.where(F.col("_day") <= 3).drop("_day")
    sentinel = pages.where(F.col("_day") > 3).drop("_day")
    payload.repartition(4).write.mode("overwrite").parquet(src)
    return root, src, payload, sentinel


def test_skip_list(spark):
    df = spark.createDataFrame(
        [
            ("https://skip.me/x",),
            ("https://host-1.example.org/ok",),
            ("https://skip.me/but.example.org/kept",),
            ("https://a.invalid.example.org/hmm",),
        ],
        ["url"],
    )
    kept = {r.url for r in apply_skip_list(df).collect()}
    # skip patterns drop, DO_NOT_SKIP (keep) patterns override
    assert "https://skip.me/x" not in kept
    assert "https://host-1.example.org/ok" in kept
    assert "https://skip.me/but.example.org/kept" in kept
    # the keep pattern's negative lookbehind excludes invalid.example.org,
    # so this skip rule actually fires (it was dead when keep matched every
    # *.example.org substring)
    assert "https://a.invalid.example.org/hmm" not in kept


def test_streaming_matches_batch(spark, staged):
    root, src, payload, sentinel = staged
    out = str(root / "out")
    ckpt = str(root / "ckpt")

    stream = read_page_stream(spark, src, max_files_per_trigger=2)
    run_to_sink(streaming_partition_stats(stream, watermark="1 hour"), out, ckpt)

    # second drain after the sentinel batch arrives → closed windows flush
    sentinel.write.mode("append").parquet(src)
    stream2 = read_page_stream(spark, src, max_files_per_trigger=2)
    run_to_sink(streaming_partition_stats(stream2, watermark="1 hour"), out, ckpt)

    got = (
        spark.read.parquet(out)
        .where(F.col("partition_date") <= F.lit("2026-08-04").cast("date"))
        .select("partition_date", "lang", "row_count")
        .collect()
    )
    expect = (
        payload.groupBy(F.to_date("warc_ts").alias("partition_date"), "lang")
        .agg(F.count(F.lit(1)).alias("row_count"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_exactly_once_resume(spark, staged):
    """Re-running the drain with the same checkpoint adds nothing."""
    root, src, _, _ = staged
    out = str(root / "out2")
    ckpt = str(root / "ckpt2")
    stream = read_page_stream(spark, src)
    run_to_sink(streaming_partition_stats(stream), out, ckpt)
    n1 = spark.read.parquet(out).count()
    stream2 = read_page_stream(spark, src)
    run_to_sink(streaming_partition_stats(stream2), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2


def test_udp_datagram_ingest(spark, tmp_path):
    """Genuine-UDP ingestion (horizon/listen.py:229-264 analog): JSON
    datagrams hit the bridge socket, land atomically in the staging dir, and
    an availableNow drain reads them with the page schema; a garbled datagram
    is dropped like the reference's try/except-continue."""
    import json
    import socket
    import time as _time

    from skyline_spark.streaming.ingest import UdpJsonBridge, read_page_stream_udp

    staging = str(tmp_path / "udp_staging")
    bridge = UdpJsonBridge(staging, flush_rows=3, flush_secs=0.1)
    rows = [
        {"url": f"https://host-2.example.org/u/{i}", "warc_ts": "2026-08-02 00:00:0%d" % i,
         "text": f"udp doc {i}", "lang": "eng"}
        for i in range(7)
    ]
    try:
        cli = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for r in rows:
            cli.sendto(json.dumps(r).encode(), (bridge.host, bridge.port))
        cli.sendto(b"\x00\x01 not json", (bridge.host, bridge.port))
        cli.close()
        # wait for the bridge to flush every datagram to the staging dir
        import glob
        deadline = _time.time() + 10
        while _time.time() < deadline:
            staged_rows = sum(
                1 for f in glob.glob(staging + "/batch-*.json")
                for _ in open(f, "rb")
            )
            if staged_rows >= len(rows) + 1:
                break
            _time.sleep(0.1)
    finally:
        bridge.stop()

    out = str(tmp_path / "udp_out")
    ckpt = str(tmp_path / "udp_ckpt")
    stream = read_page_stream_udp(spark, staging)
    (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out).collect()
    assert {r["url"] for r in got} == {r["url"] for r in rows}  # garbage dropped
    assert all(r["html"] is None for r in got)


def test_tcp_socket_ingest(spark):
    """Genuine-TCP ingestion (horizon/listen.py analog): a line-JSON server
    feeds the socket source; malformed frames are dropped, good rows land in
    a memory sink with the page schema."""
    import json
    import socket
    import threading
    import time as _time

    from skyline_spark.streaming.ingest import read_page_stream_tcp

    rows = [
        {"url": f"https://host-1.example.org/p/{i}", "warc_ts": "2026-08-01 00:00:0%d" % i,
         "text": f"doc {i}", "lang": "eng"}
        for i in range(5)
    ]

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        with conn:
            payload = "".join(json.dumps(r) + "\n" for r in rows)
            # one malformed frame: reference logs-and-continues (listen.py:119-127)
            payload += "not json at all\n"
            conn.sendall(payload.encode())
            _time.sleep(8)  # keep the connection open while the query polls

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = read_page_stream_tcp(spark, "127.0.0.1", port)
    q = (
        stream.writeStream.format("memory")
        .queryName("tcp_pages")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + 30
        got = 0
        while _time.time() < deadline:
            got = spark.sql("select * from tcp_pages").count()
            if got >= len(rows):
                break
            _time.sleep(0.5)
        assert got == len(rows)  # malformed frame dropped, all good rows in
        out = spark.sql("select url, lang, html from tcp_pages").collect()
        assert {r["url"] for r in out} == {r["url"] for r in rows}
        assert all(r["html"] is None for r in out)
    finally:
        q.stop()
        srv.close()


def test_alert_streaks_state_survives_restart(spark, tmp_path):
    """Boundary ALERT_THRESHOLD as applyInPandasWithState: a streak of
    over-limit rows spans two separate availableNow drains — the alert fires
    in the second run only because the streak count was recovered from the
    state store under the checkpoint."""
    import datetime

    from skyline_spark.streaming.ingest import alert_streaks

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def page(ts_min, lang, n_chars):
        return (
            f"https://x.example.org/{lang}/{ts_min}",
            datetime.datetime(2026, 8, 1, 0, ts_min),
            None,
            "x" * n_chars,
            lang,
        )

    from skyline_spark.sources.synth import PAGE_SCHEMA

    # batch 1: eng ends with TWO over-limit rows (threshold 3 — no alert
    # yet); spa never triggers
    b1 = [
        page(0, "eng", 50),
        page(1, "eng", 200),
        page(2, "eng", 200),
        page(0, "spa", 50),
        page(1, "spa", 60),
    ]
    spark.createDataFrame(b1, PAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_to_sink(
        alert_streaks(read_page_stream(spark, src), limit=100.0, alert_threshold=3),
        out,
        ckpt,
    )
    got = spark.read.schema(
        "lang string, warc_ts timestamp, value double, streak integer"
    ).parquet(out)
    assert got.count() == 0

    # batch 2: one more over-limit eng row completes the cross-run streak
    b2 = [page(3, "eng", 300), page(2, "spa", 70)]
    spark.createDataFrame(b2, PAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_to_sink(
        alert_streaks(read_page_stream(spark, src), limit=100.0, alert_threshold=3),
        out,
        ckpt,
    )
    rows = (
        spark.read.schema(
            "lang string, warc_ts timestamp, value double, streak integer"
        )
        .parquet(out)
        .collect()
    )
    assert len(rows) == 1
    r = rows[0]
    assert (r["lang"], r["streak"], r["value"]) == ("eng", 3, 300.0)
    assert r["warc_ts"] == datetime.datetime(2026, 8, 1, 0, 3)


def test_rolling_drift_alerts_match_batch_twin_across_restart(spark, tmp_path):
    """Streaming stddev_from_average: daily means accumulate in the state
    store across two availableNow drains; the anomalous day in run 2 is
    scored against baseline days closed in run 1 (state recovery), late
    rows for closed days are dropped, and every verdict matches a pure
    pandas batch twin."""
    import datetime

    import numpy as np
    import pandas as pd

    from skyline_spark.sources.synth import PAGE_SCHEMA
    from skyline_spark.streaming.ingest import (
        ROLLING_DRIFT_OUTPUT,
        rolling_drift_alerts,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def page(day, minute, lang, n_chars):
        return (
            f"https://x.example.org/{lang}/{day}/{minute}",
            datetime.datetime(2026, 8, 1 + day, 0, minute),
            None,
            "x" * n_chars,
            lang,
        )

    # eng: day d has rows (m-10, m, m+10) → daily mean m; m = 100 + d for
    # days 0-7, day 8 jumps to 500 (the anomaly), day 9 stays open.
    # spa: constant 50 → base_std 0 → sigma 0, never anomalous.
    def day_rows(day):
        m = 500 if day == 8 else 100 + day
        return [
            page(day, 0, "eng", m - 10),
            page(day, 1, "eng", m),
            page(day, 2, "eng", m + 10),
            page(day, 0, "spa", 50),
            page(day, 1, "spa", 50),
        ]

    def drain(rows):
        spark.createDataFrame(rows, PAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run_to_sink(
            rolling_drift_alerts(read_page_stream(spark, src)), out, ckpt
        )
        return (
            spark.read.schema(ROLLING_DRIFT_OUTPUT).parquet(out).toPandas()
        )

    got1 = drain([r for d in range(6) for r in day_rows(d)])
    # run 1 closes days 0-4 (day 5 open): 5 verdicts per lang
    assert sorted(got1["day"].astype(str).unique()) == [
        f"2026-08-0{d}" for d in range(1, 6)
    ]
    assert len(got1) == 10
    # first ROLLING_MIN_HISTORY closings have no baseline yet
    eng1 = got1[got1["lang"] == "eng"].sort_values("day")
    assert eng1["base_mean"].isna().tolist() == [True, True, True, False, False]
    assert not eng1["anomalous"].any()

    # run 2: days 6-9 plus a LATE row for closed day 3 (must be dropped —
    # day 3's verdict already emitted in run 1 and must not repeat)
    got2 = drain([r for d in range(6, 10) for r in day_rows(d)] + [
        page(3, 30, "eng", 10_000)
    ])

    # batch twin in pure pandas over all closed days
    eng = got2[got2["lang"] == "eng"].sort_values("day").reset_index(drop=True)
    assert len(eng) == 9  # days 0-8 closed exactly once
    daily = {d: (500.0 if d == 8 else 100.0 + d) for d in range(9)}
    for i, row in eng.iterrows():
        d = (row["day"] - datetime.date(2026, 8, 1)).days
        assert row["day_mean"] == daily[d]
        hist = [daily[j] for j in range(d)][-7:]
        if len([j for j in range(d)]) >= 3:
            base = np.asarray(hist[-7:], dtype=np.float64)
            assert row["base_mean"] == pytest.approx(base.mean(), abs=1e-9)
            # SAMPLE std, matching the batch twin detector_stddev_from_average
            std = base.std(ddof=1)
            dev = abs(daily[d] - base.mean())
            assert row["base_std"] == pytest.approx(std, abs=1e-9)
            if std > 0:
                want_sigma = dev / std
                assert row["sigma"] == pytest.approx(want_sigma, abs=1e-9)
                assert bool(row["anomalous"]) == (want_sigma > 3.0)
            else:
                # zero-variance baseline: ANY deviation alerts (|x-mean| >
                # 3*0 in the batch twin), none stays quiet
                assert bool(row["anomalous"]) == (dev > 0)
        else:
            assert pd.isna(row["base_mean"])

    # the jump day IS anomalous, and its baseline spans both runs
    d8 = eng[eng["day"] == datetime.date(2026, 8, 9)].iloc[0]
    assert bool(d8["anomalous"])
    # spa: zero variance baseline → sigma 0, never anomalous
    spa = got2[got2["lang"] == "spa"]
    assert len(spa) == 9 and not spa["anomalous"].any()
    assert (spa["sigma"].dropna() == 0.0).all()


def test_stream_dedup_within_watermark(spark, tmp_path):
    """The same url arriving twice within the watermark horizon is dropped;
    the output carries each url exactly once and keeps the earlier fetch."""
    from skyline_spark.streaming.ingest import stream_dedup_pages

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = synth_pages(spark, n_rows=400, n_days=2, defects=False)
    recrawl = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 5 MINUTES")
    )
    base.union(recrawl).repartition(4).write.mode("overwrite").parquet(src)

    stream = read_page_stream(spark, src, max_files_per_trigger=2)
    run_to_sink(stream_dedup_pages(stream, watermark="1 hour"), out, ckpt)

    got = spark.read.parquet(out)
    n_urls = base.select("url").distinct().count()
    assert got.count() == n_urls
    assert got.select("url").distinct().count() == n_urls
    # first fetch wins: no surviving row carries a recrawl timestamp unless
    # the recrawl landed in an earlier micro-batch than the original —
    # dropDuplicatesWithinWatermark keeps arrival-order first, so assert the
    # weaker, order-independent invariant: one of the two fetches survived
    joined = got.alias("g").join(base.alias("b"), "url")
    diffs = joined.select(
        (F.unix_timestamp("g.warc_ts") - F.unix_timestamp("b.warc_ts")).alias("d")
    )
    assert diffs.where(~F.col("d").isin(0, 300)).count() == 0


def test_stream_expectations_gate_matches_batch(spark, tmp_path):
    """The ingest expectation gate: kept + violations partition the input,
    the per-batch ledger sums to the batch-mode counts, reasons follow
    sequential semantics (NULL text outranks bad lang), and a re-drain with
    the same checkpoint adds nothing."""
    from skyline_spark.streaming.ingest import (
        run_enforced_to_sinks,
        stream_expectations,
    )

    src = str(tmp_path / "src")
    pages = synth_pages(spark, n_rows=3000, n_days=6, defects=True)
    pages.repartition(3).write.mode("overwrite").parquet(src)

    kept_dir = str(tmp_path / "kept")
    viol_dir = str(tmp_path / "viol")
    ledger_dir = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    stream = read_page_stream(spark, src, max_files_per_trigger=1)
    run_enforced_to_sinks(stream, kept_dir, viol_dir, ledger_dir, ckpt)

    batch = spark.read.parquet(src)
    flagged = stream_expectations(batch)
    want_drop = flagged.where(F.col("violation").isNotNull()).count()
    want_null = flagged.where(F.col("violation") == "text_not_null").count()
    want_lang = flagged.where(F.col("violation") == "lang_in_allowlist").count()
    want_warn = flagged.where(F.col("warned")).count()
    total = batch.count()
    assert want_null > 0 and want_lang > 0 and want_warn > 0  # defects fire

    kept = spark.read.parquet(kept_dir)
    viol = spark.read.parquet(viol_dir)
    assert kept.count() + viol.count() == total
    assert viol.count() == want_drop
    got_reasons = {
        r.violation: r.n
        for r in viol.groupBy("violation").agg(F.count("*").alias("n")).collect()
    }
    assert got_reasons == {
        "text_not_null": want_null,
        "lang_in_allowlist": want_lang,
    }
    ledger = spark.read.parquet(ledger_dir)
    sums = {
        r.expectation: (r.flagged, r.dropped)
        for r in ledger.groupBy("expectation")
        .agg(F.sum("flagged").alias("flagged"), F.sum("dropped").alias("dropped"))
        .collect()
    }
    assert sums["text_not_null"] == (want_null, want_null)
    assert sums["lang_in_allowlist"] == (want_lang, want_lang)
    assert sums["len_within_bound"] == (want_warn, 0)
    # multiple micro-batches actually exercised the per-batch ledger
    assert ledger.select("batch_id").distinct().count() >= 2

    # exactly-once: a second drain with the same checkpoint adds nothing
    stream2 = read_page_stream(spark, src, max_files_per_trigger=1)
    run_enforced_to_sinks(stream2, kept_dir, viol_dir, ledger_dir, ckpt)
    assert spark.read.parquet(kept_dir).count() == kept.count()
    assert spark.read.parquet(viol_dir).count() == viol.count()


def test_streaming_startup_self_test_gate(spark, tmp_path):
    """Stream-startup analog of the batch agent self-test (VERDICT r4 item 8):
    a poisoned detector registry must stop alert_streaks /
    rolling_drift_alerts at construction time — and must re-test on every
    build, so an unregister immediately unblocks the stream."""
    from skyline_spark.operators.detectors import (
        register_detector,
        unregister_detector,
    )
    from skyline_spark.sources.synth import PAGE_SCHEMA
    from skyline_spark.streaming.ingest import (
        alert_streaks,
        read_page_stream,
        rolling_drift_alerts,
    )

    src = str(tmp_path / "src")
    synth_pages(spark, n_rows=50).write.mode("overwrite").parquet(src)
    stream = read_page_stream(spark, src)

    def broken(ts, values, now, params):
        raise ValueError("boom")

    register_detector("broken_gate_probe", broken)
    try:
        with pytest.raises(RuntimeError, match="broken_gate_probe"):
            alert_streaks(stream, limit=100.0)
        with pytest.raises(RuntimeError, match="broken_gate_probe"):
            rolling_drift_alerts(stream)
        # explicit opt-out still builds (the batch gate has no such escape;
        # streams need one for kernel-free smoke tests)
        alert_streaks(stream, limit=100.0, self_test=False)
    finally:
        unregister_detector("broken_gate_probe")
    # registry healthy again -> both build without raising
    alert_streaks(stream, limit=100.0)
    rolling_drift_alerts(stream)
