"""Structured-Streaming ingestion — the Horizon restatement (SURVEY §2.4).

The reference's ingest path (`horizon/listen.py` TCP/UDP sources →
`horizon/worker.py` skip-list filter, late-data drop, Redis APPEND) becomes
a declarative streaming pipeline:

    readStream (file/kafka/socket source, page schema)
      → skip-list filter            (worker.py:79-124 → rlike predicate)
      → late-data watermark         (worker.py:205-206 MAX_RESOLUTION drop →
                                     withWatermark, state-bounded)
      → windowed per-partition stats (the Analyzer sweep, incremental)
      → append sink                 (worker.py:208-219 Redis APPEND →
                                     parquet/Iceberg appends, exactly-once
                                     via checkpointLocation)

Backpressure replaces the reference's drop-chunk-when-queue-full
(`listen.py:202-218`): Spark's source rate limiting (maxFilesPerTrigger)
bounds in-flight work instead of shedding it.

Scale notes: stateful aggregation state is bounded by the watermark; the
shuffle key is (window, lang) — the same partition axis as the batch
engine, so a backfilled day and a streamed day produce identical stat rows
(tested in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.synth import PAGE_SCHEMA

__all__ = [
    "read_page_stream",
    "read_page_stream_tcp",
    "UdpJsonBridge",
    "UdpMsgpackBridge",
    "TcpPickleBridge",
    "read_page_stream_udp",
    "TCP_WIRE_SCHEMA",
    "apply_skip_list",
    "stream_dedup_pages",
    "streaming_partition_stats",
    "alert_streaks",
    "run_to_sink",
]

#: reference SKIP_LIST semantics (settings.py:62-78): drop metrics whose name
#: matches any pattern; DO_NOT_SKIP_LIST wins over SKIP_LIST
DEFAULT_SKIP_PATTERNS = [r"^https://skip\.", r"\.invalid\.example\.org/"]
# negative lookbehind: without it the keep pattern is an unanchored
# substring match of every *.invalid.example.org url too, and — keep
# winning over skip — the invalid-host skip rule could never drop anything
DEFAULT_KEEP_PATTERNS = [r"(?<!invalid)\.example\.org/"]


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-based streaming source of page rows (the sandbox stand-in for the
    Kafka/socket source a crawler fleet would feed)."""
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


#: TCP wire schema — the Horizon listener receives (metric, datapoint)
#: tuples, not whole documents (`horizon/listen.py:66-150`); the page analog
#: ships the light columns and leaves html to the bulk path
TCP_WIRE_SCHEMA = (
    "url string, warc_ts timestamp, text string, lang string"
)


def read_page_stream_tcp(
    spark: SparkSession, host: str = "127.0.0.1", port: int = 9009
) -> DataFrame:
    """TCP socket streaming source of newline-JSON page rows.

    The genuine-TCP restatement of the reference's pickle listener
    (`horizon/listen.py:66-150`): Spark's socket source reads length-framed
    lines where the reference read pickle frames; ``from_json`` against the
    wire schema replaces ``unpickle``; malformed frames become null rows and
    are dropped (the reference logs-and-continues, `listen.py:119-127`).
    html is not shipped on this path — the reference's TCP path carries
    metric datapoints, not payloads — so downstream stats see html as null.
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = raw.select(F.from_json("value", TCP_WIRE_SCHEMA).alias("p")).select("p.*")
    return parsed.where(F.col("url").isNotNull()).select(
        "url",
        "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )


class UdpJsonBridge:
    """Genuine-UDP ingest bridge — the restatement of the reference's UDP
    msgpack listener (`horizon/listen.py:229-264`).

    Spark has no UDP streaming source, so the bridge plays the role the
    reference's listener process plays: it receives datagrams and hands them
    to the engine's ingest queue. Here each datagram is one newline-JSON page
    row (msgpack is the reference's wire format; SURVEY §2.10 maps
    msgpack→Arrow/parquet, and JSON is the self-describing datagram analog);
    rows are batched and published ATOMICALLY (tmp-write + rename) into a
    staging directory that ``read_page_stream_udp`` consumes with the file
    source — rename-visibility is what makes the hand-off exactly-once on the
    Spark side. Oversized/garbled datagrams are dropped exactly like the
    reference's try/except-continue (`listen.py:243-255`); queue-full load
    shedding (`listen.py:202-218`) becomes source rate limiting instead.
    """

    def __init__(self, staging_dir: str, host: str = "127.0.0.1", port: int = 0,
                 flush_rows: int = 64, flush_secs: float = 0.25):
        import os
        import socket
        import threading

        os.makedirs(staging_dir, exist_ok=True)
        self.staging_dir = staging_dir
        self.flush_rows = flush_rows
        self.flush_secs = flush_secs
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((host, port))
        self._sock.settimeout(0.05)
        self.host, self.port = self._sock.getsockname()
        import uuid

        self._stop = threading.Event()
        # unique per-instance prefix: a restarted bridge on the same staging
        # dir must never rename over a batch file the checkpointed file
        # source has already recorded as read — that would silently lose
        # the new rows (the old name stays "processed")
        self._uid = uuid.uuid4().hex[:8]
        self._seq = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _publish(self, lines: list[bytes]) -> None:
        import os

        tmp = os.path.join(self.staging_dir, f".batch-{self._uid}-{self._seq}.json.tmp")
        dst = os.path.join(self.staging_dir, f"batch-{self._uid}-{self._seq}.json")
        with open(tmp, "wb") as f:
            f.write(b"\n".join(lines) + b"\n")
        os.rename(tmp, dst)  # atomic: the file source never sees a partial file
        self._seq += 1

    def _run(self) -> None:
        import socket
        import time

        buf: list[bytes] = []
        last = time.monotonic()
        while not self._stop.is_set():
            try:
                datagram, _ = self._sock.recvfrom(65536)
                buf.extend(self._decode(datagram))
            except socket.timeout:
                pass
            except OSError:
                break
            now = time.monotonic()
            if buf and (len(buf) >= self.flush_rows or now - last >= self.flush_secs):
                self._publish(buf)
                buf, last = [], now
        if buf:
            self._publish(buf)

    def _decode(self, datagram: bytes) -> list[bytes]:
        """One datagram → zero-or-more staging JSON lines. Default wire
        format: the datagram IS a JSON line. Subclasses override for binary
        wire formats; malformed datagrams must return [] (the reference's
        try/except-continue, `listen.py:243-255`)."""
        line = datagram.strip()
        return [line] if line else []

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close()


class UdpMsgpackBridge(UdpJsonBridge):
    """Format-faithful UDP ingest: one MessagePack-encoded row per datagram,
    exactly the reference's wire (`horizon/listen.py:229-264` ``unpackb``
    per datagram). Rows are ``(url, warc_ts_epoch_seconds, text, lang)``
    tuples — the page analog of Skyline's ``(metric, (ts, value))`` — and
    garbled datagrams are dropped like the reference's except-continue."""

    def _decode(self, datagram: bytes) -> list[bytes]:
        from .wire import msgpack_unpackb, rows_to_json_lines

        try:
            row = msgpack_unpackb(datagram)
        except Exception:
            return []
        return rows_to_json_lines([row])


class TcpPickleBridge:
    """Format-faithful TCP ingest: Graphite-style length-prefixed pickle
    frames through the restricted unpickler — the reference's
    ``listen_pickle`` loop (`horizon/listen.py:110-227`, SafeUnpickler
    allowlist included). Each frame holds a LIST of page tuples; decoded
    rows land in the same atomic staging directory the file source reads
    (``read_page_stream_udp``), which plays the listener→worker queue's
    role. A poisoned or truncated frame drops the connection and the
    listener re-accepts, exactly like the reference's
    incoming-connection-dropped handling (`listen.py:162-166`)."""

    def __init__(self, staging_dir: str, host: str = "127.0.0.1", port: int = 0):
        import os
        import socket
        import threading
        import uuid

        os.makedirs(staging_dir, exist_ok=True)
        self.staging_dir = staging_dir
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(5)
        self._sock.settimeout(0.1)
        self.host, self.port = self._sock.getsockname()
        self._uid = uuid.uuid4().hex[:8]
        self._seq = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    _publish = UdpJsonBridge._publish

    def _run(self) -> None:
        import socket

        from .wire import read_frames_from_socket, rows_to_json_lines

        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            try:
                conn.settimeout(5.0)
                for bunch in read_frames_from_socket(conn):
                    lines = rows_to_json_lines(bunch)
                    if lines:
                        self._publish(lines)
            except Exception:
                # unsafe pickle / garbled frame / peer timeout: drop the
                # connection, keep listening (listen.py:162-166)
                pass
            finally:
                conn.close()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
        self._sock.close()


def read_page_stream_udp(
    spark: SparkSession, staging_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming page rows from a :class:`UdpJsonBridge` staging directory.

    Same wire schema as the TCP path (the reference's UDP listener carries
    the same `(metric, datapoint)` tuples as TCP — `horizon/listen.py:240`);
    malformed datagrams parse to null urls and are dropped.
    """
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(staging_dir)
    )
    parsed = raw.select(F.from_json("value", TCP_WIRE_SCHEMA).alias("p")).select("p.*")
    return parsed.where(F.col("url").isNotNull()).select(
        "url",
        "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )


def apply_skip_list(
    pages: DataFrame,
    skip_patterns: list[str] | None = None,
    keep_patterns: list[str] | None = None,
) -> DataFrame:
    """Skip-list filter on url (horizon/worker.py:79-124): a row is dropped
    when it matches a SKIP pattern unless it matches a DO_NOT_SKIP pattern."""
    skip_patterns = DEFAULT_SKIP_PATTERNS if skip_patterns is None else skip_patterns
    keep_patterns = DEFAULT_KEEP_PATTERNS if keep_patterns is None else keep_patterns
    skip = F.lit(False)
    for p in skip_patterns:
        skip = skip | F.col("url").rlike(p)
    keep = F.lit(False)
    for p in keep_patterns:
        keep = keep | F.col("url").rlike(p)
    return pages.where(~skip | keep)


def stream_dedup_pages(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup of re-crawled pages on the ingest path — the
    streaming twin of the batch ``dedup_exact`` query and of the reference's
    TTL-keyed suppression pattern (`analyzer.py:1871`: a Redis TTL key
    suppresses repeats of the same key within EXPIRATION_TIME).

    ``dropDuplicatesWithinWatermark`` keeps the FIRST row per url and expires
    a url's state once the event-time watermark passes it, so state is
    bounded by the url cardinality of the horizon — never by stream length.
    At crawl scale the horizon is the recrawl TTL: the same url fetched again
    inside it is a duplicate and is dropped; a fetch after the horizon is a
    legitimate re-crawl and passes. The dedup state is hash-partitioned on
    url across executors (one shuffle), and survives restarts through the
    query checkpoint like all streaming state here.
    """
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def streaming_partition_stats(
    pages: DataFrame, watermark: str = "2 days"
) -> DataFrame:
    """Incremental per-(day, lang) stats with late-data handling.

    The watermark is the declarative form of the reference's
    ``ts < now - MAX_RESOLUTION`` drop (horizon/worker.py:205-206,
    settings.py:895): rows later than the watermark are discarded and state
    for closed windows is reclaimed.
    """
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 day").alias("w"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.avg(F.col("text").isNull().cast("double")).alias("null_rate_text"),
            F.avg(F.length("text")).alias("text_len_avg"),
            F.approx_count_distinct("url").alias("url_approx_distinct"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("partition_date"),
            "lang",
            "row_count",
            "null_rate_text",
            "text_len_avg",
            "url_approx_distinct",
        )
    )


def run_to_sink(
    stats: DataFrame, out_path: str, checkpoint_path: str
) -> None:
    """Drain all available input to a parquet append sink, exactly-once via
    the checkpoint (the Redis APPEND + Roomba pairing, minus the races)."""
    (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


# ---------------------------------------------------------------------------
# stateful streaming: Boundary ALERT_THRESHOLD streaks
# ---------------------------------------------------------------------------

ALERT_STREAK_OUTPUT = "lang string, warc_ts timestamp, value double, streak integer"
ALERT_STREAK_STATE = "streak integer"


def _require_healthy_kernels(op_name: str) -> None:
    """Stream-startup analog of ``validate()``'s agent self-test gate
    (reference: every long-running agent self-tests its algorithm set before
    touching work, `analyzer/agent.py:86-104`): refuse to build a streaming
    query while the detector registry holds a kernel that errors — or fires —
    on the flat reference series. The streaming twins' alerts feed the same
    downstream consumers as the batch ensemble (Mirage re-checks re-run the
    full registry on whatever the stream surfaces), so a poisoned registry
    must stop the stream at construction, not at the first micro-batch.
    ~100 ms of driver-side numpy; no Spark job is launched. Re-runs fresh on
    every call so a re-registered kernel under an unchanged name re-tests
    (same contract as the batch gate, `plans/validate.py`)."""
    from ..operators.ensemble import kernel_self_test

    bad = kernel_self_test()
    if bad:
        raise RuntimeError(
            f"kernel self-test failed for {bad!r}: a registered detector "
            f"errors or fires on a flat series; fix or unregister it before "
            f"starting {op_name} (reference: analyzer/agent.py:86-104)"
        )


def alert_streaks(
    pages: DataFrame, limit: float, alert_threshold: int = 3, self_test: bool = True
) -> DataFrame:
    """Boundary's ALERT_THRESHOLD k-consecutive-triggers rule
    (`boundary/boundary_algorithms.py:287-383`) as a custom *stateful*
    streaming operator: per ``lang``, count consecutive rows whose
    ``length(text)`` exceeds ``limit`` and emit one alert row the moment a
    run reaches ``alert_threshold``.

    This is the ``applyInPandasWithState`` restatement of the reference's
    Redis trigger-count keys: the streak survives micro-batch boundaries AND
    query restarts (it lives in the state store under the sink checkpoint),
    which the batch twin (`boundary_alert_threshold`, gaps-and-islands over
    run history) cannot express incrementally.

    Rows are ordered by ``warc_ts`` *within* each micro-batch; cross-batch
    order is source order, as with any arbitrary-stateful Spark operator.
    The streak scan itself is vectorized (cumulative-maximum reset trick),
    not a per-row Python loop; state per key is a single int, so state-store
    size is O(distinct langs).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if self_test:
        _require_healthy_kernels("alert_streaks")

    def update(key, pdfs, state):
        carry = state.get[0] if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            rows = (
                pd.concat(frames).sort_values("warc_ts", kind="mergesort")
                if len(frames) > 1
                else frames[0].sort_values("warc_ts", kind="mergesort")
            )
            trig = rows["value"].to_numpy() > limit
            n = len(trig)
            idx = np.arange(n)
            # streak length at each position: distance since the last
            # non-trigger, plus the carried-in streak before the first one
            last_reset = np.maximum.accumulate(np.where(~trig, idx, -1))
            streaks = idx - last_reset + np.where(last_reset == -1, carry, 0)
            hit = trig & (streaks == alert_threshold)
            carry = int(streaks[-1]) if trig[-1] else 0
            if hit.any():
                out = rows.loc[hit, ["warc_ts", "value"]].copy()
                out.insert(0, "lang", key[0])
                out["streak"] = streaks[hit].astype("int32")
                yield out
        state.update((carry,))

    ev = pages.select(
        "lang", "warc_ts", F.length("text").cast("double").alias("value")
    )
    return ev.groupBy("lang").applyInPandasWithState(
        update,
        ALERT_STREAK_OUTPUT,
        ALERT_STREAK_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# stateful streaming: rolling stddev_from_average drift detection
# ---------------------------------------------------------------------------

ROLLING_DRIFT_OUTPUT = (
    "lang string, day date, n bigint, day_mean double, "
    "base_mean double, base_std double, sigma double, anomalous boolean"
)
ROLLING_DRIFT_STATE = (
    "days array<long>, means array<double>, "
    "open_day long, open_cnt long, open_sum double"
)

#: verdicts need at least this many closed baseline days before firing
ROLLING_MIN_HISTORY = 3


def rolling_drift_alerts(
    pages: DataFrame,
    lookback_days: int = 7,
    sigma_t: float = 3.0,
    self_test: bool = True,
) -> DataFrame:
    """The analyzer's continuously-running ``stddev_from_average`` detector
    (`analyzer/algorithms.py:118-135` semantics, `analyzer/analyzer.py`'s
    always-on loop) as a custom *stateful* streaming operator: per ``lang``,
    daily mean text lengths accumulate in the state store; when a later
    day's first row arrives the open day closes and its mean is scored
    against the trailing ``lookback_days`` closed days — ``sigma`` standard
    deviations from the rolling baseline, anomalous above ``sigma_t``.

    State per key is O(lookback): two parallel arrays of (day, mean) plus
    the open day's partial count/sum — a mergeable running aggregate, never
    raw rows. Late rows for an already-closed day are dropped, the
    imperative restatement of the watermark in
    :func:`streaming_partition_stats`. Verdicts only fire with
    ``ROLLING_MIN_HISTORY`` closed baseline days, mirroring the batch
    plan's TOO_SHORT gate; earlier closings emit ``anomalous = false`` with
    null baseline columns so day closure is still observable downstream.

    The batch twin is the ``detector_stddev_from_average`` catalog query /
    the drift plan's 3-sigma kernel; the streaming form is incremental and
    restart-safe (state lives under the sink checkpoint), which a batch
    window cannot express.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if self_test:
        _require_healthy_kernels("rolling_drift_alerts")

    def update(key, pdfs, state):
        if state.exists:
            days, means, open_day, open_cnt, open_sum = state.get
            days = list(days)
            means = list(means)
        else:
            days, means, open_day, open_cnt, open_sum = [], [], -1, 0, 0.0

        frames = [pdf for pdf in pdfs if len(pdf)]
        out_rows = []
        if frames:
            rows = pd.concat(frames) if len(frames) > 1 else frames[0]
            day = (
                rows["warc_ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
            )
            val = rows["value"].to_numpy(dtype=np.float64)
            order = np.argsort(day, kind="mergesort")
            day, val = day[order], val[order]
            uniq, start = np.unique(day, return_index=True)
            sums = np.add.reduceat(val, start)
            cnts = np.diff(np.append(start, len(val)))
            for d, c, s in zip(uniq.tolist(), cnts.tolist(), sums.tolist()):
                if open_day == -1:
                    open_day, open_cnt, open_sum = d, c, s
                    continue
                if d < open_day:
                    continue  # late data for a closed day: dropped
                if d == open_day:
                    open_cnt += c
                    open_sum += s
                    continue
                # d > open_day: close the open day and score it
                day_mean = open_sum / open_cnt
                if len(means) >= ROLLING_MIN_HISTORY:
                    base = np.asarray(means[-lookback_days:], dtype=np.float64)
                    base_mean = float(base.mean())
                    # SAMPLE std (ddof=1), matching the batch twin
                    # detector_stddev_from_average (stddev_samp); and a
                    # zero-std baseline means ANY deviation is anomalous —
                    # |x - mean| > 3*0 is True for x != mean in the twin,
                    # so a constant baseline followed by a jump must alert,
                    # not be forced quiet
                    base_std = float(base.std(ddof=1)) if len(base) > 1 else 0.0
                    dev = abs(day_mean - base_mean)
                    if base_std > 0.0:
                        sigma = dev / base_std
                        alert = sigma > sigma_t
                    else:
                        sigma = float("inf") if dev > 0.0 else 0.0
                        alert = dev > 0.0
                    out_rows.append(
                        (key[0], open_day, open_cnt, day_mean,
                         base_mean, base_std, sigma, alert)
                    )
                else:
                    out_rows.append(
                        (key[0], open_day, open_cnt, day_mean,
                         None, None, None, False)
                    )
                days.append(open_day)
                means.append(day_mean)
                if len(days) > lookback_days:
                    days = days[-lookback_days:]
                    means = means[-lookback_days:]
                open_day, open_cnt, open_sum = d, c, s

        state.update((days, means, open_day, open_cnt, open_sum))
        if out_rows:
            out = pd.DataFrame(
                out_rows,
                columns=[
                    "lang", "day", "n", "day_mean",
                    "base_mean", "base_std", "sigma", "anomalous",
                ],
            )
            out["day"] = pd.to_datetime(out["day"], unit="D").dt.date
            yield out

    ev = pages.select(
        "lang", "warc_ts", F.length("text").cast("double").alias("value")
    )
    return ev.groupBy("lang").applyInPandasWithState(
        update,
        ROLLING_DRIFT_OUTPUT,
        ROLLING_DRIFT_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming expectation gate (enforcement on the ingest path)
# ---------------------------------------------------------------------------

#: ordered expectation suite for the ingest gate — the streaming twin of the
#: batch ``expectations_enforce`` catalog query's action model (warn counts,
#: drop removes), restricted to the STATELESS expectations: uniqueness on a
#: stream is :func:`stream_dedup_pages` (watermarked state), composed after
#: this gate.
EXPECT_ALLOWED_LANGS = ("eng", "deu", "fra", "spa", "zho")
EXPECT_LEN_BOUND = 2000


def stream_expectations(
    pages: DataFrame,
    allowed_langs: tuple[str, ...] = EXPECT_ALLOWED_LANGS,
    len_bound: int = EXPECT_LEN_BOUND,
) -> DataFrame:
    """Row-level expectation verdicts as pure projection columns (works
    identically on a stream or a batch frame — no state, no shuffle):
    ``violation`` carries the FIRST failing drop-expectation's name (NULL =
    row passes every drop rule, the sequential-semantics twin of the batch
    ledger), ``warned`` marks rows flagged by the warn-only length bound.

    The caller routes on ``violation``: NULL rows continue down the
    pipeline, violating rows land in the violation sidecar with their
    reason — the north-star violation-row shape, applied at ingest before
    anything is persisted.
    """
    f_null = F.col("text").isNull()
    f_lang = ~f_null & ~F.col("lang").isin(*allowed_langs)
    violation = (
        F.when(f_null, F.lit("text_not_null"))
        .when(f_lang, F.lit("lang_in_allowlist"))
        .otherwise(F.lit(None).cast("string"))
    )
    warned = violation.isNull() & (F.length("text") > len_bound)
    return pages.withColumn("violation", violation).withColumn("warned", warned)


def run_enforced_to_sinks(
    pages: DataFrame,
    kept_dir: str,
    violations_dir: str,
    ledger_dir: str,
    checkpoint_path: str,
) -> None:
    """Drain a page stream through the expectation gate into three sinks:
    clean rows (kept), the violation sidecar (reason-tagged rows), and the
    per-micro-batch ledger (batch_id, expectation, action, flagged,
    dropped). One ``foreachBatch`` evaluates the gate ONCE per batch and
    fans out.

    Delivery contract: a COMPLETED drain is stable — re-drains with the
    same checkpoint reprocess nothing (pinned in test_streaming). Unlike
    :func:`run_to_sink`'s native file sink (whose commit log makes appends
    exactly-once), a crash BETWEEN the three appends and the batch commit
    replays that batch on restart — at-least-once across a failure. The
    production hardening is standard: write each sink under a
    ``batch_id=``-partitioned path (idempotent overwrite per batch) or a
    transactional table format; the ledger's ``batch_id`` column is
    already the dedup key a consumer needs either way."""

    def _enforce(batch: DataFrame, batch_id: int) -> None:
        flagged = stream_expectations(batch).persist()
        try:
            kept = flagged.where(F.col("violation").isNull()).drop(
                "violation", "warned"
            )
            kept.write.mode("append").parquet(kept_dir)
            (
                flagged.where(F.col("violation").isNotNull())
                .select("url", "warc_ts", "lang", "violation")
                .write.mode("append")
                .parquet(violations_dir)
            )
            counts = flagged.agg(
                F.sum((F.col("violation") == "text_not_null").cast("long")).alias("d1"),
                F.sum((F.col("violation") == "lang_in_allowlist").cast("long")).alias("d2"),
                F.sum(F.col("warned").cast("long")).alias("w3"),
            ).first()
            ledger = batch.sparkSession.createDataFrame(
                [
                    (batch_id, "text_not_null", "drop", counts.d1 or 0, counts.d1 or 0),
                    (batch_id, "lang_in_allowlist", "drop", counts.d2 or 0, counts.d2 or 0),
                    (batch_id, "len_within_bound", "warn", counts.w3 or 0, 0),
                ],
                "batch_id long, expectation string, action string, "
                "flagged long, dropped long",
            )
            ledger.write.mode("append").parquet(ledger_dir)
        finally:
            flagged.unpersist()

    (
        pages.writeStream.foreachBatch(_enforce)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
