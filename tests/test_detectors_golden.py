"""Golden detector-parity tests — FIXTURES.md F2/F4.

Reproduces the reference's own oracle (`/root/reference/tests/
algorithms_test.py:19-77`): 86,401 points 1 s apart, all 1.0 except the final
point 1000.0, with ``now`` anchored to the last timestamp (the reference
mocks ``time()`` the same way). Every kernel must match the reference's
verdict, and the ensemble must reach CONSENSUS with datapoint == 1000.
"""

import numpy as np
import pytest

from skyline_spark.config import (
    STATUS_BORING,
    STATUS_FAIL,
    STATUS_OK,
    STATUS_STALE,
    STATUS_TOO_SHORT,
    EnsembleConfig,
)
from skyline_spark.operators import detectors
from skyline_spark.operators.detectors import DetectorParams
from skyline_spark.operators.ensemble import gate_status, run_ensemble

NOW = 1_400_000_000.0
FULL_DURATION = DetectorParams()  # reference windows


@pytest.fixture(scope="module")
def golden():
    """The reference's canonical anomalous series (algorithms_test.py:27-35)."""
    ts = np.arange(NOW - 86400, NOW + 1, 1.0)
    values = np.ones(86401)
    values[-1] = 1000.0
    return ts, values


@pytest.fixture(scope="module")
def flat():
    """Agent self-test series: flat 1.0 (analyzer/agent.py:86-104)."""
    ts = np.arange(NOW - 86400, NOW + 1, 1.0)
    values = np.ones(86401)
    return ts, values


def test_tail_avg(golden):
    _, values = golden
    # (1000 + 1 + 1) / 3 = 334 (algorithms_test.py:37-39)
    assert detectors.tail_avg(values) == 334


def test_tail_avg_short_series():
    assert detectors.tail_avg(np.array([5.0])) == 5.0
    assert detectors.tail_avg(np.array([5.0, 7.0])) == 7.0  # falls back to last


@pytest.mark.parametrize(
    "name",
    [
        "grubbs",
        "first_hour_average",
        "stddev_from_average",
        "stddev_from_moving_average",
        "mean_subtraction_cumulation",
        "least_squares",
        "histogram_bins",
    ],
)
def test_detector_triggers_on_golden(golden, name):
    ts, values = golden
    fn = getattr(detectors, name)
    assert fn(ts, values, NOW, FULL_DURATION) is True


def test_median_absolute_deviation_golden(golden):
    # MAD of the golden series is 0 (median deviation 0) → False by the
    # zero-guard (algorithms.py:111-112); the reference test omits MAD too.
    ts, values = golden
    assert detectors.median_absolute_deviation(ts, values, NOW, FULL_DURATION) is False


def test_ks_test_golden(golden):
    # probe window (last 10 min) is 599×1.0 + 1000.0 vs reference ~1.0 —
    # D is small (distributions mostly overlap) → False, as in the reference
    # (its golden test doesn't assert ks_test for the same reason).
    ts, values = golden
    assert detectors.ks_test(ts, values, NOW, FULL_DURATION) is False


def test_run_ensemble_golden(golden):
    ts, values = golden
    res = run_ensemble(ts, values, NOW)
    assert res.anomalous is True
    assert res.status == STATUS_FAIL
    # ≥ CONSENSUS detectors triggered (algorithms_test.py:76)
    assert sum(1 for v in res.ensemble if v) >= 6
    assert res.datapoint == 1000.0
    assert len(res.ensemble) == 9


def test_run_ensemble_order_is_pinned():
    assert list(detectors.ALGORITHMS) == [
        "histogram_bins",
        "first_hour_average",
        "stddev_from_average",
        "grubbs",
        "ks_test",
        "mean_subtraction_cumulation",
        "median_absolute_deviation",
        "stddev_from_moving_average",
        "least_squares",
    ]


def test_flat_series_not_anomalous(flat):
    # agent self-test: all 9 run clean, no consensus — but a 100-long flat
    # tail trips the Boring gate first, exactly like the reference analyzer
    # would (agent.py runs detectors directly, bypassing gates).
    ts, values = flat
    for name, fn in detectors.ALGORITHMS.items():
        v = fn(ts, values, NOW, FULL_DURATION)
        assert v is not None, f"{name} errored on flat series"
        assert v is not True, f"{name} fired on flat series"
    assert gate_status(ts, values, NOW, EnsembleConfig()) == STATUS_BORING


# ---------------------------------------------------------------------------
# F4 gate + zero-guard fixtures
# ---------------------------------------------------------------------------

def test_gate_too_short():
    cfg = EnsembleConfig(min_tolerable_length=5)
    ts = np.arange(NOW - 3, NOW + 1, 1.0)
    res = run_ensemble(ts, np.arange(4.0), NOW, cfg)
    assert res.status == STATUS_TOO_SHORT
    assert res.ensemble == [] and res.datapoint is None


def test_gate_stale():
    ts = np.arange(NOW - 2000, NOW - 1000, 1.0)  # newest point 1000s old
    values = np.random.RandomState(1).normal(size=ts.size)
    res = run_ensemble(ts, values, NOW)
    assert res.status == STATUS_STALE


def test_gate_boring():
    ts = np.arange(NOW - 200, NOW + 1, 1.0)
    values = np.concatenate([np.arange(101.0), np.full(100, 7.0)])
    res = run_ensemble(ts, values, NOW)
    assert res.status == STATUS_BORING


def test_mad_zero_guard():
    # median deviation 0 but non-constant tail → False, not error (F4 mad_zero)
    ts = np.arange(NOW - 200, NOW + 1, 1.0)
    values = np.ones(201)
    values[-1] = 50.0
    assert detectors.median_absolute_deviation(ts, values, NOW, FULL_DURATION) is False


def test_grubbs_std_zero_guard():
    ts = np.arange(NOW - 9, NOW + 1, 1.0)
    values = np.full(10, 3.0)
    assert detectors.grubbs(ts, values, NOW, FULL_DURATION) is False


def test_least_squares_too_few_errors():
    ts = np.array([NOW - 1, NOW])
    values = np.array([1.0, 2.0])
    assert detectors.least_squares(ts, values, NOW, FULL_DURATION) is False


def test_detector_error_returns_none():
    # empty series reaches the kernels only if gates are bypassed; the error
    # contract says exceptions → None (algorithms.py error contract)
    empty = np.array([])
    assert detectors.stddev_from_moving_average(empty, empty, NOW, FULL_DURATION) is None


def test_consensus_none_counts_toward_k():
    # anomalous iff count(False) <= n - k: 5 True + 4 None passes k=6 because
    # None is not False (algorithms.py:679-687)
    from skyline_spark.operators.ensemble import consensus_anomalous

    assert consensus_anomalous([True] * 5 + [None] * 4, 6) is True
    assert consensus_anomalous([True] * 5 + [False] * 4, 6) is False
    assert consensus_anomalous([True] * 6 + [False] * 3, 6) is True


def test_early_exit_pads_false():
    # a boring-ish but not gate-boring series where nothing fires: optimized
    # workflow must record 9 verdicts with the tail padded False
    rng = np.random.RandomState(3)
    ts = np.arange(NOW - 400, NOW + 1, 1.0)
    values = rng.normal(100.0, 1.0, ts.size)
    res = run_ensemble(ts, values, NOW)
    assert res.status == STATUS_OK
    assert len(res.ensemble) == 9
    assert res.anomalous is False


def test_optimized_vs_full_same_verdict(golden):
    ts, values = golden
    full = run_ensemble(ts, values, NOW, EnsembleConfig(run_optimized_workflow=False))
    opt = run_ensemble(ts, values, NOW, EnsembleConfig(run_optimized_workflow=True))
    assert full.anomalous == opt.anomalous
    assert full.datapoint == opt.datapoint


def test_latest_only_matches_explicit_latest_targets(spark):
    """latest_only selects each series' newest partition in-kernel, with
    identical verdicts to an explicit max-date targets_df."""
    import datetime
    from pyspark.sql import functions as F
    from skyline_spark.config import ValidationConfig
    from skyline_spark.plans.drift import drift_verdicts

    base = datetime.date(2020, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), f"s{k}", "value_avg", 0,
         float(10 + (i * (k + 3)) % 7) + (500.0 if (i == 19 and k == 1) else 0.0))
        for i in range(20)
        for k in range(4)
    ]
    stats = spark.createDataFrame(
        rows, "partition_date date, lang string, stat string, fingerprint long, value double"
    )
    samples = stats.limit(0).select(
        "partition_date", "lang", "stat", F.array().cast("array<double>").alias("sample")
    )
    cfg = ValidationConfig(min_history=4)
    targets = stats.groupBy("lang").agg(F.max("partition_date").alias("partition_date"))
    explicit = drift_verdicts(stats, samples, cfg, targets_df=targets,
                              drift_stats=["value_avg"]).collect()
    latest = drift_verdicts(stats, samples, cfg, latest_only=True,
                            drift_stats=["value_avg"]).collect()
    key = lambda r: (r["partition_date"], r["lang"], r["stat"])  # noqa: E731
    e = {key(r): (r["status"], r["anomalous"], tuple(r["ensemble"])) for r in explicit}
    l = {key(r): (r["status"], r["anomalous"], tuple(r["ensemble"])) for r in latest}
    assert e == l
    assert len(l) == 4
    assert all(d == base + datetime.timedelta(days=19) for d, _, _ in l)


def test_derivative_stats_analyze_the_rate(spark):
    """Counter-like stats marked in derivative_stats are transformed to the
    non-negative derivative before the ensemble (analyse_derivatives,
    skyline_functions.py:1044-1100): a monotonic counter with a rate spike
    FAILs on the rate; a counter reset drops that point from analysis."""
    import datetime
    from pyspark.sql import functions as F
    from skyline_spark.config import ValidationConfig
    from skyline_spark.plans.drift import drift_verdicts

    base = datetime.date(2020, 1, 1)
    # counter: +10/day for 29 days, then +500 on the last day
    total, rows = 0.0, []
    for i in range(30):
        total += 500.0 if i == 29 else 10.0 + (i % 3)
        rows.append((base + datetime.timedelta(days=i), "eng", "row_count_total", 0, total))
    stats = spark.createDataFrame(
        rows, "partition_date date, lang string, stat string, fingerprint long, value double"
    )
    samples = stats.limit(0).select(
        "partition_date", "lang", "stat", F.array().cast("array<double>").alias("sample")
    )
    cfg = ValidationConfig(min_history=4, derivative_stats=frozenset({"row_count_total"}))
    out = drift_verdicts(stats, samples, cfg, latest_only=True,
                         drift_stats=["row_count_total"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["datapoint"] == 500.0          # the RATE, not the counter value
    assert r["status"] == "FAIL"            # rate spike reaches consensus
    # raw counter form: monotonic ramp — the spike is within trend noise for
    # most kernels, no consensus
    raw = drift_verdicts(stats, samples, ValidationConfig(min_history=4),
                         latest_only=True, drift_stats=["row_count_total"]).collect()
    assert raw[0]["datapoint"] == total

    # counter reset on the target day → the point is dropped, no verdict
    rows2 = list(rows[:-1]) + [(base + datetime.timedelta(days=29), "eng", "row_count_total", 0, 1.0)]
    stats2 = spark.createDataFrame(
        rows2, "partition_date date, lang string, stat string, fingerprint long, value double"
    )
    out2 = drift_verdicts(stats2, samples, cfg, latest_only=True,
                          drift_stats=["row_count_total"]).collect()
    assert out2 == [] or out2[0]["partition_date"] != base + datetime.timedelta(days=29)


def test_ewm_closed_form_matches_pandas():
    """The relational EWM restatement (catalog detector_stddev_from_moving_
    average) computes the last-index ewm mean/std as pow-weighted moments;
    pandas ewm(com=50, adjust=True) / std(bias=False) is the reference
    semantics (analyzer/algorithms.py:227-231). The two must agree to float
    precision on an arbitrary series."""
    import pandas as pd

    rng = np.random.RandomState(7)
    for n in (5, 60, 2000):
        x = rng.gamma(2.0, 25.0, size=n)
        s = pd.Series(x)
        ref_mean = s.ewm(com=50).mean().iloc[-1]
        ref_std = s.ewm(com=50).std(bias=False).iloc[-1]

        w = (50.0 / 51.0) ** np.arange(n - 1, -1, -1.0)
        sw, sw2 = w.sum(), (w * w).sum()
        m = (w * x).sum() / sw
        var_b = (w * x * x).sum() / sw - m * m
        std = np.sqrt(max(0.0, var_b * (sw * sw / (sw * sw - sw2))))

        assert abs(m - ref_mean) < 1e-9 * max(1.0, abs(ref_mean))
        assert abs(std - ref_std) < 1e-8 * max(1.0, abs(ref_std))
