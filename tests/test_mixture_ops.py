"""Randomized equivalence tests for the two-phase mixture operators.

The catalog parity tests prove `domain_cap_sample` / `mixture_token_budget`
match their DuckDB oracles on the fixed test corpus; these prove the
OPERATORS (operators/mixture.py) match their naive single-window
restatements on adversarial synthetic inputs — hot keys, zero weights,
quotas landing exactly on bucket boundaries — where the whole-bucket
admit/drop logic has its edge cases.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from skyline_spark.operators.mixture import cap_per_key, token_budget_fill

BUCKETS = 8  # small fan-out so boundary/edge buckets occur often


def _synth(seed: int, n: int, hot: bool) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    if hot:
        # one key owns ~70% of rows — the skew case the salted/bucketed
        # plans exist for
        keys = np.where(rng.random(n) < 0.7, 0, rng.integers(0, 5, n))
    else:
        keys = rng.integers(0, 5, n)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "key": np.char.add("k", keys.astype(str)),
            # adversarial hash: tiny range so bucket collisions + exact
            # boundary hits are common; still deterministic per row
            "h": rng.integers(0, 40, n).astype(np.int64),
            # zero weights included: rows that fit ANY remaining quota
            "w": rng.integers(0, 5, n).astype(np.int64),
        }
    )


def _naive_cap(pdf: pd.DataFrame, k: int) -> set[tuple]:
    out = []
    for key, grp in pdf.groupby("key"):
        g = grp.sort_values(["h", "doc_id"]).head(k)
        out += [
            (int(d), key, r + 1) for r, d in enumerate(g["doc_id"].tolist())
        ]
    return set(out)


def _naive_fill(pdf: pd.DataFrame, quotas: dict[str, int]) -> set[int]:
    kept = []
    pdf = pdf.assign(bucket=pdf["h"] % BUCKETS)
    for key, grp in pdf.groupby("key"):
        g = grp.sort_values(["bucket", "h", "doc_id"])
        cum = g["w"].cumsum()
        kept += g.loc[cum <= quotas[key], "doc_id"].tolist()
    return set(int(d) for d in kept)


@pytest.mark.parametrize("seed,hot", [(1, False), (2, True), (3, True)])
def test_cap_per_key_matches_naive(spark, seed, hot):
    pdf = _synth(seed, 400, hot)
    df = spark.createDataFrame(pdf)
    got = cap_per_key(
        df, key="key", order_col="h", tie_col="doc_id", k=7, salts=4
    ).select("doc_id", "key", "cap_rank")
    assert {
        (r.doc_id, r.key, r.cap_rank) for r in got.collect()
    } == _naive_cap(pdf, 7)


@pytest.mark.parametrize(
    "seed,hot,quota_hot",
    [
        (10, False, 30),
        (11, True, 30),
        # quota 0: only a leading zero-weight prefix may survive
        (12, True, 0),
        # huge quota: everything survives (no boundary bucket at all)
        (13, False, 10_000),
    ],
)
def test_token_budget_fill_matches_naive(spark, seed, hot, quota_hot):
    pdf = _synth(seed, 300, hot)
    quotas = {f"k{i}": (quota_hot if i == 0 else 17) for i in range(5)}
    df = spark.createDataFrame(pdf)
    quota = F.coalesce(
        *[F.when(F.col("key") == k, F.lit(v)) for k, v in sorted(quotas.items())]
    ).cast("long")
    got = token_budget_fill(
        df, stratum="key", weight_col="w", order_col="h",
        tie_col="doc_id", quota=quota, buckets=BUCKETS,
    )
    assert {int(r.doc_id) for r in got.collect()} == _naive_fill(pdf, quotas)


def test_token_budget_fill_null_stratum_kept(spark):
    """NULL-stratum rows form their own component under the default quota,
    exactly as the naive window form partitions them — a null-unsafe join
    would silently drop every one of them."""
    rows = [
        (0, "k0", 0, 5),
        (1, None, 0, 5),
        (2, None, 1, 5),
        (3, None, 2, 9),  # overflows the default quota of 12
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string, h long, w long")
    quota = F.coalesce(
        F.when(F.col("key") == "k0", F.lit(100)), F.lit(12)
    ).cast("long")
    got = token_budget_fill(
        df, stratum="key", weight_col="w", order_col="h",
        tie_col="doc_id", quota=quota, buckets=BUCKETS,
    )
    assert {int(r.doc_id) for r in got.collect()} == {0, 1, 2}


def test_reserved_column_collision_fails_fast(spark):
    df = spark.createDataFrame(
        [(0, "k", 1, 1, 9)], "doc_id long, key string, h long, w long, _bucket long"
    )
    with pytest.raises(ValueError, match="_bucket"):
        token_budget_fill(
            df, stratum="key", weight_col="w", order_col="h",
            tie_col="doc_id", quota=F.lit(10).cast("long"),
        )


def test_token_budget_fill_quota_on_exact_bucket_boundary(spark):
    """prior == quota exactly: the next bucket may contribute only its
    leading zero-weight rows — the edge the three-way bucket classification
    must get right."""
    rows = [
        # bucket 0 (h=0): weights sum to exactly 10
        (0, "k", 0, 4),
        (1, "k", 0, 6),
        # bucket 1 (h=1): leading zero-weight row, then overflow
        (2, "k", 1, 0),
        (3, "k", 1, 5),
        (4, "k", 1, 0),  # after the overflow row → dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, key string, h long, w long")
    got = token_budget_fill(
        df, stratum="key", weight_col="w", order_col="h",
        tie_col="doc_id", quota=F.lit(10).cast("long"), buckets=BUCKETS,
    )
    assert {int(r.doc_id) for r in got.collect()} == {0, 1, 2}


def test_rendezvous_reshard_minimal_movement(spark):
    """HRW property: growing N -> N+1 shards moves ~1/(N+1) of docs and
    every moved doc lands on the NEW shard (its weight there newly beats
    the old maximum; old-shard weights are unchanged)."""
    from skyline_spark.catalog.selection_queries import (
        HRW_N,
        HRW_N_NEW,
        shard_rendezvous_stability,
    )

    rows = shard_rendezvous_stability(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_docs for r in rows if r.moved)
    assert total > 0
    # binomial(1/9) around 11%: generous band, deterministic data
    assert 0.03 <= moved / total <= 0.25
    assert all(r.shard_new == HRW_N_NEW - 1 for r in rows if r.moved), (
        "a rendezvous move may only target the newly added shard"
    )
    assert {r.shard_old for r in rows} <= set(range(HRW_N))
