"""t-digest: size invariant, rank-accuracy envelope, merge, serialization.

The k0 merging digest's weight cap (every merged centroid <= ceil(2n/delta)
unless it is a single exact repeated value) is PROVEN by construction and
asserted directly. The rank-accuracy envelope after arbitrary merges is the
published-empirical part (Dunning & Ertl 2019 validate merge accuracy
experimentally), so these tests hold the line the catalog verdicts rely on:
|true_rank(quantile(q)) - q*n| <= td_rank_tol(n) across random data, random
partition splits, and random merge fan-ins.
"""

from __future__ import annotations

import json
import math
import random

import numpy as np
from hypothesis import given, settings, strategies as st

from skyline_spark.operators.tdigest import TDigest, td_rank_tol


def _rank_bounds_of_value(sorted_vals: np.ndarray, x: float) -> tuple[int, int]:
    lo = int(np.searchsorted(sorted_vals, x, side="left")) + 1
    hi = int(np.searchsorted(sorted_vals, x, side="right"))
    return lo, hi


def _max_rank_error(values, sk: TDigest, qs=(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Distance from the target rank to the rank interval NEAREST the
    estimate: for an estimate between two observed values, the error is
    measured to the closer neighbour's rank (the estimate interpolates)."""
    s = np.sort(np.asarray(values, dtype=np.float64))
    n = len(s)
    worst = 0
    for q in qs:
        r = max(1, int(math.ceil(q * n)))
        est = sk.quantile(q)
        lo, hi = _rank_bounds_of_value(s, est)
        if hi < lo:  # est falls between observed values: ranks bracket it
            lo, hi = hi, lo + 1
        err = max(0, lo - r, r - hi)
        worst = max(worst, err)
    return worst


VALS = st.lists(st.integers(min_value=0, max_value=5_000), min_size=1, max_size=3000)


class TestSingleDigest:
    @settings(max_examples=60, deadline=None)
    @given(VALS, st.sampled_from([50.0, 100.0, 200.0]))
    def test_weight_cap_and_counts(self, vals, delta):
        sk = TDigest.from_values(vals, delta=delta)
        assert sk.n == len(vals)
        assert sum(sk.weights) == len(vals)
        assert sk.means == sorted(sk.means)
        cap = max(1, math.ceil(2.0 * len(vals) / delta))
        hist: dict = {}
        for v in vals:
            hist[v] = hist.get(v, 0) + 1
        for m, w in zip(sk.means, sk.weights):
            # cap, or a single exact repeated value heavier than the cap
            assert w <= cap or (m in hist and hist[m] >= w)
        # size stays O(delta): chunking at cap 2n/delta gives <= delta/2 + 1
        # full centroids plus duplicate-heavy exact ones
        assert sk.size() <= delta + 1

    @settings(max_examples=60, deadline=None)
    @given(VALS)
    def test_rank_envelope_single(self, vals):
        sk = TDigest.from_values(vals)
        assert _max_rank_error(vals, sk) <= td_rank_tol(len(vals))

    @settings(max_examples=30, deadline=None)
    @given(VALS)
    def test_extremes_exact(self, vals):
        sk = TDigest.from_values(vals)
        assert sk.quantile(0.0) == min(vals)
        assert sk.quantile(1.0) == max(vals)

    def test_empty_and_constant(self):
        sk = TDigest.from_value_counts([], [])
        assert sk.n == 0
        sk = TDigest.from_value_counts([7.0], [100_000])
        assert sk.quantile(0.5) == 7.0 and sk.size() == 1


class TestMerge:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=5_000), min_size=8, max_size=3000),
        st.integers(min_value=2, max_value=12),
        st.randoms(use_true_random=False),
    )
    def test_merge_many_envelope(self, vals, k, rng):
        """Random shuffle -> k contiguous shards -> one-level merge: the
        envelope must hold on the merged digest exactly as the catalog
        verdict asserts it per lang."""
        vals = list(vals)
        rng.shuffle(vals)
        shards = [vals[i::k] for i in range(k)]
        digests = [TDigest.from_values(s) for s in shards if s]
        merged = TDigest.merge_many(digests)
        assert merged.n == len(vals)
        assert sum(merged.weights) == len(vals)
        assert _max_rank_error(vals, merged) <= td_rank_tol(len(vals))

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=50), min_size=8, max_size=800),
        st.integers(min_value=2, max_value=6),
    )
    def test_merge_duplicate_heavy(self, vals, k):
        """Few distinct values (heavy duplicates) — the regime that broke
        naive GK merges; exact single-value centroids must keep the digest
        honest."""
        shards = [vals[i::k] for i in range(k)]
        merged = TDigest.merge_many([TDigest.from_values(s) for s in shards if s])
        assert _max_rank_error(vals, merged) <= td_rank_tol(len(vals))

    def test_merge_empty_and_mismatch(self):
        assert TDigest.merge_many([]).n == 0
        a = TDigest.from_values([1, 2, 3], delta=100.0)
        b = TDigest.from_values([4, 5], delta=200.0)
        try:
            TDigest.merge_many([a, b])
            raise AssertionError("expected delta-mismatch ValueError")
        except ValueError:
            pass


class TestSerialization:
    @settings(max_examples=30, deadline=None)
    @given(VALS)
    def test_json_round_trip(self, vals):
        sk = TDigest.from_values(vals)
        rt = TDigest.from_dict(json.loads(json.dumps(sk.to_dict())))
        assert rt.n == sk.n and rt.means == sk.means and rt.weights == sk.weights
        assert rt.quantile(0.5) == sk.quantile(0.5)
