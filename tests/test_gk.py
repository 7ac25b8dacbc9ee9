"""Greenwald-Khanna sketch: rank-error and merge guarantees.

The whole point of carrying a GK sketch in the checkpoint is the bound —
so the tests ASSERT the bound, not samples of it: every quantile read off
a single sketch must be within eps*n ranks of exact, merged sketches
within 2*eps*n across random merge trees, and serialization must be
lossless.
"""

from __future__ import annotations

import json
import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from skyline_spark.operators.gk import GKSketch


def _rank_bounds_of_value(sorted_vals: np.ndarray, x: float) -> tuple[int, int]:
    """[lowest, highest] 1-based rank positions occupied by value x."""
    lo = int(np.searchsorted(sorted_vals, x, side="left")) + 1
    hi = int(np.searchsorted(sorted_vals, x, side="right"))
    return lo, hi


def _max_rank_error(values, sk: GKSketch, qs=(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)) -> float:
    s = np.sort(np.asarray(values, dtype=np.float64))
    n = len(s)
    worst = 0.0
    for q in qs:
        r = max(1, int(np.ceil(q * n)))
        est = sk.quantile(q)
        lo, hi = _rank_bounds_of_value(s, est)
        err = max(0, lo - r, r - hi)  # distance from target rank to the
        worst = max(worst, err)       # rank interval the value occupies
    return worst


class TestSingleSketch:
    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=2000),
        st.sampled_from([0.01, 0.05, 0.1]),
    )
    def test_rank_error_within_eps(self, vals, eps):
        sk = GKSketch.from_values(vals, eps=eps)
        assert sk.n == len(vals)
        assert _max_rank_error(vals, sk) <= eps * len(vals) + 1

    def test_min_max_exact(self):
        vals = [17, 3, 3, 99, 42] * 50
        sk = GKSketch.from_values(vals, eps=0.05)
        assert sk.quantile(0.0) == 3.0
        assert sk.quantile(1.0) == 99.0

    def test_size_bounded(self):
        rng = np.random.RandomState(7)
        vals = rng.randint(0, 1_000_000, size=200_000)
        eps = 0.01
        sk = GKSketch.from_values(vals, eps=eps)
        # O((1/eps) log(eps n)) with small constants; 200k exact entries
        # would be ~181k distinct values
        assert sk.size < 3 / eps
        assert _max_rank_error(vals, sk) <= eps * len(vals) + 1

    def test_invariant_holds(self):
        rng = np.random.RandomState(3)
        vals = rng.randint(0, 5000, size=20_000)
        sk = GKSketch.from_values(vals, eps=0.02)
        cap = max(1, int(2 * sk.eps * sk.n))
        assert all(g + d <= cap for g, d in zip(sk.g, sk.d))
        assert sum(sk.g) == sk.n

    def test_bad_inputs_rejected(self):
        with pytest.raises(ValueError):
            GKSketch.from_value_counts([1.0, 1.0], [2, 3])  # not ascending
        with pytest.raises(ValueError):
            GKSketch.from_value_counts([1.0], [0])  # zero count
        with pytest.raises(ValueError):
            GKSketch.from_value_counts([1.0, 2.0], [1])  # length mismatch


class TestMerge:
    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=1500),
        st.integers(min_value=2, max_value=64),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_merge_tree_error_within_2eps(self, vals, parts, seed):
        eps = 0.05
        rnd = random.Random(seed)
        idx = list(range(len(vals)))
        rnd.shuffle(idx)
        chunks = [[] for _ in range(min(parts, len(vals)))]
        for j, i in enumerate(idx):
            chunks[j % len(chunks)].append(vals[i])
        sketches = [GKSketch.from_values(c, eps=eps) for c in chunks if c]
        # random merge tree
        while len(sketches) > 1:
            rnd.shuffle(sketches)
            a = sketches.pop()
            b = sketches.pop()
            sketches.append(a.merge(b))
        merged = sketches[0]
        assert merged.n == len(vals)
        assert merged.quantile(0.0) == float(min(vals))
        assert merged.quantile(1.0) == float(max(vals))
        assert _max_rank_error(vals, merged) <= 2 * eps * len(vals) + 1

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=2, max_size=1500),
        st.integers(min_value=2, max_value=100),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_merge_many_one_shot(self, vals, parts, seed):
        """The checkpoint rollup shape: k partition sketches -> one corpus
        sketch in a single k-way combine. Error stays 2*eps at ANY fan-in
        and the result stays sketch-sized."""
        eps = 0.05
        rnd = random.Random(seed)
        idx = list(range(len(vals)))
        rnd.shuffle(idx)
        chunks = [[] for _ in range(min(parts, len(vals)))]
        for j, i in enumerate(idx):
            chunks[j % len(chunks)].append(vals[i])
        sketches = [GKSketch.from_values(c, eps=eps) for c in chunks if c]
        merged = GKSketch.merge_many(sketches)
        assert merged.n == len(vals)
        assert merged.quantile(0.0) == float(min(vals))
        assert merged.quantile(1.0) == float(max(vals))
        assert _max_rank_error(vals, merged) <= 2 * eps * len(vals) + 1
        assert merged.size <= 4 / eps + 2

    def test_merge_many_duplicate_heavy_mass(self):
        """Regression: one value carrying 90% of the corpus. Without
        per-entry multiplicity bounds, merge inflated the deltas of the
        heavy value's NEIGHBORS by its whole duplicate mass (each input's
        between-samples upper bound included it), and quantile(0.5)
        answered a neighbor ~45% of the corpus away in rank."""
        eps = 0.01
        rng = random.Random(42)
        vals = [500] * 90_000 + [rng.randint(0, 1000) for _ in range(10_000)]
        rng.shuffle(vals)
        chunks = [vals[i::32] for i in range(32)]
        merged = GKSketch.merge_many(
            [GKSketch.from_values(c, eps=eps) for c in chunks]
        )
        assert merged.n == len(vals)
        err = _max_rank_error(vals, merged, qs=(0.2, 0.5, 0.8, 0.95))
        assert err <= 2 * eps * len(vals) + 1, err
        assert merged.quantile(0.5) == 500.0

    def test_merge_with_empty(self):
        sk = GKSketch.from_values([1, 2, 3], eps=0.1)
        empty = GKSketch(eps=0.1)
        assert sk.merge(empty).n == 3
        assert empty.merge(sk).n == 3
        assert empty.merge(empty).n == 0

    def test_merge_is_size_bounded(self):
        rng = np.random.RandomState(11)
        eps = 0.01
        parts = [
            GKSketch.from_values(rng.randint(0, 10**6, size=20_000), eps=eps)
            for _ in range(32)
        ]
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.merge(p)
        assert merged.n == 32 * 20_000
        assert merged.size < 6 / eps  # stays sketch-sized after 32 merges


class TestSerialization:
    def test_round_trip_through_json(self):
        vals = list(np.random.RandomState(5).randint(0, 999, size=5000))
        sk = GKSketch.from_values(vals, eps=0.02)
        blob = json.dumps(sk.to_dict())
        back = GKSketch.from_dict(json.loads(blob))
        assert back.n == sk.n and back.v == sk.v
        assert back.g == sk.g and back.d == sk.d
        for q in (0.1, 0.5, 0.9):
            assert back.quantile(q) == sk.quantile(q)
