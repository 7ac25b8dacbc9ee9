"""Crucible replay: algorithm-set selection (SURVEY §2.7,
`crucible/crucible_algorithms.py:458-481`).

The reference resolves ``['all']`` to a per-app kernel list and runs any
explicit list as-is; these tests pin our ``resolve_algorithm_set`` analog
and prove the replay query actually honors the resolved subset.
"""

from __future__ import annotations

import pytest

from skyline_spark.operators.detectors import ALGORITHMS
from skyline_spark.operators.ensemble import resolve_algorithm_set

SF_DIR = "/root/testdata/sf0.001"


class TestResolveAlgorithmSet:
    def test_all_resolves_to_full_registry_per_app(self):
        for app in ("analyzer", "mirage", "crucible"):
            assert list(resolve_algorithm_set(app)) == list(ALGORITHMS)

    def test_subset_keeps_registered_order(self):
        names = list(ALGORITHMS)
        # ask in REVERSED order; resolution must come back in ensemble order
        got = resolve_algorithm_set("crucible", [names[4], names[1], names[0]])
        assert list(got) == [names[0], names[1], names[4]]

    def test_unknown_algorithm_rejected(self):
        with pytest.raises(ValueError, match="unknown algorithms"):
            resolve_algorithm_set("crucible", ["nope"])

    def test_boundary_requires_explicit_list(self):
        with pytest.raises(ValueError, match="explicit algorithm list"):
            resolve_algorithm_set("boundary")

    def test_unknown_app_rejected(self):
        with pytest.raises(ValueError, match="unknown skyline_app"):
            resolve_algorithm_set("webapp")
        # also rejected when a subset is passed — a typo'd app must not
        # slip through just because an explicit list short-circuits
        with pytest.raises(ValueError, match="unknown skyline_app"):
            resolve_algorithm_set("webapp", list(ALGORITHMS)[:1])

    def test_empty_list_rejected(self):
        with pytest.raises(ValueError, match="empty algorithm list"):
            resolve_algorithm_set("crucible", [])


def test_replay_honors_algorithm_subset(spark):
    from skyline_spark.catalog.skew_queries import replay_full_ensemble

    full = replay_full_ensemble(spark, SF_DIR).toPandas()
    subset_names = list(ALGORITHMS)[:3]
    sub = replay_full_ensemble(
        spark, SF_DIR, algorithms=subset_names
    ).toPandas()

    assert len(full) > 0
    allowed = set(subset_names)
    for trig in sub["triggered_algorithms"]:
        assert set(trig.split(",")) <= allowed

    # the subset run is exactly the full run's rows re-filtered to the
    # subset kernels (same prefixes, same verdicts): rows whose full-run
    # triggers intersect the subset survive with the intersection, all
    # others disappear
    key = ["event_type", "index"]
    f = {
        (r.event_type, r.index): r.triggered_algorithms.split(",")
        for r in full.itertuples()
    }
    s = {
        (r.event_type, r.index): r.triggered_algorithms.split(",")
        for r in sub.itertuples()
    }
    expected = {
        k: [a for a in v if a in allowed] for k, v in f.items()
        if any(a in allowed for a in v)
    }
    assert {k: sorted(v) for k, v in s.items()} == {
        k: sorted(v) for k, v in expected.items()
    }
    # consensus_count column is the subset trigger count
    for r in sub.itertuples():
        assert r.consensus_count == len(s[(r.event_type, r.index)])
