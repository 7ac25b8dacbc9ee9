"""connected_components: clustering near-dup pairs (operators/components.py)."""

from skyline_spark.operators.components import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = connected_components(df)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 (transitive dups) + island 10-11; 99 is a singleton pair
    got = _cc(spark, [(2, 1), (2, 3), (4, 3), (10, 11), (99, 98)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 98: 98, 99: 98}


def test_long_path_converges_via_pointer_jumping(spark):
    # path of 40 nodes — naive propagation needs 39 rounds; pointer jumping
    # must finish well inside the 25-round cap
    n = 40
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}


def test_duplicate_and_reversed_pairs(spark):
    got = _cc(spark, [(5, 6), (6, 5), (5, 6), (7, 6)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_random_graph_matches_union_find(spark):
    """Seeded random graph: the distributed min-label result must equal a
    driver-side union-find ground truth."""
    import random

    rng = random.Random(42)
    nodes = list(range(100))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(80)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    want = {n: find(n) for n in parent}
    # union-find roots are not necessarily component minima — normalize
    comp = {}
    for n, r in want.items():
        comp.setdefault(r, []).append(n)
    want = {n: min(members) for members in comp.values() for n in members}

    got = _cc(spark, pairs)
    assert got == want


def test_self_pair_nodes_are_singletons(spark):
    """A node appearing only in self-pairs still 'appears in a pair' per the
    contract and must come back as its own singleton component — the
    src != dst edge filter must not erase it from the node set."""
    got = _cc(spark, [(7, 7), (1, 2), (2, 2)])
    assert got == {7: 7, 1: 1, 2: 1}
