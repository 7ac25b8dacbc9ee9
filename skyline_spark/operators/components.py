"""Connected components over a pair list — the clustering step of dedup.

A near-dup pass (MinHash-LSH, SimHash) emits *pairs*; deleting one doc per
pair over-deletes when dups chain (a~b, b~c). The standard fix is to cluster
pairs into connected components and keep one canonical doc (the min id) per
component — reference analog: Skyline has no multi-key grouping at all (one
Redis key per metric, `horizon/worker.py:208-217`), so this operator is part
of the LLM-data-pipeline surface, not a port.

Algorithm: min-label propagation with pointer jumping (label-of-label),
the alternating-star family of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14). Each round is two hash-shuffles on ids
(never on payloads); pointer jumping halves the remaining depth each round,
so convergence is O(log diameter) rounds — a path of 2^20 nodes needs ~20
rounds, and real near-dup clusters (diameter ≤ 3) converge in 2–3. Per
round the driver runs one tiny aggregate action (sum of labels — labels
decrease monotonically, so an unchanged sum IS the fixpoint); the label
frame is localCheckpoint'ed to truncate loop lineage, and materialized
blocks are freed by the ContextCleaner when the loop's frames go out of
scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 25
) -> DataFrame:
    """Cluster an undirected pair list into components.

    Parameters: ``pairs`` with two long id columns; pairs may be one
    direction only (symmetrized here) and may contain duplicates.

    Returns ``(id, cluster_id)`` — one row per node that appears in any
    pair, ``cluster_id`` = min id of the component. Deterministic.
    """
    # materialize the pair list once — the symmetrizing union references it
    # twice, and upstream pair producers (an LSH join) are expensive
    half = pairs.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    edges = (
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # node set from the RAW pair list, not the self-pair-filtered edges:
    # a node appearing only in self-pairs (7,7) still "appears in a pair"
    # per the contract and must come back as its own singleton component
    labels = (
        half.select(F.col("src").alias("id"))
        .union(half.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=False)
    )

    prev_sum = None
    for _ in range(max_rounds):
        # propagate: lbl(u) := min(lbl(u), min over neighbors v of lbl(v))
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("src"), F.col("lbl").alias("src_lbl")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src_lbl").alias("nbr_lbl"))
        )
        prop = labels.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
        )
        # pointer jump: lbl(u) := lbl(lbl(u)) — collapses chains exponentially
        as_parent = prop.select(
            F.col("id").alias("lbl"), F.col("lbl").alias("parent_lbl")
        )
        labels = (
            prop.join(as_parent, "lbl", "left")
            .select(
                "id", F.coalesce("parent_lbl", "lbl").alias("lbl")
            )
            .localCheckpoint(eager=False)
        )
        # labels decrease monotonically ⇒ unchanged sum ⇔ fixpoint
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.select("id", F.col("lbl").alias("cluster_id"))
