"""Deterministic selection operators for training-mixture assembly.

Library forms of the catalog's ``domain_cap_sample`` and
``mixture_token_budget`` (catalog/mixing_queries.py): both select by a
caller-supplied deterministic order column (use a portable hash — see
functions/text.py h32 — for selections that are reproducible across runs,
engines, executor counts, and repartitionings), and both run the exact
skew-safe two-phase plans:

- :func:`cap_per_key` — per-key top-K by a salted local rank (bounds every
  sort partition to a salt's share of the hottest key) followed by an exact
  rank over the ≤ salts·K survivors. Spark additionally plans
  WindowGroupLimit, enforcing K before the shuffle.
- :func:`token_budget_fill` — greedy order-column prefix per stratum whose
  running weight fits the stratum's quota. Buckets the order column,
  broadcasts per-(stratum, bucket) running priors, keeps/drops whole
  buckets sort-free, and pays a row-level window only inside the single
  boundary bucket per stratum.

Both are EXACT restatements of their naive single-window forms (the naive
form is each one's oracle in the randomized equivalence tests,
tests/test_mixture_ops.py).

Reference analog: none — Skyline analyzes every metric every sweep
(`analyzer/analyzer.py`); selection/mixing belongs to the LLM-data-pipeline
surface this engine adds, like dedup and decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["cap_per_key", "token_budget_fill"]


def _check_reserved(df: DataFrame, reserved: set[str], op: str) -> None:
    # the operators add internal working columns; a caller column with the
    # same name would be silently overwritten and returned in place of the
    # user's data — fail fast instead
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"{op}: input columns collide with internal names: {sorted(clash)}")


def cap_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    tie_col: str,
    k: int,
    salts: int = 8,
    out_col: str = "cap_rank",
) -> DataFrame:
    """Keep the ``k`` rows with the smallest ``(order_col, tie_col)`` per
    ``key``; ``out_col`` carries the 1-based rank. ``tie_col`` must be
    unique per row (a doc id), making the selection total-ordered and
    deterministic.

    Exact two-phase top-K: the global per-key top-k is always a subset of
    the union of per-(key, salt) top-ks, so phase 1 bounds every sort
    partition and phase 2 ranks only survivors.
    """
    _check_reserved(df, {"_rn_local", out_col}, "cap_per_key")
    local_w = Window.partitionBy(key, F.col(order_col) % salts).orderBy(
        order_col, tie_col
    )
    survivors = df.withColumn("_rn_local", F.row_number().over(local_w)).where(
        F.col("_rn_local") <= k
    )
    global_w = Window.partitionBy(key).orderBy(order_col, tie_col)
    return (
        survivors.withColumn(out_col, F.row_number().over(global_w).cast("long"))
        .where(F.col(out_col) <= k)
        .drop("_rn_local")
    )


def token_budget_fill(
    df: DataFrame,
    stratum: str,
    weight_col: str,
    order_col: str,
    tie_col: str,
    quota: Column,
    buckets: int = 64,
) -> DataFrame:
    """Keep the greedy prefix of each stratum — rows ordered by
    ``(order_col % buckets, order_col, tie_col)`` — whose running
    ``weight_col`` sum stays ≤ ``quota`` (a Column evaluated per row, e.g.
    a CASE over the stratum). Weights must be ≥ 0; the kept set only ever
    EXTENDS when quotas grow, which is what makes a 10^12-row mixture
    resumable.

    Equivalent to the naive per-stratum running-sum window, but whole
    buckets are admitted/dropped from their (broadcast) aggregate sums and
    only the boundary bucket pays a row-level sort.
    """
    _check_reserved(
        df, {"_bucket", "_bsum", "_prior", "_quota", "_cum_in", "_cs", "_cb"},
        "token_budget_fill",
    )
    staged = df.withColumn("_bucket", F.col(order_col) % buckets)

    bs = staged.groupBy(stratum, "_bucket").agg(
        F.sum(weight_col).alias("_bsum")
    )
    prior_w = (
        Window.partitionBy(stratum)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = bs.select(
        stratum,
        "_bucket",
        "_bsum",
        F.coalesce(F.sum("_bsum").over(prior_w), F.lit(0)).alias("_prior"),
    )

    # null-SAFE join keys: the naive window form puts NULL-stratum rows in
    # their own partition and keeps their prefix under the default quota; a
    # plain equi-join would drop them (no row ever equals its own NULL key)
    cum2 = cum.withColumnRenamed(stratum, "_cs").withColumnRenamed(
        "_bucket", "_cb"
    )
    joined = (
        staged.join(
            F.broadcast(cum2),
            F.col(stratum).eqNullSafe(F.col("_cs"))
            & F.col("_bucket").eqNullSafe(F.col("_cb")),
        )
        .drop("_cs", "_cb")
        .withColumn("_quota", quota)
    )
    # running totals are monotone (weights ≥ 0) ⇒ three bucket classes
    full = F.col("_prior") + F.col("_bsum") <= F.col("_quota")
    boundary = (~full) & (F.col("_prior") <= F.col("_quota"))

    out_cols = df.columns
    kept_whole = joined.where(full).select(*out_cols)
    bnd_w = (
        Window.partitionBy(stratum, "_bucket")
        .orderBy(order_col, tie_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept_boundary = (
        joined.where(boundary)
        .withColumn("_cum_in", F.sum(weight_col).over(bnd_w))
        .where(F.col("_prior") + F.col("_cum_in") <= F.col("_quota"))
        .select(*out_cols)
    )
    return kept_whole.unionAll(kept_boundary)
