"""General relational coverage: scan/filter/agg/join/window on TPC-H-ish data.

The reference engine has no general joins or grouping (SURVEY §2, "not
present"), but the new engine is a full DataFrame/SQL surface — these
queries document that the standard operator classes (pushed-down filtered
scans, hash aggregation with partial agg, broadcast hash joins, ranking
windows) come with the platform and stay JVM-side end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import text as X
from .registry import load, query


@query(
    "tpch_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS sum_disc_price,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             * 1000000 + 0.5) / 1000000 AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: filtered scan (predicate pushdown to parquet) + "
        "hash agg with map-side partials. Money columns are 2-decimal values "
        "stored as double, so each addend casts to DECIMAL(18,2) (exact) and "
        "the SUM is associative — the result is bit-identical under any "
        "partitioning / shuffle order, unlike a double fold whose last ulp "
        "depends on partition count (seen at sf0.1: 32-partition Spark vs "
        "single-stream DuckDB differed by 1 ulp). The one double cast / "
        "division happens on the exact aggregate in both engines.",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            # r6, not native round: Spark rounds the exact BigDecimal
            # expansion HALF_UP while DuckDB rounds in float space — a
            # quotient within one ulp of a .5 boundary would diverge
            X.r6(
                F.sum(dec("l_quantity")).cast("double") / F.count("*")
            ).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


@query(
    "join_orders_by_nation",
    """
SELECT n.n_name AS nation,
       count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""",
    doc="two broadcast hash joins (customer and nation are the small sides) "
        "+ agg; no shuffle of the orders fact beyond the final group. "
        "o_totalprice sums as DECIMAL(18,2) — exact/associative, so the "
        "result is independent of partition fold order (see "
        "tpch_q1_pricing_summary).",
)
def join_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "window_top_orders_per_nation",
    """
WITH j AS (
  SELECT n.n_name AS nation, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rank
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, o_orderkey, rank::BIGINT AS rank,
       round(o_totalprice, 6) AS o_totalprice
FROM j WHERE rank <= 5 ORDER BY nation, rank
""",
    doc="ranking window (top-N per group) over a broadcast-joined fact",
)
def window_top_orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "o_orderkey", "o_totalprice")
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("nation", "o_orderkey", "rank", F.round("o_totalprice", 6).alias("o_totalprice"))
    )
