"""OLAP surface beyond the reference's own operators: grouping sets
(rollup/cube), pivot, exact percentiles, approximate distinct, and the
salted skew join (result-identical to the plain join — that IS the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import load_table
from .registry import register


@register(
    "a5_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 2) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a5_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (continuous interpolation) — the monitoring-side
    metric op; percentile_approx is the 10^10-scale variant (same API)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 2).alias("p95"),
    )


@register(
    "a6_rollup",
    """
    SELECT coalesce(l_returnflag, '∅') AS l_returnflag,
           coalesce(l_linestatus, '∅') AS l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets (rollup): subtotal + grand-total rows in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("∅")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("∅")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "a7_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a7_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: status columns out of status rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


@register(
    "j6_salted_skew_join",
    """
    SELECT o_orderpriority, count(*) AS n,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def j6_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py): hot keys spread over 8 salts,
    dim side replicated 8×. The oracle is the PLAIN join — salting must be
    result-invariant; only the shuffle layout differs."""
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, on=["o_orderkey"], n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
