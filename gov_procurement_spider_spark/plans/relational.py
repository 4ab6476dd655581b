"""Relational operator inventory (SURVEY.md §2) expressed over the driver's
TPC-H-ish testdata, each paired with a DuckDB oracle SQL string.

Every query here is a *shape probe* for one operator class of the reference
engine (file:line cites in each docstring) re-expressed Spark-first: the
driver runs the Spark callable and the oracle SQL side-by-side at sf=0.01 and
compares row count + schema + order-insensitive value hash.

Conventions for oracle parity:
- every computed column is aliased identically on both sides;
- doubles are rounded (sum order differs between engines);
- timestamps are rendered to strings with an explicit format (Spark session TZ
  is pinned to UTC by session.get_spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table

from .registry import register


# ---------------------------------------------------------------------------
# A: aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 running-counts / grouped aggregation (ref main.py:97, converter.py:30)
    scaled to the TPC-H Q1 shape: partial+final hash agg, whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "a2_collapse_concat",
    """
    SELECT n_name,
           string_agg(s_name, ' | ' ORDER BY s_name) AS suppliers,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def a2_collapse_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 collapse-to-one with ' | ' (ref sichuan.py:100-107, hebei.py:99-106):
    groupBy + sorted collect_list + concat_ws replaces the per-column Python
    loop; map-side partial agg keeps the shuffle small."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(" | ", F.sort_array(F.collect_list("s_name"))).alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "a3_argmax_latest",
    """
    SELECT o_custkey, o_orderkey AS latest_orderkey
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
             ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def a3_argmax_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 argmax-by-ctime "latest file" (ref report_generator.py:182
    ``max(files, key=getctime)``) as max_by over a composite orderable —
    a single hash aggregate, no sort of the full table."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias(
            "latest_orderkey"
        )
    )


@register(
    "a4_count_distinct",
    """
    SELECT count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
    FROM orders
    """,
)
def a4_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 count-distinct (ref main.py:112 ``len(unique_links)``); exact here,
    approx_count_distinct is the 10^10-scale monitoring variant."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# D: dedup & set ops (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "d1_ordered_dedup_first",
    """
    SELECT user_id, event_id AS first_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def d1_ordered_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 ordered distinct — the reference's keep-first-occurrence URL dedup
    (main.py:111 ``sorted(set(links), key=links.index)``). Order is carried as
    data (ts, event_id), not execution order, so the result is deterministic
    under any parallelism. One shuffle on the partition key."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


@register(
    "d2_full_row_distinct",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def d2_full_row_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 full-row distinct (ref sichuan.py:106-107 ``if item not in results``).
    dropDuplicates → partial+final hash aggregate, no O(n²) membership scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").dropDuplicates()


@register(
    "d3_union_accumulate",
    """
    SELECT o_orderstatus, count(*) AS n
    FROM (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
      UNION ALL
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY o_orderstatus
    """,
)
def d3_union_accumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 union-accumulate (ref main.py:96,135 ``list.extend`` per page/epoch):
    unionByName of per-epoch slices; Catalyst pushes the shared scan."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    return a.unionByName(b).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@register(
    "d1b_anti_join_seen",
    """
    SELECT count(*) AS n_new
    FROM events e
    WHERE e.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events s
        WHERE s.event_type = 'purchase' AND s.user_id = e.user_id
      )
    """,
)
def d1b_anti_join_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 at scale — the frontier-vs-seen anti-join (SURVEY §2.3 D1): new URLs
    are LEFT ANTI JOIN seen. Here: click events by users with no purchase."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    seen = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.join(seen, "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_new")
    )


# ---------------------------------------------------------------------------
# J: joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "j1_broadcast_enrich",
    """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 broadcast 1→N enrich (ref sichuan.py:105-114 ``{**general_info,
    **item}``): the small dimension ships to every executor, no shuffle of the
    fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "j4_dim_lookup_chain",
    """
    SELECT r_name, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j4_dim_lookup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 dimension lookups (ref province_mapping.py:16,28, url_builder.py:18
    dict.get chains) as chained broadcast hash joins."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "j3_correlated_lookup",
    r"""
    WITH noted AS (
      SELECT o_orderkey,
             'order handled by clerk#' || CAST(o_custkey % 25 AS VARCHAR)
             || ' priority ' || o_orderpriority AS note
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey,
           CAST(regexp_extract(note, 'clerk#(\d+)', 1) AS INT) AS clerk_zone,
           n_name AS zone_name
    FROM noted
    JOIN nation ON CAST(regexp_extract(note, 'clerk#(\d+)', 1) AS INT)
                   = n_nationkey
    """,
)
def j3_correlated_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 correlated lookup join (hunan.py:141-144: regex-extract a key from
    free text, then look the key up in a mapping): the extracted key becomes
    an equi-join column, so what the reference does row-by-row with
    ``re.search`` + ``dict[...]`` is one broadcast hash join — the lookup
    table ships once, the fact side never shuffles. The note column is
    synthesized (testdata has no free-text key field) before extraction."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    n = load_table(spark, sf_dir, "nation")
    note = F.concat(
        F.lit("order handled by clerk#"),
        (F.col("o_custkey") % 25).cast("string"),
        F.lit(" priority "),
        F.col("o_orderpriority"),
    )
    noted = o.select("o_orderkey", note.alias("note"))
    key = F.regexp_extract("note", r"clerk#(\d+)", 1).cast("int").alias("clerk_zone")
    return (
        noted.select("o_orderkey", key)
        .join(F.broadcast(n), F.col("clerk_zone") == n.n_nationkey)
        .select("o_orderkey", "clerk_zone", F.col("n_name").alias("zone_name"))
    )


# ---------------------------------------------------------------------------
# W/O: windows, ranking, top-k (SURVEY §2.6, §2.9)
# ---------------------------------------------------------------------------


@register(
    "o2_topk_per_group",
    """
    SELECT user_id, event_id, round(value, 4) AS value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def o2_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 politeness-capped dequeue shape — top-k per host under a budget
    (SURVEY §2.9; implicit FIFO in ref main.py). row_number over a per-key
    window; AQE handles moderate skew, hot keys get salted in the crawler."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.round("value", 4).alias("value"))
    )


@register(
    "w2_first_row_per_page",
    """
    SELECT l_orderkey, l_partkey AS first_partkey, round(l_quantity, 2) AS first_qty
    FROM (
      SELECT l_orderkey, l_partkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
             ) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def w2_first_row_per_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 take-first-data-row (ref guangdong.py:46-47, zhejiang.py:44-46 take
    rows[1] of the items table)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("first_partkey"),
            F.round("l_quantity", 2).alias("first_qty"),
        )
    )


@register(
    "w3_fill_forward",
    """
    SELECT l_orderkey, l_linenumber, l_partkey,
           last_value(flag_sparse IGNORE NULLS) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS flag_filled
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             CASE WHEN l_linenumber % 2 = 1 THEN l_returnflag END AS flag_sparse
      FROM lineitem
    )
    """,
)
def w3_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 fill-forward / rowspan carry (ref hunan.py:114-121 ``current_supplier``
    reuse): last(ignorenulls) over an ordered window — no per-row Python."""
    li = load_table(spark, sf_dir, "lineitem")
    sparse = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.when(F.col("l_linenumber") % 2 == 1, F.col("l_returnflag")).alias(
            "flag_sparse"
        ),
    )
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return sparse.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.last("flag_sparse", ignorenulls=True).over(w).alias("flag_filled"),
    )


# ---------------------------------------------------------------------------
# P/F: filters & scalar functions (SURVEY §2.2, §2.8)
# ---------------------------------------------------------------------------


@register(
    "p4_invalid_record_filter",
    """
    SELECT count(*) AS n_valid
    FROM events
    WHERE NOT (event_type = 'view' AND value < 0.5)
    """,
)
def p4_invalid_record_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 invalid-record filter (ref chongqing.py:84-85: drop when both
    项目名称 and 供应商名称 are 'N/A') — a conjunctive NOT filter pushed to scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        ~((F.col("event_type") == "view") & (F.col("value") < 0.5))
    ).agg(F.count(F.lit(1)).alias("n_valid"))


# (f13_numeric_clean was retired as a standalone driver row: F13's numeric
# clean + cast is the `amount` column of f14_spec_model — same table, same
# expression (operators/report.py::clean_numeric_display), every part row —
# so the f14 oracle already value-checks it. The slot went to
# im1_image_features, the image family's first oracle row.)


@register(
    "f12_url_absolutize",
    """
    SELECT doc_id,
           CASE WHEN source LIKE 'http%' THEN source
                ELSE concat('https://www.example.gov/', source) END AS abs_url
    FROM documents
    """,
)
def f12_url_absolutize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 conditional URL absolutize (ref search_parser.py:23)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.when(F.col("source").startswith("http"), F.col("source"))
        .otherwise(F.concat(F.lit("https://www.example.gov/"), F.col("source")))
        .alias("abs_url"),
    )
