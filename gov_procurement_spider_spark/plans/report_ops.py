"""Report-pipeline + remaining relational/string operator probes
(SURVEY §2.2/2.4/2.7/2.8/2.10): the E2 delimiter row-splitter with a full
DuckDB re-implementation as oracle, the F14 spec/model cascade, the J2
positional zip join, E3 sessionization, P7 attachment predicate, F5/F6 date
extraction, S2 URL construction. Inputs are synthesized deterministically
from the testdata tables with expressions written identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.report import clean_numeric_display, parse_spec_and_model
from ..operators.splitter import split_rows
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# E2 — the four-class delimiter splitter (ref post_processor.py:34-98)
# ---------------------------------------------------------------------------

# synthesized splitter input over `part` covering all four classes:
#   %6==0 → aligned ；-split, scalar name/brand (ok, n=2)
#   %6==1 → aligned ；-split n=3 (ok)
#   %6==2 → attachment marker (attachment)
#   %6==3 → counts never align (mismatched)
#   %6==4 → aligned 、-split with aligned name (ok, n=2)
#   else  → all scalar (single_item)
_E2_INPUT_DUCK = """
      SELECT p_partkey,
        CASE WHEN p_partkey % 6 = 4 THEN p_name || '、' || p_type ELSE p_name END AS name,
        p_brand AS brand,
        CASE p_partkey % 6
          WHEN 0 THEN p_type || '-A；' || p_type || '-B'
          WHEN 1 THEN 'X1；X2；X3'
          WHEN 2 THEN '详见附件'
          WHEN 3 THEN 'A；B'
          WHEN 4 THEN p_type || '-1、' || p_type || '-2'
          ELSE p_type END AS spec,
        CASE p_partkey % 6
          WHEN 0 THEN '1；2' WHEN 1 THEN '4；5；6' WHEN 2 THEN '1'
          WHEN 3 THEN '1；2；3' WHEN 4 THEN '7、8' ELSE '9' END AS qty,
        CASE p_partkey % 6
          WHEN 0 THEN '10；20' WHEN 1 THEN '1.5；2.5；3.5' WHEN 2 THEN '8'
          WHEN 3 THEN '10；20' WHEN 4 THEN '30、40' ELSE '55' END AS price
      FROM part
"""


def _e2_input_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tiny-row table → 1 scan partition; spread before the splitter's
    # when-cascade + arrays_zip explode (CLAUDE.md mapInPandas/explode rule)
    p = load_table(spark, sf_dir, "part").repartition(
        spark.sparkContext.defaultParallelism
    )
    # parser-side expr strings (same build-latency discipline as the
    # splitter's cascades): the identical CASE WHEN trees the Column-API
    # when-chains produced, in 5 py4j calls instead of ~70
    return p.selectExpr(
        "p_partkey",
        "CASE WHEN (p_partkey % 6) = 4 THEN concat(p_name, '、', p_type)"
        " ELSE p_name END AS name",
        "p_brand AS brand",
        "CASE WHEN (p_partkey % 6) = 0 THEN concat(p_type, '-A；', p_type, '-B')"
        " WHEN (p_partkey % 6) = 1 THEN 'X1；X2；X3'"
        " WHEN (p_partkey % 6) = 2 THEN '详见附件'"
        " WHEN (p_partkey % 6) = 3 THEN 'A；B'"
        " WHEN (p_partkey % 6) = 4 THEN concat(p_type, '-1、', p_type, '-2')"
        " ELSE p_type END AS spec",
        "CASE WHEN (p_partkey % 6) = 0 THEN '1；2'"
        " WHEN (p_partkey % 6) = 1 THEN '4；5；6'"
        " WHEN (p_partkey % 6) = 2 THEN '1'"
        " WHEN (p_partkey % 6) = 3 THEN '1；2；3'"
        " WHEN (p_partkey % 6) = 4 THEN '7、8'"
        " ELSE '9' END AS qty",
        "CASE WHEN (p_partkey % 6) = 0 THEN '10；20'"
        " WHEN (p_partkey % 6) = 1 THEN '1.5；2.5；3.5'"
        " WHEN (p_partkey % 6) = 2 THEN '8'"
        " WHEN (p_partkey % 6) = 3 THEN '10；20'"
        " WHEN (p_partkey % 6) = 4 THEN '30、40'"
        " ELSE '55' END AS price",
    )


def _arr_duck(col: str, d: str) -> str:
    return (
        f"list_filter(list_transform(string_split({col}, '{d}'), x -> trim(x)),"
        " x -> x <> '')"
    )


@register(
    "e2_delimiter_split",
    f"""
    WITH input AS ({_E2_INPUT_DUCK}),
    arr AS (
      SELECT *,
        {_arr_duck('spec', '；')} AS s0, {_arr_duck('qty', '；')} AS q0,
        {_arr_duck('price', '；')} AS p0, {_arr_duck('name', '；')} AS n0,
        {_arr_duck('brand', '；')} AS b0,
        {_arr_duck('spec', '、')} AS s1, {_arr_duck('qty', '、')} AS q1,
        {_arr_duck('price', '、')} AS p1, {_arr_duck('name', '、')} AS n1,
        {_arr_duck('brand', '、')} AS b1,
        (contains(name,'详见附件') OR contains(spec,'详见附件')
         OR contains(qty,'详见附件') OR contains(price,'详见附件')) AS att
      FROM input
    ),
    st AS (
      SELECT *,
        CASE WHEN att THEN -1
             WHEN len(s0)>1 AND len(q0)=len(s0) AND len(p0)=len(s0)
                  AND (len(n0)=1 OR len(n0)=len(s0))
                  AND (len(b0)=1 OR len(b0)=len(s0)) THEN 0
             WHEN len(s1)>1 AND len(q1)=len(s1) AND len(p1)=len(s1)
                  AND (len(n1)=1 OR len(n1)=len(s1))
                  AND (len(b1)=1 OR len(b1)=len(s1)) THEN 1
             ELSE -2 END AS chosen,
        (len(s0)>1 OR len(q0)>1 OR len(p0)>1
         OR len(s1)>1 OR len(q1)>1 OR len(p1)>1) AS any_multi
      FROM arr
    ),
    lab AS (
      SELECT *,
        CASE WHEN att THEN 'attachment' WHEN chosen >= 0 THEN 'ok'
             WHEN any_multi THEN 'mismatched' ELSE 'single_item' END AS split_status,
        CASE WHEN chosen = 0 THEN len(s0) WHEN chosen = 1 THEN len(s1)
             ELSE 1 END AS n_items
      FROM st
    )
    SELECT p_partkey, split_status, it.item_pos,
      CASE WHEN split_status <> 'ok' THEN name
           ELSE (CASE WHEN chosen=0 THEN n0 ELSE n1 END)[
             CASE WHEN len(CASE WHEN chosen=0 THEN n0 ELSE n1 END)=1 THEN 1
                  ELSE it.item_pos + 1 END] END AS name,
      CASE WHEN split_status <> 'ok' THEN spec
           ELSE (CASE WHEN chosen=0 THEN s0 ELSE s1 END)[it.item_pos + 1] END AS spec,
      CASE WHEN split_status <> 'ok' THEN qty
           ELSE (CASE WHEN chosen=0 THEN q0 ELSE q1 END)[it.item_pos + 1] END AS qty,
      CASE WHEN split_status <> 'ok' THEN price
           ELSE (CASE WHEN chosen=0 THEN p0 ELSE p1 END)[it.item_pos + 1] END AS price
    FROM lab, unnest(generate_series(0, n_items - 1)) AS it(item_pos)
    """,
)
def e2_delimiter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — prioritized-delimiter row split, all four split_status classes
    (post_processor.py:47,82,95,97), pure Catalyst expressions (see
    operators/splitter.py). The oracle re-implements the same spec in SQL."""
    inp = _e2_input_spark(spark, sf_dir)
    out = split_rows(
        inp, name_col="name", brand_col="brand", spec_col="spec",
        qty_col="qty", price_col="price",
    )
    return out.select(
        "p_partkey", "split_status", "item_pos", "name", "spec", "qty", "price"
    )


# ---------------------------------------------------------------------------
# F14 + F13 — spec/model cascade + numeric clean (report_generator.py:7-57)
# ---------------------------------------------------------------------------

_F14_INPUT_DUCK = """
      SELECT p_partkey,
        CASE p_partkey % 5
          WHEN 0 THEN '空调挂机（M-' || p_partkey || '）'
          WHEN 1 THEN '柜式机 型号：X-' || p_partkey
          WHEN 2 THEN '空调机 KFR-' || p_partkey
          WHEN 3 THEN 'KFR-' || p_partkey
          ELSE '中央空调设备' END AS raw,
        CAST(round(p_retailprice, 2) AS VARCHAR) || '元' AS amount_raw
      FROM part
"""


@register(
    "f14_spec_model",
    f"""
    WITH input AS ({_F14_INPUT_DUCK})
    SELECT p_partkey,
      CASE
        WHEN regexp_extract(raw, '^(.*?)[（(]([^（）()]+)[）)]\\s*$', 1) <> ''
          OR regexp_extract(raw, '^(.*?)[（(]([^（）()]+)[）)]\\s*$', 0) <> ''
          THEN trim(regexp_extract(raw, '^(.*?)[（(]([^（）()]+)[）)]\\s*$', 1))
        WHEN regexp_extract(raw, '型号[:：]\\s*(\\S.*)$', 1) <> ''
          THEN trim(regexp_replace(raw, '型号[:：]\\s*\\S.*$', ''))
        WHEN regexp_extract(raw, '^(.*[一-龥])\\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$', 0) <> ''
          THEN trim(regexp_extract(raw, '^(.*[一-龥])\\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$', 1))
        WHEN regexp_matches(raw, '[A-Za-z]') AND regexp_matches(raw, '[0-9]')
             AND length(raw) - length(regexp_replace(raw, '[一-龥]', '', 'g')) < 3
          THEN ''
        ELSE trim(raw) END AS spec,
      CASE
        WHEN regexp_extract(raw, '^(.*?)[（(]([^（）()]+)[）)]\\s*$', 0) <> ''
          THEN trim(regexp_extract(raw, '^(.*?)[（(]([^（）()]+)[）)]\\s*$', 2))
        WHEN regexp_extract(raw, '型号[:：]\\s*(\\S.*)$', 1) <> ''
          THEN trim(regexp_extract(raw, '型号[:：]\\s*(\\S.*)$', 1))
        WHEN regexp_extract(raw, '^(.*[一-龥])\\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$', 0) <> ''
          THEN trim(regexp_extract(raw, '^(.*[一-龥])\\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$', 2))
        WHEN regexp_matches(raw, '[A-Za-z]') AND regexp_matches(raw, '[0-9]')
             AND length(raw) - length(regexp_replace(raw, '[一-龥]', '', 'g')) < 3
          THEN trim(raw)
        ELSE 'N/A' END AS model,
      CASE WHEN regexp_matches(regexp_replace(amount_raw, '[^0-9.]', '', 'g'),
                               '^[0-9]*\\.?[0-9]+$')
           THEN CASE WHEN CAST(regexp_replace(amount_raw, '[^0-9.]', '', 'g') AS DOUBLE)
                        = floor(CAST(regexp_replace(amount_raw, '[^0-9.]', '', 'g') AS DOUBLE))
                     THEN CAST(CAST(regexp_replace(amount_raw, '[^0-9.]', '', 'g') AS DOUBLE)::BIGINT AS VARCHAR)
                     ELSE CAST(CAST(regexp_replace(amount_raw, '[^0-9.]', '', 'g') AS DOUBLE) AS VARCHAR) END
           ELSE 'N/A' END AS amount
    FROM input
    """,
)
def f14_spec_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 four-case spec/model cascade + F13 display-rule numeric clean
    (report_generator.py:7-57) over a synthesized 规格型号 column."""
    p = load_table(spark, sf_dir, "part")
    m = F.col("p_partkey") % 5
    pk = F.col("p_partkey").cast("string")
    inp = p.select(
        "p_partkey",
        F.when(m == 0, F.concat(F.lit("空调挂机（M-"), pk, F.lit("）")))
        .when(m == 1, F.concat(F.lit("柜式机 型号：X-"), pk))
        .when(m == 2, F.concat(F.lit("空调机 KFR-"), pk))
        .when(m == 3, F.concat(F.lit("KFR-"), pk))
        .otherwise(F.lit("中央空调设备"))
        .alias("raw"),
        F.concat(F.round("p_retailprice", 2).cast("string"), F.lit("元")).alias(
            "amount_raw"
        ),
    )
    spec, model = parse_spec_and_model(F.col("raw"))
    return inp.select(
        "p_partkey",
        spec.alias("spec"),
        model.alias("model"),
        clean_numeric_display(F.col("amount_raw")).alias("amount"),
    )


# ---------------------------------------------------------------------------
# J2 — positional equi-join (zip) (ref sichuan.py:99-114, hunan.py:51-53)
# ---------------------------------------------------------------------------


@register(
    "j2_positional_zip",
    """
    WITH a AS (
      SELECT l_orderkey, l_partkey,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_partkey, l_suppkey, l_linenumber) AS pos
      FROM lineitem
    ),
    b AS (
      SELECT l_orderkey, l_quantity,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_quantity, l_partkey, l_suppkey, l_linenumber) AS pos
      FROM lineitem
    )
    SELECT a.l_orderkey, a.pos, a.l_partkey AS zipped_partkey,
           round(b.l_quantity, 2) AS zipped_qty
    FROM a JOIN b ON a.l_orderkey = b.l_orderkey AND a.pos = b.pos
    """,
)
def j2_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 zip-by-index: the reference aligns packages[i]↔items[i]; here two
    independently ranked sequences equi-join on (group, pos) — the
    posexplode-both-sides pattern without materializing arrays."""
    li = load_table(spark, sf_dir, "lineitem")
    wa = W.partitionBy("l_orderkey").orderBy("l_partkey", "l_suppkey", "l_linenumber")
    wb = W.partitionBy("l_orderkey").orderBy(
        "l_quantity", "l_partkey", "l_suppkey", "l_linenumber"
    )
    a = li.select("l_orderkey", "l_partkey", F.row_number().over(wa).alias("pos"))
    b = li.select("l_orderkey", "l_quantity", F.row_number().over(wb).alias("pos"))
    return a.join(b, ["l_orderkey", "pos"]).select(
        "l_orderkey",
        "pos",
        F.col("l_partkey").alias("zipped_partkey"),
        F.round("l_quantity", 2).alias("zipped_qty"),
    )


# ---------------------------------------------------------------------------
# E3 — sessionization (paragraph→package grouping, ref sichuan.py:38-50)
# ---------------------------------------------------------------------------


@register(
    "e3_sessionization",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 600
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      -- CAST: DuckDB's windowed sum over INT is HUGEINT, which .df()
      -- materializes as float64 ('34.0' vs Spark's '34' in the value hash)
      SELECT user_id, event_id, ts,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
    FROM sess GROUP BY user_id, session_id
    """,
)
def e3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 session grouping: running count of start-markers over an ordered
    window (the reference walks <p> tags accumulating packages; here the
    start marker is a >600 s gap)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second epoch (cast to double) — unix_timestamp would
    # truncate sub-second parts the oracle's epoch() keeps
    marked = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("timestamp").cast("double")
                - F.lag("ts").over(w).cast("timestamp").cast("double")
                > 600
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


# ---------------------------------------------------------------------------
# P7 / F5 / F6 / S2 — predicates & scalar functions
# ---------------------------------------------------------------------------


@register(
    "p7_attachment_exists",
    """
    SELECT count(*) AS n_flagged
    FROM part
    WHERE list_bool_or(list_transform(
            [p_name, p_brand, p_type], x -> contains(x, 'SMALL')))
    """,
)
def p7_attachment_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 any-column-contains predicate (post_processor.py:44-48
    ``'详见附件' in any of 4 fields``) via F.exists over an array of columns."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.exists(
            F.array("p_name", "p_brand", "p_type"), lambda c: c.contains("SMALL")
        )
    ).agg(F.count(F.lit(1)).alias("n_flagged"))


@register(
    "f5_f6_date_extract",
    """
    SELECT 'f5' AS src, o_orderkey AS row_key,
           strftime(CAST(regexp_replace(regexp_replace(regexp_extract(
             strftime(o_orderdate, '%Y年%m月%d日') || '发布',
             '(\\d{4}年\\d{2}月\\d{2}日)', 1),
             '年|月', '-', 'g'), '日', '', 'g') AS DATE), '%Y-%m-%d') AS date_str
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT 'f6' AS src, event_id AS row_key,
           split_part(strftime(ts, '%Y-%m-%d %H:%M:%S'), ' ', 1) AS date_str
    FROM events WHERE event_id % 50 = 0
    """,
)
def f5_f6_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 Chinese-date extraction+normalization (jiangsu.py:104-106 pattern
    (\\d{4}年\\d{2}月\\d{2}日) → ISO) round-tripped through a synthesized
    header string, unioned with F6 datetime→date via split-on-space
    (chongqing.py:34 ``text.split(' ')[0]`` — substring_index, not a date
    cast). Two operator probes tag-unioned into one driver row to fit the
    driver's 50-query correctness cap."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    header = F.concat(F.date_format("o_orderdate", "yyyy年MM月dd日"), F.lit("发布"))
    cn = F.regexp_extract(header, r"(\d{4}年\d{2}月\d{2}日)", 1)
    iso = F.regexp_replace(F.regexp_replace(cn, "年|月", "-"), "日", "")
    f5 = o.select(
        F.lit("f5").alias("src"),
        F.col("o_orderkey").alias("row_key"),
        F.date_format(iso.cast("date"), "yyyy-MM-dd").alias("date_str"),
    )
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    f6 = ev.select(
        F.lit("f6").alias("src"),
        F.col("event_id").alias("row_key"),
        F.substring_index(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), " ", 1
        ).alias("date_str"),
    )
    return f5.unionByName(f6)


# Python urllib.parse.quote('采购公告') — the ground-truth encoding the
# reference produces (url_builder.py:27,29 quotes a Chinese keyword); the
# oracle pins it as a known answer while Spark runs the real encoder.
_CN_SUFFIX = "采购公告"
_CN_SUFFIX_ENC = "%E9%87%87%E8%B4%AD%E5%85%AC%E5%91%8A"


def quote_url(col):
    """urllib.parse.quote-contract percent encoding as a column expression:
    F.url_encode is Java URLEncoder (form encoding), whose output diverges
    from urllib.quote on exactly four characters — '+' for space, '%7E' for
    '~' (quote keeps it literal), literal '*' (quote encodes %2A), and '%2F'
    for '/' (quote's default safe set keeps '/'). All four are
    post-rewritten, so the column matches ``urllib.parse.quote(s)`` for
    every input, not just the character classes the S2 template happens to
    exercise (ADVICE r2; '/' direction fixed in round-3 review —
    tests/test_quote_url.py checks the contract against urllib itself)."""
    enc = F.url_encode(col)
    enc = F.replace(enc, F.lit("+"), F.lit("%20"))
    enc = F.replace(enc, F.lit("%7E"), F.lit("~"))
    enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
    return F.replace(enc, F.lit("%2F"), F.lit("/"))


@register(
    "s2_url_construction",
    f"""
    SELECT n_nationkey,
           'https://search.example.gov/portal?searchtype=1&page_index=1&kw='
           || replace(lower(n_name), ' ', '%20') || '%20{_CN_SUFFIX_ENC}'
           || '&start_time=' || replace('2024-01-01', '-', ':')
           || '&zone=' || CAST(n_regionkey * 100 + n_nationkey AS VARCHAR)
           AS search_url,
           replace(lower(n_name), ' ', '_') || '_'
           || replace('2024-01-01', '-', '') || '.csv' AS filename
    FROM nation
    """,
)
def s2_url_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 search-URL templating (url_builder.py:16-31): string formatting,
    real percent-encoding of a non-ASCII keyword (quote_url — F.url_encode
    with the four URLEncoder/urllib.quote divergences rewritten, the ref's
    urllib.quote contract), '-'→':' date rewrite, zone lookup. The oracle
    pins the Chinese suffix's known-answer encoding since DuckDB has no
    url_encode. Also carries F15+F16 filename templating (main.py:35-36:
    keyword sanitized space→underscore, date compacted, '.csv' suffix) —
    same input row, merged to fit the driver's 50-query cap."""
    n = load_table(spark, sf_dir, "nation")
    keyword = F.concat(F.lower("n_name"), F.lit(" " + _CN_SUFFIX))
    return n.select(
        "n_nationkey",
        F.concat(
            F.lit("https://search.example.gov/portal?searchtype=1&page_index=1&kw="),
            quote_url(keyword),
            F.lit("&start_time="),
            F.regexp_replace(F.lit("2024-01-01"), "-", ":"),
            F.lit("&zone="),
            (F.col("n_regionkey") * 100 + F.col("n_nationkey")).cast("string"),
        ).alias("search_url"),
        F.concat(
            F.regexp_replace(F.lower("n_name"), " ", "_"),
            F.lit("_"),
            F.regexp_replace(F.lit("2024-01-01"), "-", ""),
            F.lit(".csv"),
        ).alias("filename"),
    )


@register(
    "f4_regexp_findall",
    r"""
    SELECT p_partkey,
           -- coalesce: DuckDB renders the zero-match join as NULL, Spark ''
           coalesce(array_to_string(
             regexp_extract_all(p_name, '(\w*o\w*)', 1), '|'), '') AS o_words,
           len(regexp_extract_all(p_name, '(\w*o\w*)', 1)) AS n_matches
    FROM part WHERE p_partkey % 20 = 0
    """,
)
def f4_regexp_findall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 regex find-all (hunan.py:48-49 ``re.finditer`` → aligned lists):
    regexp_extract_all returns every match as an array — joined for a
    stable hash, plus the match count the reference zips against."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    matches = F.regexp_extract_all(F.col("p_name"), F.lit(r"(\w*o\w*)"), 1)
    return p.select(
        "p_partkey",
        F.array_join(matches, "|").alias("o_words"),
        F.size(matches).alias("n_matches"),
    )


# (f15_filename_template was folded into s2_url_construction above — same
# nation input row; merged so the oracle-backed registry stays within the
# driver's 50-query correctness cap, VERDICT r2 item 1)
