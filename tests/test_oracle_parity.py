"""Mini-driver: run every queries() entry on Spark and its oracle_sql() in
DuckDB over the same sf=0.01 parquet, compare row count + order-insensitive
value hash with columns sorted by name — the same comparison the external
driver performs for CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Type-honest rendering. Integer-valued floats stay visibly float
    ('34.0', never '34') so a DuckDB HUGEINT→float64 materialization can
    NOT silently hash-match a Spark BIGINT — the exact divergence class
    that slipped through round 1 (e3_sessionization)."""
    if v is None:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "∅"  # .df() renders SQL NULL in numeric columns as NaN
        if v.is_integer():
            return f"{v:.1f}"
        return f"{v:.6g}"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _null_nan_sig(rows, cols):
    """Per-row null/NaN classification, columns sorted by name. _norm renders
    both SQL NULL and float NaN as '∅' (the cost of the .df() materialization
    the external driver uses), so a genuine NaN on one engine could silently
    hash-match a NULL on the other; this second pass — Spark Rows and DuckDB
    fetchall() both keep None vs float('nan') distinct — closes that gap
    (ADVICE r2)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cls(v):
        if v is None:
            return "null"
        if isinstance(v, (float, np.floating)) and math.isnan(float(v)):
            return "nan"
        return "."

    return sorted(tuple(cls(r[i]) for i in order) for r in rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    # materialize via .df() exactly like the external driver — fetchall()
    # gives Python ints for HUGEINT and would mask float64 materialization
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_df = res.df()
    duck_rows = list(duck_df.itertuples(index=False, name=None))

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    a = _canon(spark_rows, spark_cols)
    b = _canon(duck_rows, duck_cols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")

    # NULL-vs-NaN disambiguation pass: fetchall() keeps them distinct
    duck_raw = duck.execute(ORACLES[name]).fetchall()
    sig_a = _null_nan_sig(spark_rows, spark_cols)
    sig_b = _null_nan_sig(duck_raw, duck_cols)
    assert sig_a == sig_b, (
        f"{name}: null/NaN signature mismatch (a NaN on one engine aliased a"
        f" NULL on the other): {[(x, y) for x, y in zip(sig_a, sig_b) if x != y][:5]}"
    )


def test_queries_all_have_entries():
    assert QUERIES, "registry is empty"
    for name in ORACLES:
        assert name in QUERIES


def test_registry_within_driver_cap():
    """The external driver verifies at most 50 queries in registration
    order — round 2 silently lost dd5_simhash's correctness row to exactly
    this truncation. Guard both the cap and the ordering invariant (every
    oracle-backed query registers before every rows-only view, so a future
    overflow truncates a rows-only view, never an oracle row)."""
    names = list(QUERIES)
    assert len(names) <= 50, f"{len(names)} queries registered; driver caps at 50"
    rows_only = [n for n in names if n not in ORACLES]
    if rows_only:
        first_rows_only = names.index(rows_only[0])
        assert all(n not in ORACLES for n in names[first_rows_only:]), (
            "oracle-backed query registered after a rows-only view: "
            f"{[n for n in names[first_rows_only:] if n in ORACLES]}"
        )
    assert "dd5_simhash" in ORACLES and "dd7_simhash_pairs" in ORACLES
    # round 4: ml2's slot (band-0 slice, subsumed by ml3's oracle; pytest
    # keeps its comparison) moved to the IVF family's driver row
    assert "ml4_ivf_topk" in ORACLES and "ml2_ann_lsh_buckets" not in QUERIES


def test_lazy_oracle_failure_degrades_only_its_row():
    """A lazy oracle whose data is unreachable must degrade its own row to
    rows-only, never take the other oracles down (round-4 review finding)."""
    import warnings

    from gov_procurement_spider_spark.plans import registry as reg

    def boom() -> str:
        raise FileNotFoundError("testdata gone")

    reg._REGISTRY["_zz_test_lazy"] = (lambda s, d: None, boom)
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            o = reg.oracle_sql()
        assert "_zz_test_lazy" not in o
        assert "a1_pricing_summary" in o and "ml4_ivf_topk" in o
        assert any("_zz_test_lazy" in str(x.message) for x in rec)
    finally:
        del reg._REGISTRY["_zz_test_lazy"]


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def test_lazy_oracle_any_exception_degrades_only_its_row():
    """Round-4 ADVICE broadened the handler from OSError to Exception: a
    lazy oracle failing with ArrowInvalid/KeyError/ImportError must also
    degrade only its own row."""
    import warnings

    from gov_procurement_spider_spark.plans import registry as reg

    def boom() -> str:
        raise KeyError("schema drift")

    reg._REGISTRY["_zz_test_lazy2"] = (lambda s, d: None, boom)
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            o = reg.oracle_sql()
        assert "_zz_test_lazy2" not in o
        assert "a1_pricing_summary" in o and "ml4_ivf_topk" in o
        assert any("_zz_test_lazy2" in str(x.message) for x in rec)
    finally:
        del reg._REGISTRY["_zz_test_lazy2"]
