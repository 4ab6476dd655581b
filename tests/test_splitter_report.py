"""E2 splitter (all four split_status classes, FIXTURES.md §5) and report
operators F13/F14 golden pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gov_procurement_spider_spark.operators.report import (
    clean_numeric_display,
    clean_numeric_value,
    parse_spec_and_model,
)
from gov_procurement_spider_spark.operators.splitter import split_rows, with_split_status

COLS = ["名称", "品牌", "规格型号", "数量", "单价"]

CASES = [
    # ok: three aligned multi-value cols, scalar name/brand broadcast
    ("空调", "格力", "KFR-35GW；KFR-50GW", "2；3", "3500；5200", "ok", 2),
    # ok with aligned name too, lower-priority delimiter 、
    ("挂机、柜机", "格力、美的", "A1、B2", "1、2", "10、20", "ok", 2),
    # attachment bypass
    ("空调", "格力", "详见附件", "2；3", "3500；5200", "attachment", 1),
    # mismatched: 2 specs vs 3 qtys under every delimiter
    ("空调", "格力", "A；B", "1；2；3", "10；20", "mismatched", 1),
    # single item
    ("空调", "格力", "KFR-35GW", "2", "3500", "single_item", 1),
    # ok via first-priority delimiter ';' even though '、' also aligns later
    ("空调", "格力", "A;B", "1;2", "9;8", "ok", 2),
]


@pytest.fixture(scope="module")
def split_df(spark):
    df = spark.createDataFrame(
        [tuple(c[:5]) for c in CASES], COLS
    )
    return with_split_status(df)


def test_split_status_classes(split_df):
    got = {r["规格型号"]: (r["split_status"], r["n_items"]) for r in split_df.collect()}
    for name, brand, spec, qty, price, status, n in CASES:
        assert got[spec] == (status, n), (spec, got[spec])


def test_split_rows_explode(spark):
    df = spark.createDataFrame([tuple(c[:5]) for c in CASES], COLS)
    out = split_rows(df)
    rows = [r.asDict() for r in out.collect()]
    # 2+2+1+1+1+2 = 9 rows
    assert len(rows) == sum(c[6] for c in CASES)
    ok = sorted(
        [r for r in rows if r["规格型号"] in ("KFR-35GW", "KFR-50GW") and r["split_status"] == "ok"],
        key=lambda r: r["item_pos"],
    )
    assert [r["规格型号"] for r in ok] == ["KFR-35GW", "KFR-50GW"]
    assert [r["数量"] for r in ok] == ["2", "3"]
    assert [r["单价"] for r in ok] == ["3500", "5200"]
    assert all(r["名称"] == "空调" and r["品牌"] == "格力" for r in ok)  # broadcast
    aligned = sorted(
        [r for r in rows if r["规格型号"] in ("A1", "B2")], key=lambda r: r["item_pos"]
    )
    assert [(r["名称"], r["品牌"]) for r in aligned] == [("挂机", "格力"), ("柜机", "美的")]
    # non-ok rows pass through unchanged
    mm = [r for r in rows if r["split_status"] == "mismatched"][0]
    assert mm["数量"] == "1；2；3"


NUMERIC_GOLDEN = [
    ("3,200.00元", 3200.0, "3200"),
    ("123.45万元", 123.45, "123.45"),
    ("42", 42.0, "42"),
    ("N/A", None, "N/A"),
    ("", None, "N/A"),
    ("约1,024台", 1024.0, "1024"),
]

SPEC_MODEL_GOLDEN = [
    ("1.5P挂机（KFR-35GW）", "1.5P挂机", "KFR-35GW"),
    ("1.5P挂机(KFR-35GW)", "1.5P挂机", "KFR-35GW"),
    ("落地柜机 型号：KFR-72LW", "落地柜机", "KFR-72LW"),
    ("变频挂机 KFR-26GW/N8", "变频挂机", "KFR-26GW/N8"),
    ("KFR-35GW", "", "KFR-35GW"),  # looks-like-model heuristic
    ("三匹柜式空调", "三匹柜式空调", "N/A"),  # fallback
]


def test_clean_numeric(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in NUMERIC_GOLDEN], ["raw"])
    out = df.select(
        "raw",
        clean_numeric_value(F.col("raw")).alias("num"),
        clean_numeric_display(F.col("raw")).alias("disp"),
    ).collect()
    got = {r.raw: (r.num, r.disp) for r in out}
    for raw, num, disp in NUMERIC_GOLDEN:
        assert got[raw] == (num, disp), raw


def test_parse_spec_and_model(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in SPEC_MODEL_GOLDEN], ["raw"])
    spec, model = parse_spec_and_model(F.col("raw"))
    out = df.select("raw", spec.alias("spec"), model.alias("model")).collect()
    got = {r.raw: (r.spec, r.model) for r in out}
    for raw, s, m in SPEC_MODEL_GOLDEN:
        assert got[raw] == (s, m), (raw, got[raw])
