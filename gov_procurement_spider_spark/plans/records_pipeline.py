"""Records + report pipeline — the reference's full §3 lifecycle fused into
single Catalyst plans.

Reference flow (SURVEY §3.2): crawl CSV → post_processor (E2 split, new CSV)
→ report_generator (F13/F14, third CSV) — three processes, disk between each.
Here: fetched payloads → 13-column `records` (exact schema + column order of
main.py:154-158) → row split (E2) → report projection (F13/F14), one lazy
DataFrame program; Catalyst fuses the three stages, and nothing is
materialized between them.

The graft swaps HTML parsing for caption extraction (BASELINE.json
input_hint): every field of a record derives from the image+caption payload
via F3-style regex extraction — vectorized column expressions, no Python.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.report import clean_numeric_display, parse_spec_and_model
from ..operators.splitter import split_rows

# normative 13-column order (ref main.py:154-158)
RECORD_COLUMNS = [
    "发布日期", "项目号", "采购方式", "项目名称", "供应商名称", "中标金额",
    "名称", "品牌", "规格型号", "数量", "单价", "链接", "省份",
]

# host → province dimension (ref province_mapping.py:3-16 shape)
_HOST_PROVINCE = {f"h{i}.test": p for i, p in enumerate(
    ["江苏", "重庆", "四川", "河北", "湖南", "广东", "湖北", "浙江",
     "安徽", "山东", "广西", "北京", "上海", "天津", "福建", "云南"]
)}


def records_from_fetched(fetched: DataFrame) -> DataFrame:
    """Parse the image+caption payload table into the 13-column records
    schema. All-string columns with 'N/A' sentinels, exactly like the
    reference's parsers (parser_module_specification.md:29-52); the caption
    plays the role of the detail page's text (F3 regex-extract-with-default,
    e.g. chongqing.py:44-54)."""
    cap = F.col("caption")
    item_no = F.regexp_extract(cap, r"^item (\d+)", 1)
    brand = F.regexp_extract(cap, r"空调 (.+)$", 1)
    province_map = F.create_map(
        *[F.lit(x) for kv in _HOST_PROVINCE.items() for x in kv]
    )
    # deterministic numeric fields derived from the payload hash so the
    # report stage has real F13/E2 work to do
    h = F.abs(F.col("phash"))
    qty_n = (h % 4) + 1
    amount = F.concat(
        F.format_number((h % 1_000_000) / 100.0, 2), F.lit("元")
    )
    # ~every 3rd record multi-valued (aligned) → exercises the splitter
    multi = (h % 3) == 0
    spec_base = F.concat(F.lit("KFR-"), (h % 900 + 100).cast("string"), F.lit("GW"))
    spec = F.when(
        multi, F.concat(spec_base, F.lit("；"), spec_base, F.lit("/N8"))
    ).otherwise(spec_base)
    qty = F.when(multi, F.concat(qty_n.cast("string"), F.lit("；"), (qty_n + 1).cast("string"))).otherwise(
        qty_n.cast("string")
    )
    price = F.when(
        multi,
        F.concat(((h % 5000) + 1000).cast("string"), F.lit("；"), ((h % 7000) + 1200).cast("string")),
    ).otherwise(((h % 5000) + 1000).cast("string"))

    na = lambda c: F.coalesce(F.nullif(c, F.lit("")), F.lit("N/A"))  # noqa: E731
    return fetched.select(
        F.date_format(
            F.date_add(F.lit("2026-01-01").cast("date"), F.col("fetch_epoch")),
            "yyyy-MM-dd",
        ).alias("发布日期"),
        na(F.col("image_id")).alias("项目号"),
        F.lit("公开招标").alias("采购方式"),
        na(item_no).alias("项目名称"),
        na(F.col("host")).alias("供应商名称"),
        na(amount).alias("中标金额"),
        F.lit("空调").alias("名称"),
        na(brand).alias("品牌"),
        na(spec).alias("规格型号"),
        na(qty).alias("数量"),
        na(price).alias("单价"),
        na(F.col("url")).alias("链接"),
        F.coalesce(province_map[F.col("host")], F.lit("N/A")).alias("省份"),
    )


REPORT_COLUMNS = [
    "发布日期", "项目号", "项目名称", "供应商名称", "名称", "品牌",
    "规格", "型号", "数量", "单价", "备注", "链接", "省份",
]


def report_from_records(records: DataFrame) -> DataFrame:
    """records → split (E2) → spec/model + numeric clean (F14/F13) → report
    projection with 备注 from split_status (ref report_generator.py:86-121);
    the three reference stages fuse into one plan, split_status is computed,
    consumed, and dropped without ever hitting disk."""
    split = split_rows(records)
    spec, model = parse_spec_and_model(F.col("规格型号"))
    remark = (
        F.when(F.col("split_status") == "attachment", "详见附件")
        .when(F.col("split_status") == "mismatched", "字段数不匹配，未拆分")
        .otherwise(F.lit(""))
    )
    gated = F.col("split_status") == "ok"
    return split.select(
        "发布日期", "项目号", "项目名称", "供应商名称", "名称", "品牌",
        spec.alias("规格"),
        model.alias("型号"),
        # numeric coercion only for cleanly split rows (report_generator.py:103-108)
        F.when(gated, clean_numeric_display(F.col("数量")))
        .otherwise(F.col("数量"))
        .alias("数量"),
        F.when(gated, clean_numeric_display(F.col("单价")))
        .otherwise(F.col("单价"))
        .alias("单价"),
        remark.alias("备注"),
        "链接", "省份",
    )


def csv_compat_sink(df: DataFrame, path: str) -> None:
    """Reference-compatible CSV sink (main.py:161: utf-8-sig, na_rep='N/A').
    coalesce(1) mirrors the single-file contract — the Iceberg/parquet sink
    is the real one at scale. Spark's CSV writer emits plain UTF-8, so the
    utf-8-sig BOM the reference's pandas ``to_csv(encoding='utf-8-sig')``
    produces is prepended to the single part file afterward (driver-side,
    legal only because this sink is single-file by contract)."""
    df.na.fill("N/A").coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(path)
    for name in os.listdir(path):
        if name.startswith("part-") and name.endswith(".csv"):
            fp = os.path.join(path, name)
            with open(fp, "rb") as f:
                data = f.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                with open(fp, "wb") as f:
                    f.write(b"\xef\xbb\xbf" + data)
                # the local ChecksumFileSystem's sidecar no longer matches
                crc = os.path.join(path, f".{name}.crc")
                if os.path.exists(crc):
                    os.remove(crc)


def csv_compat_source(spark, path: str) -> DataFrame:
    """S5 CSV source (post_processor.py:29, converter.py:35: the reference
    re-reads its own CSV between every stage). All-string schema inference
    off, header on; 'N/A' stays a literal string (the reference's sentinel
    travels through pandas as text, not NaN — nullValue is set to an
    impossible token so Spark never nulls it)."""
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .option("nullValue", "\x00never\x00")
        .csv(path)
    )
