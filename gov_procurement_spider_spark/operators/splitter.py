"""E2 — prioritized-delimiter row splitter (ref post_processor.py:34-98).

The reference walks每 record in Python: try delimiters in priority order,
split 规格型号/数量/单价, accept the first delimiter where all three counts
are equal and >1 while 名称/品牌 counts are 1 or equal, emit N rows
(broadcasting scalar 名称/品牌), and tag each input with one of four
``split_status`` classes (post_processor.py:47,82,95,97):

    ok | attachment | mismatched | single_item

Here the whole cascade is pure column expressions — `split`, `filter`,
`size` equality, a `when` cascade picking the first qualifying delimiter,
`posexplode` on a 0..n-1 sequence with `element_at` (1-based, scalar
broadcast via size()==1) — so Catalyst constant-folds and codegens it; no
Python touches the data. The attachment bypass (P7, post_processor.py:44-48)
short-circuits splitting entirely.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# priority order from the reference (post_processor.py:32)
DELIMITERS = [";", "；", "、", "\n", "|"]

ATTACHMENT_MARK = "详见附件"

STATUS_OK = "ok"
STATUS_ATTACHMENT = "attachment"
STATUS_MISMATCHED = "mismatched"
STATUS_SINGLE = "single_item"


def _split_clean(col: Column, delim: str) -> Column:
    """Split on a literal delimiter, trim parts, drop empties."""
    arr = F.split(col, re.escape(delim), -1)
    return F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != "")


def with_split_status(
    df: DataFrame,
    name_col: str = "名称",
    brand_col: str = "品牌",
    spec_col: str = "规格型号",
    qty_col: str = "数量",
    price_col: str = "单价",
) -> DataFrame:
    """Add `split_status`, the chosen-delimiter arrays, and `n_items`."""
    core = [spec_col, qty_col, price_col]

    is_attachment = F.lit(False)
    for c in [name_col, *core]:
        is_attachment = is_attachment | F.coalesce(
            F.col(c).contains(ATTACHMENT_MARK), F.lit(False)
        )

    # Plan-construction discipline (round-4 profile): a chained-withColumn
    # version of this cascade spent 2.6 s per FRESH query build in driver-
    # side analysis — each withColumn re-analyzes the growing plan, O(n²)
    # in the ~30 added columns — vs 0.7 s of actual cluster execution.
    # Three bulk projections (withColumns) carry the same expressions with
    # linear analysis cost; the data-side plan is unchanged.

    # projection 1: all per-delimiter candidate arrays at once
    arrays = {}
    for i, d in enumerate(DELIMITERS):
        for prefix, colname in zip(
            "sqpnb", (spec_col, qty_col, price_col, name_col, brand_col)
        ):
            arrays[f"_{prefix}{i}"] = _split_clean(F.col(colname), d)
    out = df.withColumns(arrays)

    # projection 2: chosen delimiter + status (references projection 1's cols)
    chosen_idx = F.lit(-1)
    any_multi = F.lit(False)
    for i in range(len(DELIMITERS)):
        sz = F.size(F.col(f"_s{i}"))
        aligned = (
            (sz > 1)
            & (F.size(F.col(f"_q{i}")) == sz)
            & (F.size(F.col(f"_p{i}")) == sz)
            & ((F.size(F.col(f"_n{i}")) == 1) | (F.size(F.col(f"_n{i}")) == sz))
            & ((F.size(F.col(f"_b{i}")) == 1) | (F.size(F.col(f"_b{i}")) == sz))
        )
        chosen_idx = F.when(
            (chosen_idx == -1) & aligned & ~is_attachment, F.lit(i)
        ).otherwise(chosen_idx)
        any_multi = any_multi | (sz > 1) | (F.size(F.col(f"_q{i}")) > 1) | (
            F.size(F.col(f"_p{i}")) > 1
        )
    out = out.withColumns(
        {
            "_chosen": chosen_idx,
            "split_status": (
                F.when(is_attachment, STATUS_ATTACHMENT)
                .when(chosen_idx >= 0, STATUS_OK)
                .when(any_multi, STATUS_MISMATCHED)
                .otherwise(STATUS_SINGLE)
            ),
        }
    )

    # projection 3: the chosen arrays + n_items
    def pick(prefix: str) -> Column:
        c = F.when(F.lit(False), F.array())
        for i in range(len(DELIMITERS)):
            c = c.when(F.col("_chosen") == i, F.col(f"_{prefix}{i}"))
        return c.otherwise(F.array())

    spec_arr = pick("s")
    out = out.withColumns(
        {
            "_spec_arr": spec_arr,
            "_qty_arr": pick("q"),
            "_price_arr": pick("p"),
            "_name_arr": pick("n"),
            "_brand_arr": pick("b"),
            "n_items": F.when(
                F.col("split_status") == STATUS_OK, F.size(spec_arr)
            ).otherwise(F.lit(1)),
        }
    )
    return out.drop(
        *[f"_{p}{i}" for p in "sqpnb" for i in range(len(DELIMITERS))], "_chosen"
    )


def split_rows(
    df: DataFrame,
    name_col: str = "名称",
    brand_col: str = "品牌",
    spec_col: str = "规格型号",
    qty_col: str = "数量",
    price_col: str = "单价",
) -> DataFrame:
    """1→N explode of `with_split_status` output (post_processor.py:75-86):
    split rows take element i of each array, scalar 名称/品牌 broadcast;
    non-`ok` rows pass through as one row with `item_pos` 0."""
    staged = with_split_status(df, name_col, brand_col, spec_col, qty_col, price_col)
    exploded = staged.select(
        "*", F.posexplode(F.sequence(F.lit(0), F.col("n_items") - 1)).alias("item_pos", "_x")
    ).drop("_x")

    def elem(arr: str, fallback: str) -> Column:
        return F.when(
            F.col("split_status") != STATUS_OK, F.col(fallback)
        ).otherwise(
            F.element_at(
                F.col(arr),
                F.when(F.size(F.col(arr)) == 1, F.lit(1)).otherwise(
                    F.col("item_pos") + 1
                ),
            )
        )

    return exploded.withColumns(
        {
            spec_col: elem("_spec_arr", spec_col),
            qty_col: elem("_qty_arr", qty_col),
            price_col: elem("_price_arr", price_col),
            name_col: elem("_name_arr", name_col),
            brand_col: elem("_brand_arr", brand_col),
        }
    ).drop("_spec_arr", "_qty_arr", "_price_arr", "_name_arr", "_brand_arr", "n_items")
