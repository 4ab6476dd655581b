"""Report-stage scalar operators (ref report_generator.py:7-57), as pure
column expressions inside whole-stage codegen — the reference re-reads CSV
between stages (post_processor.py:105 → report_generator.py:78); here the
whole report is one Catalyst plan over the records table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CJK = r"[一-龥]"


def clean_numeric_value(col: Column) -> Column:
    """F13 (ref report_generator.py:48-57): strip non-[0-9.], cast to double,
    downcast to integral when whole; null when nothing numeric remains.

    '3,200.00元' → 3200.0 ; '1.5万' → 1.5 ; 'N/A' → null.
    """
    cleaned = F.regexp_replace(col, r"[^0-9.]", "")
    num = F.when(cleaned.rlike(r"^[0-9]*\.?[0-9]+$"), cleaned.cast("double"))
    return num


def clean_numeric_display(col: Column) -> Column:
    """String form of clean_numeric_value matching the reference's display
    rule: integral floats render without '.0', non-numeric → 'N/A'."""
    num = clean_numeric_value(col)
    return F.when(num.isNull(), F.lit("N/A")).otherwise(
        F.when(
            num == F.floor(num), num.cast("long").cast("string")
        ).otherwise(num.cast("string"))
    )


def parse_spec_and_model(col: Column) -> tuple[Column, Column]:
    """F14 (ref report_generator.py:7-45): 4-case regex cascade splitting a
    规格型号 cell into (spec, model).

    1. parenthesized model:  '1.5P挂机（KFR-35GW）' → ('1.5P挂机','KFR-35GW')
       (both CJK （） and ASCII () parens)
    2. '型号：' keyword:       'xx 型号：ABC-1' → ('xx','ABC-1')
    3. CJK-prefix + alnum model suffix: '挂机 KFR-35GW' → ('挂机','KFR-35GW')
    4. looks-like-model-code heuristic: has a letter AND a digit AND <3 CJK
       chars → ('', whole)
    fallback: (whole, 'N/A')
    """
    s = F.trim(col)
    paren = F.regexp_extract(s, r"^(.*?)[（(]([^（）()]+)[）)]\s*$", 0)
    paren_spec = F.trim(F.regexp_extract(s, r"^(.*?)[（(]([^（）()]+)[）)]\s*$", 1))
    paren_model = F.trim(F.regexp_extract(s, r"^(.*?)[（(]([^（）()]+)[）)]\s*$", 2))

    kw_model = F.trim(F.regexp_extract(s, r"型号[:：]\s*(\S.*)$", 1))
    kw_spec = F.trim(F.regexp_replace(s, r"型号[:：]\s*\S.*$", ""))

    tail = F.regexp_extract(s, r"^(.*" + _CJK + r")\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$", 0)
    tail_spec = F.trim(
        F.regexp_extract(s, r"^(.*" + _CJK + r")\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$", 1)
    )
    tail_model = F.trim(
        F.regexp_extract(s, r"^(.*" + _CJK + r")\s+([A-Za-z0-9][A-Za-z0-9/_.-]*)$", 2)
    )

    n_cjk = F.length(s) - F.length(F.regexp_replace(s, _CJK, ""))
    looks_model = (
        s.rlike(r"[A-Za-z]") & s.rlike(r"[0-9]") & (n_cjk < 3)
    )

    spec = (
        F.when(paren != "", paren_spec)
        .when(kw_model != "", kw_spec)
        .when(tail != "", tail_spec)
        .when(looks_model, F.lit(""))
        .otherwise(s)
    )
    model = (
        F.when(paren != "", paren_model)
        .when(kw_model != "", kw_model)
        .when(tail != "", tail_model)
        .when(looks_model, s)
        .otherwise(F.lit("N/A"))
    )
    return spec, model
