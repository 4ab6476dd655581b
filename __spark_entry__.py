"""Driver contract for the spark-graft builder (PySpark target).

Delegates to gov_procurement_spider_spark's query registry; see
SURVEY.md §2 for the operator inventory each entry probes.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from gov_procurement_spider_spark.plans import (  # noqa: E402,F401
    crawl_query,  # registration side effects
    ml_ops,
    olap_extra,
    registry,
    relational,
    report_ops,
    string_ops,
    text_ops,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["a1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
