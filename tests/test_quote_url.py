"""quote_url's contract is `urllib.parse.quote(s)` — checked against urllib
itself over every divergence class between Java URLEncoder (what
F.url_encode is) and Python quote: space, '~', '*', '/', plus non-ASCII,
'%'-containing, and already-encoded-looking inputs (round-3 review caught
the '/' rewrite pointing the wrong way; this pins all four directions)."""

from __future__ import annotations

from urllib.parse import quote

from pyspark.sql import functions as F

from gov_procurement_spider_spark.plans.report_ops import quote_url

CASES = [
    "hello world",
    "a/b/c",
    "tilde~key",
    "star*glob",
    "mixed ~/* all",
    "采购公告",
    "united states 采购公告",
    "percent%sign",
    "looks%7Eencoded",
    "a+b",  # literal plus must become %2B, not space
    "",
    "UPPER lower 0123 _.-",
]


def test_quote_url_matches_urllib(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string").select(
        "s", quote_url(F.col("s")).alias("q")
    )
    for row in df.collect():
        assert row["q"] == quote(row["s"]), (row["s"], row["q"], quote(row["s"]))
