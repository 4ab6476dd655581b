"""Stateful streaming politeness gate (applyInPandasWithState)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from gov_procurement_spider_spark.streaming.stateful_politeness import politeness_gate


@pytest.fixture(scope="module")
def request_stream_dir(spark):
    """Two parquet files → two micro-batches of fetch requests."""
    d = tempfile.mkdtemp(prefix="req_stream_")
    for batch in (0, 1):
        rows = [
            (f"h{i % 3}.test", f"https://h{i % 3}.test/detail/{batch * 100 + i}")
            for i in range(12)
        ]
        spark.createDataFrame(rows, ["host", "url"]).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    return d


def test_token_bucket_gates_per_host(spark, request_stream_dir):
    schema = spark.read.parquet(request_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(request_stream_dir)
    )
    gated = politeness_gate(stream, rate_per_batch=1.0, burst=2.0)
    q = (
        gated.writeStream.outputMode("update")
        .format("memory")
        .queryName("gated")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM gated")
    per_host = (
        out.groupBy("host")
        .agg(
            F.count(F.when(F.col("decision") == "allowed", 1)).alias("allowed"),
            F.count(F.when(F.col("decision") == "deferred", 1)).alias("deferred"),
        )
        .collect()
    )
    assert len(per_host) == 3
    for r in per_host:
        # batch 1: burst=2 allowed; batch 2: refill 1 → 1 allowed; 4 req/host/batch
        assert r.allowed == 3, r
        assert r.deferred == 8 - 3, r
    # the bucket never goes negative
    assert out.filter(F.col("tokens_after") < 0).count() == 0
