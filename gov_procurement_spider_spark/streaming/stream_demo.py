"""Structured Streaming surface (SURVEY §2.10): the reference's progress
stream (queue.Queue polled by the GUI, logger_config.py:35-45) generalizes
to a streaming pipeline over event data — windowed aggregation with a
watermark for late rows, and a foreachBatch sink that reuses the batch
engine's checkpoint commit protocol.

At scale the source is Kafka/files-on-arrival; here the parquet `events`
table read as a stream (maxFilesPerTrigger) drives the same plan, and the
memory sink + processAllAvailable make tests hermetic and synchronous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """readStream over the events table → watermarked tumbling-window counts.
    Returns the streaming DataFrame (caller attaches a sink)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source wants a directory: point it at sf_dir and
    # glob-filter to the events file (files-on-arrival shape)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so the
    # cast is identity
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_memory(sdf: DataFrame, name: str) -> None:
    """Drive a streaming DF to completion synchronously into a memory sink
    (hermetic test harness; production uses foreachBatch → epoch commit)."""
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
