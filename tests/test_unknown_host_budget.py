"""A frontier host the politeness table has never seen (first discovered
mid-crawl) must neither vanish from selection (the old null-budget bug: both
rn<=budget and rn>budget are null-false) nor fetch uncapped on the fast
path. It enters with a fresh floor(burst) budget and joins the politeness
table via the full-outer refill."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from gov_procurement_spider_spark.crawler.bloom import BloomFilter
from gov_procurement_spider_spark.functions.urls import url_hash64
from gov_procurement_spider_spark.plans.crawl import (
    FRONTIER_COLS,
    init_steady_frontier,
    run_epoch,
)
from gov_procurement_spider_spark.sources.site_model import SiteSpec
from gov_procurement_spider_spark.streaming import checkpoint as ck

SPEC = SiteSpec(n_hosts=2, rate_per_sec=1.0, burst=3.0, epoch_seconds=1.0)
N_UNKNOWN = 10  # pending on the unknown host: >> floor(burst) == 3


def _inject_unknown_host(spark, ckpt):
    """Append detail URLs for a host absent from the politeness table."""
    rows = [
        (9, 0, 1000 + i, 0, i, "detail", f"https://ghost.test/detail/g{i}", "ghost.test")
        for i in range(N_UNKNOWN)
    ]
    extra = spark.createDataFrame(
        rows,
        "priority int, disc_epoch int, seed_idx int, page_idx int, pos int,"
        " kind string, url string, host string",
    )
    # materialize driver-side before overwriting the path being read
    frontier = ck.read_table(spark, ckpt, 0, "frontier").unionByName(extra)
    fr_rows = frontier.select(*FRONTIER_COLS).collect()
    ck.write_table(
        spark.createDataFrame(fr_rows, frontier.select(*FRONTIER_COLS).schema),
        ckpt, 0, "frontier",
    )
    # their URLs are already 'seen' (admission happened upstream)
    seen = ck.read_table(spark, ckpt, 0, "seen_new").unionByName(
        extra.select(
            "url", url_hash64("url").alias("url_hash"), F.lit(0).alias("admit_epoch")
        )
    )
    seen_rows = seen.collect()
    ck.write_table(spark.createDataFrame(seen_rows, seen.schema), ckpt, 0, "seen_new")
    # hand-editing the frontier invalidates the carried host_counts (in the
    # real flow admissions maintain it via _next_host_counts) — drop it so
    # run_epoch takes the documented recompute fallback
    shutil.rmtree(ck.table_path(ckpt, 0, "host_counts"), ignore_errors=True)
    bf = BloomFilter(1024)
    bf.save(os.path.join(ck.epoch_dir(ckpt, 0), "bloom.npz"))


def test_unknown_host_selected_capped_and_tracked(spark):
    ckpt = tempfile.mkdtemp(prefix="ghost_")
    # known hosts get ample pending so the epoch runs the constrained path
    init_steady_frontier(spark, SPEC, ckpt, 40)
    _inject_unknown_host(spark, ckpt)

    n_frontier, n_sel = run_epoch(spark, SPEC, ckpt, 0, use_bloom=False)
    assert n_frontier == 40 + N_UNKNOWN

    log = spark.read.parquet(ck.table_path(ckpt, 1, "crawl_log"))
    ghost_fetched = log.filter(F.col("host") == "ghost.test").count()
    # neither vanished (old bug: 0) nor uncapped (fast path: 10)
    assert ghost_fetched == int(SPEC.burst)

    remaining = spark.read.parquet(ck.table_path(ckpt, 1, "frontier"))
    assert remaining.filter(F.col("host") == "ghost.test").count() == (
        N_UNKNOWN - int(SPEC.burst)
    )

    pol = spark.read.parquet(ck.table_path(ckpt, 1, "politeness"))
    ghost_rows = pol.filter(F.col("host") == "ghost.test").collect()
    assert len(ghost_rows) == 1  # full-outer refill added the new host
    # burst - taken + refill, capped at burst
    expected = min(SPEC.burst, SPEC.burst - int(SPEC.burst) + SPEC.rate_per_sec * SPEC.epoch_seconds)
    assert ghost_rows[0]["tokens"] == expected
