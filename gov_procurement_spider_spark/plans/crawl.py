"""The crawl scheduler: a distributed, checkpointed epoch loop over a
partitioned URL frontier (BASELINE.json north_rule).

Replaces the reference's strictly sequential fetch loop (main.py:69-140, one
in-flight request, fresh Chrome per URL, no persistence) with per-epoch
DataFrame dataflow:

  frontier ─ join politeness budgets ─ top-k per host (O2) ─► selected
  selected ─ mapInPandas fetch (S3, Arrow-vectorized) ─► payloads + links
  links ─ route filter (P5) ─ robots anti-filter (T3) ─ keep-first window
        ─ Bloom prefilter + exact anti-join vs seen (D1) ─► admitted
  commit: frontier' / politeness' / seen+ / fetched+ / crawl_log+ / metrics+
          / bloom, one manifest per epoch (T5)

Determinism: selection and dedup order by the data-carried key
(priority, disc_epoch, seed_idx, page_idx, pos) — never by execution order —
so any parallelism level yields the reference crawl order exactly
(refsim.simulate is the oracle; ref keep-first semantics main.py:111).

Scale design (100 TB / 10^10 URLs): payload bytes never shuffle (fetched
in-partition, written in-partition); only ~100-byte link rows shuffle for
dedup; the seen anti-join is Bloom-prefiltered so definite-new URLs skip it;
the frontier shuffles hash-partitioned by host (politeness is a per-host
constraint, so host-partitioning also co-locates the budget join); skewed
hosts can't exceed their politeness budget, which bounds per-host epoch work
by construction — the salting knob exists for the *link-dedup* shuffle where
hot URLs would concentrate (dedup partitions by full url, which is already
uniform under hash).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..crawler.bloom import BloomFilter
from ..crawler.fetcher import FETCH_OUT_SCHEMA, make_fetcher
from ..functions.urls import url_hash64, url_path
from ..sources import site_model as sm
from ..sources.site_model import SiteSpec
from ..streaming import checkpoint as ck

ORDER_KEY = ["priority", "disc_epoch", "seed_idx", "page_idx", "pos"]
FRONTIER_COLS = ORDER_KEY + ["kind", "url", "host"]


@dataclass
class CrawlResult:
    ckpt: str
    epochs: int
    spark: SparkSession

    def _union(self, name: str) -> DataFrame:
        paths = [
            ck.table_path(self.ckpt, e, name)
            for e in ck.committed_epochs(self.ckpt)
            if os.path.isdir(ck.table_path(self.ckpt, e, name))
        ]
        return self.spark.read.parquet(*paths)

    def crawl_order(self) -> DataFrame:
        """Total crawl order: (epoch, host, key...) ascending — the proof
        artifact compared against refsim (north rule)."""
        return self._union("crawl_log").orderBy(["epoch", "host"] + ORDER_KEY)

    def fetched(self) -> DataFrame:
        return self._union("fetched")

    def seen(self) -> DataFrame:
        return self._union("seen_new")

    def metrics(self) -> DataFrame:
        return self._union("metrics")


def _bloom_expected(spec: SiteSpec) -> int:
    per_seed = spec.max_list_pages * (1 + spec.max_links_per_page)
    return max(1024, spec.n_seeds * per_seed)


def init_state(spark: SparkSession, spec: SiteSpec, ckpt: str) -> None:
    """Epoch-0 state: seed frontier, seen=seeds, politeness=burst, robots,
    Bloom seeded with the seed URLs. All generated as Spark jobs."""
    n = spec.n_seeds

    def gen_seeds(batches):
        for pdf in batches:
            ids = pdf["id"].astype(int)
            yield pd.DataFrame(
                {
                    "priority": [sm.seed_priority(spec, i) for i in ids],
                    "disc_epoch": 0,
                    "seed_idx": ids,
                    "page_idx": 1,
                    "pos": -1,
                    "kind": "list",
                    "url": [sm.seed_url(spec, i) for i in ids],
                    "host": [sm.seed_host(spec, i) for i in ids],
                }
            )

    seeds = (
        spark.range(n)
        .repartition(max(1, min(32, n // 8 or 1)))
        .mapInPandas(
            gen_seeds,
            schema="priority int, disc_epoch int, seed_idx bigint, page_idx int,"
            " pos int, kind string, url string, host string",
        )
        .withColumn("seed_idx", F.col("seed_idx").cast("int"))
    )
    # keep-first on url (parity with refsim's seed admission loop)
    wdup = W.partitionBy("url").orderBy(*ORDER_KEY)
    frontier = (
        seeds.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .repartition("host")
    )
    ck.write_table(frontier.select(*FRONTIER_COLS), ckpt, 0, "frontier")

    seen = frontier.select(
        "url", url_hash64("url").alias("url_hash"), F.lit(0).alias("admit_epoch")
    )
    ck.write_table(seen, ckpt, 0, "seen_new")

    hosts = frontier.select("host").distinct()
    ck.write_table(
        hosts.withColumn("tokens", F.lit(float(spec.burst))), ckpt, 0, "politeness"
    )

    def gen_robots(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "host": pdf["host"],
                    "disallow_prefixes": [
                        sm.robots_disallows(spec, h) for h in pdf["host"]
                    ],
                }
            )

    robots = hosts.mapInPandas(
        gen_robots, schema="host string, disallow_prefixes array<string>"
    )
    ck.write_table(robots, ckpt, 0, "robots")

    bf = BloomFilter(_bloom_expected(spec))
    _bloom_add_from_df(bf, seen.select("url_hash"))
    bf.save(os.path.join(ck.epoch_dir(ckpt, 0), "bloom.npz"))
    ck.commit_epoch(ckpt, 0, {"n_seeds": frontier.count(), "kind": "init"})


def _bloom_add_from_df(bf: BloomFilter, hashes_df: DataFrame) -> None:
    """Distributed Bloom build: per-partition bitmaps OR-reduced (treeReduce)
    — the 10^10-scale path; no driver-side row collection."""
    m, k = bf.m, bf.k

    def part(rows):
        local = BloomFilter.__new__(BloomFilter)
        local.m, local.k = m, k
        local.bits = np.zeros(m // 8, dtype=np.uint8)
        h = np.fromiter((r[0] for r in rows), dtype=np.int64)
        local.add_many(h)
        yield local.bits

    rdd = hashes_df.rdd.mapPartitions(part)
    if rdd.isEmpty():
        return
    bf.bits |= rdd.treeReduce(np.bitwise_or)


def _bloom_filter_udf(bf: BloomFilter):
    bits, m, k = bf.bits, bf.m, bf.k

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        local = BloomFilter.__new__(BloomFilter)
        local.m, local.k, local.bits = m, k, bits
        return pd.Series(local.maybe_contains(h.to_numpy(dtype=np.int64)))

    return maybe_seen


def _advance_politeness(
    spec: SiteSpec, politeness: DataFrame, active: DataFrame, taken: DataFrame | None
) -> DataFrame:
    """Token-bucket transition (T2): refill only hosts with pending rows this
    epoch (spec shared with refsim — idle hosts keep stale tokens)."""
    refill = float(spec.rate_per_sec * spec.epoch_seconds)
    pol_active = politeness.join(active, "host", "inner")
    if taken is not None:
        pol_active = pol_active.join(taken, "host", "left").fillna(
            0, subset=["n_taken"]
        )
    else:
        pol_active = pol_active.withColumn("n_taken", F.lit(0))
    pol_active = pol_active.withColumn(
        "tokens",
        F.least(
            F.lit(float(spec.burst)),
            F.col("tokens") - F.col("n_taken") + F.lit(refill),
        ),
    ).drop("n_taken")
    pol_idle = politeness.join(active, "host", "left_anti")
    return pol_active.unionByName(pol_idle)


def run_epoch(
    spark: SparkSession, spec: SiteSpec, ckpt: str, epoch: int, use_bloom: bool = True
) -> tuple[int, int]:
    """Process epoch `epoch` (state dir `epoch`) → commit dir `epoch+1`.
    Returns (frontier size, URLs fetched); frontier 0 ⇒ crawl done.

    A zero-budget epoch (frontier pending but every active host's bucket
    below 1 token) still commits: politeness refills and virtual time
    advances, matching the simulator's cadence exactly."""
    frontier = ck.read_table(spark, ckpt, epoch, "frontier").persist()
    n_frontier = frontier.count()
    if n_frontier == 0:
        frontier.unpersist()
        return 0, 0
    politeness = ck.read_table(spark, ckpt, epoch, "politeness")
    robots = ck.read_table(spark, ckpt, 0, "robots")
    out_epoch = epoch + 1
    active = frontier.select("host").distinct()

    budgets = politeness.withColumn("budget", F.floor("tokens").cast("int"))
    wsel = W.partitionBy("host").orderBy(*ORDER_KEY)
    ranked = (
        frontier.join(F.broadcast(budgets), "host", "left")
        .withColumn("rn", F.row_number().over(wsel))
        .persist()
    )
    selected = ranked.filter(F.col("rn") <= F.col("budget")).select(*FRONTIER_COLS)
    remaining = ranked.filter(F.col("rn") > F.col("budget")).select(*FRONTIER_COLS)

    n_selected = selected.count()
    if n_selected == 0:
        # virtual-time tick: refill buckets, carry frontier unchanged
        ck.write_table(frontier.select(*FRONTIER_COLS), ckpt, out_epoch, "frontier")
        ck.write_table(
            _advance_politeness(spec, politeness, active, None),
            ckpt,
            out_epoch,
            "politeness",
        )
        if use_bloom:
            BloomFilter.load(
                os.path.join(ck.epoch_dir(ckpt, epoch), "bloom.npz")
            ).save(os.path.join(ck.epoch_dir(ckpt, out_epoch), "bloom.npz"))
        ck.commit_epoch(
            ckpt,
            out_epoch,
            {"processed_epoch": epoch, "urls_fetched": 0, "urls_admitted": 0},
        )
        ranked.unpersist()
        frontier.unpersist()
        return n_frontier, 0

    # ---- fetch (payloads stay partition-local; written before any shuffle)
    fetch_out_path = ck.table_path(ckpt, out_epoch, "fetch_out")
    selected.mapInPandas(make_fetcher(spec), schema=FETCH_OUT_SCHEMA).write.mode(
        "overwrite"
    ).parquet(fetch_out_path)
    fetch_out = spark.read.parquet(fetch_out_path)

    ck.write_table(
        selected.withColumn("epoch", F.lit(epoch)), ckpt, out_epoch, "crawl_log"
    )
    payloads = fetch_out.filter(F.col("row_type") == "payload").drop("row_type", "route")
    ck.write_table(
        payloads.withColumn("fetch_epoch", F.lit(epoch)), ckpt, out_epoch, "fetched"
    )

    # ---- metrics / lineage per output partition (T6)
    metrics = (
        fetch_out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.when(F.col("row_type") == "payload", 1)).alias("urls_fetched"),
            F.count(F.when(F.col("row_type") == "link", 1)).alias("links_discovered"),
            F.coalesce(F.sum(F.length("bytes")), F.lit(0)).alias("payload_bytes"),
        )
        .withColumn("epoch", F.lit(epoch))
    )
    ck.write_table(metrics, ckpt, out_epoch, "metrics")

    # ---- admission: route filter → robots → keep-first → bloom+anti-join
    links = (
        fetch_out.filter(F.col("row_type") == "link")
        .select(*FRONTIER_COLS, "route")
        .withColumn("disc_epoch", F.lit(out_epoch))
    )
    links = links.filter(
        (F.col("kind") == "list") | (F.col("route") != sm.ROUTE_UNKNOWN)
    ).drop("route")
    links = (
        links.join(F.broadcast(robots), "host", "left")
        .withColumn("_path", url_path("url"))
        .filter(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                "disallow_prefixes", lambda p: F.col("_path").startswith(p)
            )
        )
        .drop("disallow_prefixes", "_path")
    )
    wdup = W.partitionBy("url").orderBy(*ORDER_KEY)
    cand = (
        links.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("url_hash", url_hash64("url"))
    )

    seen_paths = [
        ck.table_path(ckpt, e, "seen_new") for e in range(0, epoch + 1)
    ]
    seen = spark.read.parquet(*seen_paths).select("url")

    if use_bloom:
        bf = BloomFilter.load(os.path.join(ck.epoch_dir(ckpt, epoch), "bloom.npz"))
        cand = cand.withColumn("_maybe", _bloom_filter_udf(bf)("url_hash")).persist()
        definite_new = cand.filter(~F.col("_maybe")).drop("_maybe")
        suspect = cand.filter(F.col("_maybe")).drop("_maybe")
        admitted = definite_new.unionByName(
            suspect.join(seen, "url", "left_anti")
        ).persist()
    else:
        bf = None
        admitted = cand.join(seen, "url", "left_anti").persist()

    n_admitted = admitted.count()

    # ---- commit next state
    new_frontier = remaining.unionByName(admitted.select(*FRONTIER_COLS)).repartition(
        "host"
    )
    ck.write_table(new_frontier, ckpt, out_epoch, "frontier")
    ck.write_table(
        admitted.select(
            "url", "url_hash", F.lit(out_epoch).alias("admit_epoch")
        ),
        ckpt,
        out_epoch,
        "seen_new",
    )

    taken = selected.groupBy("host").agg(F.count(F.lit(1)).alias("n_taken"))
    ck.write_table(
        _advance_politeness(spec, politeness, active, taken),
        ckpt,
        out_epoch,
        "politeness",
    )

    if use_bloom and bf is not None:
        _bloom_add_from_df(bf, admitted.select("url_hash"))
        bf.save(os.path.join(ck.epoch_dir(ckpt, out_epoch), "bloom.npz"))

    ck.commit_epoch(
        ckpt,
        out_epoch,
        {
            "processed_epoch": epoch,
            "urls_fetched": n_selected,
            "urls_admitted": n_admitted,
        },
    )
    ranked.unpersist()
    frontier.unpersist()
    if use_bloom:
        cand.unpersist()
    admitted.unpersist()
    return n_frontier, n_selected


def run_crawl(
    spark: SparkSession,
    spec: SiteSpec,
    ckpt: str,
    max_epochs: int = 10_000,
    use_bloom: bool = True,
    resume: bool = True,
) -> CrawlResult:
    """Run (or resume) the crawl to frontier exhaustion."""
    if resume:
        ck.cleanup_uncommitted(ckpt)
    last = ck.last_committed(ckpt)
    if last is None:
        init_state(spark, spec, ckpt)
        last = 0
    epoch = last
    while epoch < max_epochs:
        n_frontier, _ = run_epoch(spark, spec, ckpt, epoch, use_bloom=use_bloom)
        if n_frontier == 0:
            break
        epoch += 1
    return CrawlResult(ckpt=ckpt, epochs=epoch, spark=spark)
