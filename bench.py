"""Benchmark harness (driver contract).

Runs the headline relational queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS], plus a politeness-unconstrained crawl of the
synthetic site to measure scheduler throughput (urls scheduled+fetched/sec —
the BASELINE.json metric). Prints ONE JSON line:

  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls": n, "sec": s, "urls_per_sec": r}}

Scaling efficiency (N vs 4N cores) is measured by scripts/scaling_bench.py,
which shells out to this file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from gov_procurement_spider_spark.plans import (  # noqa: E402,F401
    ml_ops,
    olap_extra,
    registry as qregistry,
    relational,
    report_ops,
    text_ops,
)
from gov_procurement_spider_spark.plans.crawl import (  # noqa: E402
    init_steady_frontier,
    run_crawl,
    run_epoch,
)
from gov_procurement_spider_spark.session import get_spark  # noqa: E402
from gov_procurement_spider_spark.sources.site_model import SiteSpec  # noqa: E402

HEADLINE = [
    "a1_pricing_summary",
    "j1_broadcast_enrich",
    "j4_dim_lookup_chain",
    "d1_ordered_dedup_first",
    "d1b_anti_join_seen",
    "o2_topk_per_group",
    "a2_collapse_concat",
    "w3_fill_forward",
    "e2_delimiter_split",
    "dd2_ngram_jaccard",
    "dd4_minhash_lsh_pairs",
    "ml1_cosine_topk",
    "ml3_ann_topk",
    "dd6_embedding_near_dup",
]

# throughput-mode site: politeness effectively unconstrained so the scheduler,
# not the token bucket, is what's measured
BENCH_SPEC = SiteSpec(
    n_seeds=int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "96")),
    n_hosts=16,
    detail_space=20_000,
    max_list_pages=5,
    max_links_per_page=10,
    rate_per_sec=10_000.0,
    burst=20_000.0,
    epoch_seconds=2.0,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")

    registry = qregistry.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in registry:
            continue
        fn = registry[name]
        fn(spark, sf_dir).count()  # warm (JIT, file listing); measure 2nd run
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        total += dt

    # full-site crawl (pagination + dedup + politeness machinery end-to-end)
    ckpt = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        t0 = time.perf_counter()
        res = run_crawl(spark, BENCH_SPEC, ckpt)
        crawl_sec = time.perf_counter() - t0
        n_urls = res.crawl_order().count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    timings["crawl_synthetic_site"] = round(crawl_sec, 4)
    total += crawl_sec

    # steady-state epoch throughput (the BASELINE.json metric's regime:
    # frontier ≫ budget, one huge scheduling+fetch pass)
    ss_urls = int(os.environ.get("SPARK_GRAFT_SS_URLS", "50000"))
    ss_spec = SiteSpec(
        n_hosts=64, rate_per_sec=float(ss_urls), burst=float(ss_urls), max_dim=96
    )
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ss_ckpt = tempfile.mkdtemp(prefix="bench_ss_", dir=tmp_root)
    try:
        init_steady_frontier(spark, ss_spec, ss_ckpt, ss_urls)
        t0 = time.perf_counter()
        run_epoch(spark, ss_spec, ss_ckpt, 0)
        ss_sec = time.perf_counter() - t0
    finally:
        shutil.rmtree(ss_ckpt, ignore_errors=True)
    timings["crawl_steady_state_epoch"] = round(ss_sec, 4)
    total += ss_sec

    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "crawl": {
                    "urls": n_urls,
                    "sec": round(crawl_sec, 4),
                    "urls_per_sec": round(n_urls / crawl_sec, 2),
                    "epochs": res.epochs,
                },
                "steady_state": {
                    "urls": ss_urls,
                    "sec": round(ss_sec, 4),
                    "urls_per_sec": round(ss_urls / ss_sec, 2),
                },
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
