"""Per-query profiler: wall + CPU-seconds + final AQE plan per headline query.

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/qprof.py <tag> [query ...]

For each query: 1 warm rep (discarded), REPS timed reps of a FRESH
DataFrame build + .count() (the bench protocol), recording per-rep wall,
build-wall (DataFrame construction, driver-side analysis) and CPU-seconds
(sum utime+stime over every owned process — the storm-proof instrument).
After the last rep the executed (final AQE) plan is written to
plans/r06/<query>_<tag>_final.txt. Emits one JSON line per query and a
summary JSON at the end to BENCH/raw_r6/qprof_<tag>.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TAG = sys.argv[1] if len(sys.argv) > 1 else "t0"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
REPS = int(os.environ.get("QPROF_REPS", "3"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_HZ = os.sysconf("SC_CLK_TCK")
_ME = os.getuid()


def cpu_all() -> float:
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            if os.stat(f"/proc/{pid}").st_uid != _ME:
                continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _HZ
        except (OSError, IndexError):
            continue
    return total


HEADLINE = [
    "a1_pricing_summary", "j1_broadcast_enrich", "j4_dim_lookup_chain",
    "d1_ordered_dedup_first", "d1b_anti_join_seen", "o2_topk_per_group",
    "a2_collapse_concat", "w3_fill_forward", "e2_delimiter_split",
    "dd2_ngram_jaccard", "dd4_minhash_lsh_pairs", "dd7_simhash_pairs",
    "ml1_cosine_topk", "ml3_ann_topk", "dd6_embedding_near_dup",
]


def main() -> None:
    from gov_procurement_spider_spark.session import get_spark
    import __spark_entry__ as entry

    names = sys.argv[2:] or HEADLINE
    spark = get_spark(app_name=f"qprof_{TAG}", master=f"local[{CPUS}]")
    qs = entry.queries()
    out_path = REPO / "BENCH" / "raw_r6" / f"qprof_{TAG}.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    plans_dir = REPO / "plans" / "r06"
    plans_dir.mkdir(parents=True, exist_ok=True)
    results = {}
    with open(out_path, "a") as out:
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} warm")
            qs[name](spark, SF).count()  # warm
            walls, builds, cpus = [], [], []
            df = None
            for i in range(REPS):
                spark.sparkContext.setJobDescription(f"{name} rep{i}")
                c0 = cpu_all()
                t0 = time.perf_counter()
                df = qs[name](spark, SF)
                t1 = time.perf_counter()
                df.count()
                t2 = time.perf_counter()
                walls.append(round(t2 - t0, 4))
                builds.append(round(t1 - t0, 4))
                cpus.append(round(cpu_all() - c0, 2))
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{name}_{TAG}_final.txt").write_text(plan)
            rec = {"q": name, "wall": walls, "build": builds, "cpu": cpus}
            results[name] = rec
            out.write(json.dumps({"tag": TAG, "sf": SF, **rec}) + "\n")
            out.flush()
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
