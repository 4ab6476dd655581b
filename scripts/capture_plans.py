"""Capture .explain("formatted") for every headline query into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt. Driver-only work (no jobs executed
beyond what plan analysis needs), safe to run alongside nothing.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")

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
    spark = get_spark(app_name="capture_plans", master="local[4]")
    qs = entry.queries()
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{SUFFIX}.txt").write_text(plan)
        print(name, "->", f"{name}_{SUFFIX}.txt", len(plan), "chars")
    spark.stop()


if __name__ == "__main__":
    main()
