"""CPU-second A/B probe — the storm-proof instrument for hot-path changes.

Wall-clock A/B is unreadable through this box's co-tenant throttle storms
(round 5: the same binary read 1.9 s and 51.9 s for ml3 minutes apart).
This probe instead measures total CPU consumed by OUR processes — the JVM
plus every spawned python worker — per query run: Σ Δ(utime+stime) over
/proc/<pid>/stat for every live process owned by this uid. Scheduling
delay cannot inflate it (turbo-frequency shifts can, mildly — still ~10×
less noisy than walls; see BENCH/ATTRIBUTION_r5.md Postscript 5, raw
readings in BENCH/raw_r5/ab_cpu.jsonl).

Usage:
    python scripts/cpu_ab.py <repo_dir> [query ...]

Run it alternately against two checkouts (repo vs a `git worktree` of the
build under comparison) and compare warm-rep CPU columns; first rep is the
cold JVM/codegen path, discard it. Emits one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(__file__))
QUERIES = sys.argv[2:] or ["ml1_cosine_topk", "ml3_ann_topk", "dd6_embedding_near_dup"]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("CPU_AB_REPS", "4"))

sys.path.insert(0, REPO)
from gov_procurement_spider_spark.session import get_spark  # noqa: E402

_HZ = os.sysconf("SC_CLK_TCK")
_ME = os.getuid()


def cpu_all() -> float:
    """Sum utime+stime (seconds) of every live process owned by this uid.

    Caveats (round-5 ADVICE): this is uid-wide, not session-scoped —
    unrelated same-uid work (a pytest session, shells) inflates deltas,
    and a process that EXITS between the two samples drops its accumulated
    CPU, so deltas can under-count or go negative. Run probes on an
    otherwise-idle box (the same discipline walls already need here) and
    discard reps that overlap other work. Round 6 adds: the burst-credit
    throttle inflates CPU-seconds too (frequency scaling — the same query
    read ~40 and ~80 CPU-s minutes apart); check vmstat steal DURING."""
    total = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            if os.stat(f"/proc/{pid}").st_uid != _ME:
                continue
            with open(f"/proc/{pid}/stat") as f:
                # field 2 (comm) may contain spaces/parens: split after ') '
                parts = f.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _HZ  # utime, stime
        except (OSError, IndexError):
            continue
    return total


def main() -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in QUERIES:
        walls, cpus = [], []
        for _ in range(REPS):
            c0, t0 = cpu_all(), time.monotonic()
            qs[name](spark, SF).count()
            walls.append(round(time.monotonic() - t0, 3))
            cpus.append(round(cpu_all() - c0, 2))
        out[name] = {"wall": walls, "cpu": cpus}
    print(json.dumps({"repo": REPO, "sf": SF, "q": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
