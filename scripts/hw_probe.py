"""Hardware scaling probe (no Spark): measures how much IDENTICAL
single-threaded work slows down when neighboring cores are busy.

On a single box, local[4N] necessarily runs with 4× more active cores than
local[N]; all-core turbo limits and shared memory bandwidth then slow every
thread — an artifact real multi-node scaling does not have (added nodes
bring their own clocks and memory buses). This probe quantifies that
hardware factor so BENCH/BASELINE.md's raw numbers can be read correctly.

Usage: python scripts/hw_probe.py   → one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _work_ms(n: int = 400) -> float:
    from gov_procurement_spider_spark.functions import images
    from gov_procurement_spider_spark.sources import site_model as sm

    spec = sm.SiteSpec(max_dim=64)
    t0 = time.perf_counter()
    for i in range(n):
        meta = sm.payload_meta(spec, f"https://h1.test/detail/x{i}")
        px = images.gen_pixels(meta["pixel_seed"], meta["w"], meta["h"])
        data = images.encode_image(px, meta["fmt"])
        images.ahash64(px)
        images.decode_image(data)
    return (time.perf_counter() - t0) / n * 1000


def main() -> None:
    os.sched_setaffinity(0, {0})
    n_cores = os.cpu_count() or 32
    out = {}
    for nbusy in (0, 1, 7, 15, n_cores - 1):
        spinners = [
            subprocess.Popen(
                ["taskset", "-c", str(c), sys.executable, "-c", "while True: pass"]
            )
            for c in range(1, 1 + nbusy)
        ]
        try:
            time.sleep(1.5)
            out[f"busy_{nbusy}"] = round(_work_ms(), 4)
        finally:
            for p in spinners:
                p.kill()
    base = out["busy_0"]
    out["inflation_full_load"] = round(out[f"busy_{n_cores - 1}"] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
