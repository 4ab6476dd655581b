"""Build the --py-files artifact for spark-submit (north rule ship mode).

    python scripts/build_pyfiles.py [out.zip]

Thin CLI over gov_procurement_spider_spark.shipping — the SAME builder the
driver contract's sc.addPyFile path uses, so both ship modes package
identical bytes. Default output: dist/gps_pyfiles-<digest>.zip. Feed it to

    spark-submit --master <cluster> --py-files <zip> scripts/crawl_job.py ...
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from gov_procurement_spider_spark.shipping import (  # noqa: E402
    content_addressed_zip,
    write_pyfiles_zip,
)


def build(out: str | None = None) -> str:
    if out is not None:
        return write_pyfiles_zip(out)
    return content_addressed_zip(out_dir=str(REPO / "dist"))


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
