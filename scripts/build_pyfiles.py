"""Build the --py-files artifact for spark-submit (north rule ship mode).

    python scripts/build_pyfiles.py [out.zip]

Zips every gov_procurement_spider_spark/*.py under a content-addressed name
(default dist/gps_pyfiles-<md5 prefix>.zip) and prints the path — feed it to

    spark-submit --master <cluster> --py-files <zip> scripts/crawl_job.py ...
"""

from __future__ import annotations

import hashlib
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: str | None = None) -> str:
    pkg_root = REPO
    sources = sorted((pkg_root / "gov_procurement_spider_spark").rglob("*.py"))
    digest = hashlib.md5()
    for p in sources:
        digest.update(bytes(p.relative_to(pkg_root)))
        digest.update(p.read_bytes())
    if out is None:
        dist = REPO / "dist"
        dist.mkdir(exist_ok=True)
        out = str(dist / f"gps_pyfiles-{digest.hexdigest()[:12]}.zip")
    with zipfile.ZipFile(out, "w") as z:
        for p in sources:
            z.write(p, p.relative_to(pkg_root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
