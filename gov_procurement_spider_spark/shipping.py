"""The ONE implementation of the --py-files artifact (north rule ship mode).

Both consumers — `__spark_entry__._ensure_shipped` (the driver contract's
sc.addPyFile) and `scripts/build_pyfiles.py` (the spark-submit CLI) — build
their zip here, so what ships through either path is the same bytes by
construction. Content-addressed naming: a stale zip can never be shipped
after the package changes, identical content is reused instead of
accumulating, and the atomic rename makes concurrent builders race safely.

Only usable from a checkout (driver side): when the package itself was
imported from a zip, there are no source files to walk.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent
_PKG = "gov_procurement_spider_spark"


def _sources() -> list[Path]:
    return sorted((_REPO_ROOT / _PKG).rglob("*.py"))


def pyfiles_digest() -> str:
    digest = hashlib.md5()
    for p in _sources():
        digest.update(bytes(p.relative_to(_REPO_ROOT)))
        digest.update(p.read_bytes())
    return digest.hexdigest()


def write_pyfiles_zip(out_path: str) -> str:
    """Write the package zip to ``out_path`` atomically (tmp + rename)."""
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix(f".{os.getpid()}.tmp")
    with zipfile.ZipFile(tmp, "w") as z:
        for p in _sources():
            z.write(p, p.relative_to(_REPO_ROOT))
    tmp.replace(out)
    return str(out)


def content_addressed_zip(out_dir: str | None = None, prefix: str = "gps_pyfiles") -> str:
    """The content-addressed zip path in ``out_dir`` (default: tempdir),
    built only if that exact content isn't already there."""
    d = Path(out_dir) if out_dir else Path(tempfile.gettempdir())
    out = d / f"{prefix}-{pyfiles_digest()[:16]}.zip"
    if not out.exists():
        write_pyfiles_zip(str(out))
    return str(out)
