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


def _zip_content_digest(path: Path) -> str | None:
    """md5 over the zip's entries, computed exactly like ``pyfiles_digest``
    (entry names sorted as flat strings — PurePath ordering IS flat string
    ordering — name bytes then content bytes), so it equals the source
    digest iff the zip really contains the current package bytes."""
    try:
        digest = hashlib.md5()
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                digest.update(name.encode())
                digest.update(z.read(name))
        return digest.hexdigest()
    except (OSError, zipfile.BadZipFile, KeyError):
        return None


def content_addressed_zip(out_dir: str | None = None, prefix: str = "gps_pyfiles") -> str:
    """The content-addressed zip path in ``out_dir``, built only if that
    exact content isn't already there.

    Default ``out_dir`` is the repo's own ``dist/`` — NOT the shared
    world-writable tempdir: sc.addPyFile executes whatever sits at this
    path on every worker, and a predictable name in /tmp would let any
    other local user pre-plant it (ADVICE r3). An existing file is reused
    only after its CONTENT digest is re-verified against the sources, so
    even a same-named file with foreign bytes is overwritten, never
    shipped."""
    d = Path(out_dir) if out_dir else _REPO_ROOT / "dist"
    digest = pyfiles_digest()
    out = d / f"{prefix}-{digest[:16]}.zip"
    if not out.exists() or _zip_content_digest(out) != digest:
        write_pyfiles_zip(str(out))
    return str(out)
