"""--py-files artifact builder: content-addressed cache hardening (ADVICE
r3: never ship a pre-planted zip; never cache under the shared tempdir by
default). Pure filesystem — no SparkSession."""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

from gov_procurement_spider_spark.shipping import (
    _REPO_ROOT,
    _zip_content_digest,
    content_addressed_zip,
    pyfiles_digest,
)


def test_default_cache_is_repo_dist_not_tempdir():
    out = Path(content_addressed_zip())
    assert out.parent == _REPO_ROOT / "dist"
    assert _REPO_ROOT / "dist" != Path(tempfile.gettempdir())


def test_zip_content_digest_matches_source_digest():
    out = content_addressed_zip()
    assert _zip_content_digest(Path(out)) == pyfiles_digest()


def test_preplanted_zip_is_rebuilt_not_shipped(tmp_path):
    """A file already sitting at the predictable content-addressed path but
    holding FOREIGN bytes must be overwritten before use — reuse requires
    the content digest to re-verify against the sources."""
    planted = tmp_path / f"gps_pyfiles-{pyfiles_digest()[:16]}.zip"
    with zipfile.ZipFile(planted, "w") as z:
        z.writestr("gov_procurement_spider_spark/__init__.py", "import os  # evil")
    out = Path(content_addressed_zip(out_dir=str(tmp_path)))
    assert out == planted
    assert _zip_content_digest(out) == pyfiles_digest()
    with zipfile.ZipFile(out) as z:
        assert "evil" not in z.read("gov_procurement_spider_spark/__init__.py").decode()


def test_corrupt_cached_zip_is_rebuilt(tmp_path):
    planted = tmp_path / f"gps_pyfiles-{pyfiles_digest()[:16]}.zip"
    planted.write_bytes(b"not a zip at all")
    out = Path(content_addressed_zip(out_dir=str(tmp_path)))
    assert _zip_content_digest(out) == pyfiles_digest()
