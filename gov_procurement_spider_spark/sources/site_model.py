"""Deterministic synthetic web-site model.

Pure functions (no Spark, no wall clock, no network) defining a finite crawl
universe keyed by a single integer seed, mirroring the reference site's
structure (FIXTURES.md §1-3):

    seed URLs (search queries, one host each, Zipf-skewed hosts)
      └─ list pages 1..P  (pagination; ref main.py:69-108)
           └─ K detail links per page, drawn from a bounded id space so
              ~10% of links repeat across pages (exercises keep-first
              dedup, ref main.py:111)
                └─ detail pages are leaves carrying an image+caption
                   payload (BASELINE.json input_hint schema)

Both the Spark engine (vectorized UDFs) and the sequential reference
simulator (refsim.py) call these same functions, so crawl-order equivalence
is a property of the scheduler, not of the data.

The 64-bit URL hash is sha256-prefix based so the Python and Spark column
implementations (functions/urls.py) agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

ROUTE_CENTRAL = "central"  # ref /zygg/ analog (chongqing.py:155-162)
ROUTE_LOCAL = "local"  # ref /dfgg/ analog
ROUTE_UNKNOWN = "unknown"  # no-parser skip path (main.py:119-122)

BRANDS = ("格力", "美的", "海尔", "奥克斯", "TCL")


def h64(s: str) -> int:
    """Deterministic 60-bit hash: int of the first 15 hex chars of sha256.

    15 hex chars keeps it positive and inside a signed 64-bit long, and is
    reproducible in Spark SQL as
    ``conv(substring(sha2(s, 256), 1, 15), 16, 10)`` (functions/urls.py).
    """
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:15], 16)


@dataclass(frozen=True)
class SiteSpec:
    """Parameters of the synthetic universe. Same (spec) → same site, always."""

    seed: int = 42
    n_seeds: int = 32
    n_hosts: int = 8
    detail_space: int = 400  # bounded detail-id space → cross-page duplicate links
    max_list_pages: int = 5  # P(seed) = 1 + hash % max_list_pages
    max_links_per_page: int = 8  # K(page) = 3 + hash % (max-2)
    zipf_s: float = 1.2  # host skew (a few ccgp-style portals dominate)
    # politeness (reference cadence: 2 s sleep per fetch → 0.5 req/s, main.py:102)
    rate_per_sec: float = 0.5
    burst: float = 1.0
    epoch_seconds: float = 2.0
    # payload
    max_dim: int = 64  # w,h in [8, 8+max_dim)
    # fetch failures (ref main.py:124-127: failed fetches are skipped with a
    # warning but still consumed a fetch slot); ‰ of detail fetches that fail
    fail_permille: int = 0


# ---------------------------------------------------------------------------
# hosts & seeds
# ---------------------------------------------------------------------------


def _zipf_cdf(spec: SiteSpec) -> list[float]:
    w = [1.0 / (i + 1) ** spec.zipf_s for i in range(spec.n_hosts)]
    tot = sum(w)
    acc, cdf = 0.0, []
    for x in w:
        acc += x / tot
        cdf.append(acc)
    return cdf


def seed_host(spec: SiteSpec, i: int) -> str:
    u = (h64(f"seedhost:{spec.seed}:{i}") % 10_000_019) / 10_000_019.0
    for hid, c in enumerate(_zipf_cdf(spec)):
        if u <= c:
            return f"h{hid}.test"
    return f"h{spec.n_hosts - 1}.test"


def seed_url(spec: SiteSpec, i: int) -> str:
    return f"https://{seed_host(spec, i)}/search?kw=kw{i}&page=1"


def seed_priority(spec: SiteSpec, i: int) -> int:
    return h64(f"prio:{spec.seed}:{i}") % 10


def n_list_pages(spec: SiteSpec, i: int) -> int:
    return 1 + h64(f"pages:{spec.seed}:{i}") % spec.max_list_pages


def list_page_url(spec: SiteSpec, i: int, page_idx: int) -> str:
    return f"https://{seed_host(spec, i)}/search?kw=kw{i}&page={page_idx}"


# ---------------------------------------------------------------------------
# link graph
# ---------------------------------------------------------------------------


def n_links(spec: SiteSpec, i: int, page_idx: int) -> int:
    return 3 + h64(f"k:{spec.seed}:{i}:{page_idx}") % (spec.max_links_per_page - 2)


def child_detail(spec: SiteSpec, i: int, page_idx: int, pos: int) -> tuple[str, str]:
    """(detail_url, route) for link `pos` on list page `page_idx` of seed `i`.

    Detail ids live in a bounded space → intentional cross-page collisions.
    ~10% of details sit under /private/ (robots-disallowed, FIXTURES.md §6);
    routes split central/local/unknown like the ref dispatcher.
    """
    host = seed_host(spec, i)
    did = h64(f"detail:{spec.seed}:{i}:{page_idx}:{pos}") % spec.detail_space
    r = h64(f"route:{spec.seed}:{host}:{did}") % 10
    route = ROUTE_CENTRAL if r < 4 else (ROUTE_LOCAL if r < 8 else ROUTE_UNKNOWN)
    private = h64(f"priv:{spec.seed}:{host}:{did}") % 10 == 0
    prefix = "/private" if private else ""
    return f"https://{host}{prefix}/detail/{did}", route


def robots_disallows(spec: SiteSpec, host: str) -> list[str]:
    """~20% of hosts disallow /private/ (FIXTURES.md §6)."""
    return ["/private/"] if h64(f"robots:{spec.seed}:{host}") % 5 == 0 else []


def url_allowed(spec: SiteSpec, url: str) -> bool:
    host = url.split("//", 1)[1].split("/", 1)[0]
    path = "/" + url.split("//", 1)[1].split("/", 1)[1] if "/" in url.split("//", 1)[1] else "/"
    return not any(path.startswith(p) for p in robots_disallows(spec, host))


# ---------------------------------------------------------------------------
# detail payload (image + caption, input_hint schema)
# ---------------------------------------------------------------------------


def fetch_fails(spec: SiteSpec, detail_url: str) -> bool:
    """Deterministic fetch-failure predicate (timeouts in the reference)."""
    if spec.fail_permille <= 0:
        return False
    return h64(f"fail:{spec.seed}:{detail_url}") % 1000 < spec.fail_permille


def payload_meta(spec: SiteSpec, detail_url: str) -> dict:
    """Deterministic payload metadata for a detail URL (FIXTURES.md §3)."""
    uh = h64(f"payload:{spec.seed}:{detail_url}")
    return {
        "image_id": hashlib.sha1(detail_url.encode()).hexdigest()[:16],
        "w": 8 + uh % spec.max_dim,
        "h": 8 + (uh >> 8) % spec.max_dim,
        "fmt": "png" if (uh >> 16) % 2 == 0 else "jpeg",
        "caption": f"item {uh % 1_000_000} 空调 {BRANDS[uh % len(BRANDS)]}",
        "pixel_seed": uh % (2**32),
    }
