"""Sequential reference simulator — the crawl-equivalence oracle.

Reimplements the reference spider's control flow (main.py:66-140) over the
synthetic site: FIFO pagination, admission-time keep-first dedup
(main.py:111), skip-unknown-route (main.py:119-122), plus the north rule's
politeness token bucket (reference cadence 0.5 req/s from the 2 s sleep,
main.py:102) and robots filtering, generalized to many seeds/hosts in
*virtual time* (epochs). Pure Python, single-threaded, no Spark: the Spark
engine (plans/crawl.py) must produce the exact same crawl order and URL-seen
set (BASELINE.json north_rule).

Scheduling spec shared by both implementations:

- frontier entry key: (priority, disc_epoch, seed_idx, page_idx, pos);
  pos = -1 for list pages so pagination continues before that page's details,
  matching the reference's discover-all-then-fetch order per seed.
- per epoch, per host: budget = floor(tokens); fetch the `budget` smallest
  pending keys; tokens = min(burst, tokens - fetched + rate*epoch_seconds).
- fetching a list page (seed i, page p) at epoch e admits, at disc_epoch e+1:
  the next list page (if p < P(i)) and that page's robots-allowed,
  known-route detail links, each admitted only if never seen before
  (keep-first across the whole crawl, first = smallest admission key).
- crawl order = fetched rows sorted by (epoch, host, priority, disc_epoch,
  seed_idx, page_idx, pos). Every component is data, so the order is total
  and parallelism-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .sources import site_model as sm
from .sources.site_model import SiteSpec


@dataclass
class SimResult:
    crawl_order: list[tuple]  # (epoch, host, priority, disc_epoch, seed, page, pos, kind, url)
    url_seen: set[str]
    fetched_details: list[dict]  # payload rows in crawl order
    epochs: int = 0
    skipped_robots: int = 0
    skipped_route: int = 0
    dup_dropped: int = 0
    extra: dict = field(default_factory=dict)


def simulate(spec: SiteSpec, max_epochs: int = 100_000) -> SimResult:
    frontier: list[tuple] = []  # (prio, disc_epoch, seed, page, pos, kind, url, host)
    seen: set[str] = set()
    res = SimResult([], set(), [])

    for i in range(spec.n_seeds):
        u = sm.seed_url(spec, i)
        if u in seen:
            res.dup_dropped += 1
            continue
        seen.add(u)
        frontier.append(
            (sm.seed_priority(spec, i), 0, i, 1, -1, "list", u, sm.seed_host(spec, i))
        )

    tokens: dict[str, float] = {}
    epoch = 0
    while frontier and epoch < max_epochs:
        by_host: dict[str, list[tuple]] = {}
        for row in frontier:
            by_host.setdefault(row[7], []).append(row)

        fetched_this_epoch: list[tuple] = []
        remaining: list[tuple] = []
        for host, rows in by_host.items():
            t = tokens.get(host, spec.burst)
            budget = int(t)
            # url (r[6]) appended as a guaranteed-unique final tiebreaker —
            # the same extended key the engine's selection windows order by
            rows.sort(key=lambda r: r[:5] + (r[6],))
            take, leave = rows[:budget], rows[budget:]
            fetched_this_epoch.extend(take)
            remaining.extend(leave)
            tokens[host] = min(spec.burst, t - len(take) + spec.rate_per_sec * spec.epoch_seconds)

        # global deterministic order of this epoch's fetches
        fetched_this_epoch.sort(key=lambda r: (r[7],) + r[:5] + (r[6],))
        admissions: list[tuple] = []
        for prio, de, i, p, pos, kind, url, host in fetched_this_epoch:
            res.crawl_order.append((epoch, host, prio, de, i, p, pos, kind, url))
            if kind == "detail":
                if sm.fetch_fails(spec, url):
                    res.extra.setdefault("failed", []).append(url)
                else:
                    meta = sm.payload_meta(spec, url)
                    res.fetched_details.append({"url": url, **meta})
                continue
            # list page: admit next page + this page's detail links
            if p < sm.n_list_pages(spec, i):
                admissions.append(
                    (prio, epoch + 1, i, p + 1, -1, "list", sm.list_page_url(spec, i, p + 1), host)
                )
            for pos2 in range(sm.n_links(spec, i, p)):
                child, route = sm.child_detail(spec, i, p, pos2)
                if route == sm.ROUTE_UNKNOWN:
                    res.skipped_route += 1
                    continue
                if not sm.url_allowed(spec, child):
                    res.skipped_robots += 1
                    continue
                admissions.append((prio, epoch + 1, i, p, pos2, "detail", child, host))

        # keep-first admission dedup (within epoch by key, then vs seen)
        admissions.sort(key=lambda r: r[:5] + (r[6],))
        frontier = remaining
        for row in admissions:
            if row[6] in seen:
                res.dup_dropped += 1
                continue
            seen.add(row[6])
            frontier.append(row)
        epoch += 1

    res.url_seen = seen
    res.epochs = epoch
    return res
