"""Vectorized fetch UDF — the engine's replacement for the reference's
per-URL headless-Chrome lifecycle (jiangsu.py:218-232, driver_setup.py:36-40:
spawn + handshake + quit *per row*).

One `mapInPandas` pass per epoch fetches every selected frontier row inside
its partition: list pages yield discovered-link rows (next pagination page +
detail links, ref main.py:89-100), detail pages yield the image+caption
payload (BASELINE.json input_hint schema). In this sandbox the "network" is
the deterministic synthetic site (sources/site_model.py); on a real cluster
this function body is the only thing that changes (batched HTTP with
connection reuse per partition).

Payload bytes are produced and written in the same partition-local stage —
they never enter a shuffle (SURVEY §7 hard part 4). Only the small link rows
(strings + ints) shuffle for dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..functions import images
from ..sources import site_model as sm
from ..sources.site_model import SiteSpec

# unified output schema: link rows and payload rows discriminated by row_type
FETCH_OUT_SCHEMA = (
    "row_type string, priority int, disc_epoch int, seed_idx int, page_idx int,"
    " pos int, kind string, url string, host string, route string,"
    " image_id string, bytes binary, w int, h int, fmt string, caption string,"
    " phash long"
)

_LINK_NULLS = {
    "image_id": None, "bytes": None, "w": None, "h": None,
    "fmt": None, "caption": None, "phash": None,
}


def make_fetcher(spec: SiteSpec):
    """Returns the mapInPandas function over selected frontier rows
    (priority, disc_epoch, seed_idx, page_idx, pos, kind, url, host)."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for r in pdf.itertuples(index=False):
                if r.kind == "list":
                    # pagination: admit next list page before this page's details
                    if r.page_idx < sm.n_list_pages(spec, r.seed_idx):
                        out.append(
                            dict(
                                row_type="link", priority=r.priority,
                                disc_epoch=-1, seed_idx=r.seed_idx,
                                page_idx=r.page_idx + 1, pos=-1, kind="list",
                                url=sm.list_page_url(spec, r.seed_idx, r.page_idx + 1),
                                host=r.host, route=None, **_LINK_NULLS,
                            )
                        )
                    for pos in range(sm.n_links(spec, r.seed_idx, r.page_idx)):
                        child, route = sm.child_detail(spec, r.seed_idx, r.page_idx, pos)
                        out.append(
                            dict(
                                row_type="link", priority=r.priority,
                                disc_epoch=-1, seed_idx=r.seed_idx,
                                page_idx=r.page_idx, pos=pos, kind="detail",
                                url=child, host=r.host, route=route, **_LINK_NULLS,
                            )
                        )
                else:  # detail leaf → image+caption payload
                    meta = sm.payload_meta(spec, r.url)
                    data, phash = images.make_payload(
                        meta["pixel_seed"], meta["w"], meta["h"], meta["fmt"]
                    )
                    out.append(
                        dict(
                            row_type="payload", priority=r.priority,
                            disc_epoch=r.disc_epoch, seed_idx=r.seed_idx,
                            page_idx=r.page_idx, pos=r.pos, kind="detail",
                            url=r.url, host=r.host, route=None,
                            image_id=meta["image_id"], bytes=data,
                            w=meta["w"], h=meta["h"], fmt=meta["fmt"],
                            caption=meta["caption"], phash=phash,
                        )
                    )
            cols = [
                "row_type", "priority", "disc_epoch", "seed_idx", "page_idx",
                "pos", "kind", "url", "host", "route", "image_id", "bytes",
                "w", "h", "fmt", "caption", "phash",
            ]
            # build column-wise with explicit nullable dtypes: a plain
            # pd.DataFrame(out) would infer float64 for mixed None/int
            # columns and silently round 64-bit phashes
            nullable_int = {"w": "Int32", "h": "Int32", "phash": "Int64"}
            data = {
                c: pd.array([r[c] for r in out], dtype=nullable_int[c])
                if c in nullable_int
                else [r[c] for r in out]
                for c in cols
            }
            yield pd.DataFrame(data, columns=cols)

    return fetch
