"""Vectorized fetch UDF — the engine's replacement for the reference's
per-URL headless-Chrome lifecycle (jiangsu.py:218-232, driver_setup.py:36-40:
spawn + handshake + quit *per row*).

One `mapInPandas` pass per epoch fetches every selected frontier row inside
its partition: list pages yield discovered-link rows (next pagination page +
detail links, ref main.py:89-100), detail pages yield the image+caption
payload (BASELINE.json input_hint schema), and each batch appends one
``metric`` lineage row (per-partition fetch counts/bytes/wall — SURVEY §2.10
T6). In this sandbox the "network" is the deterministic synthetic site
(sources/site_model.py); on a real cluster this function body is the only
thing that changes (batched HTTP with connection reuse per partition).

Payload bytes are produced and written in the same partition-local stage —
they never enter a shuffle, and the epoch writes them exactly once
(partitionBy(row_type) lets downstream readers prune them away). Only the
small link rows (strings + ints) shuffle for dedup.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from ..functions import images
from ..sources import site_model as sm
from ..sources.site_model import SiteSpec

# unified output schema: link / payload / metric rows discriminated by row_type
FETCH_OUT_SCHEMA = (
    "row_type string, fetch_epoch int, priority int, disc_epoch int,"
    " seed_idx int, page_idx int, pos int, kind string, url string,"
    " host string, route string,"
    " image_id string, bytes binary, w int, h int, fmt string, caption string,"
    " phash long,"
    " urls_fetched long, links_discovered long, payload_bytes long, wall_ms long"
)

COLS = [
    "row_type", "fetch_epoch", "priority", "disc_epoch", "seed_idx",
    "page_idx", "pos", "kind", "url", "host", "route", "image_id", "bytes",
    "w", "h", "fmt", "caption", "phash",
    "urls_fetched", "links_discovered", "payload_bytes", "wall_ms",
]

_NULLABLE_INT = {
    "w": "Int32", "h": "Int32", "phash": "Int64",
    "urls_fetched": "Int64", "links_discovered": "Int64",
    "payload_bytes": "Int64", "wall_ms": "Int64",
    "priority": "Int32", "disc_epoch": "Int32", "seed_idx": "Int32",
    "page_idx": "Int32", "pos": "Int32",
}

_BASE = dict.fromkeys(COLS)


def _frame(rows: list[dict]) -> pd.DataFrame:
    # column-wise with explicit nullable dtypes: a plain pd.DataFrame(rows)
    # would infer float64 for mixed None/int columns and silently round
    # 64-bit phashes
    data = {
        c: pd.array([r[c] for r in rows], dtype=_NULLABLE_INT[c])
        if c in _NULLABLE_INT
        else [r[c] for r in rows]
        for c in COLS
    }
    return pd.DataFrame(data, columns=COLS)


# payload rows accumulate columnar (parallel lists), not as 22-key dicts:
# the dict-per-row + per-column re-gather in _frame cost ~50 µs of the
# ~250 µs per-detail-URL fetch budget. These are the per-row-varying
# columns; the rest are constants filled in _payload_frame.
_PAYLOAD_DYNAMIC = [
    "priority", "disc_epoch", "seed_idx", "page_idx", "pos", "url", "host",
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
]


def _payload_frame(pay: dict, epoch: int) -> pd.DataFrame:
    n = len(pay["url"])
    data = {}
    for c in COLS:
        if c in pay:
            vals = pay[c]
        elif c == "row_type":
            vals = ["payload"] * n
        elif c == "kind":
            vals = ["detail"] * n
        elif c == "fetch_epoch":
            vals = [epoch] * n
        else:  # route + metric columns: null on payload rows
            vals = [None] * n
        data[c] = (
            pd.array(vals, dtype=_NULLABLE_INT[c]) if c in _NULLABLE_INT else vals
        )
    return pd.DataFrame(data, columns=COLS)


def make_fetcher(spec: SiteSpec, epoch: int, validate: bool = True, links_acc=None):
    """Returns the mapInPandas function over selected frontier rows
    (priority, disc_epoch, seed_idx, page_idx, pos, kind, url, host).

    ``links_acc`` (optional Spark accumulator) receives the per-batch
    discovered-link count, letting the epoch skip a whole probe job over the
    metric rows. Accumulators in transformations can over-count on task
    retry, never under-count — and the epoch only branches on ``== 0``, so a
    retry inflating the count merely takes the (correct, slightly slower)
    admission path; it can never drop links."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t0 = time.perf_counter()
            out: list[dict] = []
            pay: dict = {c: [] for c in _PAYLOAD_DYNAMIC}
            n_payloads = n_links = n_bytes = 0
            for r in pdf.itertuples(index=False):
                if r.kind == "list":
                    # pagination: admit next list page before this page's details
                    if r.page_idx < sm.n_list_pages(spec, r.seed_idx):
                        out.append(
                            dict(
                                _BASE, row_type="link", fetch_epoch=epoch,
                                priority=r.priority, disc_epoch=-1,
                                seed_idx=r.seed_idx, page_idx=r.page_idx + 1,
                                pos=-1, kind="list",
                                url=sm.list_page_url(spec, r.seed_idx, r.page_idx + 1),
                                host=r.host,
                            )
                        )
                        n_links += 1
                    for pos in range(sm.n_links(spec, r.seed_idx, r.page_idx)):
                        child, route = sm.child_detail(spec, r.seed_idx, r.page_idx, pos)
                        out.append(
                            dict(
                                _BASE, row_type="link", fetch_epoch=epoch,
                                priority=r.priority, disc_epoch=-1,
                                seed_idx=r.seed_idx, page_idx=r.page_idx,
                                pos=pos, kind="detail", url=child, host=r.host,
                                route=route,
                            )
                        )
                        n_links += 1
                elif sm.fetch_fails(spec, r.url):
                    # failed fetch: consumed its politeness slot, recorded
                    # for lineage, no payload (ref main.py:124-127 skips)
                    out.append(
                        dict(
                            _BASE, row_type="failed", fetch_epoch=epoch,
                            priority=r.priority, disc_epoch=r.disc_epoch,
                            seed_idx=r.seed_idx, page_idx=r.page_idx,
                            pos=r.pos, kind="detail", url=r.url, host=r.host,
                        )
                    )
                else:  # detail leaf → image+caption payload
                    meta = sm.payload_meta(spec, r.url)
                    pixels = images.gen_pixels(
                        meta["pixel_seed"], meta["w"], meta["h"]
                    )
                    data = images.encode_image(pixels, meta["fmt"])
                    phash = images.ahash64(pixels)
                    # ingest-time validation (input_hint per-row invariant):
                    # decode what we stored, check PSNR≥40dB for lossy /
                    # exact for png, and that the perceptual hash survives
                    if validate:
                        dec = images.decode_image(data)
                        if meta["fmt"] == "png":
                            # exact pixel equality implies hash equality —
                            # the re-hash the lossy branch needs is
                            # redundant here (ahash is a pure function of
                            # the pixels)
                            ok = bool((dec == pixels).all())
                        else:
                            # lossy: pixels within PSNR gate, phash within a
                            # small hamming radius
                            dist = bin(
                                (images.ahash64(dec) ^ phash) & ((1 << 64) - 1)
                            ).count("1")
                            ok = images.psnr(pixels, dec) >= 40.0 and dist <= 8
                    else:
                        ok = True
                    if not ok:  # pragma: no cover - codec is deterministic
                        continue  # skip corrupt payload (ref skips failed
                        # fetches, main.py:124-127)
                    pay["priority"].append(r.priority)
                    pay["disc_epoch"].append(r.disc_epoch)
                    pay["seed_idx"].append(r.seed_idx)
                    pay["page_idx"].append(r.page_idx)
                    pay["pos"].append(r.pos)
                    pay["url"].append(r.url)
                    pay["host"].append(r.host)
                    pay["image_id"].append(meta["image_id"])
                    pay["bytes"].append(data)
                    pay["w"].append(meta["w"])
                    pay["h"].append(meta["h"])
                    pay["fmt"].append(meta["fmt"])
                    pay["caption"].append(meta["caption"])
                    pay["phash"].append(phash)
                    n_payloads += 1
                    n_bytes += len(data)
            out.append(
                dict(
                    _BASE, row_type="metric", fetch_epoch=epoch,
                    urls_fetched=len(pdf),
                    links_discovered=n_links, payload_bytes=n_bytes,
                    wall_ms=int((time.perf_counter() - t0) * 1000),
                )
            )
            if links_acc is not None:
                links_acc.add(n_links)
            frame = _frame(out)  # link/failed rows + the metric row
            if pay["url"]:
                pframe = _payload_frame(pay, epoch)
                frame = pd.concat([pframe, frame], ignore_index=True, copy=False)
            yield frame

    return fetch
