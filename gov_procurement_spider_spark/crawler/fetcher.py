"""Vectorized fetch UDF — the engine's replacement for the reference's
per-URL headless-Chrome lifecycle (jiangsu.py:218-232, driver_setup.py:36-40:
spawn + handshake + quit *per row*).

One `mapInArrow` pass per epoch fetches every selected frontier row inside
its partition: list pages yield discovered-link rows (next pagination page +
detail links, ref main.py:89-100), detail pages yield the image+caption
payload (BASELINE.json input_hint schema), and each batch appends one
``metric`` lineage row (per-partition fetch counts/bytes/wall — SURVEY §2.10
T6). In this sandbox the "network" is the deterministic synthetic site
(sources/site_model.py); on a real cluster this function body is the only
thing that changes (batched HTTP with connection reuse per partition).

Round 6: the boundary is Arrow-native end to end (was mapInPandas).
Payload bytes previously crossed worker→JVM through a pandas frame — one
``pd.array(…, dtype="Int64")`` boxing pass per nullable column plus a
pandas→Arrow conversion per batch; now every output column is built ONCE
as a pyarrow array and the record batches ship as-is. The round-1 gotcha
that motivated the nullable dtypes (mixed None/int inferring float64 and
rounding 64-bit phashes) disappears with pandas itself: pa.array with an
explicit int64 type is exact by construction.

Payload bytes are produced and written in the same partition-local stage —
they never enter a shuffle, and the epoch writes them exactly once
(partitionBy(row_type) lets downstream readers prune them away). Only the
small link rows (strings + ints) shuffle for dedup.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa

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

# pyarrow mirror of FETCH_OUT_SCHEMA (int → int32, long → int64) — mapInArrow
# ships these batches to the JVM verbatim, so the types must match exactly
_PA_TYPES = {
    "row_type": pa.string(), "fetch_epoch": pa.int32(),
    "priority": pa.int32(), "disc_epoch": pa.int32(),
    "seed_idx": pa.int32(), "page_idx": pa.int32(), "pos": pa.int32(),
    "kind": pa.string(), "url": pa.string(), "host": pa.string(),
    "route": pa.string(), "image_id": pa.string(), "bytes": pa.binary(),
    "w": pa.int32(), "h": pa.int32(), "fmt": pa.string(),
    "caption": pa.string(), "phash": pa.int64(),
    "urls_fetched": pa.int64(), "links_discovered": pa.int64(),
    "payload_bytes": pa.int64(), "wall_ms": pa.int64(),
}
PA_SCHEMA = pa.schema([(c, _PA_TYPES[c]) for c in COLS])

# per-row-varying columns of each section; everything else is a constant or
# null for that row_type and is filled column-wise in _batch
_LINK_DYNAMIC = [
    "priority", "disc_epoch", "seed_idx", "page_idx", "pos", "kind", "url",
    "host", "route",
]
_PAYLOAD_DYNAMIC = [
    "priority", "disc_epoch", "seed_idx", "page_idx", "pos", "url", "host",
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
]


def _batch(dynamic: dict, constants: dict, n: int) -> pa.RecordBatch:
    """One output record batch from column lists + per-batch constants:
    every remaining schema column is null."""
    arrays = []
    for c in COLS:
        t = _PA_TYPES[c]
        if c in dynamic:
            arrays.append(pa.array(dynamic[c], type=t))
        elif c in constants:
            arrays.append(pa.array([constants[c]] * n, type=t))
        else:
            arrays.append(pa.nulls(n, type=t))
    return pa.RecordBatch.from_arrays(arrays, schema=PA_SCHEMA)


def make_fetcher(spec: SiteSpec, epoch: int, validate: bool = True, links_acc=None):
    """Returns the mapInArrow function over selected frontier rows
    (priority, disc_epoch, seed_idx, page_idx, pos, kind, url, host).

    ``links_acc`` (optional Spark accumulator) receives the per-batch
    discovered-link count, letting the epoch skip a whole probe job over the
    metric rows. Accumulators in transformations can over-count on task
    retry, never under-count — and the epoch only branches on ``== 0``, so a
    retry inflating the count merely takes the (correct, slightly slower)
    admission path; it can never drop links."""

    def fetch(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            t0 = time.perf_counter()
            col = {name: rb.column(i).to_pylist() for i, name in enumerate(rb.schema.names)}
            link: dict = {c: [] for c in _LINK_DYNAMIC}
            failed: dict = {c: [] for c in _LINK_DYNAMIC if c != "route"}
            pay: dict = {c: [] for c in _PAYLOAD_DYNAMIC}
            n_links = n_bytes = 0
            for prio, de, seed_idx, page_idx, pos, kind, url, host in zip(
                col["priority"], col["disc_epoch"], col["seed_idx"],
                col["page_idx"], col["pos"], col["kind"], col["url"],
                col["host"],
            ):
                if kind == "list":
                    # pagination: admit next list page before this page's details
                    if page_idx < sm.n_list_pages(spec, seed_idx):
                        link["priority"].append(prio)
                        link["disc_epoch"].append(-1)
                        link["seed_idx"].append(seed_idx)
                        link["page_idx"].append(page_idx + 1)
                        link["pos"].append(-1)
                        link["kind"].append("list")
                        link["url"].append(
                            sm.list_page_url(spec, seed_idx, page_idx + 1)
                        )
                        link["host"].append(host)
                        link["route"].append(None)
                        n_links += 1
                    for p2 in range(sm.n_links(spec, seed_idx, page_idx)):
                        child, route = sm.child_detail(spec, seed_idx, page_idx, p2)
                        link["priority"].append(prio)
                        link["disc_epoch"].append(-1)
                        link["seed_idx"].append(seed_idx)
                        link["page_idx"].append(page_idx)
                        link["pos"].append(p2)
                        link["kind"].append("detail")
                        link["url"].append(child)
                        link["host"].append(host)
                        link["route"].append(route)
                        n_links += 1
                elif sm.fetch_fails(spec, url):
                    # failed fetch: consumed its politeness slot, recorded
                    # for lineage, no payload (ref main.py:124-127 skips)
                    failed["priority"].append(prio)
                    failed["disc_epoch"].append(de)
                    failed["seed_idx"].append(seed_idx)
                    failed["page_idx"].append(page_idx)
                    failed["pos"].append(pos)
                    failed["kind"].append("detail")
                    failed["url"].append(url)
                    failed["host"].append(host)
                else:  # detail leaf → image+caption payload
                    meta = sm.payload_meta(spec, url)
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
                    pay["priority"].append(prio)
                    pay["disc_epoch"].append(de)
                    pay["seed_idx"].append(seed_idx)
                    pay["page_idx"].append(page_idx)
                    pay["pos"].append(pos)
                    pay["url"].append(url)
                    pay["host"].append(host)
                    pay["image_id"].append(meta["image_id"])
                    pay["bytes"].append(data)
                    pay["w"].append(meta["w"])
                    pay["h"].append(meta["h"])
                    pay["fmt"].append(meta["fmt"])
                    pay["caption"].append(meta["caption"])
                    pay["phash"].append(phash)
                    n_bytes += len(data)
            if links_acc is not None:
                links_acc.add(n_links)
            # payload rows first, then links, failed, and the metric row —
            # the order the mapInPandas version concatenated them in
            if pay["url"]:
                yield _batch(
                    pay,
                    {"row_type": "payload", "kind": "detail", "fetch_epoch": epoch},
                    len(pay["url"]),
                )
            if link["url"]:
                yield _batch(
                    link, {"row_type": "link", "fetch_epoch": epoch}, len(link["url"])
                )
            if failed["url"]:
                yield _batch(
                    failed,
                    {"row_type": "failed", "fetch_epoch": epoch},
                    len(failed["url"]),
                )
            yield _batch(
                {},
                {
                    "row_type": "metric", "fetch_epoch": epoch,
                    "urls_fetched": rb.num_rows,
                    "links_discovered": n_links, "payload_bytes": n_bytes,
                    "wall_ms": int((time.perf_counter() - t0) * 1000),
                },
                1,
            )

    return fetch
