"""Driver-contract image query (im1): the image operator family's oracle row.

The graft cell is pyspark × IMAGE, yet until round 3 image operators were
verified only inside the crawl's per-row ingest gates and pytest
(operators/images_ops.py, functions/images.py). This gives the family a
DuckDB-checked driver row built like au1 (plans/audio_plan.py): pixels come
from a PURE INTEGER recurrence (reproducible in SQL), travel through the
real container format — encode_image → binary column → decode_image, the
same codec the crawl payload path uses — and reduce to EXACT integer
aggregates inside the Arrow-batched UDF. The fake-jpeg path is genuinely
lossy and its quantization ((v//4)·4+2, functions/images.py:44,60) is
applied symbolically by the oracle, so the LOSSY DECODE SEMANTICS are what
the cross-engine hash actually checks. Float features are shared final
column expressions over identical integers — bit-exact in both engines.

Scale notes: synth, encode, decode, and aggregation are partition-local
mapInPandas — payload bytes never shuffle (the images_ops/crawl rule)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.images import decode_image, encode_image
from ..sources.tables import load_table
from .registry import register

# per-doc image geometry + generator params, identical as SQL text and numpy
_W_DUCK = "(24 + (doc_id % 5) * 8)"
_H_DUCK = "(16 + (doc_id % 3) * 8)"
_A_DUCK = (
    "(CASE WHEN ((doc_id * 1103515245) % 9973) % 2 = 0"
    " THEN ((doc_id * 1103515245) % 9973) + 1"
    " ELSE ((doc_id * 1103515245) % 9973) END)"
)
_B_DUCK = "((doc_id * 12345) % 256)"
_FMT_DUCK = "(CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END)"

_BRIGHT_LUM = 384  # r+g+b threshold for the bright-pixel fraction


def _pixels(doc_id: int) -> np.ndarray:
    w = 24 + (doc_id % 5) * 8
    h = 16 + (doc_id % 3) * 8
    a = (doc_id * 1103515245) % 9973
    if a % 2 == 0:
        a += 1
    b = (doc_id * 12345) % 256
    # pixel p (row-major), channel c: ((a·(3p+c+1) + b) mod 256)
    idx = np.arange(1, w * h * 3 + 1, dtype=np.int64)
    return ((a * idx + b) % 256).astype(np.uint8).reshape(h, w, 3)


def synth_image_table(docs: DataFrame) -> DataFrame:
    """(doc_id) → input_hint-style binary image table via the real encoder
    (container format + zlib; jpeg rows are genuinely lossy)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype(np.int64)
            rows = {
                "image_id": [], "doc_id": [], "w": [], "h": [], "fmt": [],
                "bytes": [],
            }
            for i in ids:
                i = int(i)
                px = _pixels(i)
                fmt = "png" if i % 2 == 0 else "jpeg"
                rows["image_id"].append("im" + str(i))
                rows["doc_id"].append(i)
                rows["w"].append(px.shape[1])
                rows["h"].append(px.shape[0])
                rows["fmt"].append(fmt)
                rows["bytes"].append(encode_image(px, fmt))
            yield pd.DataFrame(
                {
                    "image_id": rows["image_id"],
                    "doc_id": np.asarray(rows["doc_id"], dtype=np.int64),
                    "w": np.asarray(rows["w"], dtype=np.int32),
                    "h": np.asarray(rows["h"], dtype=np.int32),
                    "fmt": rows["fmt"],
                    "bytes": rows["bytes"],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema="image_id string, doc_id bigint, w int, h int, fmt string,"
        " bytes binary",
    )


def exact_image_aggregates(images: DataFrame) -> DataFrame:
    """decode_image + integer-exact per-image aggregates (channel sums in
    int64, bright-pixel count) — the float-free half of feature extraction,
    computed over DECODED pixels so the jpeg rows measure the lossy
    reconstruction, exactly what the oracle derives symbolically."""

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "image_id": [], "fmt": [], "w": [], "h": [], "n_pixels": [],
                "sum_r": [], "sum_g": [], "sum_b": [], "n_bright": [],
            }
            for r in pdf.itertuples(index=False):
                px = decode_image(bytes(r.bytes)).astype(np.int64)
                out["image_id"].append(r.image_id)
                out["fmt"].append(r.fmt)
                out["w"].append(int(r.w))
                out["h"].append(int(r.h))
                out["n_pixels"].append(px.shape[0] * px.shape[1])
                out["sum_r"].append(int(px[:, :, 0].sum()))
                out["sum_g"].append(int(px[:, :, 1].sum()))
                out["sum_b"].append(int(px[:, :, 2].sum()))
                out["n_bright"].append(int((px.sum(axis=2) >= _BRIGHT_LUM).sum()))
            yield pd.DataFrame(
                {
                    k: (v if k in ("image_id", "fmt") else np.asarray(v, np.int64))
                    for k, v in out.items()
                }
            )

    return images.mapInPandas(
        agg,
        schema="image_id string, fmt string, w bigint, h bigint,"
        " n_pixels bigint, sum_r bigint, sum_g bigint, sum_b bigint,"
        " n_bright bigint",
    )


@register(
    "im1_image_features",
    f"""
    WITH par AS (
      SELECT doc_id, {_W_DUCK} AS w, {_H_DUCK} AS h, {_A_DUCK} AS a,
             {_B_DUCK} AS b, {_FMT_DUCK} AS fmt
      FROM documents WHERE doc_id % 50 = 0
    ),
    px AS (
      SELECT doc_id, w, h, fmt, p.p AS p, c.c AS c,
             -- raw generator value, then the codec's decode semantics:
             -- png is lossless; fake-jpeg dequantizes to bin centers
             CASE WHEN fmt = 'jpeg'
                  THEN (((a * (3 * p.p + c.c + 1) + b) % 256) // 4) * 4 + 2
                  ELSE ((a * (3 * p.p + c.c + 1) + b) % 256) END AS v
      FROM par,
           unnest(generate_series(0, w * h - 1)) AS p(p),
           unnest(generate_series(0, 2)) AS c(c)
    ),
    lum AS (
      SELECT doc_id, p, sum(v) AS pix_lum,
             sum(CASE WHEN c = 0 THEN v END) AS r,
             sum(CASE WHEN c = 1 THEN v END) AS g,
             sum(CASE WHEN c = 2 THEN v END) AS bch
      FROM px GROUP BY doc_id, p
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_pixels,
             CAST(sum(r) AS BIGINT) AS sum_r,
             CAST(sum(g) AS BIGINT) AS sum_g,
             CAST(sum(bch) AS BIGINT) AS sum_b,
             CAST(sum(CASE WHEN pix_lum >= {_BRIGHT_LUM} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_bright
      FROM lum GROUP BY doc_id
    )
    SELECT 'im' || CAST(par.doc_id AS VARCHAR) AS image_id,
           par.fmt, CAST(par.w AS BIGINT) AS w, CAST(par.h AS BIGINT) AS h,
           n_pixels,
           round(CAST(sum_r AS DOUBLE) / n_pixels, 4) AS mean_r,
           round(CAST(sum_g AS DOUBLE) / n_pixels, 4) AS mean_g,
           round(CAST(sum_b AS DOUBLE) / n_pixels, 4) AS mean_b,
           round(CAST(sum_r + sum_g + sum_b AS DOUBLE) / (3 * n_pixels), 4)
             AS brightness,
           round(CAST(n_bright AS DOUBLE) / n_pixels, 6) AS bright_frac
    FROM agg JOIN par ON agg.doc_id = par.doc_id
    """,
)
def im1_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image feature extraction end-to-end over real binary payloads
    (operators/images_ops.py family; the graft cell's image axis): synth →
    container encode (png lossless / fake-jpeg lossy) → bytes → decode →
    exact integer aggregates (Arrow-batched, partition-local), float
    features as shared column expressions. The jpeg rows hash-match ONLY if
    both engines agree on the quantized reconstruction — the decode
    semantics are the thing under test."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        # 2× slots (CLAUDE.md rule): tiny-row scans arrive as 1-2 partitions,
        # and a second wave backfills any straggler ahead of the UDF chain
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )
    agg = exact_image_aggregates(synth_image_table(docs))
    n = F.col("n_pixels")
    return agg.select(
        "image_id",
        "fmt",
        "w",
        "h",
        "n_pixels",
        F.round(F.col("sum_r").cast("double") / n, 4).alias("mean_r"),
        F.round(F.col("sum_g").cast("double") / n, 4).alias("mean_g"),
        F.round(F.col("sum_b").cast("double") / n, 4).alias("mean_b"),
        F.round(
            (F.col("sum_r") + F.col("sum_g") + F.col("sum_b")).cast("double")
            / (3 * n),
            4,
        ).alias("brightness"),
        F.round(F.col("n_bright").cast("double") / n, 6).alias("bright_frac"),
    )
