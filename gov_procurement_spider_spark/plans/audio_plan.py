"""Driver-contract audio query (au1): the audio operator family's oracle row.

Round 2 left operators/audio_ops.py as the only pytest-only family; this
module gives it a DuckDB-checked driver row. A deterministic s16le clip is
synthesized per document from a PURE INTEGER recurrence (reproducible in SQL
with BIGINT arithmetic — no trig, no RNG), pushed through the real binary
plumbing (functions/audio.encode_pcm → bytes column → decode_pcm, the same
codec operators/audio_ops.py uses), and reduced to EXACT integer aggregates
inside the Arrow-batched UDF. Every float feature (duration, rms, zcr) is
then a column expression over those identical integers in BOTH engines, so
IEEE division/sqrt/round behave bit-identically and the value hash matches.

Scale notes: synth and feature extraction are partition-local mapInPandas —
bytes never shuffle (the images_ops/audio_ops rule); the only shuffle-free
plan is scan → UDF → UDF → project.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.audio import decode_pcm, encode_pcm
from ..sources.tables import load_table
from .registry import register

_SR = 16000

# samples[t] = ((a·(t+1) + b) mod 65536) − 32768  with a odd — a full-period
# LCG step: integer-exact in numpy int64 and DuckDB BIGINT alike
_N_DUCK = "(800 + (doc_id % 7) * 160)"
_A_DUCK = (
    "(CASE WHEN ((doc_id * 2654435761) % 99991) % 2 = 0"
    " THEN ((doc_id * 2654435761) % 99991) + 1"
    " ELSE ((doc_id * 2654435761) % 99991) END)"
)
_B_DUCK = "((doc_id * 40503) % 65536)"


def _samples(doc_id: int) -> np.ndarray:
    n = 800 + (doc_id % 7) * 160
    a = (doc_id * 2654435761) % 99991
    if a % 2 == 0:
        a += 1
    b = (doc_id * 40503) % 65536
    t = np.arange(1, n + 1, dtype=np.int64)
    return ((a * t + b) % 65536 - 32768).astype(np.int64)


def synth_audio_table(docs: DataFrame) -> DataFrame:
    """(doc_id) → input_hint-style binary audio table via the real s16le
    encoder — the bytes column is what a production pipeline would carry."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype(np.int64)
            yield pd.DataFrame(
                {
                    "audio_id": ["au" + str(i) for i in ids],
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "sample_rate": np.full(len(ids), _SR, dtype=np.int32),
                    "fmt": "pcm",
                    "bytes": [
                        encode_pcm(_samples(int(i)).astype(np.int16)) for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen,
        schema="audio_id string, doc_id bigint, sample_rate int, fmt string,"
        " bytes binary",
    )


def exact_audio_aggregates(audio: DataFrame) -> DataFrame:
    """decode_pcm + integer-exact per-clip aggregates (sum of squares in
    int64, sign-change count with the (s≥0) convention) — the float-free
    half of feature extraction, so the oracle can reproduce it exactly."""

    def agg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "audio_id": [], "doc_id": [], "n_samples": [],
                "peak": [], "sum_sq": [], "n_zero_cross": [],
            }
            for r in pdf.itertuples(index=False):
                s = decode_pcm(bytes(r.bytes)).astype(np.int64)
                out["audio_id"].append(r.audio_id)
                out["doc_id"].append(int(r.doc_id))
                out["n_samples"].append(len(s))
                out["peak"].append(int(np.max(np.abs(s))))
                out["sum_sq"].append(int(np.sum(s * s)))
                out["n_zero_cross"].append(
                    int(np.sum((s[:-1] >= 0) != (s[1:] >= 0)))
                )
            yield pd.DataFrame(
                {k: (v if k in ("audio_id",) else np.asarray(v, dtype=np.int64))
                 for k, v in out.items()}
            )

    return audio.mapInPandas(
        agg,
        schema="audio_id string, doc_id bigint, n_samples bigint, peak bigint,"
        " sum_sq bigint, n_zero_cross bigint",
    )


@register(
    "au1_audio_features",
    f"""
    WITH par AS (
      SELECT doc_id, {_N_DUCK} AS n, {_A_DUCK} AS a, {_B_DUCK} AS b
      FROM documents WHERE doc_id % 50 = 0
    ),
    smp AS (
      SELECT doc_id, n, t.t,
             ((a * (t.t + 1) + b) % 65536) - 32768 AS s,
             CASE WHEN t.t < n - 1
                  THEN ((a * (t.t + 2) + b) % 65536) - 32768 END AS s_next
      FROM par, unnest(generate_series(0, n - 1)) AS t(t)
    ),
    agg AS (
      SELECT doc_id,
             count(*) AS n_samples,
             max(abs(s)) AS peak,
             CAST(sum(s * s) AS BIGINT) AS sum_sq,
             CAST(sum(CASE WHEN s_next IS NOT NULL
                            AND (s >= 0) <> (s_next >= 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
      FROM smp GROUP BY doc_id
    )
    SELECT 'au' || CAST(doc_id AS VARCHAR) AS audio_id,
           n_samples, peak,
           round(CAST(n_samples AS DOUBLE) / {_SR}, 4) AS duration_sec,
           round(sqrt(CAST(sum_sq AS DOUBLE) / n_samples), 4) AS rms,
           round(CAST(n_zero_cross AS DOUBLE) / (n_samples - 1), 6)
             AS zero_crossing_rate
    FROM agg
    """,
)
def au1_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction end-to-end over real binary payloads
    (operators/audio_ops.py family; ref graft axis — the reference's
    attachment-download loop, main.py:124-133, generalized to media
    payloads): synth → s16le encode → bytes → decode → exact integer
    aggregates (Arrow-batched, partition-local), float features as shared
    column expressions so the DuckDB oracle is bit-exact."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        # 2× slots (CLAUDE.md rule): tiny-row scans arrive as 1-2 partitions,
        # and a second wave backfills any straggler ahead of the UDF chain
        .repartition(2 * spark.sparkContext.defaultParallelism)
    )
    agg = exact_audio_aggregates(synth_audio_table(docs))
    return agg.select(
        "audio_id",
        "n_samples",
        "peak",
        F.round(F.col("n_samples").cast("double") / _SR, 4).alias("duration_sec"),
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples")), 4
        ).alias("rms"),
        F.round(
            F.col("n_zero_cross").cast("double") / (F.col("n_samples") - 1), 6
        ).alias("zero_crossing_rate"),
    )
