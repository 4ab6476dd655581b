"""Multimodal binary-column operators: audio payloads.

Audio travels as an opaque `binary` column with typed metadata
(sample_rate/fmt/n_samples), mirroring the image design
(operators/images_ops.py): decode / feature-extract / resample run as
Arrow-batched `mapInPandas`, the only layer where Python touches bytes, and
every operator is partition-local — bytes never shuffle. Three real
formats via functions/audio.decode_audio: 'pcm' (s16le, exact), 'mulaw'
(G.711, vendored) and 'adpcm' (IMA/DVI, vendored); perceptual codecs the
container genuinely lacks (mp3/flac/ogg) raise NotImplementedError by
name, with the Spark-side contract — schema, batch shape, UDF signature —
identical across all formats.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import audio

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_samples int, duration_sec double, "
    "rms double, peak int, zero_crossing_rate double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Per-clip features (duration, RMS, peak, zero-crossing rate) computed
    vectorized per batch row — the audio analogue of image feature
    extraction. Input columns: audio_id, bytes, sample_rate, fmt."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s = audio.decode_audio(bytes(r.bytes), r.fmt).astype(np.float64)
                n = len(s)
                zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))) if n > 1 else 0.0
                rows.append(
                    dict(
                        audio_id=r.audio_id,
                        sample_rate=int(r.sample_rate),
                        n_samples=n,
                        duration_sec=n / float(r.sample_rate),
                        rms=float(np.sqrt(np.mean(s**2))) if n else 0.0,
                        peak=int(np.max(np.abs(s))) if n else 0,
                        zero_crossing_rate=zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sample_rate", "n_samples", "duration_sec",
                    "rms", "peak", "zero_crossing_rate",
                ],
            )

    return df.select("audio_id", "bytes", "sample_rate", "fmt").mapInPandas(
        op, schema=AUDIO_FEATURES_SCHEMA
    )


RESAMPLE_SCHEMA = "audio_id string, sample_rate int, fmt string, bytes binary"


def resample(df: DataFrame, target_sr: int) -> DataFrame:
    """Nearest-neighbor resample to target_sr, re-encoded s16le — the
    audio analogue of image thumbnailing; partition-local, bytes in/out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s = audio.decode_audio(bytes(r.bytes), r.fmt)
                n_out = max(1, int(round(len(s) * target_sr / float(r.sample_rate))))
                idx = (np.arange(n_out, dtype=np.int64) * len(s)) // n_out
                rows.append(
                    dict(
                        audio_id=r.audio_id,
                        sample_rate=target_sr,
                        fmt="pcm",
                        bytes=audio.encode_pcm(s[idx]),
                    )
                )
            yield pd.DataFrame(rows, columns=["audio_id", "sample_rate", "fmt", "bytes"])

    return df.select("audio_id", "bytes", "sample_rate", "fmt").mapInPandas(
        op, schema=RESAMPLE_SCHEMA
    )
