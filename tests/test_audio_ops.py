"""Audio binary-column operators: features match a per-row numpy reference,
resample preserves content shape, non-pcm formats are honestly stubbed."""

from __future__ import annotations

import numpy as np
import pytest

from gov_procurement_spider_spark.functions import audio
from gov_procurement_spider_spark.operators.audio_ops import (
    extract_audio_features,
    resample,
)

SR = 16_000


def _clips(spark, n=40):
    rows = []
    for i in range(n):
        n_samples = 800 + (i * 37) % 1600
        rows.append((f"a{i}", audio.encode_pcm(audio.gen_samples(i, n_samples)), SR, "pcm"))
    return spark.createDataFrame(
        rows, "audio_id string, bytes binary, sample_rate int, fmt string"
    )


def test_features_match_numpy_reference(spark):
    df = _clips(spark)
    got = {r.audio_id: r for r in extract_audio_features(df).collect()}
    assert len(got) == 40
    for i in range(40):
        s = audio.gen_samples(i, 800 + (i * 37) % 1600).astype(np.float64)
        r = got[f"a{i}"]
        assert r.n_samples == len(s)
        assert r.duration_sec == pytest.approx(len(s) / SR)
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(s**2))))
        assert r.peak == int(np.max(np.abs(s)))
        zc = float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
        assert r.zero_crossing_rate == pytest.approx(zc)


def test_resample_halves_and_roundtrips(spark):
    df = _clips(spark, n=10)
    out = {r.audio_id: r for r in resample(df, SR // 2).collect()}
    for i in range(10):
        n_in = 800 + (i * 37) % 1600
        s = audio.decode_pcm(bytes(out[f"a{i}"].bytes))
        assert len(s) == int(round(n_in / 2))  # operator rounds, not floors
        assert out[f"a{i}"].sample_rate == SR // 2
        # nearest-neighbor: every output sample exists in the input
        orig = audio.gen_samples(i, n_in)
        assert np.isin(s, orig).all()


def test_non_pcm_is_stubbed(spark):
    bad = spark.createDataFrame(
        [("x", b"\x00\x01", SR, "mp3")],
        "audio_id string, bytes binary, sample_rate int, fmt string",
    )
    with pytest.raises(Exception, match="codec"):
        extract_audio_features(bad).collect()
