"""Deterministic raw-PCM audio codec (s16le) — the audio twin of
functions/images.py. No audio library exists in this container, so the
'pcm' format is real signed-16-bit little-endian samples processed with
numpy (decode/encode are exact inverses), while compressed formats
(mp3/flac/ogg) are explicitly stubbed at the operator layer. A real
deployment swaps `decode_pcm` for soundfile/ffmpeg and nothing else
changes: schema, batching, partitioning, and UDF signatures are identical.
"""

from __future__ import annotations

import numpy as np


def gen_samples(seed: int, n_samples: int) -> np.ndarray:
    """Deterministic synthetic waveform: a seed-keyed mix of two sine tones
    plus uniform noise, quantized to int16 — same (seed, n) → same bytes."""
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    t = np.arange(n_samples, dtype=np.float64)
    f1 = 0.01 + (seed % 97) / 1970.0
    f2 = 0.002 + (seed % 31) / 3100.0
    wave = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    wave += rng.uniform(-0.05, 0.05, n_samples)
    return np.clip(wave * 32767.0, -32768, 32767).astype(np.int16)


def encode_pcm(samples: np.ndarray) -> bytes:
    return np.asarray(samples, dtype="<i2").tobytes()


def decode_pcm(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2")
