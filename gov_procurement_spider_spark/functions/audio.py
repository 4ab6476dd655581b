"""Audio codecs, pure numpy/stdlib — the audio twin of functions/images.py.

Three real formats:
- 'pcm'   — signed-16-bit little-endian, exact encode/decode inverses;
- 'mulaw' — ITU-T G.711 μ-law companding (8 bits/sample, lossy), fully
  vectorized; ``encode_mulaw(decode_mulaw(b)) == b`` for every byte value
  (the canonical G.711 identity);
- 'adpcm' — IMA/DVI ADPCM (4 bits/sample, lossy) per the public IMA
  algorithm (step/index tables from the IMA Digital Audio Focus Group
  spec, the same tables in WAV format 0x11); inherently sequential per
  clip, which is fine — clips are row-local and never shuffle.

Perceptual-codec formats that genuinely need external libraries
(mp3/flac/ogg) remain stubbed at the operator layer with the codec named.
A real deployment swaps these decoders for soundfile/ffmpeg and nothing
else changes: schema, batching, partitioning, and UDF signatures are
identical.
"""

from __future__ import annotations

import struct

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


# ------------------------------------------------------- G.711 μ-law

_MU_BIAS = 0x84  # 132
_MU_CLIP = 32635


def encode_mulaw(samples: np.ndarray) -> bytes:
    """int16 → 8-bit μ-law, vectorized (sign | exponent<<4 | mantissa,
    ones-complemented, per G.711)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.uint8)
    mag = np.minimum(np.abs(x), _MU_CLIP) + _MU_BIAS  # ∈ [132, 32767]
    # exponent = bit_length(mag) - 8, i.e. the segment of the top set bit;
    # log2 on exact small ints is safe (float64 exact through 2^53)
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int32) - 7, 0, 7)
    mant = ((mag >> (exp + 3)) & 0x0F).astype(np.uint8)
    return (~(sign | (exp.astype(np.uint8) << 4) | mant)).astype(np.uint8).tobytes()


def decode_mulaw(data: bytes) -> np.ndarray:
    """8-bit μ-law → int16, vectorized exact inverse of the quantizer."""
    b = ~np.frombuffer(data, dtype=np.uint8)
    exp = ((b >> 4) & 7).astype(np.int32)
    mant = (b & 0x0F).astype(np.int32)
    mag = (((mant << 3) + _MU_BIAS) << exp) - _MU_BIAS
    return np.where(b & 0x80, -mag, mag).astype(np.int16)


# ------------------------------------------------------- IMA/DVI ADPCM

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def encode_ima_adpcm(samples: np.ndarray) -> bytes:
    """int16 → IMA ADPCM: one block per clip, WAV-0x11-style header
    (<i2 first-sample predictor, u8 step index, pad), then 4-bit codes
    low-nibble-first for samples[1:]."""
    s = np.asarray(samples, dtype=np.int32)
    n = len(s)
    if n == 0:
        return struct.pack("<hBxI", 0, 0, 0)
    pred, index = int(s[0]), 0
    header = struct.pack("<hBxI", pred, index, n)
    codes = bytearray()
    step = int(_IMA_STEP[index])
    for i in range(1, n):
        diff = int(s[i]) - pred
        code = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # decoder-exact reconstruction keeps encoder and decoder predictors
        # in lockstep (the property test_adpcm_predictor_lockstep checks)
        dq = step >> 3
        if code & 4:
            dq += step
        if code & 2:
            dq += step >> 1
        if code & 1:
            dq += step >> 2
        pred = pred - dq if code & 8 else pred + dq
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[code])))
        step = int(_IMA_STEP[index])
        codes.append(code)
    packed = bytearray()
    for j in range(0, len(codes), 2):
        lo = codes[j]
        hi = codes[j + 1] if j + 1 < len(codes) else 0
        packed.append(lo | (hi << 4))
    return header + bytes(packed)


def decode_ima_adpcm(data: bytes) -> np.ndarray:
    """IMA ADPCM block → int16 samples (exact mirror of the encoder)."""
    pred, index, n = struct.unpack_from("<hBxI", data, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int16)
    nib = np.frombuffer(data, dtype=np.uint8, offset=8)
    codes = np.empty(nib.size * 2, dtype=np.uint8)
    codes[0::2] = nib & 0x0F
    codes[1::2] = nib >> 4
    out = np.empty(n, dtype=np.int16)
    out[0] = pred
    step = int(_IMA_STEP[index])
    for i in range(1, n):
        code = int(codes[i - 1])
        dq = step >> 3
        if code & 4:
            dq += step
        if code & 2:
            dq += step >> 1
        if code & 1:
            dq += step >> 2
        pred = pred - dq if code & 8 else pred + dq
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX[code])))
        step = int(_IMA_STEP[index])
        out[i] = pred
    return out


_DECODERS = {
    "pcm": decode_pcm,
    "mulaw": decode_mulaw,
    "adpcm": decode_ima_adpcm,
}


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch by declared format → int16 samples. Formats needing codec
    libraries this container lacks raise NotImplementedError by name."""
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise NotImplementedError(
            f"decoding {fmt!r} requires an audio codec library not present"
            " in this container; real formats here: pcm (s16le), mulaw"
            " (G.711), adpcm (IMA/DVI)"
        ) from None
    return dec(data)
