"""Real-codec path (VERDICT r3 item 7): when PIL is present, decode_image
dispatches real PNG/JPEG bytes through decode_real and the same PSNR/phash
gates apply unchanged. skipif-gated — this build container has no PIL, but
the dispatch itself is testable everywhere (the no-PIL branch must raise
NotImplementedError for real payloads, never misparse them as FIMG)."""

from __future__ import annotations

import numpy as np
import pytest

from gov_procurement_spider_spark.functions import images

_PNG = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 8
_JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 8


def _pixels(w: int = 48, h: int = 32, seed: int = 11) -> np.ndarray:
    # smooth gradient + mild noise: JPEG-compressible (uniform random noise
    # would fail any quality/PSNR expectation by construction)
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 255 // max(w - 1, 1) + y * 64 // max(h - 1, 1)) % 256
    rng = np.random.default_rng(seed)
    px = np.clip(base + rng.integers(-8, 9, size=(h, w)), 0, 255)
    return np.repeat(px[:, :, None], 3, axis=2).astype(np.uint8)


def test_real_payload_never_misparsed_without_pil():
    if images.HAVE_PIL:
        pytest.skip("PIL present: dispatch goes to decode_real (tested below)")
    for data in (_PNG, _JPEG):
        with pytest.raises(NotImplementedError):
            images.decode_image(data)


def test_garbage_payload_rejected_either_way():
    with pytest.raises(ValueError):
        images.decode_image(b"GIF89a not supported here")


@pytest.mark.skipif(not images.HAVE_PIL, reason="PIL not in this container")
def test_png_roundtrip_lossless_with_gates():
    px = _pixels()
    dec = images.decode_image(images.encode_real(px, "png"))
    assert np.array_equal(dec, px)
    assert images.psnr(px, dec) == float("inf")
    assert images.ahash64(dec) == images.ahash64(px)


@pytest.mark.skipif(not images.HAVE_PIL, reason="PIL not in this container")
def test_jpeg_lossy_passes_psnr_and_phash_gates():
    px = _pixels()
    dec = images.decode_image(images.encode_real(px, "jpeg", quality=90))
    assert dec.shape == px.shape and dec.dtype == np.uint8
    # the fetch pipeline's lossy gates, applied unchanged to the real codec
    assert images.psnr(px, dec) >= 40.0
    a, b = images.ahash64(px), images.ahash64(dec)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 6
