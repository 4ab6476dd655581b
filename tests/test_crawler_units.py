"""Unit tests for crawler components: Bloom filter properties, politeness
cadence at the reference constant, simulator determinism, codec, URL hash
parity between Python and Spark column expressions.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gov_procurement_spider_spark.crawler.bloom import BloomFilter
from gov_procurement_spider_spark.functions import images
from gov_procurement_spider_spark.functions.urls import url_hash64
from gov_procurement_spider_spark.refsim import simulate
from gov_procurement_spider_spark.sources import site_model as sm
from gov_procurement_spider_spark.sources.site_model import SiteSpec


class TestBloom:
    def test_no_false_negatives(self):
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2**60, size=5000, dtype=np.int64)
        bf = BloomFilter(5000, fpr=0.01)
        bf.add_many(keys)
        assert bf.maybe_contains(keys).all()

    def test_fpr_reasonable(self):
        rng = np.random.default_rng(8)
        keys = rng.integers(0, 2**60, size=5000, dtype=np.int64)
        other = rng.integers(0, 2**60, size=20000, dtype=np.int64)
        other = other[~np.isin(other, keys)]
        bf = BloomFilter(5000, fpr=0.01)
        bf.add_many(keys)
        fpr = bf.maybe_contains(other).mean()
        assert fpr < 0.05, fpr

    def test_save_load_roundtrip(self, tmp_path):
        keys = np.arange(100, dtype=np.int64) * 1_000_003
        bf = BloomFilter(1000)
        bf.add_many(keys)
        p = str(tmp_path / "b.npz")
        bf.save(p)
        bf2 = BloomFilter.load(p)
        assert bf2.maybe_contains(keys).all()
        assert bf2.m == bf.m and bf2.k == bf.k


class TestPoliteness:
    def test_reference_cadence_single_host(self):
        """Rate 0.5 req/s, 2 s epochs, burst 1 (the reference's 2 s sleep,
        main.py:102) ⇒ exactly one fetch per epoch on a single host."""
        spec = SiteSpec(
            n_seeds=2, n_hosts=1, detail_space=30, max_list_pages=2,
            rate_per_sec=0.5, burst=1.0, epoch_seconds=2.0,
        )
        sim = simulate(spec)
        per_epoch: dict[int, int] = {}
        for row in sim.crawl_order:
            per_epoch[row[0]] = per_epoch.get(row[0], 0) + 1
        assert all(v == 1 for v in per_epoch.values())
        # no gaps while work remains: epochs are consecutive
        assert sorted(per_epoch) == list(range(len(per_epoch)))

    def test_fractional_rate_skips_epochs(self):
        """rate*epoch < 1 ⇒ zero-fetch epochs interleave (bucket refills)."""
        spec = SiteSpec(
            n_seeds=1, n_hosts=1, detail_space=30, max_list_pages=2,
            rate_per_sec=0.25, burst=1.0, epoch_seconds=2.0,
        )
        sim = simulate(spec)
        epochs_with_fetch = {row[0] for row in sim.crawl_order}
        assert sim.epochs > len(epochs_with_fetch) > 0


class TestSimulator:
    def test_deterministic(self):
        spec = SiteSpec(n_seeds=8, n_hosts=4)
        a, b = simulate(spec), simulate(spec)
        assert a.crawl_order == b.crawl_order
        assert a.url_seen == b.url_seen

    def test_keep_first_dedup(self):
        spec = SiteSpec(n_seeds=16, n_hosts=4, detail_space=50)
        sim = simulate(spec)
        urls = [row[8] for row in sim.crawl_order]
        assert len(urls) == len(set(urls))
        assert sim.dup_dropped > 0, "site too sparse to exercise dedup"

    def test_robots_never_fetched(self):
        spec = SiteSpec(n_seeds=32, n_hosts=4, detail_space=100)
        sim = simulate(spec)
        for row in sim.crawl_order:
            assert sm.url_allowed(spec, row[8]), row[8]
        assert sim.skipped_robots > 0, "site never generated disallowed links"


class TestCodec:
    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(8, 48), st.integers(8, 48))
    def test_png_lossless_jpeg_psnr(self, seed, w, h):
        px = images.gen_pixels(seed, w, h)
        assert np.array_equal(images.decode_image(images.encode_image(px, "png")), px)
        dec = images.decode_image(images.encode_image(px, "jpeg"))
        assert images.psnr(px, dec) >= 40.0

    def test_ahash_stable_and_discriminative(self):
        a = images.gen_pixels(1, 32, 32)
        b = images.gen_pixels(2, 32, 32)
        assert images.ahash64(a) == images.ahash64(a.copy())
        assert images.ahash64(a) != images.ahash64(b)
        assert -(2**63) <= images.ahash64(a) < 2**63


class TestUrlHashParity:
    def test_python_equals_spark(self, spark):
        urls = [sm.seed_url(SiteSpec(), i) for i in range(50)] + [
            "https://h0.test/detail/123",
            "https://例え.test/路径?q=空调&x=1",
        ]
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        got = {r.url: r.h for r in df.select("url", url_hash64("url").alias("h")).collect()}
        for u in urls:
            assert got[u] == sm.h64(u), u
