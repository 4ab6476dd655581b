"""dd2 hot-shingle df-cap: boilerplate shared by every document must NOT
generate a quadratic candidate-pair set (the 100-TB scale guarantee —
one shingle in 10^6 docs would otherwise emit ~10^12 join rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gov_procurement_spider_spark.plans.text_ops import (
    _shingles_spark,
    ngram_jaccard_pairs,
)

N_DOCS = 60
BOILER = "the quick brown fox jumps"  # 3 shingles, each with df == N_DOCS


def _docs(spark):
    rows = []
    for i in range(N_DOCS):
        filler = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        if i >= N_DOCS - 2:  # one genuine near-dup pair at the tail
            filler = "dup1 dup2 dup3 dup4 " + f"tail{i}"
        rows.append((i, f"{BOILER} {filler}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_bounds_candidate_pairs(spark):
    sh = _shingles_spark(_docs(spark)).cache()

    # uncapped, threshold 0 → every doc pair is a candidate via boilerplate:
    # the quadratic blowup the cap exists to prevent
    uncapped = ngram_jaccard_pairs(sh, threshold=0.0, max_df=None).count()
    assert uncapped == N_DOCS * (N_DOCS - 1) // 2

    # capped → boilerplate (df=60 > 10) leaves the universe; only the one
    # true near-dup pair (shared unique filler shingles) survives
    capped = ngram_jaccard_pairs(sh, threshold=0.0, max_df=10)
    rows = capped.collect()
    assert len(rows) == 1
    assert (rows[0]["doc_a"], rows[0]["doc_b"]) == (N_DOCS - 2, N_DOCS - 1)
    sh.unpersist()


def test_cap_is_inert_below_tau(spark):
    """With τ above every df, capped and uncapped results are identical —
    the driver's dd2 row can't change at sf0.01 (max df there is 7)."""
    sh = _shingles_spark(_docs(spark)).cache()
    a = ngram_jaccard_pairs(sh, threshold=0.0, max_df=10_000)
    b = ngram_jaccard_pairs(sh, threshold=0.0, max_df=None)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    sh.unpersist()


def test_capped_join_never_explodes_rows(spark):
    """Physical guarantee: with the cap, the pair join's output rows are
    ≤ Σ_kept_shingles df·(df-1)/2 — measured, not inferred."""
    sh = _shingles_spark(_docs(spark))
    tau = 10
    kept_df = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= tau)
    )
    bound = kept_df.select(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("b")
    ).first()["b"]
    n_candidates = (
        ngram_jaccard_pairs(sh, threshold=0.0, max_df=tau)
        .agg(F.count(F.lit(1)))
        .first()[0]
    )
    assert n_candidates <= bound
