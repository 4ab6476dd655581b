"""Similarity search over the `embeddings` table (array<float>, dim 64):
brute-force cosine top-k as the exactness baseline, and a hyperplane-LSH
bucketed variant as the scale path.

Scale story: brute force is O(n²·d) — correct at validation scale, dead at
10^9 vectors. The LSH variant hashes each vector to a signature of
hyperplane sign bits (planes derived deterministically from md5, so the
oracle can reproduce them); candidate pairs only form *within* a bucket via
an equi-join on the signature — the cross join never exists, and bucket
skew is an AQE skew-join case. An IVF variant would swap the signature for
a k-means cell id; the join topology is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_TOP_K = 5


def _load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tiny-row single-file table → 1 scan partition; spread before the
    # per-row O(d) cosine lambdas / O(d·planes) signature explode
    return load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )


def _cosine(a, b):
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
    rounded similarity so cross-engine float ties break identically."""
    e = _load_embeddings(spark, sf_dir)
    a = e.alias("a")
    b = e.alias("b")
    sim = F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        a.filter(F.col("a.vec_id") < 50)
        .join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .drop("rn")
    )


_N_PLANES = 8

# deterministic pseudo-random hyperplane component for (plane p, dim d):
# +1 / -1 from the parity of a 48-bit md5 hash — reproducible in both engines
_SIGN_DUCK = (
    "CASE WHEN CAST('0x'||substr(md5('plane:' || p.plane || ':' || d.dim),1,12)"
    " AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END"
)


def _sign_spark(plane, dim):
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("plane:"), plane.cast("string"), F.lit(":"), dim.cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


@register(
    "ml2_ann_lsh_buckets",
    f"""
    WITH comp AS (
      SELECT vec_id, p.plane, d.dim,
             embedding[d.dim + 1]::DOUBLE * ({_SIGN_DUCK}) AS contrib
      FROM embeddings,
           unnest(generate_series(0, {_N_PLANES - 1})) AS p(plane),
           unnest(generate_series(0, 63)) AS d(dim)
    ),
    sig AS (
      SELECT vec_id, plane, CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
      FROM comp GROUP BY vec_id, plane
    )
    SELECT vec_id,
           sum(bit * power(2, plane)::BIGINT)::BIGINT AS bucket
    FROM sig GROUP BY vec_id
    """,
)
def ml2_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-sign LSH signature ({_N_PLANES} planes → bucket id):
    linear in vectors; neighbor candidates come from an equi-join on bucket,
    never a cross join."""
    e = _load_embeddings(spark, sf_dir)
    comp = e.select(
        "vec_id",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "dim",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(_N_PLANES - 1))).alias("plane"),
    )
    sig = (
        comp.withColumn(
            "contrib", F.col("x").cast("double") * _sign_spark(F.col("plane"), F.col("dim"))
        )
        .groupBy("vec_id", "plane")
        .agg(F.when(F.sum("contrib") > 0, 1).otherwise(0).alias("bit"))
    )
    return sig.groupBy("vec_id").agg(
        F.sum(F.col("bit") * F.pow(F.lit(2), F.col("plane")).cast("long"))
        .cast("long")
        .alias("bucket")
    )


@register(
    "ml3_ann_topk",
    f"""
    WITH comp AS (
      SELECT vec_id, p.plane, d.dim,
             embedding[d.dim + 1]::DOUBLE * ({_SIGN_DUCK}) AS contrib
      FROM embeddings,
           unnest(generate_series(0, {_N_PLANES - 1})) AS p(plane),
           unnest(generate_series(0, 63)) AS d(dim)
    ),
    sig AS (
      SELECT vec_id, plane, CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
      FROM comp GROUP BY vec_id, plane
    ),
    buckets AS (
      SELECT vec_id, sum(bit * power(2, plane)::BIGINT)::BIGINT AS bucket
      FROM sig GROUP BY vec_id
    ),
    v AS (
      SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id)
    )
    SELECT q_id, neighbor_id, sim FROM (
      SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(
               a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                 a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                        b.vec_id
             ) AS rn
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ) WHERE rn <= {_TOP_K}
    """,
)
def ml3_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN dish, oracle-checked end-to-end (not just its
    ingredients): LSH-bucket every vector, then cosine-rank top-{_TOP_K}
    candidates *within* buckets only — the cross join never exists, so the
    pair space is Σ_buckets n_b², linear for balanced buckets."""
    return ann_lsh_topk(spark, sf_dir)


# calibrated to the synthetic corpus: its embeddings are random (max pairwise
# cosine ≈ 0.51 corpus-wide, ≈ 0.40 within LSH buckets), so a production-style
# 0.9 threshold would make the query vacuously empty; 0.3 yields a small
# non-trivial pair set. The threshold is data, not structure — at 100 TB you
# raise it, the plan is unchanged.
_NEAR_DUP_SIM = 0.3


@register(
    "dd6_embedding_near_dup",
    f"""
    WITH comp AS (
      SELECT vec_id, p.plane, d.dim,
             embedding[d.dim + 1]::DOUBLE * ({_SIGN_DUCK}) AS contrib
      FROM embeddings,
           unnest(generate_series(0, {_N_PLANES - 1})) AS p(plane),
           unnest(generate_series(0, 63)) AS d(dim)
    ),
    sig AS (
      SELECT vec_id, plane, CASE WHEN sum(contrib) > 0 THEN 1 ELSE 0 END AS bit
      FROM comp GROUP BY vec_id, plane
    ),
    buckets AS (
      SELECT vec_id, sum(bit * power(2, plane)::BIGINT)::BIGINT AS bucket
      FROM sig GROUP BY vec_id
    ),
    v AS (
      SELECT e.vec_id, e.embedding, b.bucket
      FROM embeddings e JOIN buckets b USING (vec_id)
    )
    SELECT a.vec_id AS dup_a, b.vec_id AS dup_b,
           round(list_cosine_similarity(
             a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
            a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= {_NEAR_DUP_SIM}
    """,
)
def dd6_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection (the semantic member of the
    dedup family): LSH-bucket every vector, emit pairs with cosine above the
    (corpus-calibrated) threshold *within* buckets only. Same linear topology as ml3 —
    candidate pairs are Σ_buckets n_b², never n²; recall is tunable by
    band count exactly like MinHash-LSH banding (dd4)."""
    e = _load_embeddings(spark, sf_dir)
    buckets = ml2_ann_lsh_buckets(spark, sf_dir)
    v = e.join(buckets, "vec_id")
    a, b = v.alias("a"), v.alias("b")
    sim = F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("dup_a"),
            F.col("b.vec_id").alias("dup_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= _NEAR_DUP_SIM)
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str, k: int = _TOP_K) -> DataFrame:
    """Composed ANN scale path: bucket vectors (ml2's signature), then
    brute-force cosine *within* buckets only."""
    e = _load_embeddings(spark, sf_dir)
    buckets = ml2_ann_lsh_buckets(spark, sf_dir)
    v = e.join(buckets, "vec_id")
    a, b = v.alias("a"), v.alias("b")
    sim = F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            sim.alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
