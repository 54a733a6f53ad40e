"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline, pure ``zip_with``/``aggregate``
  Column expressions (JVM-side, no UDF), oracle-checked against DuckDB's
  ``list_cosine_similarity``.
- LSH-bucketed ANN: random-hyperplane signatures via a vectorized numpy
  pandas UDF → candidates bucket-join → exact re-rank. The scale path: at
  10^9 vectors only bucket-mates pay the dot product. (No SQL oracle —
  approximate; the driver records a rows-only check.)

  LSH caveat, measured: on ISOTROPIC random vectors (the driver's synthetic
  embeddings table: max pairwise cosine ≈ 0.37) hyperplane collisions are
  ≈ random and recall@k ≈ 0 — a property of the data, not the index; real
  embedding corpora are strongly clustered, where recall is high
  (demonstrated on clustered vectors in tests/test_similarity.py). For
  sparse-similarity corpora use the brute-force operator or raise probes.
- embedding near-duplicate pairs: cosine ≥ t over bucket-mates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import LongType


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id (excluding itself).
    The query side is tiny → broadcast; the corpus scan is one pass."""
    q = emb.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    pairs = emb.join(F.broadcast(q), F.col(id_col) != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


# 2^8 = 256 buckets: sized so a 10^3-10^4-vector bucket population keeps
# ~dozens of vectors per bucket; at 10^9 vectors raise toward 20-24 planes
# (bucket count should track corpus size / desired candidate-list length)
N_PLANES = 8


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seeded, no RNG state)."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((N_PLANES, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int):
    planes = _hyperplanes(dim)

    @F.pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (n, dim)
        signs = (m.astype(np.float64) @ planes.T) > 0  # (n, planes)
        out = np.zeros(len(m), dtype=np.int64)
        for j in range(N_PLANES):
            out |= signs[:, j].astype(np.int64) << j
        return pd.Series(out)

    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only vectors in the query's hyperplane bucket are
    scored (multi-probe: exact bucket ∪ distance-1 buckets)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim)
    with_b = emb.withColumn("bucket", bucket(F.col(vec_col))).cache()
    q = with_b.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
    )
    # multi-probe: flip each bit once → N_PLANES+1 probe buckets per query
    probes = q.select(
        "q_id",
        "q_vec",
        F.explode(
            F.array(
                F.col("q_bucket"),
                *[
                    F.col("q_bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    pairs = with_b.join(F.broadcast(probes), "bucket").where(
        F.col(id_col) != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col(vec_col)), 6).alias("score"),
    ).dropDuplicates(["q_id", "neighbor_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vectors by cosine ≥ t, bucket-blocked via LSH so the
    pair join is bucket-local instead of a cross join."""
    dim = len(emb.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim)
    with_b = emb.withColumn("bucket", bucket(F.col(vec_col)))
    a, b = with_b.alias("a"), with_b.alias("b")
    return (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias(
                "score"
            ),
        )
        .where(F.col("score") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
