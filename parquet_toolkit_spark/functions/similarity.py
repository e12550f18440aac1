"""Similarity search over an embedding column (array<float>).

  cosine_col            portable dot/norm via F.aggregate + F.zip_with
  ann_bruteforce_topk   exact top-k neighbors (broadcast queries — no
                        shuffle of the big side; the 100TB-scale baseline)
  lsh_ann_topk          random-hyperplane LSH bucketed ANN (the scale path:
                        candidates from equi-joined buckets only)
  embedding_near_pairs  near-duplicate pairs by cosine >= tau

Outputs are id/rank-only (no float columns) so oracle comparison is
hash-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F, Window
from pyspark.sql.types import ArrayType, IntegerType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_bruteforce_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    (huge) corpus; ties broken by neighbor id; self-matches excluded.

    Returns (query_id, neighbor_id, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            cosine_col(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """Sign-bit bucket id from fixed random hyperplanes (deterministic)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        from parquet_toolkit_spark.runtime import tune_malloc

        tune_malloc()
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def lsh_ann_topk(df: DataFrame, queries: DataFrame, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 8, seed: int = 42,
                 multiprobe: bool = True,
                 dim: int | None = None) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket(s) are
    scored (equi-join on bucket id — scales to corpora where the
    brute-force cross product cannot shuffle).

    multiprobe expands each QUERY to its bucket plus all hamming-1 buckets
    (n_planes+1 probes) — the standard recall fix that costs nothing on
    the corpus side (still one bucket per corpus row)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    c = df.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        bucket(F.col(vec_col)).alias("bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        bucket(F.col(vec_col)).alias("bkt0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bkt0"),
            *[F.col("bkt0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
        )
        q = q.select("query_id", "qvec", F.explode(probes).alias("bkt"))
    else:
        q = q.withColumnRenamed("bkt0", "bkt")
    scored = (
        c.join(F.broadcast(q), "bkt")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine_col(F.col("qvec"), F.col("cvec")).alias("cos"))
        .groupBy("query_id", "neighbor_id").agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_pairs(df: DataFrame, tau: float = 0.95,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         n_planes: int = 6, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= tau),
    LSH-blocked so the join is bucket-local."""
    dim = len(df.select(vec_col).first()[0])
    bucket = lsh_bucket_udf(dim, n_planes, seed)
    t = df.select(F.col(id_col), F.col(vec_col), bucket(F.col(vec_col)).alias("bkt"))
    a, b = t.alias("a"), t.alias("b")
    pairs = a.join(
        b, (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = cosine_col(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= tau)
        .select("id_a", "id_b")
    )
