"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k via JVM higher-order functions (zip_with +
aggregate — whole-stage codegen, bit-reproducible in the SQL oracle),
plus an LSH-bucketed (random hyperplane) scale path and a vectorized
numpy matmul path for throughput.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

ANN_SEED = 20240616


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("__norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, cos, rank).

    Queries are broadcast (the small side); corpus streams — this is
    the baseline ANN oracle. Ties break by neighbor id ascending.
    """
    c = with_norm(corpus, vec_col).alias("c")
    q = with_norm(queries, vec_col).alias("q")
    j = c.join(
        F.broadcast(q), F.col(f"c.{id_col}") != F.col(f"q.{id_col}"), "inner"
    ).select(
        F.col(f"q.{id_col}").alias("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        (
            _dot(F.col(f"q.{vec_col}"), F.col(f"c.{vec_col}"))
            / (F.col("q.__norm") * F.col("c.__norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    out = (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
    if round_to is not None:
        out = out.withColumn("cos", F.round("cos", round_to))
    return out


def hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    seed: int = ANN_SEED,
) -> DataFrame:
    """LSH bucket id per vector: sign pattern against random hyperplanes.

    The hyperplane matrix is deterministic from (seed, dim, n_planes)
    and regenerated executor-side (no broadcast traffic). Vectors in the
    same bucket are ANN candidates; shuffle = one exchange on bucket.
    """

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        h = np.random.RandomState(seed).standard_normal((dim, n_planes))
        m = np.vstack(vecs.to_numpy())
        bits = (m.astype(np.float64) @ h) > 0
        vals = (bits @ (1 << np.arange(n_planes, dtype=np.int64))).astype(np.int64)
        return pd.Series(vals)

    return df.withColumn("bucket", bucket(F.col(vec_col)))


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    Recall < 1 by construction; the bench compares its throughput and
    recall against cosine_topk.
    """
    c = hyperplane_buckets(corpus, dim, n_planes, vec_col).alias("c")
    q = hyperplane_buckets(queries, dim, n_planes, vec_col).alias("q")
    c = with_norm(c, vec_col).alias("c")
    q = with_norm(q, vec_col).alias("q")
    j = c.join(
        F.broadcast(q),
        (F.col("c.bucket") == F.col("q.bucket"))
        & (F.col(f"c.{id_col}") != F.col(f"q.{id_col}")),
    ).select(
        F.col(f"q.{id_col}").alias("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        (
            _dot(F.col(f"q.{vec_col}"), F.col(f"c.{vec_col}"))
            / (F.col("q.__norm") * F.col("c.__norm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("cos", F.round("cos", 6))
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 8,
    n_probe: int = 2,
    seed: int = ANN_SEED,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Scale path for ANN: KMeans centroids partition the corpus into
    n_lists inverted lists; each query probes only its n_probe nearest
    lists. The candidate join is an equi-join on list id (one shuffle,
    prunable), versus brute force's full cross product. Recall is
    tunable via n_probe; the bench compares recall/throughput against
    cosine_topk.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    feat = corpus.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(feat)
    centers = [c.tolist() for c in model.clusterCenters()]

    @pandas_udf("array<int>")
    def probe_lists(vecs: pd.Series) -> pd.Series:
        C = np.asarray(centers)  # (n_lists, dim)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    @pandas_udf("int")
    def assign_list(vecs: pd.Series) -> pd.Series:
        C = np.asarray(centers)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    c = with_norm(
        corpus.withColumn("list_id", assign_list(F.col(vec_col))), vec_col
    ).alias("c")
    q = with_norm(
        queries.withColumn(
            "list_id", F.explode(probe_lists(F.col(vec_col)))
        ),
        vec_col,
    ).alias("q")
    j = c.join(
        F.broadcast(q),
        (F.col("c.list_id") == F.col("q.list_id"))
        & (F.col(f"c.{id_col}") != F.col(f"q.{id_col}")),
    ).select(
        F.col(f"q.{id_col}").alias("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        (
            _dot(F.col(f"q.{vec_col}"), F.col(f"c.{vec_col}"))
            / (F.col("q.__norm") * F.col("c.__norm"))
        ).alias("cos"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumn("cos", F.round("cos", 6))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup)."""
    a = with_norm(df, vec_col).alias("a")
    b = with_norm(df, vec_col).alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.__norm") * F.col("b.__norm")),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
