"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — exact baseline. Dot products as built-in
  higher-order functions (``zip_with`` + ``aggregate``), entirely JVM-side;
  the query side is broadcast so the scan is one pass over the corpus.
* LSH-bucketed ANN — deterministic random-hyperplane signatures; candidate
  generation touches only colliding buckets, the scale path when the corpus
  side is 10^9+ vectors.
* IVF-style variant — coarse quantization by nearest seed centroid, probe
  the closest partitions only.
"""

from __future__ import annotations

from typing import List

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernel.ctc import hashed_embedding


def _norm_col(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot_col(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id") -> DataFrame:
    """Exact top-k: broadcast queries x corpus scan -> window rank.

    ``queries(q_id, embedding)``; returns (q_id, vec_id, cosine, rank<=k).
    """
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                _dot_col(F.col("q_vec"), F.col("c_vec"))
                / (F.greatest(_norm_col(F.col("q_vec")), F.lit(1e-12))
                   * F.greatest(_norm_col(F.col("c_vec")), F.lit(1e-12))), 4))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int = 16) -> List[List[float]]:
    """Deterministic random hyperplanes: hashed embeddings of fixed seeds."""
    return [
        [float(x) for x in hashed_embedding([f"lsh-plane-{i}"], dim=dim)[0]]
        for i in range(n_planes)
    ]


def lsh_signature_col(vec_col, planes: List[List[float]]):
    bits = [
        F.when(_dot_col(vec_col, F.array(*[F.lit(v) for v in p])) >= 0, F.lit("1")
               ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
                 n_planes: int = 12, id_col: str = "vec_id",
                 vec_col: str = "embedding", q_id_col: str = "q_id") -> DataFrame:
    """Approximate top-k: exact rank *within* the query's LSH bucket."""
    planes = hyperplanes(dim, n_planes)
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec"),
                      lsh_signature_col(F.col(vec_col), planes).alias("sig"))
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("q_vec"),
                       lsh_signature_col(F.col(vec_col), planes).alias("sig"))
    scored = (
        c.join(F.broadcast(q), "sig")
        .withColumn(
            "cosine",
            F.round(
                _dot_col(F.col("q_vec"), F.col("c_vec"))
                / (F.greatest(_norm_col(F.col("q_vec")), F.lit(1e-12))
                   * F.greatest(_norm_col(F.col("c_vec")), F.lit(1e-12))), 4))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "cosine", "rank")
    )


def ivf_assignments(corpus: DataFrame, dim: int, n_centroids: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Coarse IVF partitioning: assign each vector to its nearest
    deterministic seed centroid (argmax cosine)."""
    cents = [
        [float(x) for x in hashed_embedding([f"ivf-centroid-{i}"], dim=dim)[0]]
        for i in range(n_centroids)
    ]
    sims = [
        (_dot_col(F.col(vec_col), F.array(*[F.lit(v) for v in c]))
         / F.greatest(_norm_col(F.col(vec_col)), F.lit(1e-12))).alias(f"s{i}")
        for i, c in enumerate(cents)
    ]
    df = corpus.select(F.col(id_col), F.col(vec_col), *sims)
    best = F.greatest(*[F.col(f"s{i}") for i in range(n_centroids)])
    assign = F.lit(-1)
    for i in reversed(range(n_centroids)):
        assign = F.when(F.col(f"s{i}") == best, F.lit(i)).otherwise(assign)
    return df.select(F.col(id_col), F.col(vec_col), assign.alias("centroid"))
