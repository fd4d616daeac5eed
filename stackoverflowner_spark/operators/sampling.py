"""Deterministic sampling / split assignment for training-data curation.

Random sampling on a cluster must be a pure function of the row key — not of
partitioning, task retries, or engine RNG — or resumed/backfilled runs see
different corpora. Both operators hash the id with md5 (identical in every
engine, so DuckDB can oracle them bit-for-bit) and derive the decision from
the first 15 hex chars (60 bits, uniform, fits a signed 64-bit int in both
engines).

* ``hash_sample``  — keep ~fraction of rows, stable under reruns.
* ``hash_split``   — assign train/val/test (any named buckets with weights);
  a row's bucket never changes when other rows are added or removed.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(2 ** 60)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Uniform [0, 1) double from md5(salt:id) — engine-portable."""
    h = F.md5(F.concat_ws(":", F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(_DENOM)


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                salt: str = "sample") -> DataFrame:
    return df.filter(_unit_hash(F.col(id_col), salt) < fraction)


def hash_split(df: DataFrame, weights: List[Tuple[str, float]],
               id_col: str = "doc_id", salt: str = "split") -> DataFrame:
    """Adds a ``split`` column. ``weights`` = [(name, w), ...] normalized to
    cumulative thresholds; assignment = first bucket whose cumulative weight
    exceeds the row's unit hash."""
    total = sum(w for _, w in weights)
    u = _unit_hash(F.col(id_col), salt)
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w / total
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def split_counts(df: DataFrame, weights: List[Tuple[str, float]],
                 id_col: str = "doc_id", salt: str = "split") -> DataFrame:
    return (hash_split(df, weights, id_col, salt)
            .groupBy("split").agg(F.count("*").alias("n")))


def dedup_clusters(pairs: DataFrame, ids: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Near-duplicate pairs -> clusters -> canonical keeper per cluster.

    The end-to-end dedup decision: connected components over the verified
    pair graph; the cluster representative is the minimum id; singletons
    keep themselves. Returns (doc_id, keep_id, is_dup)."""
    from .components import connected_components

    edges = pairs.select(F.col("id_a").cast("string").alias("src"),
                         F.col("id_b").cast("string").alias("dst"))
    comps = connected_components(edges)
    assign = (ids.select(F.col(id_col))
              .join(comps.withColumn("node", F.col("node").cast(
                  ids.schema[id_col].dataType)),
                  ids[id_col] == F.col("node"), "left")
              .select(id_col, "component"))
    return assign.select(
        F.col(id_col),
        F.coalesce(F.col("component").cast(ids.schema[id_col].dataType),
                   F.col(id_col)).alias("keep_id"),
    ).withColumn("is_dup", (F.col(id_col) != F.col("keep_id")).cast("int"))
