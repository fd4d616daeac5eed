"""Triple materialization, partitioned by subject hash.

North-rule sink (SURVEY.md §2.8 / S8): linked mentions ->
``triples(subj, pred, obj, url, part_hash)`` with
``part_hash = pmod(xxhash64(subj), n_buckets)``. Writing is partitioned by
``part_hash`` so downstream subject lookups prune partitions and the write
itself spreads head subjects deterministically.

Predicates:
  instance_of   canonical -> entity type        (deduplicated)
  mentioned_in  canonical -> url                (per page)
  alias_of      surface form -> canonical       (deduplicated)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triples_from_linked(linked: DataFrame, components: DataFrame | None = None,
                        n_buckets: int = 64) -> DataFrame:
    subj = F.col("canonical_id")
    if components is not None:
        linked = linked.join(F.broadcast(components), "canonical_id", "left")
        subj = F.coalesce(F.col("component"), F.col("canonical_id"))
    base = linked.select(
        subj.alias("subj"),
        F.col("entity_type"),
        F.col("surface_norm"),
        F.col("url"),
    )

    # Evidence-level triples: every row keeps its source url, deduplicated on
    # (subj, pred, obj, url). This keeps the stage idempotent per url-bucket,
    # which is what makes bucket-granular resume safe (plans/pipeline.py);
    # logical triples are `distinct_triples` below.
    #
    # The three predicates are emitted via ONE explode, not a union of three
    # projections: a union would make Catalyst re-execute the upstream
    # Python kernel once per branch (no subplan CSE across union arms — seen
    # live in PLANS.md §1 before this rewrite, a 3x kernel recompute).
    triples = base.select(
        F.explode(F.array(
            F.struct(F.col("subj"), F.lit("instance_of").alias("pred"),
                     F.col("entity_type").alias("obj"), F.col("url")),
            F.struct(F.col("subj"), F.lit("mentioned_in").alias("pred"),
                     F.col("url").alias("obj"), F.col("url")),
            F.struct(F.col("surface_norm").alias("subj"),
                     F.lit("alias_of").alias("pred"),
                     F.col("subj").alias("obj"), F.col("url")),
        )).alias("t")
    ).select("t.subj", "t.pred", "t.obj", "t.url").distinct()
    return triples.withColumn(
        "part_hash", F.pmod(F.xxhash64("subj"), F.lit(n_buckets)).cast("int"))


def distinct_triples(triples: DataFrame) -> DataFrame:
    """Logical (subj, pred, obj) view over the evidence-level table."""
    return triples.select("subj", "pred", "obj").distinct()


def write_triples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    triples.write.mode(mode).partitionBy("part_hash").parquet(path)


def write_triples_bucketed(triples: DataFrame, table: str, n_buckets: int = 64,
                           mode: str = "overwrite") -> None:
    """Bucketed managed table (`bucketBy(subj)`): downstream subject-keyed
    joins and aggregations read co-located buckets and skip the exchange
    entirely — the parquet+partitionBy variant above prunes partitions but
    still shuffles on join. On Iceberg this is `bucket(N, subj)` partition
    transform; here it is the Spark managed-table equivalent."""
    (triples.write.mode(mode)
     .bucketBy(n_buckets, "subj").sortBy("subj")
     .format("parquet").saveAsTable(table))
