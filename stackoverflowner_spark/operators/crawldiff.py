"""Crawl-snapshot delta: classify every key across two snapshots of the
same corpus as added / removed / changed / unchanged.

The incremental-crawl primitive: snapshot B (this crawl) against snapshot
A (the last one), keyed by url, compared by content fingerprint. Drives
recrawl scheduling, incremental KG updates (only `changed`+`added` pages
re-enter the extraction pipeline), and corpus-drift reporting.

Shape: ONE full-outer sort-merge join on the key — both sides shuffle
once on url, the same partitioning an Iceberg table bucketed by url
already has on disk (then the join is exchange-free). No skew concern:
crawl keys are ~unique per snapshot. The fingerprint comparison is a
column expression; nothing leaves the JVM.

The driver oracle (`crawl_delta` entry) replays the classification
bitwise in DuckDB over deterministically derived snapshots of the
documents fixture; planted-specimen tests cover each status class
(tests/test_asof_range_delta.py).

Reference parity note: the reference processes one static dump; snapshot
deltas are engine-beyond-reference surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_delta(a: DataFrame, b: DataFrame, keys: Sequence[str],
                   fingerprint_col: str) -> DataFrame:
    """Full-outer compare of snapshot ``a`` (old) and ``b`` (new).

    Both inputs must be unique per key and carry ``fingerprint_col``
    (any equatable column; md5 of the content is the usual choice).
    Result: keys + status + fp_old + fp_new; fp_old is null for added,
    fp_new null for removed.
    """
    keys = list(keys)
    fa = a.select(*keys, F.col(fingerprint_col).alias("fp_old"))
    fb = b.select(*keys, F.col(fingerprint_col).alias("fp_new"))
    j = fa.join(fb, keys, "full_outer")
    status = (F.when(F.col("fp_old").isNull(), F.lit("added"))
              .when(F.col("fp_new").isNull(), F.lit("removed"))
              .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return j.select(*keys, status.alias("status"), "fp_old", "fp_new")


def delta_counts(delta: DataFrame) -> DataFrame:
    """Per-status rollup of a :func:`snapshot_delta` result."""
    return delta.groupBy("status").agg(F.count("*").alias("n"))


def changed_or_added(delta: DataFrame, b: DataFrame,
                     keys: Sequence[str]) -> DataFrame:
    """The incremental work-list: new-snapshot rows whose key is added or
    changed — the only pages the KG pipeline must re-extract. Left-semi
    join, so ``b``'s columns pass through untouched."""
    keys = list(keys)
    todo = delta.filter(F.col("status").isin("added", "changed"))
    return b.join(todo.select(*keys), keys, "left_semi")
