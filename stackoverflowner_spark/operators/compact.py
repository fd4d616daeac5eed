"""Small-file compaction for the partitioned triples table.

The operational problem: incremental crawls append small files per
``part_hash`` partition (every micro-batch / resumed bucket adds one),
and at 10^12 triples the scan cost becomes dominated by file-open
overhead and tiny row groups long before data volume matters
(the classic "small files problem"; Iceberg calls the fix rewrite_data_-
files / bin-packing compaction). This operator rewrites a partitioned
triple table into ~``target_rows``-sized files per partition without
changing a single row.

Plan shape (the part that must survive 100x): ONE scan → ONE
``repartitionByRange`` keyed on (part_hash, subj) — range partitioning
keeps the subject clustering the sorted layout established (hash
repartition would destroy it) — with the number of output partitions
derived from a cheap per-partition count agg, → partitionBy write. The
row count pass is metadata-cheap on parquet (count pushes to footer
stats; no column data is read). Rows never move across ``part_hash``
boundaries (the range key leads with part_hash), so partition dirs stay
self-contained and a partial compaction of selected partitions is safe.

``sortWithinPartitions(part_hash, subj, pred)`` is re-applied before the
write so compaction REPAIRS clustering for tables written by the plain
writer too — compact-then-probe equals the sorted layout's prunability.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_compaction(spark: SparkSession, path: str,
                    target_rows: int = 4_000_000) -> dict:
    """Inventory pass: rows and files per partition, output file budget.

    Returns {"partitions": n, "files": n, "rows": n, "out_files": n} —
    the decision record an operator wants in the job log before a
    rewrite is launched.
    """
    df = spark.read.parquet(path)
    per = (df.groupBy("part_hash").agg(F.count("*").alias("rows"))
           .collect())
    files = (df.select(F.input_file_name().alias("f")).distinct().count())
    rows = sum(r.rows for r in per)
    out_files = sum(max(1, math.ceil(r.rows / target_rows)) for r in per)
    return {"partitions": len(per), "files": files, "rows": rows,
            "out_files": out_files}


def compact_triples(spark: SparkSession, src: str, dst: str,
                    target_rows: int = 4_000_000) -> dict:
    """Rewrite ``src`` into ``dst`` with ~target_rows rows per file,
    subject-clustered. Returns the plan_compaction record of the source
    plus the achieved output file count."""
    plan = plan_compaction(spark, src, target_rows)
    df = spark.read.parquet(src)
    (df.repartitionByRange(max(1, plan["out_files"]),
                           "part_hash", "subj")
     .sortWithinPartitions("part_hash", "subj", "pred")
     .write.mode("overwrite").partitionBy("part_hash").parquet(dst))
    out = spark.read.parquet(dst)
    achieved = (out.select(F.input_file_name().alias("f"))
                .distinct().count())
    return {**plan, "achieved_files": achieved}
