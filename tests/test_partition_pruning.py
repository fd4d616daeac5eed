"""Partition-pruning evidence for the 100-TB layout.

At crawl scale the pages table is written partitioned by ``lang`` (and in
production date), so the flagship's ``lang = 'en'`` filter must prune
PARTITIONS at planning time — entire directories never read — rather than
filtering rows after reading them. Behavioral proof: the non-en partition
directory is corrupted with a garbage file; a pruned scan succeeds because
it never opens that file, while an unpruned scan fails on it.
"""

import os

import pytest
from pyspark.sql import functions as F
from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.sources.pages import synth_pages


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-prune", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def parted(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages_parted"))
    pages = synth_pages(spark, 400).withColumn("lang", F.lit("en"))
    other = pages.withColumn("lang", F.lit("de")) \
                 .withColumn("url", F.concat(F.lit("de-"), F.col("url")))
    pages.unionByName(other).write.partitionBy("lang") \
         .mode("overwrite").parquet(path)
    # poison the de partition: any scan that actually opens it will fail
    with open(os.path.join(path, "lang=de", "part-99999-garbage.parquet"),
              "wb") as f:
        f.write(b"this is not a parquet file")
    return path


def test_lang_filter_prunes_partitions(spark, parted):
    df = spark.read.parquet(parted).filter(F.col("lang") == "en")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # behavioral proof: succeeds despite the poisoned de partition
    assert df.count() == 400
    # control: an unpruned scan DOES hit the garbage file and fails
    with pytest.raises(Exception, match="garbage|FAILED_READ_FILE"):
        spark.read.parquet(parted).count()


def test_extract_stage_filter_reaches_partition_level(spark, parted):
    """The flagship's own lang filter (extract_stage lang_filter) must
    prune the partitioned layout the same way."""
    from stackoverflowner_spark.operators.document_kernel import extract_stage
    pages = spark.read.parquet(parted)
    ex = extract_stage(pages, lang_filter="en")
    plan = ex._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert ex.filter(F.col("ok")).count() > 0  # de partition never opened
