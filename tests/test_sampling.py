"""Deterministic sampling/split operators (training-data curation)."""

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.sampling import (
    dedup_clusters, hash_sample, hash_split)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sampling", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_sample_stable_under_corpus_growth(spark):
    """A row's keep/drop decision is a pure function of its id: adding more
    rows (backfill) must not change which of the original rows are kept."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(small, 0.3).collect()}
    b = {r.doc_id for r in hash_sample(big, 0.3).collect() if r.doc_id < 500}
    assert a == b
    assert 0.2 < len(a) / 500 < 0.4


def test_split_total_and_stable(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    w = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = hash_split(df, w)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000          # total: every row assigned
    assert 0.7 < counts["train"] / 3000 < 0.9
    # rerun identical
    again = {(r.doc_id, r.split) for r in hash_split(df, w).collect()}
    assert {(r.doc_id, r.split) for r in out.collect()} == again


def test_dedup_clusters_keeps_one_per_cluster(spark):
    ids = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    got = {r.doc_id: (r.keep_id, r.is_dup)
           for r in dedup_clusters(pairs, ids).collect()}
    assert got[0] == (0, 0) and got[1] == (0, 1) and got[2] == (0, 1)
    assert got[3] == (3, 0)                      # singleton keeps itself
    assert got[4] == (4, 0) and got[5] == (4, 1)
