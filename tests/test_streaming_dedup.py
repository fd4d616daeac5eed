"""Streaming exact dedup: batch==stream parity + incremental increments.

The stream must emit each distinct normalized text exactly once across
micro-batches (state carries between batches and between restarts via the
checkpoint), matching the batch operator's surviving-content set.
"""

import os

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.dedup import exact_dedup
from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.streaming.dedup import start_dedup_stream


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-dedup", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _await(q):
    assert q.awaitTermination(300), "stream did not finish in 300 s"


def test_stream_matches_batch_content_set(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, f"document body number {i % 40}") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(docs_dir)

    _await(start_dedup_stream(spark, docs_dir, out_dir, ckpt))
    got = spark.read.parquet(out_dir)
    batch_hashes = {r.content_hash for r in
                    exact_dedup(docs).select("content_hash").collect()}
    stream_hashes = [r.content_hash for r in got.select("content_hash").collect()]
    assert set(stream_hashes) == batch_hashes       # same surviving content
    assert len(stream_hashes) == len(batch_hashes)  # exactly once per hash


def test_increment_resumes_state_from_checkpoint(spark, tmp_path):
    """A second crawl increment (half re-crawls, half new) processed by a
    RESTARTED stream must emit only the genuinely-new documents — the seen
    set survives in the state store through the checkpoint."""
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)
    first = spark.createDataFrame(
        [(i, f"body {i}") for i in range(30)], "doc_id long, text string")
    first.write.mode("append").parquet(docs_dir)
    _await(start_dedup_stream(spark, docs_dir, out_dir, ckpt))
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 30

    second = spark.createDataFrame(
        [(1000 + i, f"body {i}") for i in range(15)]        # re-crawls
        + [(2000 + i, f"fresh {i}") for i in range(10)],    # new
        "doc_id long, text string")
    second.write.mode("append").parquet(docs_dir)
    _await(start_dedup_stream(spark, docs_dir, out_dir, ckpt))
    got = spark.read.parquet(out_dir)
    assert got.count() == 40                                # 30 + 10 new
    fresh = got.filter(F.col("text").startswith("fresh")).count()
    assert fresh == 10
    # each content hash exactly once across both increments
    assert got.select("content_hash").distinct().count() == 40
