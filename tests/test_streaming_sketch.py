"""Streaming HLL: register-table bitwise parity with the batch sketch,
estimate equality, and O(increment) state advance across a restart."""

import os

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.sketch import (
    cm_estimate, cm_sketch, hll_estimate, hll_sketch)
from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.streaming.sketch import (
    start_cm_stream, start_hll_stream)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-hll", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _await(q):
    assert q.awaitTermination(300), "stream did not finish in 300 s"


def _rows(i0, n, hosts=5):
    # token-ish values with cross-host overlap so per-key distinct counts
    # differ from row counts
    return [(i, f"tok{(i * 7) % 97}", f"host{i % hosts}")
            for i in range(i0, i0 + n)]


def _regs(df):
    return sorted((r.source, r.reg, r.rho) for r in df.collect())


def test_stream_registers_match_batch_bitwise(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(_rows(0, 400),
                                 "doc_id long, text string, source string")
    docs.write.parquet(docs_dir)

    _await(start_hll_stream(spark, docs_dir, ckpt, "hll_snap_a",
                            ["source"], "text"))
    got = spark.table("hll_snap_a")
    want = hll_sketch(docs, ["source"], "text")
    assert _regs(got) == _regs(want)

    # estimates off the snapshot equal the batch estimates exactly
    ge = {(r.source): (r.present, r.zeros, r.z_num, r.est)
          for r in hll_estimate(got).collect()}
    we = {(r.source): (r.present, r.zeros, r.z_num, r.est)
          for r in hll_estimate(want).collect()}
    assert ge == we


def test_increment_advances_registers_from_checkpoint(spark, tmp_path):
    """A second crawl increment processed by a RESTARTED stream must
    leave the registers equal to the batch sketch over BOTH increments —
    the max(rho) state survives in the checkpoint, so the increment
    never re-reads the first crawl."""
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)
    first = spark.createDataFrame(_rows(0, 200),
                                  "doc_id long, text string, source string")
    first.write.mode("append").parquet(docs_dir)
    _await(start_hll_stream(spark, docs_dir, ckpt, "hll_snap_b",
                            ["source"], "text"))
    snap1 = _regs(spark.table("hll_snap_b"))
    assert snap1 == _regs(hll_sketch(first, ["source"], "text"))

    second = spark.createDataFrame(
        _rows(100, 300),  # half re-crawl overlap, half new values
        "doc_id long, text string, source string")
    second.write.mode("append").parquet(docs_dir)
    _await(start_hll_stream(spark, docs_dir, ckpt, "hll_snap_b",
                            ["source"], "text"))
    both = first.unionByName(second)
    assert _regs(spark.table("hll_snap_b")) == \
        _regs(hll_sketch(both, ["source"], "text"))
    # monotone: registers only advance (max-merge), never regress
    d1 = dict(((s, r), rho) for s, r, rho in snap1)
    d2 = dict(((s, r), rho)
              for s, r, rho in _regs(spark.table("hll_snap_b")))
    assert all(d2[k] >= v for k, v in d1.items())


def test_cm_stream_counters_match_batch_and_increment(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)
    first = spark.createDataFrame(_rows(0, 250),
                                  "doc_id long, text string, source string")
    first.write.mode("append").parquet(docs_dir)
    _await(start_cm_stream(spark, docs_dir, ckpt, "cm_snap",
                           ["source"], "text", d=3, w=64))

    def cells(df):
        return sorted((r.source, r.depth, r.bucket, r.cnt)
                      for r in df.collect())
    assert cells(spark.table("cm_snap")) == \
        cells(cm_sketch(first, ["source"], "text", d=3, w=64))

    second = spark.createDataFrame(_rows(200, 200),
                                   "doc_id long, text string, source string")
    second.write.mode("append").parquet(docs_dir)
    _await(start_cm_stream(spark, docs_dir, ckpt, "cm_snap",
                           ["source"], "text", d=3, w=64))
    both = first.unionByName(second)
    snap = spark.table("cm_snap")
    assert cells(snap) == cells(cm_sketch(both, ["source"], "text",
                                          d=3, w=64))
    # point estimates off the stream snapshot honor est >= exact
    probes = both.select("source", "text").distinct()
    est = {(r.source, r.text): r.est
           for r in cm_estimate(snap, probes, "text", d=3, w=64).collect()}
    exact = {(r.source, r.text): r.n for r in
             both.groupBy("source", "text")
             .agg(F.count("*").alias("n")).collect()}
    assert all(est[k] >= v for k, v in exact.items())