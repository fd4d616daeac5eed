"""Compaction (operators/compact.py): fewer files, identical rows,
clustering repaired.

Builds a fragmented triples table (many tiny appends per partition —
the incremental-crawl aftermath), compacts it, and gates: (a) row-level
content is EXACTLY unchanged; (b) file count drops to ~the plan's
budget; (c) rows never crossed part_hash directories; (d) compaction of
a PLAIN-written (unclustered) table restores subject clustering to the
sorted-layout prunability level, measured on parquet footer stats with
the same candidate-row-group metric as test_triples_layout.
"""

import glob

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.compact import (compact_triples,
                                                      plan_compaction)
from stackoverflowner_spark.session import get_spark

from .test_triples_layout import (N_BUCKETS, _candidate_rowgroups,
                                  _synthetic_triples)


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-compact", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _fragmented(spark, path, n_appends=6):
    tri = _synthetic_triples(spark, n=12_000, n_subj=1_200).cache()
    for i in range(n_appends):
        (tri.filter(F.pmod(F.xxhash64("obj"), F.lit(n_appends)) == i)
         .repartition(3)
         .write.mode("append").partitionBy("part_hash").parquet(path))
    return tri


def test_compact_preserves_rows_and_cuts_files(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    _fragmented(spark, src)
    n_src_files = len(glob.glob(src + "/part_hash=*/part-*"))
    assert n_src_files >= 8 * N_BUCKETS, "fixture not fragmented enough"

    rec = compact_triples(spark, src, dst, target_rows=2_000)
    n_dst_files = len(glob.glob(dst + "/part_hash=*/part-*"))
    assert rec["rows"] == 12_000 and rec["files"] == n_src_files
    # file count collapses toward the budget (range partitions can split
    # across a dir boundary, so allow slack but require a big cut)
    assert n_dst_files <= rec["out_files"] + N_BUCKETS
    assert n_dst_files < n_src_files / 4

    a = sorted(map(tuple, spark.read.parquet(src)
                   .select("subj", "pred", "obj", "url", "part_hash")
                   .collect()))
    b = sorted(map(tuple, spark.read.parquet(dst)
                   .select("subj", "pred", "obj", "url", "part_hash")
                   .collect()))
    assert a == b

    # rows never crossed part_hash dirs: per-dir counts match
    src_counts = {r.part_hash: r["count"] for r in
                  spark.read.parquet(src).groupBy("part_hash").count()
                  .collect()}
    dst_counts = {r.part_hash: r["count"] for r in
                  spark.read.parquet(dst).groupBy("part_hash").count()
                  .collect()}
    assert src_counts == dst_counts


def test_compact_restores_clustering(spark, tmp_path):
    """A plain (unclustered) fragmented table, once compacted, must admit
    few candidate row groups for subject probes — clustering is repaired,
    not just file counts."""
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "compact2")
    _fragmented(spark, src)
    compact_triples(spark, src, dst, target_rows=1_500)

    probes = [f"ent_{i}" for i in range(0, 1200, 173)]
    buckets = {r.subj: r.b for r in
               (spark.createDataFrame([(s,) for s in probes], "subj string")
                .select("subj", F.pmod(F.xxhash64("subj"),
                                       F.lit(N_BUCKETS)).cast("int")
                        .alias("b")).collect())}
    frag_hits, _ = _candidate_rowgroups(src, buckets)
    comp_hits, _ = _candidate_rowgroups(dst, buckets)
    tot_frag, tot_comp = sum(frag_hits.values()), sum(comp_hits.values())
    assert all(v >= 1 for v in comp_hits.values())
    # fragmented: every probe hits ~every tiny file's group; compacted:
    # ~one group per probe
    assert tot_frag >= 4 * tot_comp, (tot_frag, tot_comp)
