"""Collective disambiguation gates: support counting (distinct other
mentions, any-candidate adjacency), argmax + tie-break determinism,
zero-evidence fallback, exactly-one-assignment invariant."""

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.disambig import disambiguate
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-disambig", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, cands, edges):
    c = spark.createDataFrame(cands, "doc_id long, mention string, "
                                     "entity string")
    e = spark.createDataFrame(edges, "src string, dst string")
    return {(r.doc_id, r.mention): (r.entity, r.support)
            for r in disambiguate(c, e).collect()}


def test_support_picks_coherent_candidate(spark):
    # doc 1 mentions 'java' (ambiguous: island vs language) alongside
    # 'maven' and 'gradle'; the KG connects only the language variant
    cands = [(1, "java", "java_lang"), (1, "java", "java_island"),
             (1, "maven", "maven_tool"), (1, "gradle", "gradle_tool")]
    edges = [("java_lang", "maven_tool"), ("java_lang", "gradle_tool"),
             ("java_island", "indonesia")]
    got = _run(spark, cands, edges)
    assert got[(1, "java")] == ("java_lang", 2)
    # unambiguous mentions also resolve, with their own support
    assert got[(1, "maven")] == ("maven_tool", 1)


def test_support_counts_distinct_mentions_not_edges(spark):
    # both candidates of m2 are adjacent to e -> m2 supports e ONCE
    cands = [(1, "m1", "e"), (1, "m1", "f"),
             (1, "m2", "x"), (1, "m2", "y")]
    edges = [("e", "x"), ("e", "y")]
    got = _run(spark, cands, edges)
    assert got[(1, "m1")] == ("e", 1)


def test_same_mention_no_self_support(spark):
    # adjacency between a mention's OWN candidates is not evidence
    cands = [(1, "m1", "a"), (1, "m1", "b")]
    edges = [("a", "b")]
    got = _run(spark, cands, edges)
    assert got[(1, "m1")] == ("a", 0)  # zero support, entity-order tie


def test_zero_evidence_falls_back_to_entity_order(spark):
    cands = [(7, "m", "zeta"), (7, "m", "alpha")]
    got = _run(spark, cands, [("unrelated", "nodes")])
    assert got[(7, "m")] == ("alpha", 0)


def test_exactly_one_assignment_per_mention(spark):
    cands = [(d, f"m{i}", f"m{i}#{v}")
             for d in (1, 2) for i in range(5) for v in (0, 1)]
    edges = [("m0#0", "m1#1"), ("m2#0", "m3#0")]
    c = spark.createDataFrame(cands, "doc_id long, mention string, "
                                     "entity string")
    e = spark.createDataFrame(edges, "src string, dst string")
    out = disambiguate(c, e)
    assert out.count() == 10
    assert out.groupBy("doc_id", "mention").count() \
              .filter(F.col("count") != 1).count() == 0


def test_doc_locality(spark):
    # evidence in doc 1 must not leak into doc 2's decision
    cands = [(1, "java", "java_lang"), (1, "maven", "maven_tool"),
             (2, "java", "java_lang"), (2, "java", "java_island"),
             (2, "bali", "bali_island")]
    edges = [("java_lang", "maven_tool"), ("java_island", "bali_island")]
    got = _run(spark, cands, edges)
    assert got[(2, "java")] == ("java_island", 1)