"""Gates for PMI collocations (exact-rational lift vs a hand-counted
specimen and a local replay) and inverted-index conjunctive search
(AND semantics, tf ranking, deterministic ties, top-k cut)."""

from collections import Counter

import pytest

from stackoverflowner_spark.operators.cooccur import (
    collocations, comention_edges)
from stackoverflowner_spark.operators.search import (
    build_postings, keyword_search)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-cooccur", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


DOCS = [(0, "new york is big. new york never sleeps"),
        (1, "york new and new york again"),
        (2, "big apple big apple big apple"),
        (3, "a lone token stream with new ideas")]


def _toks(t):
    out = []
    for w in t.lower().split():
        w = w.strip(".,!?")
        if w:
            out.append(w)
    return out


def _local_colloc(min_count):
    uni, pairs = Counter(), Counter()
    n = p = 0
    for _, t in DOCS:
        ts = _toks(t)
        uni.update(ts)
        n += len(ts)
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] += 1
            p += 1
    out = {}
    for (a, b), c12 in pairs.items():
        if c12 >= min_count:
            out[(a, b)] = (c12, uni[a], uni[b],
                           c12 * n * n, p * uni[a] * uni[b])
    return out


def test_collocations_match_local_replay(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.c12, r.c1, r.c2, r.lift_num, r.lift_den)
           for r in collocations(docs, min_pair_count=2).collect()}
    assert got == _local_colloc(2)


def test_collocations_strong_flag_is_cross_multiplied(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = collocations(docs, min_pair_count=2,
                        strong_lift_x10=20).collect()
    assert rows, "fixture must produce pairs"
    for r in rows:
        assert r.strong == (1 if 10 * r.lift_num >= 20 * r.lift_den
                            else 0)
    # 'new york' repeats far above independence -> strong
    strong = {(r.w1, r.w2) for r in rows if r.strong == 1}
    assert ("new", "york") in strong


def test_collocations_min_count_filters(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {(r.w1, r.w2)
           for r in collocations(docs, min_pair_count=3).collect()}
    assert got == {(a, b) for (a, b), v in _local_colloc(3).items()}
    assert ("york", "is") not in got  # count 1 pair never surfaces


MENTIONS = [(0, "java"), (0, "maven"), (0, "java"),     # dup ignored
            (1, "java"), (1, "maven"), (1, "gradle"),
            (2, "java"), (2, "gradle"),
            (3, "solo")]                                 # no pair


def test_comention_weights_and_canonical_order(spark):
    m = spark.createDataFrame(MENTIONS, "doc_id long, entity string")
    got = sorted((r.src, r.dst, r.w)
                 for r in comention_edges(m).collect())
    assert got == [("gradle", "java", 2), ("gradle", "maven", 1),
                   ("java", "maven", 2)]


def test_comention_mega_doc_guard(spark):
    m = spark.createDataFrame(
        MENTIONS + [(9, f"e{i}") for i in range(40)],
        "doc_id long, entity string")
    capped = sorted((r.src, r.dst, r.w)
                    for r in comention_edges(m, max_per_doc=10).collect())
    # doc 9's 40 entities (780 pairs) dropped entirely; rest unchanged
    assert capped == [("gradle", "java", 2), ("gradle", "maven", 1),
                      ("java", "maven", 2)]
    uncapped = comention_edges(m).count()
    assert uncapped == 3 + 40 * 39 // 2


SDOCS = [(0, "spark runs fast spark scales"),
         (1, "spark joins tables fast"),
         (2, "tables scan fast fast fast"),
         (3, "spark spark spark fast")]


def test_search_and_semantics_and_ranking(spark):
    docs = spark.createDataFrame(SDOCS, "doc_id long, text string")
    q = spark.createDataFrame([("a", "spark"), ("a", "fast")],
                              "qid string, term string")
    rows = keyword_search(build_postings(docs), q, k=10).collect()
    got = [(r.doc_id, r.score, r.rank)
           for r in sorted(rows, key=lambda r: r.rank)]
    # doc2 lacks 'spark' -> excluded; scores: doc3 3+1=4, doc0 2+1=3,
    # doc1 1+1=2
    assert got == [(3, 4, 1), (0, 3, 2), (1, 2, 3)]


def test_search_tie_breaks_by_doc_id(spark):
    docs = spark.createDataFrame(
        [(5, "x y"), (2, "x y"), (9, "x y")], "doc_id long, text string")
    q = spark.createDataFrame([("t", "x"), ("t", "y")],
                              "qid string, term string")
    rows = keyword_search(build_postings(docs), q, k=10).collect()
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)
            ] == [(2, 1), (5, 2), (9, 3)]


def test_search_top_k_cut(spark):
    docs = spark.createDataFrame(
        [(i, "x " * (i + 1)) for i in range(8)], "doc_id long, text string")
    q = spark.createDataFrame([("t", "x")], "qid string, term string")
    rows = keyword_search(build_postings(docs), q, k=3).collect()
    assert sorted((r.doc_id, r.score, r.rank) for r in rows) == [
        (5, 6, 3), (6, 7, 2), (7, 8, 1)]


def test_search_duplicate_query_terms_collapse(spark):
    docs = spark.createDataFrame(SDOCS, "doc_id long, text string")
    q1 = spark.createDataFrame([("a", "spark"), ("a", "spark")],
                               "qid string, term string")
    q2 = spark.createDataFrame([("a", "spark")], "qid string, term string")
    p = build_postings(docs)
    r1 = sorted((r.doc_id, r.score, r.rank)
                for r in keyword_search(p, q1, k=10).collect())
    r2 = sorted((r.doc_id, r.score, r.rank)
                for r in keyword_search(p, q2, k=10).collect())
    assert r1 == r2
