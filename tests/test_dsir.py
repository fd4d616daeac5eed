"""DSIR importance resampling (operators/dsir.py).

Gates: (a) bucket featurization parity vs hashlib.md5 in pure Python;
(b) integer stats parity vs Counter; (c) score parity vs a numpy-free
math.log reference (approx — per-doc float sum order is Spark's); (d)
planted-specimen selection: a target-like document beats noise by a
margin no Gumbel draw overturns; (e) pure-Gumbel determinism: with
target == raw the log-ratio is exactly 0 everywhere, so selection
reduces to the hashed Gumbel ranking, replayed bit-for-bit in Python.
"""

import hashlib
import math
from collections import Counter

import pytest

from stackoverflowner_spark.operators.dsir import (dsir_bucket_stats,
                                                   dsir_scores,
                                                   dsir_select,
                                                   hashed_bigram_buckets)
from stackoverflowner_spark.session import get_spark

B = 64  # small bucket count so collisions actually happen in tests


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-dsir", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _bigrams(text):
    ws = [w for w in text.split(" ") if w]
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _bucket(gram, buckets=B):
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16) % buckets


# several copies of the target style: per-bucket target counts must
# clear the add-one smoothing for the ratio to go positive on a
# test-sized corpus (raw includes doc10's own occurrences)
_T = "spark sql query engine optimizes the query plan"
TARGET = [(1, _T), (2, _T), (3, _T), (4, _T)]
RAW = [
    (10, _T),
    (11, "cats and dogs and cats and dogs"),
    (12, "the weather today is mild and sunny"),
    (13, ""),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucket_featurization_parity(spark):
    got = {(r.doc_id, r.bucket): r.c
           for r in hashed_bigram_buckets(_df(spark, RAW),
                                          buckets=B).collect()}
    want = Counter()
    for i, t in RAW:
        for g in _bigrams(t):
            want[(i, _bucket(g))] += 1
    assert got == dict(want)


def test_stats_parity(spark):
    got = {r.bucket: (r.target_c, r.raw_c)
           for r in dsir_bucket_stats(_df(spark, TARGET), _df(spark, RAW),
                                      buckets=B).collect()}
    tc, rc = Counter(), Counter()
    for i, t in TARGET:
        for g in _bigrams(t):
            tc[_bucket(g)] += 1
    for i, t in RAW:
        for g in _bigrams(t):
            rc[_bucket(g)] += 1
    want = {b: (tc.get(b, 0), rc.get(b, 0)) for b in set(tc) | set(rc)}
    assert got == want


def _ref_scores(alpha=1.0):
    tc, rc = Counter(), Counter()
    for i, t in TARGET:
        for g in _bigrams(t):
            tc[_bucket(g)] += 1
    for i, t in RAW:
        for g in _bigrams(t):
            rc[_bucket(g)] += 1
    T, R = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in RAW:
        s = 0.0
        for g in _bigrams(t):
            b = _bucket(g)
            s += (math.log((tc.get(b, 0) + alpha) / (T + alpha * B))
                  - math.log((rc.get(b, 0) + alpha) / (R + alpha * B)))
        out[i] = s
    return out


def test_scores_parity(spark):
    stats = dsir_bucket_stats(_df(spark, TARGET), _df(spark, RAW), buckets=B)
    got = {r.doc_id: r.score
           for r in dsir_scores(_df(spark, RAW), stats, buckets=B).collect()}
    want = _ref_scores()
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-12)
    assert got[13] == 0.0          # empty doc: exact zero row
    assert got[10] > 0 > got[11]   # target-like positive, noise negative
    assert got[10] > got[12]


def test_planted_selection(spark):
    stats = dsir_bucket_stats(_df(spark, TARGET), _df(spark, RAW), buckets=B)
    for seed in range(5):
        top = dsir_select(_df(spark, RAW), stats, k=1, buckets=B,
                          seed=seed).collect()
        assert [r.doc_id for r in top] == [10]


def test_pure_gumbel_determinism(spark):
    # target == raw -> llr exactly 0 in every bucket -> selection is the
    # hashed Gumbel ranking alone; replay it bit-for-bit in Python
    stats = dsir_bucket_stats(_df(spark, RAW), _df(spark, RAW), buckets=B)
    got = [r.doc_id for r in
           dsir_select(_df(spark, RAW), stats, k=2, buckets=B,
                       seed=7).collect()]

    def gumbel(i, seed=7):
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15]
        u = (int(h, 16) + 0.5) / float(1 << 60)
        return -math.log(-math.log(u))

    want = sorted((i for i, _ in RAW),
                  key=lambda i: (-gumbel(i), i))[:2]
    assert got == want
    # and it is stable across a second run
    again = [r.doc_id for r in
             dsir_select(_df(spark, RAW), stats, k=2, buckets=B,
                         seed=7).collect()]
    assert again == got
