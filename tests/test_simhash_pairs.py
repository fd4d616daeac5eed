"""simhash_pairs: exact pigeonhole recall + parameter validation.

Unlike MinHash-LSH, simhash banding is EXACT when ``max_hamming < bands``
(a pair within d differing bits corrupts at most d of the bands, so one
band must match). The gate verifies that guarantee against a brute-force
all-pairs Hamming scan on a fixture with seeded near-identical documents —
every brute-force pair within the threshold must be recovered, with the
same Hamming distance. Value-level engine parity is the driver oracle
(``simhash_pairs`` in __spark_entry__.py, banded block join + popcount
replayed in DuckDB SQL).
"""

import random

import pytest

from stackoverflowner_spark.operators.dedup import simhash, simhash_pairs
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-simhash-pairs", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(60):
        rows.append((i, " ".join(rng.choice(WORDS) + str(rng.randrange(50))
                                 for _ in range(30))))
    # seeded near-identical twins: one-word edits flip only the few simhash
    # bits that word's hash touched, keeping Hamming distance small
    for j in range(20):
        base = rows[j][1].split()
        base[rng.randrange(30)] = "edited"
        rows.append((1000 + j, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute_force(spark, docs, max_hamming):
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ids = sorted(sigs)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = sum(x != y for x, y in zip(sigs[a], sigs[b]))
            if d <= max_hamming:
                out[(a, b)] = d
    return out


@pytest.mark.parametrize("bands,max_hamming", [(4, 3), (8, 6)])
def test_pigeonhole_recall_is_exact(spark, docs, bands, max_hamming):
    want = _brute_force(spark, docs, max_hamming)
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_pairs(docs, bands=bands,
                                  max_hamming=max_hamming).collect()}
    assert got == want          # exact recall AND exact distances
    assert len(want) >= 5       # non-vacuous: seeded twins surfaced


def test_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "the same text body here"), (2, "the same text body here"),
         (3, "a completely different unrelated collection of words")],
        "doc_id long, text string")
    rows = simhash_pairs(df, bands=4, max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_rejects_unsound_parameters():
    import pyspark.sql  # noqa: F401  (df unused — validation is eager)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(None, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        simhash_pairs(None, bands=5, max_hamming=3)
