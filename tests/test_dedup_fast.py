"""Recall gate for the xxhash64 scale twin of the MinHash/LSH dedup path.

The md5 variant (``minhash_signatures`` / ``lsh_pairs``) is the
DuckDB-oracle-verified path; ``minhash_signatures_fast`` is the documented
100-TB path (JVM codegen hashes, long keys). The two hash families are
*different* MinHash samplers, so candidate sets need not be identical on
borderline pairs — what must hold is that BOTH recover the seeded
near-duplicates, and that neither degenerates toward all-pairs. This gate
runs them on a 240-doc fixture with 40 seeded near-dup pairs (one-word edit
over a 30-word body, 3-shingle Jaccard ~0.9) plus 160 unrelated documents.
"""

import random

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.dedup import (
    lsh_candidate_pairs, minhash_signatures, minhash_signatures_fast,
    ngram_jaccard_pairs)

from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-dedup-fast", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


N_PAIRS = 40
N_NOISE = 160
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
         "oscar", "papa", "quebec", "romeo", "sierra", "tango"]


def _fixture_rows():
    rng = random.Random(20260816)
    rows = []
    for i in range(N_PAIRS):
        body = [rng.choice(WORDS) for _ in range(30)]
        near = list(body)
        near[rng.randrange(30)] = rng.choice(WORDS) + "x"
        rows.append((2 * i, " ".join(body)))
        rows.append((2 * i + 1, " ".join(near)))
    for j in range(N_NOISE):
        rows.append((1000 + j, " ".join(rng.choice(WORDS) + str(rng.randrange(50))
                                        for _ in range(30))))
    truth = {(2 * i, 2 * i + 1) for i in range(N_PAIRS)}
    return rows, truth


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows, truth = _fixture_rows()
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache(), truth


def _candidates(sig):
    return {(r.id_a, r.id_b)
            for r in lsh_candidate_pairs(sig, rows_per_band=2).collect()}


def test_fast_lsh_recall_matches_md5_twin(spark, fixture_df):
    df, truth = fixture_df
    slow = _candidates(minhash_signatures(df, n=3, k=8))
    fast = _candidates(minhash_signatures_fast(df, n=3, k=8))
    n_all_pairs = (N_PAIRS * 2 + N_NOISE) * (N_PAIRS * 2 + N_NOISE - 1) / 2
    recall_slow = len(slow & truth) / len(truth)
    recall_fast = len(fast & truth) / len(truth)
    # both MinHash families recover ≥90% of the seeded near-dups
    assert recall_slow >= 0.9, f"md5 recall {recall_slow}"
    assert recall_fast >= 0.9, f"xxhash64 recall {recall_fast}"
    # neither degenerates toward all-pairs (the scale property)
    assert len(fast) < 0.05 * n_all_pairs
    assert len(slow) < 0.05 * n_all_pairs


def test_fast_candidates_verify_to_same_duplicate_set(spark, fixture_df):
    """End-to-end containment: after exact Jaccard verification at 0.7, the
    fast path's duplicate pairs sit inside the seeded truth, recover ≥90% of
    it, and differ from the md5 path only on borderline collision misses
    (≤10% of truth — each family misses different ~1.4%-probability pairs).
    A lane-mixing bug in the xxhash64 variant (wrong seed binding, truncated
    lanes) collapses recall and breaks this immediately."""
    df, truth = fixture_df

    def verified(sig_fn):
        cands = lsh_candidate_pairs(sig_fn(df, n=3, k=8), rows_per_band=2)
        got = ngram_jaccard_pairs(df, cands, n=3, threshold=0.7)
        return {(r.id_a, r.id_b) for r in got.collect()}

    v_slow = verified(minhash_signatures)
    v_fast = verified(minhash_signatures_fast)
    # verification makes both precise: nothing outside the seeded truth
    assert v_fast <= truth and v_slow <= truth
    assert len(v_fast) / len(truth) >= 0.9
    assert len(v_fast ^ v_slow) <= 0.1 * len(truth)
