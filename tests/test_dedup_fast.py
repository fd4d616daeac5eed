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


def test_gazetteer_fast_loop_matches_reference_semantics():
    """The gazetteer hot loop (1-gram direct probe + multi-first pre-screen
    + reordered URL predicates) must reproduce a plain greedy
    longest-match reference implementation on randomized sentences."""
    from stackoverflowner_spark.kernel.ctc import is_number_token, is_url_token
    from stackoverflowner_spark.operators.tagger import (
        _SENTINEL_TYPES, GazetteerTagger)

    amap = {"spark": ("e1", "Library"), "apache spark": ("e2", "Library"),
            "visual studio code": ("e3", "Application"),
            "go": ("e4", "Language"), "c++": ("e5", "Language"),
            "studio": ("e6", "Application")}

    def reference_tag(tokens, md_tags, max_ngram=3):
        n = len(tokens)
        tags = ["O"] * n
        for i, md in enumerate(md_tags):
            if md != "O" and md.split("-", 1)[-1] in _SENTINEL_TYPES:
                tags[i] = md
        i = 0
        while i < n:
            if tags[i] != "O":
                i += 1
                continue
            matched, mtype = 0, None
            for ln in range(min(max_ngram, n - i), 0, -1):
                if any(tags[j] != "O" for j in range(i, i + ln)):
                    continue
                hit = amap.get(" ".join(tokens[i:i + ln]).lower())
                if hit:
                    matched, mtype = ln, hit[1]
                    break
            if matched:
                tags[i] = "B-" + mtype
                for j in range(i + 1, i + matched):
                    tags[j] = "I-" + mtype
                i += matched
            else:
                i += 1
        for i, tok in enumerate(tokens):
            if tags[i] == "O" and len(tok) > 4 and not is_number_token(tok) \
                    and is_url_token(tok) and tok.lower().startswith(("http", "www.")):
                tags[i] = "B-Website"
        return tags

    import random
    rng = random.Random(7)
    vocab = ["apache", "spark", "visual", "studio", "code", "Go", "c++",
             "the", "fast", "http://x.io/a", "www.ex.com/p", "12345",
             "Spark", "STUDIO", "run", "of"]
    gz = GazetteerTagger(alias_map=amap)
    for _ in range(400):
        n = rng.randrange(1, 12)
        toks = [rng.choice(vocab) for _ in range(n)]
        mds = ["O"] * n
        if rng.random() < 0.3:
            mds[rng.randrange(n)] = "B-Code_Block"
        assert gz.tag(toks, mds) == reference_tag(toks, mds), (toks, mds)


def test_salted_join_rejects_outer_modes(spark):
    """ADVICE r02: the replicated small side would emit unmatched rows
    n_salts times under right/full-outer — those modes must be rejected."""
    from stackoverflowner_spark.operators.link import salted_join

    big = spark.createDataFrame([(1, "a")], ["k", "x"])
    small = spark.createDataFrame([(1, "b")], ["k", "y"])
    assert salted_join(big, small, "k", n_salts=4, how="inner").count() == 1
    assert salted_join(big, small, "k", n_salts=4, how="left").count() == 1
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="full_outer")
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "k", how="right")
