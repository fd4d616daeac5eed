"""with_repetition_stats: Gopher-style accept rules on planted specimens.

Engine parity is the driver oracle (`gopher_rules`); this gates the
decision semantics — each planted document violates exactly one rule.
"""

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.textstats import with_repetition_stats
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-gopher", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_each_rule_drops_its_specimen(spark):
    rows = [
        (1, "the quick brown fox jumps over a lazy dog near the old river "
            "bank while birds sing their morning songs quite loudly today"),
        (2, "click here click here click here click here click here "
            "click here click here click here click here click here"),   # top-bigram spam
        (3, "x#@! $%^& *()_ +=-~ x#@! $%^& *()_ {}[] <>?/ |\\^%"),        # symbol soup
        (4, "a I a I o u a I o e a I e o u I a e o u"),                  # mean word len < 3
        (5, "word word word word word word word word word word "
            "other other other other other other other other"),          # dup words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].top_bigram_frac >= 0.2
    assert not out[3].keep and out[3].symbol_ratio >= 0.1
    assert not out[4].keep and out[4].mean_word_len < 3
    assert not out[5].keep and out[5].dup_word_frac >= 0.3
    # ratios are well-formed
    for r in out.values():
        assert 0.0 <= r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_word_frac < 1.0


def test_short_docs_do_not_crash(spark):
    df = spark.createDataFrame([(1, "one"), (2, "")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert out[1].top_bigram_frac == 0.0    # no bigrams -> coalesce(0)
    assert out[2].n_words == 0
