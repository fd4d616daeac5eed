"""Tag schemes, wordpiece featurization, prepared-example operator."""

import os

import pytest

from stackoverflowner_spark.kernel import tagscheme, wordpiece
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-prep", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_iob1_to_iob2():
    tags = ["I-Class", "I-Class", "O", "I-Function", "B-Function", "I-Class"]
    ok = tagscheme.to_iob2(tags)
    assert ok
    assert tags == ["B-Class", "I-Class", "O", "B-Function", "B-Function", "B-Class"]
    bad = ["X-Class"]
    assert not tagscheme.to_iob2(bad)


def test_iob_iobes_roundtrip():
    iob = ["B-Class", "I-Class", "O", "B-Function", "B-Class", "I-Class", "I-Class"]
    iobes = tagscheme.iob_to_iobes(iob)
    assert iobes == ["B-Class", "E-Class", "O", "S-Function", "B-Class",
                     "I-Class", "E-Class"]
    assert tagscheme.iobes_to_iob(iobes) == iob


def test_zero_digits_and_caps():
    assert tagscheme.zero_digits("v1.2.3") == "v0.0.0"
    assert tagscheme.cap_class("word") == 0
    assert tagscheme.cap_class("WORD") == 1
    assert tagscheme.cap_class("Word") == 2
    assert tagscheme.cap_class("wOrd") == 3


def test_wordpiece_shape_contract():
    corpus = ["python", "pandas", "dataframe", "select", "filter", "the",
              "using", "groupby"] * 2
    vocab = wordpiece.WordPieceVocab(corpus)
    label_map = {"O": 0, "B-Library": 1, "I-Library": 2}
    words = ["using", "pandas", "dataframe"]
    labels = ["O", "B-Library", "O"]
    feats = wordpiece.convert_example(
        words, labels, [0, 1, 1], ["O", "Name", "O"], vocab, label_map,
        max_seq_length=16)
    assert len(feats.input_ids) == 16
    assert len(feats.input_mask) == 16
    assert len(feats.label_ids) == 16
    # CLS position padded label; exactly one non-(-100) label per word
    assert feats.label_ids[0] == wordpiece.PAD_LABEL_ID
    real = [l for l in feats.label_ids if l != wordpiece.PAD_LABEL_ID]
    assert real == [0, 1, 0]
    # mask covers CLS + pieces + SEP then zeros
    n_real = sum(feats.input_mask)
    assert feats.input_mask[:n_real] == [1] * n_real
    assert feats.input_ids[n_real:] == [vocab.pad_id] * (16 - n_real)


def test_wordpiece_truncation_drops_tail():
    vocab = wordpiece.WordPieceVocab(["aa", "bb"])
    words = ["aa"] * 50
    labels = ["O"] * 50
    feats = wordpiece.convert_example(words, labels, [0] * 50, ["O"] * 50,
                                      vocab, {"O": 0}, max_seq_length=16)
    real = [l for l in feats.label_ids if l != wordpiece.PAD_LABEL_ID]
    assert len(real) == 14  # 16 - CLS - SEP
    preds = wordpiece.unpad_predictions(feats.label_ids, list(range(16)))
    assert len(preds) == 14


def test_prepare_dataset_operator(spark):
    from stackoverflowner_spark.operators.prepare import (
        UNK_ID, build_char_mapping, build_tag_mapping, prepare_dataset,
        word_mapping_df)
    rows = [
        ("f", 0, ["The", "Python", "API", "works"], ["O", "B-Language", "O", "O"]),
        ("f", 1, ["the", "python", "api", "the", "the"],
         ["O", "B-Language", "O", "O", "O"]),
        ("f", 2, ["the", "python", "api"], ["O", "B-Language", "O"]),
    ]
    df = spark.createDataFrame(
        rows, "file string, sent_idx int, words array<string>, tags array<string>")
    wm_df = word_mapping_df(df, min_freq=3)
    wm = {r.word: r.word_id for r in wm_df.collect()}  # tiny here: test-only
    cm = build_char_mapping(df)
    tm = build_tag_mapping(df)
    assert "the" in wm and "python" in wm and "works" not in wm
    assert min(wm.values()) == 2                 # 0/1 reserved for PAD/UNK
    out = {r.sent_idx: r
           for r in prepare_dataset(df, spark, wm_df, cm, tm).collect()}
    r0 = out[0]
    assert r0.word_ids[0] == wm["the"]           # lowercased lookup
    assert r0.word_ids[3] == UNK_ID              # pruned word -> UNK
    assert r0.caps == [2, 2, 1, 0]
    assert len(r0.char_ids) == 4
    assert all(isinstance(c, int) for cs in r0.char_ids for c in cs)
    assert r0.tag_ids[1] == tm["B-Language"]
    assert r0.str_words == ["The", "Python", "API", "works"]  # order preserved
    # the plan must not collect the word mapping: the lookup is a join
    plan = prepare_dataset(df, spark, wm_df, cm, tm)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "Join" in plan


def test_segmenter_stage_and_report(spark):
    from stackoverflowner_spark.operators.document_kernel import (
        extract_stage, seg_tags_stage, sentences_stage)
    from stackoverflowner_spark.operators.evalops import format_report
    from stackoverflowner_spark.operators.tagger import SegmenterTagger
    from stackoverflowner_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 40)
    seg = seg_tags_stage(sentences_stage(extract_stage(pages)), SegmenterTagger())
    rows = seg.collect()
    assert rows
    assert all(len(r.seg_tags) == len(r.tokens) for r in rows)
    flat = {t for r in rows for t in r.seg_tags}
    assert flat <= {"O", "Name"} and "Name" in flat

    report = {"__overall__": {"precision": 80.0, "recall": 40.0, "f1": 53.33,
                              "tp": 4, "guessed": 5, "truth": 10},
              "Class": {"precision": 80.0, "recall": 40.0, "f1": 53.33,
                        "tp": 4, "guessed": 5, "truth": 10}}
    txt = format_report(report)
    assert "overall" in txt and "precision:  80.00%" in txt
    tsv = format_report(report, "tsv")
    assert tsv.splitlines()[0].startswith("type\tPrecision")
    tex = format_report(report, "latex")
    assert tex.startswith("\\begin{tabular}")


def test_partitioned_rank_matches_global_window(spark):
    """Two-pass partition-offset ids (VERDICT r02 #5) must be bit-identical
    to a global row_number over the same (unique) total order, and the plan
    must contain no single-partition Exchange."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from stackoverflowner_spark.operators.prepare import partitioned_rank

    df = spark.range(0, 5000).select(
        F.concat(F.lit("w"), F.col("id")).alias("word"),
        (F.pmod(F.xxhash64("id"), F.lit(97))).alias("freq"))
    order = [F.desc("freq"), F.asc("word")]
    got = {r.word: r.rank for r in
           partitioned_rank(df, order, partitions=8).collect()}
    ref = {r.word: r.rank for r in df.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))).collect()}
    assert got == ref

    plan = (partitioned_rank(df, order, partitions=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan


def test_word_mapping_two_pass_plan_and_empty_sentences(spark):
    from pyspark.sql import functions as F

    from stackoverflowner_spark.operators.prepare import (
        build_char_mapping, build_tag_mapping, prepare_dataset,
        word_mapping_df)

    rows = [("f", 0, ["a", "b", "a"], ["O", "O", "O"]),
            ("f", 1, [], []),                       # ADVICE: must survive
            ("f", 2, ["a", "b", "a"], ["O", "O", "O"]),
            ("f", 3, ["a", "c", "a"], ["O", "O", "O"])]
    df = spark.createDataFrame(
        rows, "file string, sent_idx int, words array<string>, tags array<string>")
    wm = word_mapping_df(df, min_freq=3)
    plan = wm._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    out = {r.sent_idx: r for r in
           prepare_dataset(df, spark, wm, build_char_mapping(df),
                           build_tag_mapping(df)).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[1].str_words == [] and out[1].word_ids == []
    assert out[0].word_ids[0] == 2                 # ids start at 2
