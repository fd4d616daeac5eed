"""P6 char-encoding repair: parity with fix_char_encoding.py semantics.

The reference needs ftfy (absent here); ``fix_text_lite`` implements its
core cp1252/latin-1 mojibake re-decode. The cases below are classic
mojibake pairs whose ftfy output is unambiguous, plus the reference's own
substitution table (transcribed byte-exact and asserted against the
reference source in-process) and label-replication logic.
"""

import ast
import re

import pytest

from stackoverflowner_spark.kernel.fixchar import (
    SUBSTITUTIONS, fix_gold_lines, fix_text_lite, fix_word_label,
    get_list_of_labels)

REF = "/root/reference/code/BERT_NER/utils_preprocess/fix_char_encoding.py"


def test_substitution_table_matches_reference_source():
    line = [l for l in open(REF) if "fixed_word.replace" in l][0]
    pairs = [
        (ast.literal_eval(a), ast.literal_eval(b))
        for a, b in re.findall(
            r"replace\((\"[^\"]*\"|'[^']*'),(\"[^\"]*\"|'[^']*')\)", line)
    ]
    assert SUBSTITUTIONS == pairs


@pytest.mark.parametrize("broken,fixed", [
    ("â€™", "’"),          # cp1252 mojibake of RIGHT SINGLE QUOTE
    ("â€œquoteâ€\x9d", "“quote”"),
    ("Ã©tÃ©", "été"),
    ("donâ€™t", "don’t"),
    ("plain ascii", "plain ascii"),   # untouched
    ("naïve", "naïve"),               # real accents not mangled
])
def test_fix_text_lite_classic_mojibake(broken, fixed):
    assert fix_text_lite(broken) == fixed


def test_get_list_of_labels_matches_reference_semantics():
    # Get_List_of_Labels (fix_char_encoding.py:10-22)
    assert get_list_of_labels(3, "O") == ["O", "O", "O"]
    assert get_list_of_labels(3, "B-Class") == ["B-Class", "I-Class", "I-Class"]
    assert get_list_of_labels(2, "I-Class") == ["I-Class", "I-Class"]
    assert get_list_of_labels(1, "B-Class") == ["B-Class"]


def test_fix_word_label_skip_markers_and_replication():
    # entity-escape words pass through unmodified (fix_char_encoding.py:26)
    toks, golds, raws, mod = fix_word_label("&amp;x", "B-Class", "O")
    assert toks == ["&amp;x"] and not mod
    # unmodified word passes through
    toks, golds, raws, mod = fix_word_label("hello", "O", "O")
    assert toks == ["hello"] and not mod
    # mojibake word retokenized with label replication
    toks, golds, raws, mod = fix_word_label("donâ€™t", "B-Code_Block", "O")
    assert mod and "".join(toks).startswith("don")
    assert golds[0] == "B-Code_Block"
    assert all(g == "I-Code_Block" for g in golds[1:])
    assert all(r == "O" for r in raws)


def test_fix_gold_lines_writer_semantics():
    lines = [
        "donâ€™t\tB-Class\tdonâ€™t\tO",
        "",
        "ok\tO\tok\tO",
    ]
    out = fix_gold_lines(lines)
    assert "" in out
    # the repaired word splits into don / 's / t-ish tokens; any 's gets O
    for l in out:
        if l and l.split("\t")[0] == "'s":
            assert l.split("\t")[1] == "O"
    assert out[-1] == "ok\tO\tok\tO"


def test_spark_stage(tmp_path):
    from stackoverflowner_spark.operators.encoding import fix_char_encoding_stage
    from stackoverflowner_spark.session import get_spark
    spark = get_spark(app_name="sokg-fixchar", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [("f", 0, ["donâ€™t", "stop"], ["O", "O"], ["B-Class", "O"])]
    df = spark.createDataFrame(
        rows, "file string, sent_idx int, words array<string>, "
              "md_tags array<string>, tags array<string>")
    got = fix_char_encoding_stage(df).collect()[0]
    assert got.n_fixed == 1
    assert got.words[-1] == "stop"
    assert got.tags[0] == "B-Class"
    assert all(t == "I-Class" for t in got.tags[1:-1])
