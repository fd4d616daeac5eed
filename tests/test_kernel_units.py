"""Unit tests for tokenizer, offsets, conlleval, labels, CTC kernels."""

import numpy as np

from stackoverflowner_spark.kernel import conlleval, ctc, labels
from stackoverflowner_spark.kernel.goldload import parse_gold_lines
from stackoverflowner_spark.kernel.offsets import map_tokens_to_offsets
from stackoverflowner_spark.kernel.sotok import tokenize


def test_tokenizer_software_protections():
    # behaviors documented in stokenizer.py comments (lines 184-287)
    assert tokenize("javax.swing.Timer fires") == ["javax.swing.Timer", "fires"]
    assert tokenize("GNU/Linux works") == ["GNU/Linux", "works"]
    assert "txScope.Complete(arg1,arg2)" in tokenize("call txScope.Complete(arg1, arg2) now")
    assert tokenize("a == b") == ["a", "==", "b"]
    assert tokenize("ii) item") == ["ii)", "item"]
    assert tokenize("see .html.erb file") == ["see", ".html.erb", "file"]


def test_tokenizer_end_punct_and_contractions():
    assert tokenize("Update the sdk version.") == ["Update", "the", "sdk", "version", "."]
    assert tokenize("it doesn't work") == ["it", "does", "n't", "work"]
    assert tokenize("the queries....it works") == ["the", "queries", "....", "it", "works"]


def test_tokenizer_empty_token_quirk_preserved():
    # bracket splitting emits residual empty tokens (stokenizer.py:1053-1060)
    toks = tokenize('like {"kind"=>"GGG"}.')
    assert "{" in toks and "}" in toks and "." in toks


def test_offsets_roundtrip():
    s = "NetBeans: use .jar files?\n"
    toks = tokenize(s)
    pairs = map_tokens_to_offsets(s, toks, 0)
    for tok, pos in pairs:
        if tok and not tok.isspace() and "-----" not in tok:
            assert s[pos:pos + len(tok)] == tok, (tok, pos)


def test_offsets_with_offset_accumulation():
    s = "a b c\n"
    pairs = map_tokens_to_offsets(s, ["a", "b", "c"], 100)
    assert pairs == [("a", 100), ("b", 102), ("c", 104)]


def test_conlleval_chunks():
    tags = ["O", "B-Class", "I-Class", "O", "B-Function", "B-Function", "I-Function"]
    spans = conlleval.extract_chunks(tags)
    assert spans == [("Class", 1, 3), ("Function", 4, 5), ("Function", 5, 7)]


def test_conlleval_metrics():
    golds = [["B-Class", "I-Class", "O"], ["B-Function", "O", "O"]]
    preds = [["B-Class", "I-Class", "O"], ["O", "O", "B-Function"]]
    rep = conlleval.evaluate_sentences(golds, preds)
    assert rep["__overall__"]["tp"] == 1
    assert rep["__overall__"]["guessed"] == 2
    assert rep["__overall__"]["truth"] == 2
    assert abs(rep["__overall__"]["precision"] - 50.0) < 1e-9


def test_label_merge_and_selection():
    assert labels.merge_label("B-Function_Name") == "B-Function"
    assert labels.merge_label("I-Organization") == "I-Website"
    assert labels.merge_label("O") == "O"
    sel = labels.selected_tags()
    assert "Algorithm" in sel
    assert "Licence" not in sel
    assert "Keyboard_IP" not in sel


def test_gold_loader_filters_and_unmask():
    lines = [
        "Question_ID	O	Question_ID	O",
        ":	O	:	O",
        "42	O	42	O",
        "",
        "CODE_BLOCK	B-Code_Block	CODE_BLOCK	B-Code_Block",
        ":	I-Code_Block	:	I-Code_Block",
        "Q_1	I-Code_Block	Q_1	I-Code_Block",
        "(	I-Code_Block	(	I-Code_Block",
        "code	I-Code_Block	code	I-Code_Block",
        "omitted	I-Code_Block	omitted	I-Code_Block",
        "for	I-Code_Block	for	I-Code_Block",
        "annotation	I-Code_Block	annotation	I-Code_Block",
        ")	I-Code_Block	)	I-Code_Block",
        "",
        "use	O	use	O",
        "with-----space	B-Function_Name	with-----space	B-Code_Block",
        "",
    ]
    sents = parse_gold_lines(lines)
    assert len(sents) == 1
    assert sents[0][1].word == "with space"
    assert sents[0][1].tag == "B-Function"


def test_ctc_rules_and_determinism():
    assert ctc.is_number_token("-12.4")
    assert not ctc.is_number_token("-12.4a")
    assert ctc.is_url_token("http://x.com/y")

    natural = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
               "a", "an", "and", "of", "to", "in", "is", "was"] * 3
    code = ["foo.bar()", "x=1", "int[]", "self.setup", "np.array", "df.select",
            "arr[0]", "obj->ptr", "std::cout", "print(x)"] * 3
    a1 = ctc.CTCArtifact(natural, code)
    a2 = ctc.CTCArtifact(natural, code)
    words = ["the", "foo.bar()", "123", "http://a.com", "df.select"]
    p1 = a1.predict(words)
    p2 = a2.predict(words)
    assert (p1 == p2).all()
    assert p1[2] == 1  # IS_NUMBER rule
    assert p1[3] == 0  # IS_URL rule


def test_binner_matches_reference_shape():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 5))
    b = ctc.GaussianBinner(100)
    b.fit(x, 5)
    out = b.transform(x, 5)
    assert out.shape == (50, 5 * 102)
    # row-normalized per feature block
    block = out[:, :102]
    assert np.allclose(block.sum(axis=1), 1.0, atol=1e-6)
