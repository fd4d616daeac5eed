"""Hypothesis property tests for the text kernel."""

from hypothesis import given, settings, strategies as st

from stackoverflowner_spark.kernel.punkt import split_sentences
from stackoverflowner_spark.kernel.offsets import map_tokens_to_offsets
from stackoverflowner_spark.kernel.sotok import tokenize
from stackoverflowner_spark.kernel.htmltext import ExtractionError, extract_text

text_strategy = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2030),
    min_size=0, max_size=400)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_punkt_sentences_are_substrings(text):
    for s in split_sentences(text):
        assert s in text
        assert s == "" or not s[-1].isspace() or "\n" not in s[-1]


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_punkt_sentences_preserve_order(text):
    spans = []
    pos = 0
    for s in split_sentences(text):
        idx = text.find(s, pos)
        assert idx >= 0
        pos = idx
        spans.append(idx)
    assert spans == sorted(spans)


@settings(max_examples=300, deadline=None)
@given(text_strategy)
def test_tokenize_deterministic_and_total(text):
    a = tokenize(text)
    b = tokenize(text)
    assert a == b
    assert all(isinstance(t, str) for t in a)
    # no token retains internal whitespace after the final explode
    assert all(" " not in t or t in (" '", ' "') for t in a)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_offsets_monotonic_nondecreasing(text):
    sentence = text + "\n"
    toks = tokenize(sentence)
    pairs = map_tokens_to_offsets(sentence, toks, 0)
    positions = [p for _, p in pairs]
    assert positions == sorted(positions)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=0, max_size=300))
def test_extract_text_total_on_ascii_html(fragment):
    html = "<p>" + fragment.replace("<", "&lt;") + "</p>"
    try:
        out = extract_text(html)
    except ExtractionError:
        return
    assert out.endswith("\n\n") or out == ""
