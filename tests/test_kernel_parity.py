"""Byte-parity gate for the text kernel (the gating test per BASELINE.md).

Golden oracle: the reference's shipped ``Posts_Small.xml`` ->
``text_files/*.txt`` pairs (produced by the actual reference pipeline with
bs4+NLTK), plus structural invariants on standoffs and BIO output.
"""

import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

from stackoverflowner_spark.kernel.bio import text_to_conll_rows
from stackoverflowner_spark.kernel.htmltext import extract_text
from stackoverflowner_spark.kernel.sentencize import sentencize

REF = Path("/root/reference/code/DataReader")


def _reference_posts():
    posts = []
    xml_path = REF / "Posts_Small.xml"
    if not xml_path.exists():
        return posts
    for line in xml_path.open():
        if "<row" not in line:
            continue
        row = ET.fromstring("<posts>" + line + "</posts>")[0]
        pid = row.get("Id").strip()
        if row.get("PostTypeId") == "2":
            pid = row.get("ParentId").strip() + "_" + pid
        posts.append((pid, row.get("Body")))
    return posts


@pytest.mark.parametrize("pid,body", _reference_posts())
def test_extracted_text_byte_parity(pid, body):
    golden_path = REF / "text_files" / f"{pid}.txt"
    if not golden_path.exists():
        pytest.skip("no golden file")
    final, _ = sentencize(extract_text(body), pid, with_header=True)
    assert final == golden_path.read_text()


def test_standoff_offsets_point_at_their_text():
    for pid, body in _reference_posts():
        final, anns = sentencize(extract_text(body), pid, with_header=False)
        for a in anns:
            assert final[a.start:a.end] == a.text.replace("\r", "").replace("\n", "")


def test_sentinel_bio_runs():
    pid, body = _reference_posts()[0]
    final, anns = sentencize(extract_text(body), pid, with_header=False)
    rows = text_to_conll_rows(final, anns)
    tags = [r.tag for r in rows]
    assert "B-Code_Block" in tags
    # IOB2 well-formedness: I- must follow same-type B-/I-
    prev = "O"
    for t in tags:
        if t.startswith("I-"):
            assert prev.endswith(t[2:]) and prev != "O"
        prev = t


def test_inline_code_annotation_offsets():
    html = (
        "<p>Use <code>foo.bar()</code> then <kbd>Ctrl</kbd> and "
        "<code>x?y</code> here.</p>"
    )
    final, anns = sentencize(extract_text(html), "1", with_header=False)
    types = sorted(a.type for a in anns)
    assert types == ["Code_Block", "Code_Block", "Keyboard_IP"]
    for a in anns:
        assert final[a.start:a.end] == a.text


def test_multiline_inline_code_promoted_to_block():
    html = "<p>run <code>a\nb</code> now</p>"
    text = extract_text(html)
    assert "CODE_BLOCK: Q_1 (code omitted for annotation)" in text
    assert "--INLINE_CODE_BEGIN---" not in text


def test_blockquote_only_first_replaced():
    html = "<div><blockquote>one</blockquote><blockquote>two</blockquote></div>"
    text = extract_text(html)
    assert text.count("OP_BLOCK:") == 1
    assert "two" in text
