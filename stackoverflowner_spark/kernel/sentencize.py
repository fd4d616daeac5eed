"""Sentence splitting + standoff annotation of sentinel spans.

Re-implements ``tokenize_and_annotae_post_body`` from
``/root/reference/code/DataReader/read_so_post_info.py:153-216`` (with the
``Question_ID``/``Question_URL`` header) and its E2E twin
``code/BERT_NER/utils_preprocess/format_markdown.py:152-395`` (header-less,
plus brat-style standoff annotations for the substituted spans).

The offset arithmetic for the annotations — including its idiosyncrasies
(the Keyboard_IP loop compensates for inline-code markers but not for other
keyboard markers except via the per-position term; Code_Block/Output_Block
compensate for both) — is replicated exactly, since these offsets are
observable output consumed by the BIO relabeling stage.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Tuple

from .htmltext import INLINE_BEGIN, INLINE_END, KBD_BEGIN, KBD_END
from .punkt import split_sentences

_CODE_END = "(code omitted for annotation)"
_OP_END = "(output omitted for annotation)"

_LEN_INLINE_PAIR = len(INLINE_BEGIN) + len(INLINE_END)
_LEN_KBD_PAIR = len(KBD_BEGIN) + len(KBD_END)


class Standoff(NamedTuple):
    start: int
    end: int
    type: str
    text: str


def _find_all(haystack: str, needle: str) -> List[int]:
    # read_so_post_info.py:32-39
    out = []
    pos = haystack.find(needle)
    while pos != -1:
        out.append(pos)
        pos = haystack.find(needle, pos + 1)
    return out


def _marked_sentence_text(extracted_text: str) -> str:
    sentences = split_sentences(extracted_text)
    fixed = []
    for s in sentences:
        if INLINE_BEGIN in s:
            s = s.replace("..", ".").replace("<?-?>", "?")
        fixed.append(re.sub(r"\n+", "\n", s))
    return "\n".join(fixed)


def header_for(post_id: str) -> str:
    return (
        "Question_ID: " + str(post_id) + "\n"
        "Question_URL: " + "https://stackoverflow.com/questions/" + str(post_id) + "/\n\n"
    )


def sentencize(extracted_text: str, post_id: str, with_header: bool = False
               ) -> Tuple[str, List[Standoff]]:
    """Return ``(final_text, standoffs)`` for one post.

    ``final_text`` is byte-identical to the reference's ``<post_id>.txt``
    output; ``standoffs`` reproduce the reference's ``<post_id>.ann`` records
    (format_markdown.py:219-395) with char offsets into ``final_text``.
    """
    marked = _marked_sentence_text(extracted_text)

    inline_begins = _find_all(marked, "--INLINE_CODE_BEGIN")
    inline_ends = [p + len("INLINE_CODE_END---") for p in _find_all(marked, "INLINE_CODE_END---")]
    kbd_begins = _find_all(marked, "--KEYBOARD_IP_BEGIN")
    kbd_ends = [p + len("KEYBOARD_IP_END---") for p in _find_all(marked, "KEYBOARD_IP_END---")]
    code_begins = _find_all(marked, "CODE_BLOCK:")
    code_ends = [p + len(_CODE_END) for p in _find_all(marked, _CODE_END)]
    op_begins = _find_all(marked, "OP_BLOCK:")
    op_ends = [p + len(_OP_END) for p in _find_all(marked, _OP_END)]

    intro = header_for(post_id) if with_header else ""
    stripped = (
        marked.replace(INLINE_BEGIN, "").replace(INLINE_END, "")
        .replace(KBD_BEGIN, "").replace(KBD_END, "")
    )
    final_text = intro + stripped + "\n"

    init = len(intro)
    anns: List[Standoff] = []

    # Code_Block spans from inline markers (format_markdown.py:230-267)
    for i, (b, e) in enumerate(zip(inline_begins, inline_ends)):
        span_text = (
            marked[b:e].replace(INLINE_BEGIN, "").replace(INLINE_END, "")
            .replace("\r", "").replace("\n", "")
        )
        ab, ae = b, e
        for kb in kbd_begins:
            if b > kb:
                ab -= _LEN_KBD_PAIR
                ae -= _LEN_KBD_PAIR
        anns.append(Standoff(
            ab + init - i * _LEN_INLINE_PAIR,
            ae + init - (i + 1) * _LEN_INLINE_PAIR,
            "Code_Block", span_text,
        ))

    # Output_Block spans (format_markdown.py:271-307)
    for b, e in zip(op_begins, op_ends):
        ab, ae = b, e
        for ib in inline_begins:
            if b > ib:
                ab -= _LEN_INLINE_PAIR
                ae -= _LEN_INLINE_PAIR
        for kb in kbd_begins:
            if b > kb:
                ab -= _LEN_KBD_PAIR
                ae -= _LEN_KBD_PAIR
        anns.append(Standoff(ab + init, ae + init, "Output_Block", marked[b:e]))

    # Keyboard_IP spans (format_markdown.py:309-345) — note: the reference
    # adjusts for inline markers only, plus the per-position keyboard term.
    for i, (b, e) in enumerate(zip(kbd_begins, kbd_ends)):
        span_text = marked[b:e].replace(KBD_BEGIN, "").replace(KBD_END, "")
        ab, ae = b, e
        for ib in inline_begins:
            if b > ib:
                ab -= _LEN_INLINE_PAIR
                ae -= _LEN_INLINE_PAIR
        anns.append(Standoff(
            ab + init - i * _LEN_KBD_PAIR,
            ae + init - (i + 1) * _LEN_KBD_PAIR,
            "Keyboard_IP", span_text,
        ))

    # Code_Block spans from block sentinels (format_markdown.py:347-393)
    for b, e in zip(code_begins, code_ends):
        ab, ae = b, e
        for ib in inline_begins:
            if b > ib:
                ab -= _LEN_INLINE_PAIR
                ae -= _LEN_INLINE_PAIR
        for kb in kbd_begins:
            if b > kb:
                ab -= _LEN_KBD_PAIR
                ae -= _LEN_KBD_PAIR
        anns.append(Standoff(ab + init, ae + init, "Code_Block", marked[b:e]))

    return final_text, anns
