"""Token -> character-offset alignment.

Re-implements ``map_text_to_char`` from
``/root/reference/code/BERT_NER/utils_preprocess/map_text_to_char.py:4-53``,
including its quirks: stale character variables when an index runs past the
end, space-only skipping (a genuine character mismatch silently records the
current position), and the ``-----`` masked-space compensation.
"""

from __future__ import annotations

from typing import List, Tuple


def map_tokens_to_offsets(sentence: str, tokens: List[str], offset: int
                          ) -> List[Tuple[str, int]]:
    joined = " ".join(tokens)
    si = 0
    ti = 0
    sc = ""
    tc = ""
    char_positions: List[Tuple[str, int]] = []
    while ti < len(joined):
        if ti < len(joined):
            tc = joined[ti]
        if si < len(sentence):
            sc = sentence[si]
        while sc != tc and sc == " ":
            if si + 1 == len(sentence):
                break
            si += 1
            sc = sentence[si]
        while sc != tc and tc == " ":
            if ti + 1 == len(joined):
                break
            ti += 1
            tc = joined[ti]
        if tc != " ":
            char_positions.append((tc, si))
        si += 1
        ti += 1

    out: List[Tuple[str, int]] = []
    cursor = 0
    for t in tokens:
        t_unmasked = t.replace("-----", " ")
        if cursor < len(char_positions):
            out.append((t, char_positions[cursor][1] + offset))
        cursor += len(t_unmasked)
    return out
