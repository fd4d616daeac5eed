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
    n_j = len(joined)
    n_s = len(sentence)
    si = 0
    ti = 0
    sc = ""
    tc = ""
    # positions of non-space joined chars in the sentence (the reference also
    # carries the char itself, but only the position is ever read)
    char_positions: List[int] = []
    append = char_positions.append
    while ti < n_j:
        tc = joined[ti]
        if si < n_s:
            sc = sentence[si]
        if sc != tc:
            while sc != tc and sc == " ":
                if si + 1 == n_s:
                    break
                si += 1
                sc = sentence[si]
            while sc != tc and tc == " ":
                if ti + 1 == n_j:
                    break
                ti += 1
                tc = joined[ti]
        if tc != " ":
            append(si)
        si += 1
        ti += 1

    out: List[Tuple[str, int]] = []
    n_pos = len(char_positions)
    cursor = 0
    for t in tokens:
        if cursor < n_pos:
            out.append((t, char_positions[cursor] + offset))
        cursor += len(t.replace("-----", " "))
    return out
