"""Wordpiece featurization with the reference's exact shape semantics (M5).

``convert_examples_to_features``
(`/root/reference/code/BERT_NER/utils_ner.py:87-264`): label lives on the
FIRST wordpiece of each word (pad label -100 on continuations), sequences are
truncated to ``max_seq_length - num_special_tokens`` (silently dropping tail
predictions — the writer skips them,
``softner_ner_predict_from_file.py:641-643``), [CLS]/[SEP] added, attention
mask 1 on real tokens, zero-padding to fixed length.

The HF BERT vocabulary is an external download, so the subword tokenizer here
is a self-contained greedy-longest-match WordPiece over a deterministic
vocabulary built from a corpus (same algorithm family; pluggable with a real
vocab file when present). What the engine guarantees is the *feature shape
contract*, which is what the parity gate checks.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence

PAD_LABEL_ID = -100


class WordPieceVocab:
    """Greedy longest-match WordPiece with a corpus-derived vocabulary."""

    def __init__(self, corpus: Sequence[str], max_subwords: int = 8000,
                 max_piece_len: int = 10):
        counts: Dict[str, int] = {}
        for word in corpus:
            w = word.lower()
            for i in range(len(w)):
                for n in range(1, min(max_piece_len, len(w) - i) + 1):
                    piece = w[i:i + n] if i == 0 else "##" + w[i:i + n]
                    counts[piece] = counts.get(piece, 0) + 1
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        self.token_to_id: Dict[str, int] = {t: i for i, t in enumerate(specials)}
        for piece, _ in ranked[:max_subwords]:
            if piece not in self.token_to_id:
                self.token_to_id[piece] = len(self.token_to_id)

    @property
    def pad_id(self):
        return self.token_to_id["[PAD]"]

    def tokenize(self, word: str) -> List[str]:
        w = word.lower()
        if not w:
            return ["[UNK]"]
        pieces: List[str] = []
        start = 0
        while start < len(w):
            end = len(w)
            cur = None
            while start < end:
                sub = w[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.token_to_id:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return ["[UNK]"]
            pieces.append(cur)
            start = end
        return pieces

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        unk = self.token_to_id["[UNK]"]
        return [self.token_to_id.get(t, unk) for t in tokens]


class InputFeatures(NamedTuple):
    input_ids: List[int]
    input_mask: List[int]
    segment_ids: List[int]
    label_ids: List[int]
    label_ids_ctc: List[int]
    label_ids_seg: List[int]


def convert_example(words: Sequence[str], labels: Sequence[str],
                    ctc_labels: Sequence[int], seg_labels: Sequence[str],
                    vocab: WordPieceVocab, label_map: Dict[str, int],
                    max_seq_length: int = 128) -> InputFeatures:
    """One sentence -> fixed-length features (utils_ner.py semantics:
    first-wordpiece labeling, truncation, CLS/SEP, padding)."""
    tokens: List[str] = []
    label_ids: List[int] = []
    ctc_ids: List[int] = []
    seg_ids_aux: List[int] = []
    seg_label_map = {"O": 0, "Name": 1}
    for word, label, ctc, seg in zip(words, labels, ctc_labels, seg_labels):
        pieces = vocab.tokenize(word)
        if not pieces:
            continue
        tokens.extend(pieces)
        label_ids.extend([label_map.get(label, 0)]
                         + [PAD_LABEL_ID] * (len(pieces) - 1))
        ctc_ids.extend([int(ctc)] + [PAD_LABEL_ID] * (len(pieces) - 1))
        seg_ids_aux.extend([seg_label_map.get(seg, 0)]
                           + [PAD_LABEL_ID] * (len(pieces) - 1))

    special = 2  # [CLS] + [SEP]
    if len(tokens) > max_seq_length - special:
        tokens = tokens[: max_seq_length - special]
        label_ids = label_ids[: max_seq_length - special]
        ctc_ids = ctc_ids[: max_seq_length - special]
        seg_ids_aux = seg_ids_aux[: max_seq_length - special]

    tokens = ["[CLS]"] + tokens + ["[SEP]"]
    label_ids = [PAD_LABEL_ID] + label_ids + [PAD_LABEL_ID]
    ctc_ids = [PAD_LABEL_ID] + ctc_ids + [PAD_LABEL_ID]
    seg_ids_aux = [PAD_LABEL_ID] + seg_ids_aux + [PAD_LABEL_ID]
    segment_ids = [0] * len(tokens)

    input_ids = vocab.convert_tokens_to_ids(tokens)
    input_mask = [1] * len(input_ids)
    pad = max_seq_length - len(input_ids)
    input_ids += [vocab.pad_id] * pad
    input_mask += [0] * pad
    segment_ids += [0] * pad
    label_ids += [PAD_LABEL_ID] * pad
    ctc_ids += [PAD_LABEL_ID] * pad
    seg_ids_aux += [PAD_LABEL_ID] * pad
    return InputFeatures(input_ids, input_mask, segment_ids,
                         label_ids, ctc_ids, seg_ids_aux)


def unpad_predictions(label_ids: Sequence[int], preds: Sequence[int]
                      ) -> List[int]:
    """Keep predictions at first-wordpiece positions only (label_ids != -100)
    — the truncated tail of long sentences silently drops, like the
    reference's writer (softner_ner_predict_from_file.py:628-643)."""
    return [int(p) for lid, p in zip(label_ids, preds) if lid != PAD_LABEL_ID]
