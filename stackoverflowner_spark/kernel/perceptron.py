"""Averaged-perceptron sequence tagger (deterministic learned Tagger).

The reference's taggers are neural (BiLSTM-CRF, BERT) with external weights;
this module provides a *trainable in-sandbox* alternative with the same
token->BIO contract: a classic averaged perceptron (Collins 2002) with
greedy left-to-right decoding, lexical/shape/context features plus the
reference's auxiliary channels (markdown label, gazetteer hit, CTC-style
shape cues). Training is plain Python/numpy, bit-deterministic (fixed
iteration order, no RNG), fit once driver-side and broadcast.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterable, List, Optional, Sequence, Tuple


def _shape(word: str) -> str:
    out = []
    for ch in word[:8]:
        if ch.isupper():
            out.append("X")
        elif ch.islower():
            out.append("x")
        elif ch.isdigit():
            out.append("9")
        else:
            out.append(ch)
    return "".join(out)


def token_features(words: Sequence[str], i: int, prev_tag: str,
                   md: str, gaz: str) -> List[str]:
    w = words[i]
    lw = w.lower()
    prev_w = words[i - 1].lower() if i > 0 else "<S>"
    next_w = words[i + 1].lower() if i + 1 < len(words) else "</S>"
    feats = [
        "b",
        "w=" + lw,
        "suf3=" + lw[-3:],
        "suf2=" + lw[-2:],
        "pre2=" + lw[:2],
        "shape=" + _shape(w),
        "pw=" + prev_w,
        "nw=" + next_w,
        "pw2=" + prev_w + "|" + lw,
        "nw2=" + lw + "|" + next_w,
        "pt=" + prev_tag,
        "pt+w=" + prev_tag + "|" + lw,
        "md=" + md,
        "gaz=" + gaz,
        "dot=" + ("1" if "." in w else "0"),
        "dig=" + ("1" if any(c.isdigit() for c in w) else "0"),
        "up=" + ("1" if w[:1].isupper() else "0"),
        "paren=" + ("1" if "(" in w or ")" in w else "0"),
    ]
    return feats


class AveragedPerceptron:
    def __init__(self):
        self.weights: Dict[str, Dict[str, float]] = {}
        self.classes: List[str] = []

    # -- training internals ------------------------------------------------ #

    def _predict(self, feats: Sequence[str]) -> str:
        scores: Dict[str, float] = defaultdict(float)
        for f in feats:
            wts = self.weights.get(f)
            if wts:
                for label, w in wts.items():
                    scores[label] += w
        if not scores:
            return "O"
        # deterministic argmax: score desc, then label asc
        return min(scores, key=lambda c: (-scores[c], c))

    def fit(self, sentences: Iterable[Tuple[Sequence[str], Sequence[str],
                                            Sequence[str], Sequence[str]]],
            epochs: int = 3) -> None:
        """sentences: (words, md_tags, gaz_tags, gold_tags) tuples."""
        data = list(sentences)
        label_set = sorted({t for _, _, _, g in data for t in g})
        self.classes = label_set
        totals: Dict[Tuple[str, str], float] = defaultdict(float)
        tstamps: Dict[Tuple[str, str], int] = defaultdict(int)
        step = 0

        def upd(f: str, label: str, v: float) -> None:
            key = (f, label)
            w = self.weights.setdefault(f, {})
            totals[key] += (step - tstamps[key]) * w.get(label, 0.0)
            tstamps[key] = step
            w[label] = w.get(label, 0.0) + v

        for _ in range(epochs):
            for words, mds, gazs, golds in data:
                prev = "<S>"
                for i in range(len(words)):
                    feats = token_features(words, i, prev, mds[i], gazs[i])
                    step += 1
                    guess = self._predict(feats)
                    gold = golds[i]
                    if guess != gold:
                        for f in feats:
                            upd(f, gold, 1.0)
                            upd(f, guess, -1.0)
                    prev = gold  # gold prev-tag during training (teacher forcing)
        # average
        for f, wts in self.weights.items():
            for label in list(wts):
                key = (f, label)
                total = totals[key] + (step - tstamps[key]) * wts[label]
                avg = total / step
                if abs(avg) > 1e-9:
                    wts[label] = avg
                else:
                    del wts[label]
        self.weights = {f: w for f, w in self.weights.items() if w}

    # -- inference --------------------------------------------------------- #

    def tag_sentence(self, words: Sequence[str], mds: Sequence[str],
                     gazs: Sequence[str]) -> List[str]:
        prev = "<S>"
        out = []
        for i in range(len(words)):
            feats = token_features(words, i, prev, mds[i], gazs[i])
            scores: Dict[str, float] = defaultdict(float)
            for f in feats:
                wts = self.weights.get(f)
                if wts:
                    for label, w in wts.items():
                        scores[label] += w
            tag = min(scores, key=lambda c: (-scores[c], c)) if scores else "O"
            out.append(tag)
            prev = tag
        return out
