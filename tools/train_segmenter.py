#!/usr/bin/env python3
"""Trained binary segmenter for the deployment seg channel (r5 ladder).

The deployment-channel seg input used to come from the alias-gazetteer
segmenter — measured 41.5 token-level Name F1 on dev, vs 93.9 for the
reference's shipped fixture channel (the channel behind the two-pass
protocol's +7 F1). This module trains a StructuredPerceptron binary
segmenter on the gold data with entity tags collapsed to one type
(78.2 dev channel F1, tools/exp_segmenter.py) and builds JACKKNIFED
channel predictions for NER training: K fold models, each predicting
only the sentences it never saw, so the NER model trains against the
same channel-noise profile inference will produce (the swap-only probe
measured ~0: the gain requires retraining against the new channel).

Helpers are imported by tools/tune_segchannel.py (dev gate) and
tools/train_tagger.py (final artifacts).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402

# The collapsed-type label must survive goldload's selected-type filter,
# so it borrows an existing type name; the task is label-agnostic (every
# entity span becomes the one positive class).
BINARY_TYPE = "Application"


def to_binary_lines(lines) -> list:
    """4-col gold lines with entity tags collapsed to B-/I-<BINARY_TYPE>."""
    out = []
    for line in lines:
        vals = line.strip().split()
        if len(vals) < 4:
            if line.strip() == "":
                out.append("\n")
            continue
        w, tag, raw, md = vals[0], vals[1], vals[2], vals[3]
        if tag != "O":
            tag = tag.split("-", 1)[0] + "-" + BINARY_TYPE
        out.append(f"{w}\t{tag}\t{raw}\t{md}\n")
    return out


def sentences_to_gold_lines(sentences) -> list:
    """Parsed GoldToken sentences back to 4-col gold lines (binary tags)."""
    out = []
    for s in sentences:
        for t in s:
            tag = t.tag
            if tag != "O":
                tag = tag.split("-", 1)[0] + "-" + BINARY_TYPE
            w = t.word.replace(" ", "-----")
            out.append(f"{w}\t{tag}\t{w}\t{t.md_label}\n")
        out.append("\n")
    return out


def train_segmenter(gold_paths, epochs: int = 6) -> PerceptronTagger:
    """Full binary segmenter over the concatenated gold files."""
    lines = []
    for p in gold_paths:
        lines.extend(open(p).read().splitlines(keepends=True))
    tmp = tempfile.mkdtemp(prefix="sokg_segtrain_")
    path = os.path.join(tmp, "bin.txt")
    with open(path, "w") as f:
        f.writelines(to_binary_lines(lines))
    return PerceptronTagger.fit_from_gold(path, epochs=epochs,
                                          structured=True)


def jackknife_channels(sentences, k_folds: int = 5, epochs: int = 6,
                       fold_models: list | None = None):
    """('Name'/'O') channel per sentence, each predicted by the fold
    model that excluded it (fold = index mod k_folds). Returns
    (channels, fold_models); pass ``fold_models`` to reuse trained folds
    (e.g. for augmentation sentences appended after the real ones)."""
    if fold_models is None:
        fold_models = []
        tmp = tempfile.mkdtemp(prefix="sokg_segjk_")
        for f_i in range(k_folds):
            train = [s for j, s in enumerate(sentences)
                     if j % k_folds != f_i]
            path = os.path.join(tmp, f"fold{f_i}.txt")
            with open(path, "w") as f:
                f.writelines(sentences_to_gold_lines(train))
            fold_models.append(PerceptronTagger.fit_from_gold(
                path, epochs=epochs, structured=True))
    channels = []
    # batch per fold model (its tag_sentences path memoizes + dedups)
    by_fold: dict = {}
    for j, s in enumerate(sentences):
        by_fold.setdefault(j % k_folds, []).append(j)
    channels = [None] * len(sentences)
    for f_i, idxs in by_fold.items():
        batch = [([t.word for t in sentences[j]],
                  [t.md_label for t in sentences[j]]) for j in idxs]
        bios = fold_models[f_i].tag_sentences(batch)
        for j, bio in zip(idxs, bios):
            channels[j] = ["Name" if t != "O" else "O" for t in bio]
    return channels, fold_models


if __name__ == "__main__":
    # standalone: train the full train+dev segmenter artifact
    SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sokg_segmenter.pkl.gz"
    seg = train_segmenter([SO + "train.txt", SO + "dev.txt"])
    seg.save(out)
    print("saved", out, "bytes:", os.path.getsize(out))
