#!/usr/bin/env python3
"""Stacker architecture/regularization experiments on the cached jackknife
dataset. Selection happens on the dev slice only; the test split is not
read here.

    python tools/exp_stacker.py <variant> <out_dir>

Variants:
  noword  — word channel forced to UNK (word_min_count=inf): corrections
            must ride shape/suffix/context/channel evidence, which
            transfers to unseen vocabulary (the base's own test-split
            degradation is vocabulary shift).
  h96     — hidden 96 / ffn 192 capacity bump, word channel kept.
  h128    — hidden 128 / ffn 256 capacity bump, word channel kept.
  base64  — the shipped default (hidden 64, word kept), for A/B.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_stacker import DEV_EVERY, build_dataset  # noqa: E402

from stackoverflowner_spark.kernel.conlleval import evaluate_sentences  # noqa: E402
from stackoverflowner_spark.kernel.np_stacker import StackedNpTagger  # noqa: E402

MARGINS = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0]


def main() -> None:
    variant = sys.argv[1]
    out_dir = sys.argv[2]
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 14

    data = build_dataset("ref")
    train = [d for i, d in enumerate(data) if i % DEV_EVERY != 0]
    dev = [d for i, d in enumerate(data) if i % DEV_EVERY == 0]
    labels = sorted({t for _, gold in data for t in gold})

    kw = {}
    if variant == "noword":
        vocabs = StackedNpTagger.build_vocabs(train, word_min_count=10**9)
    elif variant == "h96":
        vocabs = StackedNpTagger.build_vocabs(train)
        kw = {"hidden": 96, "ffn": 192}
    elif variant == "h128":
        vocabs = StackedNpTagger.build_vocabs(train)
        kw = {"hidden": 128, "ffn": 256}
    elif variant.startswith("seed"):
        # seed ensemble members: same architecture, different init/batch
        # order — logits averaged at fusion time (tools/tune_fusion.py)
        vocabs = StackedNpTagger.build_vocabs(train)
        kw = {"seed": 20260817 + int(variant[4:])}
    else:
        vocabs = StackedNpTagger.build_vocabs(train)
    model = StackedNpTagger.init(vocabs, labels, **kw)
    print(f"variant={variant} word_vocab={len(vocabs['word'])}")
    fit_seed = 7 + int(variant[4:]) if variant.startswith("seed") else 7
    model.fit(train, epochs=epochs, dev=dev, log=print, seed=fit_seed)

    golds = [g for _, g in dev]
    chans = [ch for ch, _ in dev]
    base_f1 = evaluate_sentences(
        golds, [ch["base"] for ch in chans])["__overall__"]["f1"]
    best_m, best_f1 = 0.0, -1.0
    for m in MARGINS:
        model.config["margin"] = m
        f1 = evaluate_sentences(
            golds, model.tag_batch(chans))["__overall__"]["f1"]
        print(f"margin {m}: dev F1 {f1:.2f}")
        if f1 > best_f1:
            best_m, best_f1 = m, f1
    model.config["margin"] = best_m
    model.save(out_dir)
    print(f"dev base {base_f1:.2f}; chosen margin {best_m} "
          f"dev F1 {best_f1:.2f} -> {out_dir}")


if __name__ == "__main__":
    main()
