#!/usr/bin/env python3
"""Tune the stacker's margin gate on the jackknifed dev slice.

The margin decides when the stacker may override the base tagger's tag
(kernel/np_stacker.StackedNpTagger._decode). Tuned here by chunk F1 on
the SAME held-out slice used for epoch selection (every DEV_EVERY-th
jackknifed sentence) — the test split is never touched. The chosen
margin is written into the checkpoint's config.json so inference picks
it up everywhere (Spark executors included) with no extra plumbing.

    python tools/tune_stacker.py <stacker_dir> [--regime ref|multi]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARGINS = [0.0, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0]


def main() -> None:
    from tools.train_stacker import DEV_EVERY, build_dataset

    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences
    from stackoverflowner_spark.kernel.np_stacker import StackedNpTagger

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stack_dir = args[0]
    regime = "ref"
    if "--regime" in sys.argv:
        regime = sys.argv[sys.argv.index("--regime") + 1]

    model = StackedNpTagger.load(stack_dir)
    data = build_dataset(regime)
    dev = [d for i, d in enumerate(data) if i % DEV_EVERY == 0]
    golds = [gold for _, gold in dev]
    chans = [ch for ch, _ in dev]

    # the base channel's own F1 on the dev slice — the floor the gate
    # must not fall below (reached exactly at margin -> infinity)
    base_f1 = evaluate_sentences(
        golds, [ch["base"] for ch in chans])["__overall__"]["f1"]
    print(f"dev base-channel F1 {base_f1:.2f}")

    best_m, best_f1 = None, -1.0
    for m in MARGINS:
        model.config["margin"] = m
        preds = model.tag_batch(chans)
        f1 = evaluate_sentences(golds, preds)["__overall__"]["f1"]
        print(f"margin {m:>5}: dev F1 {f1:.2f}")
        if f1 > best_f1:
            best_m, best_f1 = m, f1

    model.config["margin"] = best_m
    cfg_path = os.path.join(stack_dir, "config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["margin"] = best_m
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)
    print(f"chosen margin {best_m} (dev F1 {best_f1:.2f}) -> {cfg_path}")


if __name__ == "__main__":
    main()
