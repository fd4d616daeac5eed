#!/usr/bin/env python3
"""Evaluate the stacked transformer tagger on the gold test split.

Two protocols, mirroring tests/test_quality_gates.py:

* two-pass ("ref"): segmenter channel from the reference's shipped test
  fixtures (its own E2E protocol) — compare against the 66.5 F1 of the
  base ``viterbi_twopass_ref`` artifact alone.
* deployment: channels from the internal alias segmenter only — compare
  against the 59.2 F1 of the multi-regime default.

    python tools/eval_stacker.py <stacker_dir> [--base <pkl.gz>] [--deploy]
    python tools/eval_stacker.py <stacker_dir> --gh   # GitHub OOD split
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SO_TEST = ("/root/reference/resources/annotated_ner_data/StackOverflow/"
           "test.txt")
GH_GOLD = ("/root/reference/resources/annotated_ner_data/GitHub/"
           "gh_anno_merged.txt")
SEG_TEST = ("/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"
            "segmenter_pred/segmenter_pred_test.txt")
ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "stackoverflowner_spark", "artifacts")


def _base_inputs(base, sents, segs):
    inputs = []
    for i, s in enumerate(sents):
        w = [t.word for t in s]
        md = [t.md_label for t in s]
        seg = None
        if segs is not None and i < len(segs) and segs[i] is not None \
                and len(segs[i]) == len(w):
            seg = segs[i]
        if seg is not None:
            inputs.append((w, md, base._aux_channel(w, seg)))
        else:
            inputs.append(base._model_inputs(w, md))
    return inputs


def stacked_predict(base, stacker, sents, segs=None, base2=None):
    """Tag sentences with base channels -> stacker arbitration. ``base2``
    (the second-regime artifact) fills the stacker's base2 channel; without
    it the channel copies base (the single-base degenerate mode)."""
    from stackoverflowner_spark.kernel.np_stacker import (sentence_channels,
                                                          split_aux)
    inputs = _base_inputs(base, sents, segs)
    base_tags = base.model.tag_sentences(inputs)
    base2_tags = None
    if base2 is not None:
        base2_tags = base2.model.tag_sentences(
            _base_inputs(base2, sents, segs))
    chans = []
    for j, ((w, md, aux), bt) in enumerate(zip(inputs, base_tags)):
        gazs, ctcs, seg_ch = split_aux(aux)
        chans.append(sentence_channels(
            w, md, gazs, ctcs, seg_ch, bt,
            base2_tags[j] if base2_tags is not None else None))
    return stacker.tag_batch(chans), base_tags


def f1_of(golds, preds):
    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences
    return evaluate_sentences(golds, preds)["__overall__"]["f1"]


def main() -> None:
    from tools.train_stacker import _parse_seg

    from stackoverflowner_spark.kernel.goldload import parse_gold_lines
    from stackoverflowner_spark.kernel.np_stacker import StackedNpTagger
    from stackoverflowner_spark.operators.tagger import PerceptronTagger

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stack_dir = args[0] if args else os.path.join(ART_DIR, "stacked_ref")
    deploy = "--deploy" in sys.argv
    gh = "--gh" in sys.argv
    base_path = os.path.join(
        ART_DIR,
        "viterbi_ctc_seg.pkl.gz" if (deploy or gh)
        else "viterbi_twopass_ref.pkl.gz")
    if "--base" in sys.argv:
        base_path = sys.argv[sys.argv.index("--base") + 1]

    base = PerceptronTagger.load(base_path)
    base2_path = os.path.join(
        ART_DIR,
        "viterbi_twopass_ref.pkl.gz" if (deploy or gh)
        else "viterbi_ctc_seg.pkl.gz")
    base2 = PerceptronTagger.load(base2_path)
    stacker = StackedNpTagger.load(stack_dir)
    gold_path = GH_GOLD if gh else SO_TEST
    sents = parse_gold_lines(open(gold_path).read().splitlines())
    segs = None if (deploy or gh) else _parse_seg(SEG_TEST)
    golds = [[t.tag for t in s] for s in sents]
    preds, base_tags = stacked_predict(base, stacker, sents, segs,
                                       base2=base2)
    print(f"base    F1 {f1_of(golds, base_tags):.2f}")
    print(f"stacked F1 {f1_of(golds, preds):.2f}")


if __name__ == "__main__":
    main()
