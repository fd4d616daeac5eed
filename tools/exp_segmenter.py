#!/usr/bin/env python3
"""Headroom probe for a TRAINED binary segmenter as the deployment seg
channel (r5 ladder candidate).

Today the deployment-channel seg input comes from the alias-gazetteer
segmenter (operators/tagger.py _model_inputs); the two-pass protocol
instead feeds the reference's shipped segmenter predictions and scores
~7 F1 higher. This probe measures, dev-honestly (train-only models, dev
split only — test/GH never read):

1. token-level Name channel quality on dev: alias segmenter vs a
   StructuredPerceptron binary segmenter trained on train.txt with gold
   tags collapsed to B-Name/I-Name, vs the reference's own dev fixture
   (the channel the two-pass number consumes);
2. swap-only NER effect: the cached train-only NER model (trained with
   the alias-segmenter "own" regime) decoding dev with the trained
   segmenter's channel instead — a lower bound on the retrained gain
   (the model never saw this channel's noise profile).

    python tools/exp_segmenter.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.kernel.conlleval import evaluate_sentences  # noqa: E402
from stackoverflowner_spark.kernel.goldload import parse_gold_lines  # noqa: E402
from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402
from tools.tune_consistency import train_only_model  # noqa: E402

SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
AUX = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"
SEG_CACHE = "/tmp/sokg_segmenter_trainonly.pkl.gz"


def binary_gold_file(gold_path: str, out_path: str) -> str:
    """Rewrite a 4-col gold file with entity tags collapsed to a single
    type (the binary span-segmentation task the reference's segmenter
    solves). The label name must survive goldload's selected-type filter,
    so it borrows an existing type name; the task is label-agnostic —
    every entity span becomes one positive class."""
    with open(out_path, "w") as f:
        for line in open(gold_path):
            vals = line.strip().split()
            if len(vals) < 4:
                if line.strip() == "":
                    f.write("\n")
                continue
            w, tag, raw, md = vals[0], vals[1], vals[2], vals[3]
            if tag != "O":
                tag = tag.split("-", 1)[0] + "-Application"
            f.write(f"{w}\t{tag}\t{raw}\t{md}\n")
    return out_path


def train_segmenter(cache: str = SEG_CACHE) -> PerceptronTagger:
    if os.path.exists(cache):
        return PerceptronTagger.load(cache)
    tmp = tempfile.mkdtemp(prefix="sokg_seg_")
    binary = binary_gold_file(SO + "train.txt", tmp + "/train_bin.txt")
    seg = PerceptronTagger.fit_from_gold(binary, epochs=6, structured=True)
    seg.save(cache)
    return seg


def load_fixture_channels(path: str):
    """Sentence-aligned token channels ('Name'/'O') from a reference
    segmenter_pred_*.txt fixture."""
    out, cur = [], []
    for line in open(path):
        vals = line.strip().split()
        if len(vals) < 3:
            if cur:
                out.append(cur)
                cur = []
            continue
        cur.append(vals[2])
    if cur:
        out.append(cur)
    return out


def channel_prf(golds_bin, chans):
    tp = fp = fn = 0
    for g, c in zip(golds_bin, chans):
        for gi, ci in zip(g, c):
            gpos, cpos = gi != "O", ci == "Name"
            tp += gpos and cpos
            fp += (not gpos) and cpos
            fn += gpos and (not cpos)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p * 100, r * 100, f * 100


def main():
    dev_raw = open(SO + "dev.txt").read().splitlines()
    sents = parse_gold_lines(dev_raw)
    words = [[t.word for t in s] for s in sents]
    mds = [[t.md_label for t in s] for s in sents]
    golds = [[t.tag for t in s] for s in sents]
    golds_bin = [["Name" if t != "O" else "O" for t in g] for g in golds]

    ner = train_only_model()  # cached multi-regime train-only NER model
    seg_model = train_segmenter()

    # --- channel quality on dev ---
    # alias segmenter (what deployment uses today), via the NER model's
    # own _model_inputs (so the alias map matches the deployed one)
    alias_chans = []
    for w, m in zip(words, mds):
        aux = ner._model_inputs(w, m)[2]
        alias_chans.append(["Name" if a.split("|s")[-1] == "Name" else "O"
                            for a in aux])
    trained_chans = []
    for w, m in zip(words, mds):
        bio = seg_model.tag(w, m)
        trained_chans.append(["Name" if t != "O" else "O" for t in bio])
    fix = load_fixture_channels(AUX + "segmenter_pred/segmenter_pred_dev.txt")
    fix_aligned, fix_golds = [], []
    for i, g in enumerate(golds_bin):
        if i < len(fix) and len(fix[i]) == len(g):
            fix_aligned.append(fix[i])
            fix_golds.append(g)

    for name, chans, gb in (
            ("alias segmenter", alias_chans, golds_bin),
            ("trained segmenter", trained_chans, golds_bin),
            ("reference dev fixture", fix_aligned, fix_golds)):
        p, r, f = channel_prf(gb, chans)
        print(f"dev Name-channel {name:24s} P={p:5.1f} R={r:5.1f} F1={f:5.1f}")

    # --- swap-only NER effect on dev ---
    def ner_f1_with(chans):
        inputs = []
        for w, m, c in zip(words, mds, chans):
            seg = [x if x == "Name" else "O" for x in c]
            inputs.append((w, m, ner._aux_channel(w, seg)))
        preds = ner.model.tag_sentences(inputs)
        return evaluate_sentences(golds, preds)["__overall__"]["f1"]

    base_inputs = [ner._model_inputs(w, m) for w, m in zip(words, mds)]
    base = evaluate_sentences(
        golds, ner.model.tag_sentences(base_inputs))["__overall__"]["f1"]
    print(f"dev NER F1  alias channel (deployed today): {base:.2f}")
    print(f"dev NER F1  trained-segmenter channel (swap-only): "
          f"{ner_f1_with(trained_chans):.2f}")


if __name__ == "__main__":
    main()
