#!/usr/bin/env python3
"""Dev-gate the @-handle User_Name augmentation (tools/train_tagger.py
handle_aug_lines) with train-only models: train.txt vs train.txt + aug,
both evaluated on dev under deployment channels, overall + per-type.
The gold test and GH splits are never read here.

    python tools/tune_handles.py [n_aug]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.kernel.conlleval import evaluate_sentences  # noqa: E402
from stackoverflowner_spark.kernel.goldload import parse_gold_lines  # noqa: E402
from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402
from tools.train_tagger import handle_aug_lines  # noqa: E402
from tools.tune_consistency import CACHE, tag_split, train_only_model  # noqa: E402

SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
AUX = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"


def report(tag, golds, preds):
    rep = evaluate_sentences(golds, preds)
    o = rep["__overall__"]
    u = rep.get("User_Name", {"f1": 0.0, "precision": 0.0, "recall": 0.0})
    print(f"{tag}: overall F1={o['f1']:.2f} P={o['precision']:.2f} "
          f"R={o['recall']:.2f} | User_Name F1={u['f1']:.2f} "
          f"P={u['precision']:.2f} R={u['recall']:.2f}")


def main():
    n_aug = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    base = train_only_model(CACHE)
    toks, golds, preds, keys = tag_split(base, SO + "dev.txt")
    report("base     ", golds, preds)

    tmp = tempfile.mkdtemp(prefix="sokg_handles_")
    train_lines = open(SO + "train.txt").read()
    parsed = parse_gold_lines(train_lines.splitlines())
    aug_path = tmp + "/train_aug.txt"
    with open(aug_path, "w") as f:
        f.write(train_lines)
        f.writelines(handle_aug_lines(parsed, n_aug=n_aug))
    cache = f"/tmp/sokg_trainonly_handles{n_aug}.pkl.gz"
    if os.path.exists(cache):
        aug = PerceptronTagger.load(cache)
    else:
        aug = PerceptronTagger.fit_from_gold(
            aug_path, epochs=6, structured=True,
            ctc_path=AUX + "ctc_pred.tsv",
            seg_path=AUX + "segmenter_pred/segmenter_pred_train.txt",
            seg_mode="multi")
        aug.save(cache)
    toks2, golds2, preds2, _ = tag_split(aug, SO + "dev.txt")
    report(f"+aug {n_aug:4d}", golds2, preds2)


if __name__ == "__main__":
    main()
