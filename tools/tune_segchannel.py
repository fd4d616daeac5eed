#!/usr/bin/env python3
"""Dev gate for the trained-segmenter deployment channel (r5 ladder).

Protocol (same dev-honesty as every ladder rung): TRAIN-ONLY models —
jackknifed binary segmenters over train.txt supply the own-regime
channel the NER perceptron trains against; a full train-only segmenter
ships inside the candidate tagger for inference — evaluated once on the
dev split under deployment channels against the shipped-recipe baseline
(alias-segmenter own channel). test/GH are never read here.

    python tools/tune_segchannel.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.kernel.conlleval import evaluate_sentences  # noqa: E402
from stackoverflowner_spark.kernel.goldload import parse_gold_lines  # noqa: E402
from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402
from tools.train_segmenter import jackknife_channels, train_segmenter  # noqa: E402
from tools.tune_consistency import tag_split, train_only_model  # noqa: E402

SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
AUX = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"


def main():
    train_sents = parse_gold_lines(open(SO + "train.txt").read().splitlines())
    print(f"jackknifing seg channels over {len(train_sents)} train sentences")
    channels, _folds = jackknife_channels(train_sents, k_folds=5)
    seg_full = train_segmenter([SO + "train.txt"])

    for mode in ("multi", "own"):
        cand = PerceptronTagger.fit_from_gold(
            SO + "train.txt", epochs=6, structured=True,
            ctc_path=AUX + "ctc_pred.tsv",
            seg_path=AUX + "segmenter_pred/segmenter_pred_train.txt",
            seg_mode=mode, own_seg_channels=channels, seg_model=seg_full)
        _, golds, preds, _ = tag_split(cand, SO + "dev.txt")
        r = evaluate_sentences(golds, preds)["__overall__"]
        print(f"dev deployment F1 (trained-seg channel, seg_mode={mode}): "
              f"F1={r['f1']:.2f} P={r['precision']:.2f} R={r['recall']:.2f}")

    base = train_only_model()
    _, golds, preds, _ = tag_split(base, SO + "dev.txt")
    r = evaluate_sentences(golds, preds)["__overall__"]
    print(f"dev deployment F1 (baseline alias channel):  "
          f"F1={r['f1']:.2f} P={r['precision']:.2f} R={r['recall']:.2f}")


if __name__ == "__main__":
    main()
