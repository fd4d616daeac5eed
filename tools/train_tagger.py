#!/usr/bin/env python3
"""Train the shipped default tagger (Viterbi StructuredPerceptron with the
CTC + segmenter aux channels, 63.1 test F1 — the top of the quality ladder
20.8 gazetteer -> 53.6 greedy -> 55.2 viterbi -> 55.9 +ctc -> 63.1 +seg)
and save the artifact (~0.8 MB gzip pickle). Deterministic; ~30 s.

    python tools/train_tagger.py [out_path] [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402

TRAIN = "/root/reference/resources/annotated_ner_data/StackOverflow/train.txt"
CTC = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/ctc_pred.tsv"
SEG = ("/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"
       "segmenter_pred/segmenter_pred_train.txt")
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "stackoverflowner_spark", "artifacts",
    "viterbi_ctc_seg.pkl.gz")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tagger = PerceptronTagger.fit_from_gold(
        TRAIN, epochs=epochs, structured=True, ctc_path=CTC, seg_path=SEG)
    tagger.save(out)
    print("saved", out, "features:", len(tagger.model.weights))


if __name__ == "__main__":
    main()
