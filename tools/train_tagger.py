#!/usr/bin/env python3
"""Train the shipped tagger artifacts (Viterbi StructuredPerceptron with the
CTC + segmenter aux channels and the r4 char-4-gram feature set).

Two artifacts, one model family, two segmenter-channel regimes (see
PerceptronTagger.fit_from_gold seg_mode and BENCH/BASELINE.md ladder):

* ``viterbi_ctc_seg.pkl.gz`` (the DEFAULT the pipeline loads) — seg_mode
  "multi": each train+dev sentence seen under the reference-fixture channel
  AND the deployment alias-segmenter channel. Best where the engine
  actually runs (no reference fixtures exist for arbitrary web pages):
  gold test under deployment channels + the OOD GitHub split.
* ``viterbi_twopass_ref.pkl.gz`` — seg_mode "ref": the reference's two-pass
  protocol (train on its shipped segmenter fixtures, evaluate with its test
  fixtures), the apples-to-apples ladder artifact.

Both train on train+dev (test is never touched); deterministic, ~2-4 min
each.

    python tools/train_tagger.py [out_dir] [epochs]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402

SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
AUX = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"
CTC = AUX + "ctc_pred.tsv"
ART_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "stackoverflowner_spark", "artifacts")


def _concat(paths, out):
    with open(out, "w") as f:
        for p in paths:
            f.write(open(p).read())
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ART_DIR
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    tmp = tempfile.mkdtemp(prefix="sokg_train_")
    gold = _concat([SO + "train.txt", SO + "dev.txt"], tmp + "/gold.txt")
    seg = _concat([AUX + "segmenter_pred/segmenter_pred_train.txt",
                   AUX + "segmenter_pred/segmenter_pred_dev.txt"],
                  tmp + "/seg.txt")
    for name, seg_mode in (("viterbi_ctc_seg.pkl.gz", "multi"),
                           ("viterbi_twopass_ref.pkl.gz", "ref")):
        tagger = PerceptronTagger.fit_from_gold(
            gold, epochs=epochs, structured=True, ctc_path=CTC, seg_path=seg,
            seg_mode=seg_mode)
        out = os.path.join(out_dir, name)
        tagger.save(out)
        print("saved", out, "features:", len(tagger.model.w),
              "bytes:", os.path.getsize(out))


if __name__ == "__main__":
    main()
