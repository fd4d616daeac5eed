#!/usr/bin/env python3
"""Train the averaged-perceptron tagger on the gold train split and save the
artifact (~few MB gzip pickle). Deterministic; ~1 minute.

    python tools/train_tagger.py [out_path] [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402

TRAIN = "/root/reference/resources/annotated_ner_data/StackOverflow/train.txt"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sokg_perceptron.pkl.gz"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    tagger = PerceptronTagger.fit_from_gold(TRAIN, epochs=epochs)
    tagger.save(out)
    print("saved", out, "features:", len(tagger.model.weights))


if __name__ == "__main__":
    main()
