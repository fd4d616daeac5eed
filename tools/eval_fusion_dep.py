#!/usr/bin/env python3
"""Single-shot TEST evaluation of the deployment-channel fusion
(tune_fusion_dep.py) with the SHIPPED artifacts and frozen weights.

Run after tuning; the test split is touched only here, once.

    python tools/eval_fusion_dep.py [--gh]   # --gh also evals GitHub OOD
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.eval_stacker import ART_DIR, SO_TEST  # noqa: E402
from tools.tune_fusion import fused_decode  # noqa: E402
from tools.tune_fusion_dep import (FUSION_DEP_CONFIG, STACKED_DEP,  # noqa: E402
                                   _dep_emissions)

GH_GOLD = "/root/reference/resources/annotated_ner_data/GitHub/GH_test_set.txt"


def fusion_predict_dep(sents):
    """(fused_preds, base_preds, idxs, (w2, lam)) under DEPLOYMENT channels
    from the shipped artifacts + frozen fusion_dep.json weights. Shared by
    the CLI below and the quality-gate test."""
    from stackoverflowner_spark.kernel.np_stacker import (StackedNpTagger,
                                                          sentence_channels,
                                                          split_aux)
    from stackoverflowner_spark.operators.tagger import PerceptronTagger

    with open(FUSION_DEP_CONFIG) as f:
        cfg = json.load(f)
    w2, lam = cfg["w2"], cfg["lam"]

    ref = PerceptronTagger.load(
        os.path.join(ART_DIR, "viterbi_twopass_ref.pkl.gz"))
    multi = PerceptronTagger.load(
        os.path.join(ART_DIR, "viterbi_ctc_seg.pkl.gz"))
    stacker = StackedNpTagger.load(STACKED_DEP)

    idxs = [i for i in range(len(sents)) if len(sents[i]) > 0]
    E_multi = _dep_emissions(multi, sents, idxs)
    E_ref = _dep_emissions(ref, sents, idxs)
    labels = list(multi.model.labels)
    assert list(ref.model.labels) == labels and stacker.labels == labels
    T = multi.model.trans + w2 * ref.model.trans

    base_preds, base2_preds = {}, {}
    for i in idxs:
        base_preds[i] = fused_decode(E_multi[i], multi.model.trans, labels)
        base2_preds[i] = fused_decode(E_ref[i], ref.model.trans, labels)

    preds = []
    for i in idxs:
        s = sents[i]
        w = [t.word for t in s]
        md = [t.md_label for t in s]
        # channels exactly as the dep dataset builds them: deployment aux
        # from the multi artifact, base=ref tags, base2=multi tags
        aux = multi._model_inputs(w, md)[2]
        gazs, ctcs, seg_ch = split_aux(aux)
        ch = sentence_channels(w, md, gazs, ctcs, seg_ch, base2_preds[i],
                               base_preds[i])
        n = len(w)
        # clamp to the stacker's positional capacity; tokens past max_len
        # (rare, long code dumps) get zero logits — fusion degrades to the
        # pure perceptron scores there
        L = min(max(n, 1), stacker.config["max_len"])
        enc = stacker.encode(ch, L)
        batch = {k: v[None] for k, v in enc.items()}
        logits = np.zeros((n, len(labels)))
        logits[:L] = stacker.forward(batch)[0, :min(n, L)].astype(np.float64)
        preds.append(fused_decode(
            E_multi[i] + w2 * E_ref[i] + lam * logits, T, labels))
    return preds, [base_preds[i] for i in idxs], idxs, (w2, lam)


def _eval(gold_path: str, name: str) -> None:
    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences
    from stackoverflowner_spark.kernel.goldload import parse_gold_lines

    sents = parse_gold_lines(open(gold_path).read().splitlines())
    preds, base_preds, idxs, (w2, lam) = fusion_predict_dep(sents)
    golds = [[t.tag for t in sents[i]] for i in idxs]
    base = evaluate_sentences(golds, base_preds)["__overall__"]
    fused = evaluate_sentences(golds, preds)["__overall__"]
    print(f"{name} base (deployed default) "
          f"P={base['precision']:.1f} R={base['recall']:.1f} "
          f"F1={base['f1']:.2f}")
    print(f"{name} fused (w2={w2}, lam={lam}) "
          f"P={fused['precision']:.1f} R={fused['recall']:.1f} "
          f"F1={fused['f1']:.2f}")


def main() -> None:
    _eval(SO_TEST, "test/deployment")
    if "--gh" in sys.argv and os.path.exists(GH_GOLD):
        _eval(GH_GOLD, "GH-OOD/deployment")


if __name__ == "__main__":
    main()
