#!/usr/bin/env python3
"""Single-shot test evaluation of the tuned score fusion (tune_fusion.py).

Uses the SHIPPED full-data artifacts (viterbi_twopass_ref +
viterbi_ctc_seg + stacked_ref) with the frozen (w2, lam) from
artifacts/fusion.json under the reference's two-pass protocol.

    python tools/eval_fusion.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.eval_stacker import ART_DIR, SEG_TEST, SO_TEST  # noqa: E402
from tools.train_stacker import _parse_seg  # noqa: E402
from tools.tune_fusion import (FUSION_CONFIG, _emissions_by_sentence,  # noqa: E402
                               fused_decode)


def fusion_predict(sents, segs):
    """(fused_preds, base_preds) for gold sentences under the two-pass
    protocol, from the shipped artifacts + frozen fusion.json weights.
    Shared by the CLI below and the quality-gate test."""
    from stackoverflowner_spark.kernel.np_stacker import (StackedNpTagger,
                                                          sentence_channels,
                                                          split_aux)
    from stackoverflowner_spark.operators.tagger import PerceptronTagger

    with open(FUSION_CONFIG) as f:
        cfg = json.load(f)
    w2, lam = cfg["w2"], cfg["lam"]

    ref = PerceptronTagger.load(
        os.path.join(ART_DIR, "viterbi_twopass_ref.pkl.gz"))
    multi = PerceptronTagger.load(
        os.path.join(ART_DIR, "viterbi_ctc_seg.pkl.gz"))
    stacker = StackedNpTagger.load(os.path.join(ART_DIR, "stacked_ref"))

    segs = list(segs) + [None] * (len(sents) - len(segs))
    idxs = [i for i in range(len(sents)) if len(sents[i]) > 0]

    E_ref = _emissions_by_sentence(ref, sents, segs, idxs)
    E_multi = _emissions_by_sentence(multi, sents, segs, idxs)
    labels = list(ref.model.labels)
    assert list(multi.model.labels) == labels
    assert stacker.labels == labels
    T = ref.model.trans + w2 * multi.model.trans

    # stacker channels exactly as eval_stacker builds them: base tags from
    # the shipped artifacts, aux pieces from the ref artifact
    base_preds, base2_preds = {}, {}
    for i in idxs:
        base_preds[i] = fused_decode(E_ref[i], ref.model.trans, labels)
        base2_preds[i] = fused_decode(E_multi[i], multi.model.trans, labels)
    preds = []
    for i in idxs:
        s = sents[i]
        w = [t.word for t in s]
        md = [t.md_label for t in s]
        seg = segs[i] if segs[i] is not None and len(segs[i]) == len(w) \
            else None
        aux = (ref._aux_channel(w, seg) if seg is not None
               else ref._model_inputs(w, md)[2])
        gazs, ctcs, seg_ch = split_aux(aux)
        ch = sentence_channels(w, md, gazs, ctcs, seg_ch, base_preds[i],
                               base2_preds[i])
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
            E_ref[i] + w2 * E_multi[i] + lam * logits, T, labels))
    return preds, [base_preds[i] for i in idxs], idxs, (w2, lam)


def main() -> None:
    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences
    from stackoverflowner_spark.kernel.goldload import parse_gold_lines

    sents = parse_gold_lines(open(SO_TEST).read().splitlines())
    segs = _parse_seg(SEG_TEST)
    preds, base_preds, idxs, (w2, lam) = fusion_predict(sents, segs)
    golds = [[t.tag for t in sents[i]] for i in idxs]
    base_f1 = evaluate_sentences(golds, base_preds)["__overall__"]["f1"]
    f1 = evaluate_sentences(golds, preds)["__overall__"]["f1"]
    print(f"test base (ref artifact) F1 {base_f1:.2f}")
    print(f"test fused (w2={w2}, lam={lam}) F1 {f1:.2f}")


if __name__ == "__main__":
    main()
