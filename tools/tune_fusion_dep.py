#!/usr/bin/env python3
"""Deployment-channel score fusion: lift the DEPLOYED F1 number.

tune_fusion.py improves the reference-fixture two-pass protocol number
(67.3 vs 66.5), but that protocol needs the reference's shipped segmenter
prediction files — which do not exist on arbitrary web pages. The number
the engine actually ships with is the DEPLOYMENT-channel F1 (59.5 in r5:
every channel computed by the engine itself, the protocol of
tests/test_quality_gates.py::test_shipped_artifact_f1_floors). This tool
tunes the same soft score fusion entirely under deployment channels:

    E = E_multi + w2 * E_ref + lam * stacker_logits
    T = T_multi + w2 * T_ref

* E_multi — emissions of the multi-regime artifact (the deployed
  default's regime) over deployment inputs; at (w2=0, lam=0) the fusion
  IS the deployed default, so its F1 floors the tuned result on dev.
* E_ref — the twopass_ref artifact's emissions over the SAME deployment
  inputs (alone it is miscalibrated there — measured 38.8 — but its
  disagreements still carry signal the grid can weight).
* stacker_logits — a deployment-regime StackedNpTagger (trained here,
  saved to artifacts/stacked_dep) whose channels are built exactly as
  deployment inference builds them: aux from ``_model_inputs`` (engine
  segmenter, no fixtures), base/base2 tags decoded under deployment
  channels.

Honest protocol (test split never touched):
1. Fold models from tune_fusion.FOLD_DIR (fit on the other folds) tag
   their held-out fold under DEPLOYMENT channels -> jackknife base tags.
2. The stacker trains on the non-dev slice of that dataset; the dev
   slice (sentence index % DEV_EVERY == 0) is used for epoch selection.
3. (w2, lam) tune on dev-slice deployment emissions, all jackknife-honest
   (each sentence scored only by models that never saw it).
4. eval_fusion_dep.py evaluates the gold TEST split once, with the
   shipped full-data artifacts + the frozen weights.

    python tools/tune_fusion_dep.py          # build dataset, train, tune
"""

import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.train_stacker import (ART_DIR, DEV_EVERY, K,  # noqa: E402
                                 load_gold_and_seg)
from tools.tune_fusion import (FOLD_DIR, LAM_GRID, W2_GRID,  # noqa: E402
                               ensure_fold_models, fused_decode)

DEP_DS_CACHE = f"/tmp/sokg_stacker_ds_dep_k{K}_v1.pkl.gz"
STACKED_DEP = os.path.join(ART_DIR, "stacked_dep")
FUSION_DEP_CONFIG = os.path.join(ART_DIR, "fusion_dep.json")


def _dep_tag_fold(args):
    """Tag fold ``fold``'s held-out sentences with the saved (fold, regime)
    model under DEPLOYMENT inputs. Returns ({i: tags}, {i: aux}); aux is
    returned only for the multi regime (the deployed default's regime —
    the stacker must see the channel inference will feed it)."""
    fold, regime = args
    from stackoverflowner_spark.operators.tagger import PerceptronTagger

    tagger = PerceptronTagger.load(
        os.path.join(FOLD_DIR, f"{regime}{fold}.pkl.gz"))
    sents, _ = load_gold_and_seg()
    held = [(i, s) for i, s in enumerate(sents)
            if i % K == fold and len(s) > 0]
    inputs = [tagger._model_inputs([t.word for t in s], [t.md_label for t in s])
              for _, s in held]
    tags = tagger.model.tag_sentences(inputs)
    out_tags = {i: tg for (i, _), tg in zip(held, tags)}
    out_aux = {}
    if regime == "multi":
        out_aux = {i: inp[2] for (i, _), inp in zip(held, inputs)}
    return out_tags, out_aux


def build_dataset_dep(cache: bool = True):
    """(channels, gold) pairs with every channel built the way deployment
    inference builds it, base tags jackknife-honest."""
    import gzip
    import pickle

    if cache and os.path.exists(DEP_DS_CACHE):
        with gzip.open(DEP_DS_CACHE, "rb") as f:
            return pickle.load(f)

    from stackoverflowner_spark.kernel.np_stacker import (sentence_channels,
                                                          split_aux)

    ensure_fold_models()
    sents, _ = load_gold_and_seg()
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    jobs = [(f, r) for f in range(K) for r in ("ref", "multi")]
    base_ref: dict = {}
    base_multi: dict = {}
    auxes: dict = {}
    with ProcessPoolExecutor(max_workers=min(len(jobs), 10)) as ex:
        for (f, r), (tags, aux) in zip(jobs, ex.map(_dep_tag_fold, jobs)):
            (base_ref if r == "ref" else base_multi).update(tags)
            auxes.update(aux)

    data = []
    for i, sent in enumerate(sents):
        if not sent:
            data.append(None)
            continue
        w = [t.word for t in sent]
        md = [t.md_label for t in sent]
        gold = [t.tag for t in sent]
        gazs, ctcs, seg_ch = split_aux(auxes[i])
        ch = sentence_channels(w, md, gazs, ctcs, seg_ch, base_ref[i],
                               base_multi[i])
        data.append((ch, gold))
    if cache:
        with gzip.open(DEP_DS_CACHE, "wb") as f:
            pickle.dump(data, f)
    return data


def train_stacker_dep(epochs: int = 12):
    """Train the deployment-regime stacker (same recipe as
    tools/train_stacker.py, deployment-channel dataset)."""
    from stackoverflowner_spark.kernel.np_stacker import StackedNpTagger

    data = [d for d in build_dataset_dep() if d is not None]
    train = [d for i, d in enumerate(data) if i % DEV_EVERY != 0]
    dev = [d for i, d in enumerate(data) if i % DEV_EVERY == 0]
    labels = sorted({t for _, gold in data for t in gold})
    vocabs = StackedNpTagger.build_vocabs(train)
    model = StackedNpTagger.init(vocabs, labels)
    print(f"dep stacker: train={len(train)} dev={len(dev)} "
          f"labels={len(labels)} word_vocab={len(vocabs['word'])}")
    model.fit(train, epochs=epochs, dev=dev, log=print)
    model.save(STACKED_DEP)
    return model


def _dep_emissions(tagger, sents, idxs):
    inputs = [tagger._model_inputs([t.word for t in sents[i]],
                                   [t.md_label for t in sents[i]])
              for i in idxs]
    flat = tagger.model._batch_emissions(inputs).astype(np.float64)
    out, pos = {}, 0
    for i, (w, _, _) in zip(idxs, inputs):
        out[i] = flat[pos:pos + len(w)]
        pos += len(w)
    return out


def dev_scores_dep():
    """(golds, E_multi, E_ref, logits, labels, T_multi, T_ref) for the dev
    slice, all deployment-channel and jackknife-honest."""
    from stackoverflowner_spark.kernel.np_stacker import StackedNpTagger
    from stackoverflowner_spark.operators.tagger import PerceptronTagger

    ensure_fold_models()
    sents, _ = load_gold_and_seg()
    data = build_dataset_dep()
    assert len(data) == len(sents), "index alignment broken"
    dev_idx = [i for i in range(len(sents)) if i % DEV_EVERY == 0
               and len(sents[i]) > 0]

    E_ref, E_multi = {}, {}
    T_ref = T_multi = labels = None
    for f in range(K):
        idxs = [i for i in dev_idx if i % K == f]
        for regime, store in (("ref", E_ref), ("multi", E_multi)):
            tg = PerceptronTagger.load(
                os.path.join(FOLD_DIR, f"{regime}{f}.pkl.gz"))
            store.update(_dep_emissions(tg, sents, idxs))
            if regime == "ref" and T_ref is None:
                T_ref, labels = tg.model.trans.copy(), list(tg.model.labels)
            if regime == "multi" and T_multi is None:
                T_multi = tg.model.trans.copy()
                assert list(tg.model.labels) == labels

    stacker = StackedNpTagger.load(STACKED_DEP)
    assert stacker.labels == labels
    logits = {}
    for i in dev_idx:
        ch, _ = data[i]
        n = len(ch["word"])
        L = min(max(n, 1), stacker.config["max_len"])
        enc = stacker.encode(ch, L)
        batch = {k: v[None] for k, v in enc.items()}
        lg = np.zeros((n, len(labels)))
        lg[:L] = stacker.forward(batch)[0, :min(n, L)].astype(np.float64)
        logits[i] = lg

    golds = {i: [t.tag for t in sents[i]] for i in dev_idx}
    return golds, E_multi, E_ref, logits, labels, T_multi, T_ref


def main() -> None:
    import json

    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences

    if not os.path.exists(os.path.join(STACKED_DEP, "config.json")):
        train_stacker_dep()

    golds, E_multi, E_ref, logits, labels, T_multi, T_ref = dev_scores_dep()
    idxs = sorted(golds)
    gold_list = [golds[i] for i in idxs]

    base_preds = [fused_decode(E_multi[i], T_multi, labels) for i in idxs]
    base_f1 = evaluate_sentences(gold_list, base_preds)["__overall__"]["f1"]
    print(f"dev base (multi-regime jackknife, deployment channels) "
          f"F1 {base_f1:.2f}")

    best = (-1.0, 0.0, 0.0)
    for w2 in W2_GRID:
        T = T_multi + w2 * T_ref
        for lam in LAM_GRID:
            preds = [fused_decode(
                E_multi[i] + w2 * E_ref[i] + lam * logits[i], T, labels)
                for i in idxs]
            f1 = evaluate_sentences(gold_list, preds)["__overall__"]["f1"]
            print(f"w2={w2:<4} lam={lam:<4}: dev F1 {f1:.2f}")
            if f1 > best[0]:
                best = (f1, w2, lam)

    f1, w2, lam = best
    with open(FUSION_DEP_CONFIG, "w") as f:
        json.dump({"w2": w2, "lam": lam, "dev_f1": round(f1, 2),
                   "dev_base_f1": round(base_f1, 2)}, f, indent=1)
    print(f"chosen w2={w2} lam={lam} (dev F1 {f1:.2f}) "
          f"-> {FUSION_DEP_CONFIG}")


if __name__ == "__main__":
    main()
