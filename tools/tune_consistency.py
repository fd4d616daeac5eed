#!/usr/bin/env python3
"""Dev-tune the document-level post-pass (kernel/docconsist.py).

Protocol (same dev-honesty as the r4/r5 ladder): a TRAIN-ONLY model
(fit_from_gold on train.txt, the shipped recipe minus dev) tags the dev
split once under deployment channels; the post-pass variants are then
swept over those frozen predictions, grouped into documents by
goldload.document_keys. The gold test and GH splits are never read here.

    python tools/tune_consistency.py [--cache /tmp/sokg_trainonly.pkl.gz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stackoverflowner_spark.kernel.conlleval import evaluate_sentences  # noqa: E402
from stackoverflowner_spark.kernel.docconsist import (apply_consistency,  # noqa: E402
                                                      suppress_punct_code_spans)
from stackoverflowner_spark.kernel.goldload import (document_keys,  # noqa: E402
                                                    parse_gold_lines)
from stackoverflowner_spark.operators.tagger import PerceptronTagger  # noqa: E402

SO = "/root/reference/resources/annotated_ner_data/StackOverflow/"
AUX = "/root/reference/code/Attentive_BiLSTM/auxilary_inputs_ner/"
CACHE = "/tmp/sokg_trainonly.pkl.gz"


def train_only_model(cache: str = CACHE) -> PerceptronTagger:
    if os.path.exists(cache):
        return PerceptronTagger.load(cache)
    tagger = PerceptronTagger.fit_from_gold(
        SO + "train.txt", epochs=6, structured=True,
        ctc_path=AUX + "ctc_pred.tsv",
        seg_path=AUX + "segmenter_pred/segmenter_pred_train.txt",
        seg_mode="multi")
    tagger.save(cache)
    return tagger


def tag_split(tagger: PerceptronTagger, gold_path: str):
    """Deployment-channel predictions + gold + doc grouping for a split."""
    raw = open(gold_path).read().splitlines()
    sents = parse_gold_lines(raw)
    keys = document_keys(raw)
    assert len(keys) == len(sents), (len(keys), len(sents))
    golds = [[t.tag for t in s] for s in sents]
    toks = [[t.word for t in s] for s in sents]
    inputs = [tagger._model_inputs([t.word for t in s],
                                   [t.md_label for t in s]) for s in sents]
    preds = tagger.model.tag_sentences(inputs)
    return toks, golds, preds, keys


def group_docs(keys):
    docs = {}
    for i, k in enumerate(keys):
        docs.setdefault(k, []).append(i)
    return list(docs.values())


def sweep(toks, golds, preds, keys):
    docs = group_docs(keys)

    def f1_of(tags):
        rep = evaluate_sentences(golds, tags)["__overall__"]
        return rep["f1"], rep["precision"], rep["recall"]

    def run(consistency, punct, min_votes, types, max_ngram=1):
        tags = [list(t) for t in preds]
        if punct:
            tags = [suppress_punct_code_spans(tk, tg)
                    for tk, tg in zip(toks, tags)]
        if consistency:
            for idxs in docs:
                new = apply_consistency([toks[i] for i in idxs],
                                        [tags[i] for i in idxs],
                                        min_votes=min_votes,
                                        allowed_types=types,
                                        max_ngram=max_ngram)
                for i, t in zip(idxs, new):
                    tags[i] = t
        return f1_of(tags)

    base = f1_of(preds)
    print(f"base (no pass):              F1={base[0]:.2f} P={base[1]:.2f} R={base[2]:.2f}")
    f, p, r = run(False, True, 1, None)
    print(f"punct-suppress only:         F1={f:.2f} P={p:.2f} R={r:.2f}")
    app = {"Application", "Library", "Website"}
    for mv in (1, 2):
        for label, types in (("all-types", None), ("app/lib/site", app)):
            f, p, r = run(True, False, mv, types)
            print(f"consistency mv={mv} {label:12s}: F1={f:.2f} P={p:.2f} R={r:.2f}")
    for mv in (1, 2):
        f, p, r = run(True, True, mv, None)
        print(f"both mv={mv} all-types:        F1={f:.2f} P={p:.2f} R={r:.2f}")
    # r5c sweep: multi-token mention propagation (whole-tuple surfaces)
    for ng in (2, 3):
        for mv in (1, 2):
            f, p, r = run(True, False, mv, None, max_ngram=ng)
            print(f"consistency mv={mv} ngram<={ng} all: F1={f:.2f} P={p:.2f} R={r:.2f}")


def main():
    cache = CACHE
    if "--cache" in sys.argv:
        cache = sys.argv[sys.argv.index("--cache") + 1]
    tagger = train_only_model(cache)
    toks, golds, preds, keys = tag_split(tagger, SO + "dev.txt")
    print(f"dev: {len(golds)} sentences, {len(set(keys))} documents")
    sweep(toks, golds, preds, keys)


if __name__ == "__main__":
    main()
