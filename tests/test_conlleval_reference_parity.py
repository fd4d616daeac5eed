"""Cross-implementation parity: OUR conlleval vs the reference's own scorer.

The reference ships a pure-stdlib python port of conlleval
(`code/Attentive_BiLSTM/conlleval_py.py`) — we import and execute it directly
as the oracle, on seeded random tag streams including malformed ones
(I- after O, type switches without B-), and require per-type and overall
P/R/F1 equality to the reference's own 2-decimal rounding.
"""

import os
import random
import sys

import pytest

REF_DIR = "/root/reference/code/Attentive_BiLSTM"


def _load_reference_scorer():
    sys.path.insert(0, REF_DIR)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_conlleval", os.path.join(REF_DIR, "conlleval_py.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TYPES = ["Class", "Function", "Library", "Code_Block", "Variable"]


def _random_tags(rng, n):
    tags = []
    for _ in range(n):
        r = rng.random()
        if r < 0.55:
            tags.append("O")
        elif r < 0.8:
            tags.append("B-" + rng.choice(TYPES))
        else:
            tags.append("I-" + rng.choice(TYPES))  # may be malformed
    return tags


@pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference absent")
def test_scorer_matches_reference_implementation(tmp_path):
    from stackoverflowner_spark.kernel.conlleval import evaluate_sentences

    ref = _load_reference_scorer()
    rng = random.Random(20260816)
    golds, preds, lines = [], [], []
    for _ in range(400):
        n = rng.randint(1, 25)
        g = _random_tags(rng, n)
        p = [t if rng.random() < 0.7 else q
             for t, q in zip(g, _random_tags(rng, n))]
        golds.append(g)
        preds.append(p)
        for i, (gt, pt) in enumerate(zip(g, p)):
            lines.append(f"w{i} {gt} {pt}")
        lines.append("")
    f = tmp_path / "preds.txt"
    f.write_text("\n".join(lines) + "\n")

    ref_result = ref.evaluate_conll_file(inputFile=str(f))
    ours = evaluate_sentences(golds, preds)

    ro = ref_result["overall"]
    oo = ours["__overall__"]
    assert round(oo["precision"], 2) == ro["P"]
    assert round(oo["recall"], 2) == ro["R"]
    assert round(oo["f1"], 2) == ro["F1"]
    assert oo["guessed"] == ro["Total Predicted"]
    assert oo["tp"] == ro["Correctly Predicted"]

    for typ, rvals in ref_result["by_category"].items():
        assert typ in ours, typ
        assert round(ours[typ]["precision"], 2) == rvals["P"], typ
        assert round(ours[typ]["recall"], 2) == rvals["R"], typ
        assert round(ours[typ]["f1"], 2) == rvals["F1"], typ


GOLD_TEST = "/root/reference/resources/annotated_ner_data/StackOverflow/test.txt"


@pytest.mark.skipif(not os.path.exists(GOLD_TEST), reason="gold absent")
def test_retokenization_agreement_diagnostic():
    """Re-tokenizing the gold test split (pre-tokenized by the OLDER T2
    SOTokenizer variant + human correction) with our normative T1 tokenizer
    reproduces the exact token sequence for >= 80% of sentences. The
    divergences are the documented T1/T2 differences (SURVEY.md §2.3):
    T1 applies Split_Punc_At_End_of_Word (so mid-sentence ``..`` splits) and
    re-tokenizing already-split contractions (``'m`` standing alone) is not
    idempotent. This is a drift detector, not a byte gate — the byte gates
    are the golden text files and the worked examples."""
    import itertools

    from stackoverflowner_spark.kernel.goldload import parse_gold_lines
    from stackoverflowner_spark.kernel.sotok import TokenizerGuardError, tokenize

    gold = parse_gold_lines(open(GOLD_TEST).read().splitlines())
    total = same = 0
    for sent in itertools.islice(gold, 0, 1200):
        words = [t.word for t in sent]
        try:
            ours = tokenize(" ".join(words))
        except TokenizerGuardError:
            continue
        total += 1
        if ours == words:
            same += 1
    assert total > 1000
    assert same / total >= 0.80, f"{same}/{total}"
