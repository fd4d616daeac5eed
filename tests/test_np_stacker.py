"""Unit gates for the trainable stacked transformer (kernel/np_stacker).

The heavyweight claims (test-split F1 beating the base perceptron) live in
test_quality_gates.py against the shipped artifact; these gates pin the
*math*: backprop exactness by finite differences, deterministic forward,
checkpoint round-trip, BIO-valid decoding, and that training actually
learns a synthetic correction task.
"""

import numpy as np
import pytest

from stackoverflowner_spark.kernel.np_stacker import (CHANNELS,
                                                      StackedNpTagger,
                                                      _softmax, split_aux)

LABELS = ["O", "B-X", "I-X"]


def _tiny_model(seed=1):
    vocabs = {c: {f"{c}{i}": i + 2 for i in range(5)} for c in CHANNELS}
    return StackedNpTagger.init(vocabs, LABELS, hidden=8, ffn=12,
                                max_len=10, seed=seed)


def _tiny_batch(rng, B=2, L=6):
    batch = {c: rng.integers(0, 7, size=(B, L)) for c in CHANNELS}
    mask = np.ones((B, L), np.float64)
    mask[1, 4:] = 0
    batch["mask"] = mask
    gold = rng.integers(0, 3, size=(B, L))
    gold[1, 4:] = -1
    return batch, gold


def _loss(model, batch, gold):
    logits = model._forward(batch, train=False)
    probs = _softmax(logits)
    m = gold >= 0
    sg = np.where(m, gold, 0)
    pg = np.take_along_axis(probs, sg[..., None], -1)[..., 0]
    return float(-np.log(np.maximum(pg[m], 1e-12)).sum()) / m.sum()


def test_backward_matches_finite_differences():
    """Every gradient tensor matches central finite differences in float64
    (loose where FD noise dominates tiny gradients)."""
    rng = np.random.default_rng(0)
    m = _tiny_model()
    m.w = {k: v.astype(np.float64) for k, v in m.w.items()}
    batch, gold = _tiny_batch(rng)
    logits, cache = m._forward(batch, train=True)
    probs = _softmax(logits)
    msk = gold >= 0
    n = msk.sum()
    sg = np.where(msk, gold, 0)
    dlog = probs.copy()
    np.put_along_axis(dlog, sg[..., None],
                      np.take_along_axis(dlog, sg[..., None], -1) - 1.0, -1)
    dlog *= msk[..., None] / n
    grads = m._backward(batch, cache, dlog)
    eps = 1e-6
    for name in ["pos", "emb_word", "emb_base", "cls_w", "cls_b", "wq", "wk",
                 "wv", "wo", "ffn1_w", "ffn2_w", "ln0_g", "ln1_b", "ln2_g"]:
        w = m.w[name]
        for _ in range(4):
            idx = tuple(rng.integers(0, s) for s in w.shape)
            orig = w[idx]
            w[idx] = orig + eps
            lp = _loss(m, batch, gold)
            w[idx] = orig - eps
            lm = _loss(m, batch, gold)
            w[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = grads[name][idx]
            if max(abs(num), abs(ana)) < 1e-7:
                continue
            rel = abs(num - ana) / max(abs(num), abs(ana))
            assert rel < 1e-3, (name, idx, num, ana)


def test_forward_deterministic_and_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    m = _tiny_model(seed=9)
    batch, _ = _tiny_batch(rng)
    batch = {k: v for k, v in batch.items()}
    a = m.forward(batch)
    b = m.forward(batch)
    assert np.array_equal(a, b)
    m.save(str(tmp_path / "ckpt"))
    m2 = StackedNpTagger.load(str(tmp_path / "ckpt"))
    assert np.array_equal(m2.forward(batch), a)
    assert m2.labels == m.labels
    assert m2.vocabs == m.vocabs


def test_decode_is_bio_valid():
    """Greedy decode never emits I-X without a same-type B-X/I-X left
    neighbor, even when raw logits prefer it."""
    m = _tiny_model()
    logits = np.zeros((4, 3), np.float32)
    logits[:, LABELS.index("I-X")] = 5.0  # I-X everywhere is invalid at i=0
    tags = m._decode(logits)
    assert tags[0] != "I-X"
    for i, t in enumerate(tags):
        if t.startswith("I-"):
            assert i > 0 and tags[i - 1][2:] == t[2:] and tags[i - 1] != "O"


def test_fit_learns_channel_correction():
    """Synthetic stacking task: gold = base channel except where word is
    'w3' (there gold is B-X regardless of base). A trained stacker must
    learn both the copy map and the correction; an untrained one can't."""
    rng = np.random.default_rng(11)
    data = []
    for _ in range(120):
        n = int(rng.integers(3, 8))
        words = [f"w{rng.integers(0, 6)}" for _ in range(n)]
        base = [["O", "B-X"][rng.integers(0, 2)] for _ in range(n)]
        gold = ["B-X" if w == "w3" else b for w, b in zip(words, base)]
        ch = {c: ["?"] * n for c in CHANNELS}
        ch["word"] = words
        ch["base"] = base
        data.append((ch, gold))
    train, dev = data[:100], data[100:]
    vocabs = StackedNpTagger.build_vocabs(train, word_min_count=1)
    m = StackedNpTagger.init(vocabs, LABELS, hidden=16, ffn=32, max_len=16,
                             seed=3)
    before = m._token_acc(dev)
    m.fit(train, epochs=30, batch_size=16, lr=3e-3, seed=2)
    after = m._token_acc(dev)
    assert after > 0.97, (before, after)
    # determinism: same seed + data -> identical weights
    m2 = StackedNpTagger.init(vocabs, LABELS, hidden=16, ffn=32, max_len=16,
                              seed=3)
    m2.fit(train, epochs=30, batch_size=16, lr=3e-3, seed=2)
    assert all(np.array_equal(m.w[k], m2.w[k]) for k in m.w)


def test_split_aux_roundtrip():
    gazs, ctcs, segs = split_aux(["O|c1|sName", "Library|c0|sO", "O"])
    assert gazs == ["O", "Library", "O"]
    assert ctcs == ["1", "0", "?"]
    assert segs == ["Name", "O", "?"]
