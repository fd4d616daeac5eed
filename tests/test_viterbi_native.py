"""Bitwise parity gate for the compile-on-demand C Viterbi kernel.

The contract (kernel/viterbi_native.py): identical float32 adds in the
same order as the numpy lattice, strict-> first-occurrence tie-breaks —
so decoded paths must be EQUAL (not just tag-equal), including on inputs
engineered to tie. Also gates the end-to-end path: the shipped tagger
artifact must decode a corpus identically with the kernel forced on and
forced off.
"""

import numpy as np
import pytest

from stackoverflowner_spark.kernel import perceptron as P
from stackoverflowner_spark.kernel.viterbi_native import (viterbi_lib,
                                                          viterbi_paths)


def _numpy_paths(E_batch: np.ndarray, T: np.ndarray) -> np.ndarray:
    """The tag_sentences numpy lattice, verbatim (tile-free: per-sentence
    ops are independent, gated bitwise-equal in the existing suite)."""
    B, n, L = E_batch.shape
    TT = np.ascontiguousarray(T[:L].T)
    cols = np.arange(L)
    rows = np.arange(B)[:, None]
    dp = T[L] + E_batch[:, 0]
    back = np.zeros((B, n, L), dtype=np.int64)
    cand = np.empty((B, L, L), dtype=T.dtype)
    for i in range(1, n):
        np.add(dp[:, None, :], TT[None], out=cand)
        bi = cand.argmax(axis=2)
        back[:, i] = bi
        dp = cand[rows, cols[None, :], bi] + E_batch[:, i]
    last = dp.argmax(axis=1)
    paths = np.zeros((B, n), dtype=np.int64)
    paths[:, n - 1] = last
    r = np.arange(B)
    for i in range(n - 1, 0, -1):
        paths[:, i - 1] = back[r, i, paths[:, i]]
    return paths


def test_kernel_builds():
    # this box ships cc; if the kernel cannot build here the optimization
    # is silently off — fail loudly instead
    assert viterbi_lib() is not None


@pytest.mark.parametrize("seed,B,n,L", [
    (0, 64, 12, 41), (1, 128, 54, 41), (2, 7, 1, 41), (3, 33, 3, 5),
    (4, 256, 21, 13),
])
def test_paths_bitwise_equal_random(seed, B, n, L):
    lib = viterbi_lib()
    assert lib is not None
    rng = np.random.default_rng(seed)
    T = rng.standard_normal((L + 1, L)).astype(np.float32)
    # START -> I-* style pins, like the trained matrix
    T[L, ::3] = -10000.0
    E = rng.standard_normal((B, n, L)).astype(np.float32)
    assert np.array_equal(viterbi_paths(lib, E, T), _numpy_paths(E, T))


def test_paths_bitwise_equal_with_ties():
    lib = viterbi_lib()
    assert lib is not None
    rng = np.random.default_rng(7)
    L, B, n = 11, 96, 17
    T = rng.integers(-3, 4, size=(L + 1, L)).astype(np.float32)
    E = rng.integers(-2, 3, size=(B, n, L)).astype(np.float32)
    # integer-valued floats force exact score ties: first-occurrence
    # tie-breaks must agree everywhere
    assert np.array_equal(viterbi_paths(lib, E, T), _numpy_paths(E, T))


def test_artifact_decode_identical_native_on_off(monkeypatch):
    from stackoverflowner_spark.operators.tagger import default_tagger

    tagger = default_tagger()
    if not hasattr(tagger, "model"):
        pytest.skip("no perceptron artifact shipped")
    sents = []
    rng = np.random.default_rng(11)
    words = ["numpy", "uses", "ndarray", "objects", "with", "dtype",
             "float32", "and", "pandas", "DataFrame", "joins", ".",
             "select", "(", ")", "the", "quick", "fox"]
    for _ in range(200):
        k = int(rng.integers(1, 14))
        toks = [words[int(i)] for i in rng.integers(0, len(words), size=k)]
        sents.append((toks, ["O"] * k))

    def run():
        tagger.__dict__.pop("_sent_cache", None)
        tagger.model.__dict__.pop("_sent_cache", None)
        return tagger.tag_sentences(sents)

    got_native = run()
    # force the numpy path by making the lib lookup fail
    monkeypatch.setattr(
        "stackoverflowner_spark.kernel.viterbi_native.viterbi_lib",
        lambda: None)
    got_numpy = run()
    assert got_native == got_numpy
