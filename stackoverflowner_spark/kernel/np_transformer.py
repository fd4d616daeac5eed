"""Minimal numpy token-classification transformer (checkpoint-path gate).

The reference's SoftNER/segmenter forwards are HF BERT checkpoints the repo
does not ship (code/Readme.md:4-8 points at external downloads), and this
container has no torch. What CAN be verified end-to-end is the engine's
checkpoint *path*: weights on disk -> lazy executor-singleton load ->
batched ``forward(input_ids[B,L], input_mask[B,L]) -> logits[B,L,n_labels]``
-> first-wordpiece alignment. This module provides a real (if tiny)
transformer forward in pure numpy — embeddings + one masked self-attention
head + FFN + classifier head, HF-like directory layout (config.json +
weights file) — deterministic from a seed, so tests can generate a
few-hundred-kB checkpoint on the fly and drive ``ModelTagger``/
``model_tag_stage`` through the exact code path a torch checkpoint would
take (operators/tagger.py:_executor_model_forward).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

CONFIG = "config.json"
WEIGHTS = "numpy_model.npz"


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


class NumpyTokenClassifier:
    """One-block transformer encoder + token-classification head."""

    def __init__(self, weights: Dict[str, np.ndarray], config: dict):
        self.w = weights
        self.config = config

    # -- construction ------------------------------------------------------ #

    @classmethod
    def generate(cls, vocab_size: int, n_labels: int, hidden: int = 16,
                 ffn: int = 32, max_len: int = 128,
                 seed: int = 20260816) -> "NumpyTokenClassifier":
        """Deterministic random-weight checkpoint (the test stand-in for a
        trained download; the FORWARD math is real either way)."""
        rng = np.random.default_rng(seed)

        def m(*shape):
            return (rng.standard_normal(shape) * 0.1).astype(np.float32)

        w = {
            "emb": m(vocab_size, hidden), "pos": m(max_len, hidden),
            "ln0_g": np.ones(hidden, np.float32), "ln0_b": np.zeros(hidden, np.float32),
            "wq": m(hidden, hidden), "wk": m(hidden, hidden),
            "wv": m(hidden, hidden), "wo": m(hidden, hidden),
            "ln1_g": np.ones(hidden, np.float32), "ln1_b": np.zeros(hidden, np.float32),
            "ffn1_w": m(hidden, ffn), "ffn1_b": np.zeros(ffn, np.float32),
            "ffn2_w": m(ffn, hidden), "ffn2_b": np.zeros(hidden, np.float32),
            "ln2_g": np.ones(hidden, np.float32), "ln2_b": np.zeros(hidden, np.float32),
            "cls_w": m(hidden, n_labels), "cls_b": np.zeros(n_labels, np.float32),
        }
        cfg = {"vocab_size": vocab_size, "n_labels": n_labels,
               "hidden": hidden, "ffn": ffn, "max_len": max_len,
               "model_type": "numpy-token-classifier", "seed": seed}
        return cls(w, cfg)

    # -- HF-like directory persistence -------------------------------------- #

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        np.savez(os.path.join(dirpath, WEIGHTS), **self.w)
        with open(os.path.join(dirpath, CONFIG), "w") as f:
            json.dump(self.config, f, indent=1)

    @classmethod
    def load(cls, dirpath: str) -> "NumpyTokenClassifier":
        with open(os.path.join(dirpath, CONFIG)) as f:
            cfg = json.load(f)
        npz = np.load(os.path.join(dirpath, WEIGHTS))
        return cls({k: npz[k] for k in npz.files}, cfg)

    # -- forward ------------------------------------------------------------- #

    def forward(self, input_ids, input_mask) -> np.ndarray:
        """(B, L) int ids + 0/1 mask -> (B, L, n_labels) float32 logits."""
        w = self.w
        ids = np.asarray(input_ids)
        mask = np.asarray(input_mask).astype(np.float32)
        B, L = ids.shape
        h = w["emb"].shape[1]
        x = w["emb"][ids] + w["pos"][:L][None]
        x = _layer_norm(x, w["ln0_g"], w["ln0_b"])
        q, k, v = x @ w["wq"], x @ w["wk"], x @ w["wv"]
        att = (q @ k.transpose(0, 2, 1)) / np.sqrt(h)
        att = att + (1.0 - mask[:, None, :]) * -1e9  # padded keys masked out
        x = x + _softmax(att) @ v @ w["wo"]
        x = _layer_norm(x, w["ln1_g"], w["ln1_b"])
        f = np.maximum(x @ w["ffn1_w"] + w["ffn1_b"], 0.0)
        x = _layer_norm(x + f @ w["ffn2_w"] + w["ffn2_b"], w["ln2_g"], w["ln2_b"])
        return (x @ w["cls_w"] + w["cls_b"]).astype(np.float32)
