"""Deterministic synthetic DistilBERT checkpoints (on-disk, real
layout) for tests and benchmarks.

Writes the exact artifact set a torch export produces —
``model.safetensors`` (via the dependency-free writer), ``vocab.txt``,
``config.json`` — so ``NumpyMaskedLM``/``resolve_lm("numpy:<dir>")``
loads it through the same path a real pretrained checkpoint would
take. Weights are seeded random (PCG64), so two writes of the same
spec are byte-identical; the MODEL MATH exercised over them is the
real architecture (lm/numpy_lm.py), which is what benchmarks need: a
compute profile shaped like a genuine MLM forward (matmul-dominated),
unlike the hash-based fake backends whose per-row cost is trivial.
"""

from __future__ import annotations

import json
import os
import string

import numpy as np

from .safetensors_io import save_file

DEFAULT_WORDS = (
    "giraffe africa lion savanna kitchen table water people bird fly "
    "fish sing run walk city house tree river mountain music work play "
    "found located lives can you find typically something that"
).split()


def build_vocab_lines(extra_words: tuple[str, ...] = ()) -> list[str]:
    """Specials + full printable-char fallback (standalone and ``##``
    continuation forms, so EVERY word tokenizes without [UNK]) +
    punctuation + whole words."""
    lines = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    for c in string.ascii_lowercase + string.digits:
        lines.append(c)
        lines.append("##" + c)
    for c in ".,!?'\"-()":
        lines.append(c)
    seen = set(lines)
    for w in list(DEFAULT_WORDS) + sorted(set(extra_words)):
        w = w.lower()
        if w not in seen:
            lines.append(w)
            seen.add(w)
    return lines


def write_synth_checkpoint(
    path: str,
    *,
    dim: int = 64,
    n_layers: int = 2,
    n_heads: int = 2,
    hidden_dim: int = 128,
    max_position_embeddings: int = 128,
    vocab_words: tuple[str, ...] = (),
    seed: int = 7,
) -> str:
    """Write a loadable checkpoint dir; returns ``path``. Idempotent
    for a given spec (seeded weights, sorted vocab extension)."""
    os.makedirs(path, exist_ok=True)
    lines = build_vocab_lines(tuple(vocab_words))
    vocab = len(lines)
    with open(os.path.join(path, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    cfg = {
        "architectures": ["DistilBertForMaskedLM"],
        "dim": dim, "n_layers": n_layers, "n_heads": n_heads,
        "hidden_dim": hidden_dim, "vocab_size": vocab,
        "max_position_embeddings": max_position_embeddings,
        "do_lower_case": True,
        "synthetic": True,  # marks it as NOT pretrained weights
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)

    rng = np.random.Generator(np.random.PCG64(seed))

    def r(*shape):
        return (rng.standard_normal(shape) * 0.5).astype(np.float32)

    w = {
        "distilbert.embeddings.word_embeddings.weight": r(vocab, dim),
        "distilbert.embeddings.position_embeddings.weight":
            r(max_position_embeddings, dim),
        "distilbert.embeddings.LayerNorm.weight": np.ones(dim, np.float32),
        "distilbert.embeddings.LayerNorm.bias": r(dim),
        "vocab_transform.weight": r(dim, dim),
        "vocab_transform.bias": r(dim),
        "vocab_layer_norm.weight": np.ones(dim, np.float32),
        "vocab_layer_norm.bias": r(dim),
        "vocab_projector.weight": r(vocab, dim),
        "vocab_projector.bias": r(vocab),
    }
    for i in range(n_layers):
        p = f"distilbert.transformer.layer.{i}"
        w.update({
            f"{p}.attention.q_lin.weight": r(dim, dim),
            f"{p}.attention.q_lin.bias": r(dim),
            f"{p}.attention.k_lin.weight": r(dim, dim),
            f"{p}.attention.k_lin.bias": r(dim),
            f"{p}.attention.v_lin.weight": r(dim, dim),
            f"{p}.attention.v_lin.bias": r(dim),
            f"{p}.attention.out_lin.weight": r(dim, dim),
            f"{p}.attention.out_lin.bias": r(dim),
            f"{p}.sa_layer_norm.weight": np.ones(dim, np.float32),
            f"{p}.sa_layer_norm.bias": r(dim),
            f"{p}.ffn.lin1.weight": r(hidden_dim, dim),
            f"{p}.ffn.lin1.bias": r(hidden_dim),
            f"{p}.ffn.lin2.weight": r(dim, hidden_dim),
            f"{p}.ffn.lin2.bias": r(dim),
            f"{p}.output_layer_norm.weight": np.ones(dim, np.float32),
            f"{p}.output_layer_norm.bias": r(dim),
        })
    save_file(w, os.path.join(path, "model.safetensors"),
              metadata={"format": "pt", "synthetic": "true"})
    return path
