"""Numeric scoring kernels (numpy, pure).

Combiner + softmax semantics of the reference orchestrator
(reference ``models/knowledge_harvester.py:66-83,111-134``), used both
on the driver (tiny arrays) and inside Arrow UDFs (vectorized).
"""

from __future__ import annotations

import numpy as np


def combine_mask_logprobs(logprobs: list[float] | np.ndarray, n_ents: int) -> float:
    """score = mean(token-wise mean, entity-wise mean, min).

    token-wise mean = sum/len(logprobs); entity-wise mean =
    sum/n_ents; min = min(logprobs).
    Reference ``models/knowledge_harvester.py:126-134``.
    """
    lp = np.asarray(logprobs, dtype=np.float64)
    token_wise = lp.sum() / lp.size
    ent_wise = lp.sum() / n_ents
    return float((token_wise + ent_wise + lp.min()) / 3.0)


def softmax(x: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax (scipy.special.softmax equivalent)."""
    x = np.asarray(x, dtype=np.float64)
    z = x - x.max()
    e = np.exp(z)
    return e / e.sum()


def softmax_clip_renorm(
    weights: np.ndarray | list[float], clip: float = 0.05
) -> np.ndarray:
    """Softmax-normalize, zero entries < ``clip``, renormalize.

    Reference ``models/knowledge_harvester.py:76-78`` (prompt weights).
    The caller additionally drops rows with final weight <= 1e-4
    (reference ``models/knowledge_harvester.py:82-83``).
    """
    w = softmax(np.asarray(weights, dtype=np.float64))
    w[w < clip] = 0.0
    s = w.sum()
    if s > 0:
        w = w / s
    return w


def prompt_compatibility(
    pos_mean: float, neg_mean: float, prompt_temp: float
) -> float:
    """(pos − 0.5·neg) / temp. Reference
    ``models/knowledge_harvester.py:66-70``."""
    return (pos_mean - 0.5 * neg_mean) / prompt_temp
