"""Token sampling: temperature / top-p / top-k / logit bias, plus
presence & frequency penalties (capability surface of the reference's
python/sampling.py and chat front-end penalties, chat_with_bot.py).

Accepts numpy or JAX arrays; all math in numpy f32 on host (sampling is a
per-token host-side decision; the TPU produces the logits)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def sample_logits(
    logits,
    temperature: float = 1.0,
    top_p: float = 0.8,
    top_k: int = 0,
    logit_bias: Optional[Dict[int, float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> int:
    return sample_probs(
        softmax(np.asarray(logits, dtype=np.float32)),
        temperature=temperature,
        top_p=top_p,
        top_k=top_k,
        logit_bias=logit_bias,
        rng=rng,
    )


def sample_probs(
    probs: np.ndarray,
    temperature: float = 1.0,
    top_p: float = 0.8,
    top_k: int = 0,
    logit_bias: Optional[Dict[int, float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> int:
    if temperature < 0.0:
        raise ValueError("temperature must be >= 0")
    if not (0.0 <= top_p <= 1.0):
        raise ValueError("top_p must be in [0, 1]")
    probs = np.asarray(probs, dtype=np.float32).copy()

    if top_p == 0.0:  # reference quirk: 0 disables nucleus filtering
        top_p = 1.0

    if logit_bias:
        with np.errstate(divide="ignore"):
            logits = np.log(probs)
        ids = np.fromiter(logit_bias.keys(), dtype=np.int64)
        vals = np.fromiter(logit_bias.values(), dtype=np.float32)
        logits[ids] += vals
        logits -= logits.max()
        probs = np.exp(logits)
        probs /= probs.sum()

    if temperature == 0.0:
        return int(np.argmax(probs))

    if top_k > 0 and top_k < probs.size:
        kth = np.partition(probs, -top_k)[-top_k]
        probs[probs < kth] = 0.0

    if top_p < 1.0:
        sorted_probs = np.sort(probs)[::-1]
        cutoff_idx = int(np.argmax(np.cumsum(sorted_probs) > top_p))
        probs[probs < float(sorted_probs[cutoff_idx])] = 0.0

    if temperature != 1.0:
        probs = np.power(probs, 1.0 / temperature)

    probs /= probs.sum()
    rng = rng if rng is not None else np.random.default_rng()
    return int(rng.choice(probs.size, p=probs))


def apply_penalties(
    logits: np.ndarray,
    token_counts: Dict[int, int],
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
) -> np.ndarray:
    """Presence/frequency penalties as used by the chat front-end."""
    out = np.asarray(logits, dtype=np.float32).copy()
    for tok, count in token_counts.items():
        out[tok] -= presence_penalty + count * frequency_penalty
    return out
