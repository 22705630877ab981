"""Token sampling: temperature / top-p / top-k / logit bias, plus
presence & frequency penalties (capability surface of the reference's
python/sampling.py and chat front-end penalties, chat_with_bot.py).

Two implementations of the same semantics:
- numpy host-side (`sample_logits`/`sample_probs`) for per-token decisions;
- jittable batched device-side (`device_sample`, `device_penalized_logits`)
  for the continuous batcher's on-device decode loop, where a host
  round-trip per token would cost more than the decode step itself.

The reference applies temperature to PROBABILITIES after the nucleus filter
(probs ** (1/T), sampling.py:42-50) — both paths reproduce that, not the
more common logits/T."""

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


def device_penalized_logits(logits, counts, presence, frequency):
    """Batched jittable presence/frequency penalties.

    logits [B, V] f32; counts [B, V] (per-sequence emitted-token counts);
    presence/frequency [B]. Same math as apply_penalties."""
    import jax.numpy as jnp

    return (
        logits
        - (counts > 0).astype(jnp.float32) * presence[:, None]
        - counts.astype(jnp.float32) * frequency[:, None]
    )


def device_sample(logits, temperature, top_p, key, top_k: int = 0):
    """Batched jittable sampler matching sample_probs' semantics.

    logits [B, V]; temperature/top_p [B] (top_p 0 disables nucleus
    filtering, temperature 0 = argmax, both per row); key a PRNG key.
    top_k is STATIC: 0 = exact full-vocab nucleus sort; k > 0 restricts the
    nucleus to the k most probable tokens first (exact whenever the nucleus
    fits in k; bounds the per-step sort cost to k on large vocabs).
    Returns int32 tokens [B].
    """
    import jax
    import jax.numpy as jnp

    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)

    if top_k and top_k < v:
        # k-domain path: ALL post-top-k work (nucleus cutoff, temperature,
        # categorical) runs on [B, k], not [B, V]. lax.top_k returns values
        # sorted descending, so no further sort is needed; the true
        # full-vocab probabilities of the kept tokens come from one
        # logsumexp reduction. A [B, 65536] f32 sort + full-vocab gumbel
        # per scan step dominated the batcher's decode overhead
        # (scripts/probe_batcher_overhead.py).
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        vals, idx = jax.lax.top_k(logits, top_k)        # [B, k] descending
        probs = jnp.exp(vals - lse)                     # true probs, desc
        greedy = idx[:, 0].astype(jnp.int32)

        top_p_eff = jnp.where(top_p == 0.0, 1.0, top_p)[:, None]
        exceeded = jnp.cumsum(probs, axis=-1) > top_p_eff
        cut_idx = jnp.argmax(exceeded, axis=-1)  # first True (0 if none)
        cutoff = jnp.take_along_axis(probs, cut_idx[:, None], axis=-1)
        cutoff = jnp.where(top_p_eff >= 1.0, -1.0, cutoff)
        probs = jnp.where(probs < cutoff, 0.0, probs)

        safe_t = jnp.maximum(temperature, 1e-6)[:, None]
        logp = jnp.where(probs > 0.0,
                         jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
        s = jax.random.categorical(key, logp / safe_t, axis=-1)
        sampled = jnp.take_along_axis(idx, s[:, None], axis=-1)[:, 0]
        return jnp.where(temperature <= 0.0, greedy,
                         sampled.astype(jnp.int32))

    probs = jax.nn.softmax(logits, axis=-1)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    top_p_eff = jnp.where(top_p == 0.0, 1.0, top_p)[:, None]
    sorted_desc = jnp.flip(jnp.sort(probs, axis=-1), axis=-1)
    exceeded = jnp.cumsum(sorted_desc, axis=-1) > top_p_eff
    cut_idx = jnp.argmax(exceeded, axis=-1)  # first True (0 if none)
    cutoff = jnp.take_along_axis(sorted_desc, cut_idx[:, None], axis=-1)
    cutoff = jnp.where(top_p_eff >= 1.0, -1.0, cutoff)
    probs = jnp.where(probs < cutoff, 0.0, probs)

    # temperature on probabilities (reference semantics), in log space for
    # categorical(): log(p^(1/T)) = log(p)/T; zeroed entries -> -inf.
    safe_t = jnp.maximum(temperature, 1e-6)[:, None]
    logp = jnp.where(probs > 0.0, jnp.log(jnp.maximum(probs, 1e-38)), -jnp.inf)
    sampled = jax.random.categorical(key, logp / safe_t, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


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
