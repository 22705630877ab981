"""Chunked (matmul-form) wkv prefill.

The sequential wkv recurrence is O(T) tiny steps — fine for decode, but on
TPU prefill it leaves the MXU idle. Because the wkv5/6 state update is
elementwise-linear in the state, a chunk of T_c tokens can be processed
with dense matmuls (the chunked linear-attention / GLA formulation):

  within a chunk, with per-step decays w_t (elementwise over the key dim)
  and W_t = prod_{tau<=t} w_tau:

    out_t = (r_t * tf * k_t).sum * v_t                      (diagonal bonus)
          + S_0 @ (r_t o W_{t-1})                           (state read)
          + sum_{tau<t} [ (r_t o W_{t-1}/W_tau) . k_tau ] v_tau   (intra-chunk)

    S_next = S_0 o W_last + sum_tau (k_tau o W_last/W_tau) v_tau^T

  The intra-chunk term is a masked [T_c, T_c] attention matrix per head —
  pure MXU work. Decay products are handled in log space with chunk-local
  normalization so every exponent that reaches a matmul is <= 0 (the read
  factors) or clamped (the strictly-increasing local factors), keeping f32
  finite even for extreme decays.

wkv7's delta rule couples the state into the update (S' depends on S@a), so
it does not chunk this way; its chunked form (WY representation) is future
work — v7 prefill uses the scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chunk_body(s0, r, k, v, lw, tf):
    """One chunk. Shapes: r/k/v/lw [P, B, H, S]; s0 [B, H, S, S] (i=value
    dim, j=key dim); tf [H, S]. Returns (out [P, B, H, S], s_next)."""
    lcum = jnp.cumsum(lw, axis=0)          # inclusive log-decay products
    lcum_ex = lcum - lw                    # exclusive (through t-1)
    last = lcum[-1]                        # [B, H, S]

    q_state = r * jnp.exp(lcum_ex)         # <= |r|; reads S_0
    kappa = k * jnp.exp(last - lcum)       # factors <= 1

    # Intra-chunk attention with EXACT per-pair decay ratios. For causal
    # pairs (tau < t) the exponent lcum_ex[t] - lcum[tau] <= 0, so exp() is
    # unconditionally finite — no normalization point needed. Materializes
    # [P, P, B, H, S]; chunk sizes stay small (16) to bound it.
    p = r.shape[0]
    ldiff = jnp.minimum(lcum_ex[:, None] - lcum[None, :], 0.0)
    att = jnp.sum(r[:, None] * k[None, :] * jnp.exp(ldiff), axis=-1)  # [P,P,B,H]
    att = jnp.moveaxis(att, (0, 1), (2, 3))  # -> [B, H, t, u]
    mask = jnp.tril(jnp.ones((p, p), bool), k=-1)
    att = jnp.where(mask, att, 0.0)

    diag = jnp.sum(r * tf * k, axis=-1, keepdims=True)  # [P, B, H, 1]

    out = (
        jnp.einsum("bhtu,ubhi->tbhi", att, v)
        + diag * v
        + jnp.einsum("bhij,tbhj->tbhi", s0, q_state)
    )
    s_next = s0 * jnp.exp(last)[..., None, :] + jnp.einsum(
        "ubhj,ubhi->bhij", kappa, v
    )
    return out, s_next


def wkv6_chunked(s0, r, k, v, w, tf, chunk_size: int = 16):
    """Chunked wkv5/6. Shapes as wkv6_scan but time-major batched:
    r/k/v [T, B, H, S]; w [T, B, H, S] or [H, S] (static, v5);
    tf [H, S]; s0 [B, H, S, S]. T must be a multiple of chunk_size
    (callers pad or fall back to the scan)."""
    t = r.shape[0]
    if w.ndim == 2:
        w = jnp.broadcast_to(w, r.shape)
    # Guard against log(0) for extreme decays: w is exp(-exp(x)) > 0
    # mathematically but may underflow; floor keeps log finite.
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-38)))

    n_chunks = t // chunk_size

    def body(s, inp):
        rc, kc, vc, lwc = inp
        out, s = _chunk_body(s, rc, kc, vc, lwc, tf)
        return s, out

    def split(x):
        return x.reshape(n_chunks, chunk_size, *x.shape[1:])

    s, outs = jax.lax.scan(body, s0, (split(r), split(k), split(v), split(lw)))
    return outs.reshape(t, *r.shape[1:]), s


def wkv6_auto(s, r, k, v, w, tf, chunk_size: int = 16):
    """Dispatch: chunked matmul form when T is a chunk multiple and > 1,
    sequential scan otherwise. Accepts rank-3 ([T, H, S], single sequence)
    or rank-4 ([T, B, H, S]) operands like wkv6_scan."""
    from rwkv_tpu.models.graph import wkv6_scan

    t = r.shape[0]
    if t == 1 or t % chunk_size != 0:
        return wkv6_scan(s, r, k, v, w, tf)

    squeeze = r.ndim == 3
    if squeeze:
        r, k, v = r[:, None], k[:, None], v[:, None]
        if w.ndim == 3:
            w = w[:, None]
        s = s[None]
    y, s2 = wkv6_chunked(s, r, k, v, w, tf, chunk_size)
    if squeeze:
        return y[:, 0], s2[0]
    return y, s2
