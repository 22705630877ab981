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

wkv7's generalized delta rule couples the state into its own update
(S' = S o w + v k^T + (S a) b^T), so the plain linear-attention chunking
does not apply. Its chunked form here works on the DE-DECAYED state
T_t = S_t o (1/W_t): within a chunk the self-coupling reduces to a unit
lower-triangular linear system over the chunk's `sa_t = S_{t-1} a_t`
vectors, solved with one batched triangular solve per chunk; everything
else is masked [P, P] attention matmuls. wkv7's decay is bounded
(w = exp(-0.6065*sigmoid(.)) in [0.545, 1]), so the 1/W ratio factors are
at most e^{0.607 P} — comfortably finite in f32 for P <= 32.
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


# ---------------------------------------------------------------------------
# wkv7 (generalized delta rule)
# ---------------------------------------------------------------------------


def _chunk_body7(s0, r, w, k, v, a, b, lw):
    """One wkv7 chunk. Shapes: r/w/k/v/a/b/lw [P, B, H, S]; s0 [B, H, S, S]
    (i = value dim, j = key dim). Returns (out [P, B, H, S], s_next).

    Derivation (per head, de-decayed state T_t = S_t o 1/W_t, W_t the
    elementwise cumulative decay within the chunk):
      T_t = T_0 + sum_{tau<=t} (sa_tau btil_tau^T + v_tau ktil_tau^T)
      sa_t = T_{t-1} atil_t,   atil = a o W_{t-1},
      btil = b o (1/W), ktil = k o (1/W), rhat = r o W
      => (I - B_strict) sa = T_0 atil + K_strict v   (unit lower triangular)
      out_t = T_0 rhat_t + sum_{tau<=t} [sa_tau (btil_tau . rhat_t)
                                         + v_tau (ktil_tau . rhat_t)]
    """
    from jax.scipy.linalg import solve_triangular

    p = r.shape[0]
    lcum = jnp.cumsum(lw, axis=0)
    lcum_ex = lcum - lw

    atil = a * jnp.exp(lcum_ex)
    btil = b * jnp.exp(-lcum)
    ktil = k * jnp.exp(-lcum)
    rhat = r * jnp.exp(lcum)

    strict = jnp.tril(jnp.ones((p, p), bool), k=-1)
    incl = jnp.tril(jnp.ones((p, p), bool))

    bmat = jnp.where(strict, jnp.einsum("tbhj,ubhj->bhtu", atil, btil), 0.0)
    kmat = jnp.where(strict, jnp.einsum("tbhj,ubhj->bhtu", atil, ktil), 0.0)

    rhs = jnp.einsum("bhij,tbhj->tbhi", s0, atil) + jnp.einsum(
        "bhtu,ubhi->tbhi", kmat, v
    )
    # Solve (I - B) sa = rhs, batched over (B, H); unit lower triangular.
    eye = jnp.eye(p)
    sa = solve_triangular(
        eye - bmat,                      # [B, H, P, P]
        jnp.moveaxis(rhs, 0, 2),         # [B, H, P, S]
        lower=True,
        unit_diagonal=True,
    )
    sa = jnp.moveaxis(sa, 2, 0)          # [P, B, H, S]

    br = jnp.where(incl, jnp.einsum("tbhj,ubhj->bhtu", rhat, btil), 0.0)
    kr = jnp.where(incl, jnp.einsum("tbhj,ubhj->bhtu", rhat, ktil), 0.0)
    out = (
        jnp.einsum("bhij,tbhj->tbhi", s0, rhat)
        + jnp.einsum("bhtu,ubhi->tbhi", br, sa)
        + jnp.einsum("bhtu,ubhi->tbhi", kr, v)
    )

    t_last = (
        s0
        + jnp.einsum("ubhi,ubhj->bhij", sa, btil)
        + jnp.einsum("ubhi,ubhj->bhij", v, ktil)
    )
    s_next = t_last * jnp.exp(lcum[-1])[..., None, :]
    return out, s_next


def wkv7_chunked(s0, r, w, k, v, a, b, chunk_size: int = 16):
    """Chunked wkv7. Shapes as wkv7_scan but time-major batched:
    r/w/k/v/a/b [T, B, H, S]; s0 [B, H, S, S]. T must be a multiple of
    chunk_size."""
    t = r.shape[0]
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
    n_chunks = t // chunk_size

    def split(x):
        return x.reshape(n_chunks, chunk_size, *x.shape[1:])

    def body(s, inp):
        rc, wc, kc, vc, ac, bc, lwc = inp
        out, s = _chunk_body7(s, rc, wc, kc, vc, ac, bc, lwc)
        return s, out

    s, outs = jax.lax.scan(
        body, s0, (split(r), split(w), split(k), split(v), split(a), split(b), split(lw))
    )
    return outs.reshape(t, *r.shape[1:]), s


def wkv7_auto(s, r, w, k, v, a, b, chunk_size: int = 16):
    """Dispatch: chunked form when T is a chunk multiple and > 1, scan
    otherwise. Accepts rank-3 ([T, H, S]) or rank-4 ([T, B, H, S])."""
    from rwkv_tpu.models.graph import wkv7_scan

    t = r.shape[0]
    if t == 1 or t % chunk_size != 0:
        return wkv7_scan(s, r, w, k, v, a, b)

    squeeze = r.ndim == 3
    if squeeze:
        r, w, k, v, a, b = (x[:, None] for x in (r, w, k, v, a, b))
        s = s[None]
    y, s2 = wkv7_chunked(s, r, w, k, v, a, b, chunk_size)
    if squeeze:
        return y[:, 0], s2[0]
    return y, s2
