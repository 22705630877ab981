"""Speculative decoding: a small draft model proposes k tokens, the target
verifies them in ONE sequence-mode pass.

Why this wins on TPU: single-stream decode is weight-stream-bound (the
whole model's weights cross HBM once PER TOKEN; see docs/STATUS.md hardware
walls). Sequence-mode verification reads the weights once per k-token
round, so accepted tokens amortize the target's weight traffic: per round
the target runs one k-token scoring pass plus one <=k-token state-roll
pass, instead of j serial steps — a win whenever the draft is cheap and
acceptance j averages >= 2.

RWKV specifics: the recurrent state cannot be rolled back, so the scoring
pass runs on a THROWAWAY state copy; after acceptance of a j-prefix the
committed state advances via a j-token prefix pass (states are O(1), so
both passes are pure sequence evals — no KV-cache surgery, the part that
makes speculative decoding painful for attention models).

Greedy verification preserves the target's exact greedy output
(tests/test_speculative.py asserts equality), matching the reference's
deterministic temperature-0 sampling semantics (sampling.py:48-50).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from rwkv_tpu.models.serve import ServingModel


def speculative_generate(
    target: ServingModel,
    draft: ServingModel,
    prompt_tokens: Sequence[int],
    n_tokens: int,
    k: int = 4,
) -> Tuple[np.ndarray, dict]:
    """Greedy speculative generation.

    Returns (tokens [n_tokens], stats) where stats records rounds and the
    acceptance rate. Output is identical to `target`'s greedy decode.
    """
    logits_t, state_t = target.prefill(list(prompt_tokens))
    _, state_d = draft.prefill(list(prompt_tokens))

    out: List[int] = []
    n_rounds = 0
    n_drafted = 0
    n_accepted = 0
    pred_t = int(np.argmax(np.asarray(logits_t)))  # target's next token

    while len(out) < n_tokens:
        # The target's own next token is already known exactly (greedy) —
        # emit it, then ask the draft to continue k tokens further.
        out.append(pred_t)
        if len(out) >= n_tokens:
            break
        n_rounds += 1

        # 1. draft proposes k tokens serially, starting from pred_t.
        draft_toks = []
        d_state = state_d
        tok = pred_t
        for _ in range(k):
            d_logits, d_state = draft.decode(np.array([tok], np.int32), d_state)
            tok = int(np.argmax(np.asarray(d_logits[0])))
            draft_toks.append(tok)
        n_drafted += k

        # 2. target scores [pred_t, draft_toks[:-1]] in one pass on a
        # throwaway state: logits at position i predict position i+1.
        seq = np.array([[pred_t] + draft_toks[:-1]], np.int32)  # [1, k]
        logits_seq, _ = target.score(seq, state_t)
        greedy = np.argmax(np.asarray(logits_seq[0]), axis=-1)  # [k]

        # 3. longest accepted prefix; the first mismatch is REPLACED by the
        # target's own choice (still exactly the target's greedy stream).
        j = 0
        while j < k and draft_toks[j] == int(greedy[j]):
            j += 1
        accepted = draft_toks[:j]
        n_accepted += j
        next_pred = int(greedy[j]) if j < k else None

        # 4. commit: roll both models' states over the accepted round
        # (pred_t + accepted) with prefix passes.
        committed = [pred_t] + accepted
        logits_t, state_t = target.prefill(committed, state=state_t)
        _, state_d = draft.prefill(committed, state=state_d)

        out.extend(accepted[: n_tokens - len(out)])
        if len(out) >= n_tokens:
            break
        # next target token: known from verification on mismatch, else from
        # the committed-state logits.
        pred_t = next_pred if next_pred is not None else int(
            np.argmax(np.asarray(logits_t))
        )

    stats = {
        "rounds": n_rounds,
        "drafted": n_drafted,
        "accepted": n_accepted,
        "acceptance_rate": (n_accepted / n_drafted) if n_drafted else 1.0,
    }
    return np.asarray(out[:n_tokens], np.int32), stats


# ---------------------------------------------------------------------------
# Fully on-device speculative loop
# ---------------------------------------------------------------------------

def _model_sig(m: ServingModel) -> tuple:
    """Semantic cache signature: everything the jitted closure captures
    from a model besides its (passed-as-argument) params. id()-keying
    would break on id reuse after GC."""
    cfg = m.config
    return (cfg.version_major, cfg.version_minor, cfg.n_layer,
            cfg.n_embed, cfg.n_vocab, cfg.head_size, m.precision,
            m._mm_force)


def speculative_generate_device(
    target: ServingModel,
    draft: ServingModel,
    prompt_tokens: Sequence[int],
    n_tokens: int,
    k: int = 4,
    force_accept: bool = False,
) -> Tuple[np.ndarray, dict]:
    """Greedy speculative generation with the ENTIRE round loop on device
    (one host sync for the whole generation, vs ~3k+2 syncs/round for the
    host loop above — each sync costs ~25 ms through this environment's
    tunnel, and is never free in production).

    Per round, inside one jitted lax.while_loop iteration:
      1. the draft runs k+1 sequential steps (collecting its per-step
         states as scan outputs),
      2. the target scores seq = [pred, d_1..d_k] in ONE sequence pass
         that also emits the state after every position
         (forward_stacked_trace) — because the scored tokens ARE the
         committed tokens for any accepted prefix, the commit state is a
         single gather trace[:, j]: no prefix-replay pass at all,
      3. the accepted length j and the replacement token come from device
         argmax/cumprod math, and the emitted window is written into a
         fixed output buffer at a dynamic offset (positions beyond the
         accepted prefix are overwritten by the next round's window).

    Output is identical to `target`'s greedy decode (tests assert this).
    Works for every architecture (the trace path covers v4-v7); the
    draft can likewise be any architecture."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import forward_stacked, forward_stacked_trace
    from rwkv_tpu.ops.kernels import force_mode

    logits_t, state_t = target.prefill(list(prompt_tokens))
    _, state_d = draft.prefill(list(prompt_tokens))
    pred0 = jnp.argmax(jnp.asarray(logits_t), -1).astype(jnp.int32)

    t_cfg, d_cfg = target.config, draft.config
    t_force, d_force = target._mm_force, draft._mm_force
    n_cap = n_tokens + k + 2
    # cached on the TARGET model (bounded lifetime), keyed semantically
    key = ("specdev", _model_sig(target), _model_sig(draft), n_tokens, k,
           force_accept)

    if key not in target._jit_cache:

        @jax.jit
        def run(t_params, d_params, state_t, state_d, pred):
            state_t = jax.tree.map(lambda a: a[0], state_t)
            state_d = jax.tree.map(lambda a: a[0], state_d)

            def cond(carry):
                return carry[4] < n_tokens

            def body(carry):
                state_t, state_d, pred, buf, count, rounds, acc = carry

                def dstep(c, _):
                    st, tok = c
                    with force_mode(d_force):
                        logits, st2 = forward_stacked(
                            d_params, st, tok[None], d_cfg
                        )
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    return (st2, nxt), (nxt, st2)

                (_, _), (draft_toks, d_states) = jax.lax.scan(
                    dstep, (state_d, pred), None, length=k + 1
                )
                seq = jnp.concatenate([pred[None], draft_toks[:k]])

                with force_mode(t_force):
                    logits_all, trace = forward_stacked_trace(
                        t_params, state_t, seq, t_cfg
                    )
                greedy = jnp.argmax(logits_all, -1).astype(jnp.int32)

                matches = (greedy[:k] == draft_toks[:k]).astype(jnp.int32)
                j = jnp.sum(jnp.cumprod(matches))
                if force_accept:
                    # BENCHMARK-ONLY knob: pretend every drafted token
                    # was accepted. Output is NOT the target's greedy
                    # chain; this measures the end-to-end acceptance=1
                    # throughput ceiling of the round machinery with a
                    # real (cheap) draft — random synth weight pairs
                    # have ~0 natural acceptance, so the honest perf
                    # story is the measured [random, forced] bracket
                    # plus the component-derived crossover.
                    j = jnp.int32(k)

                state_t = jax.tree.map(lambda a: a[:, j], trace)
                state_d = jax.tree.map(lambda a: a[j], d_states)

                buf = jax.lax.dynamic_update_slice(buf, seq, (count,))
                return (state_t, state_d, greedy[j], buf, count + j + 1,
                        rounds + 1, acc + j)

            buf0 = jnp.zeros((n_cap,), jnp.int32)
            out = jax.lax.while_loop(
                cond,
                body,
                (state_t, state_d, pred,
                 buf0, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            )
            _, _, _, buf, count, rounds, acc = out
            return buf, count, rounds, acc

        target._jit_cache[key] = run

    buf, count, rounds, acc = target._jit_cache[key](
        target.params, draft.params, state_t, state_d, pred0
    )
    buf = np.asarray(buf)
    n_rounds = int(rounds)
    n_acc = int(acc)
    stats = {
        "rounds": n_rounds,
        "drafted": n_rounds * k,
        "accepted": n_acc,
        "acceptance_rate": (n_acc / (n_rounds * k)) if n_rounds else 1.0,
    }
    return buf[:n_tokens].astype(np.int32), stats


# ---------------------------------------------------------------------------
# Speculative SAMPLING (temperature > 0): Leviathan-style rejection
# ---------------------------------------------------------------------------


def _spec_accept(probs_t, probs_d, draft_toks, key):
    """One round of speculative rejection sampling (device math).

    probs_t [k+1, V]: target probs at positions 0..k (position i is the
    distribution of token i+1 given the committed prefix + d_1..d_i);
    probs_d [k, V]: draft probs the k proposals were drawn from;
    draft_toks [k]. Returns (j, next_token): j = accepted proposal count
    in [0, k]; next_token is drawn from the residual max(0, p_t - p_d)
    at the rejection position, or from probs_t[k] when all k accepted —
    the emitted stream is distributed EXACTLY as target-only sampling
    (Leviathan et al., arXiv:2211.17192)."""
    import jax
    import jax.numpy as jnp

    k = draft_toks.shape[0]
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (k,))
    pt_tok = jnp.take_along_axis(
        probs_t[:k], draft_toks[:, None], axis=-1
    )[:, 0]
    pd_tok = jnp.take_along_axis(
        probs_d, draft_toks[:, None], axis=-1
    )[:, 0]
    ratio = pt_tok / jnp.maximum(pd_tok, 1e-30)
    accept = (u < ratio).astype(jnp.int32)
    j = jnp.sum(jnp.cumprod(accept))

    # residual distribution at the rejection position (row j; when all
    # accepted, j == k and the "residual" is just probs_t[k])
    p_t_j = probs_t[j]
    p_d_j = jnp.where(
        j < k,
        probs_d[jnp.minimum(j, k - 1)],
        jnp.zeros_like(p_t_j),
    )
    resid = jnp.maximum(p_t_j - p_d_j, 0.0)
    resid = resid / jnp.maximum(jnp.sum(resid), 1e-30)
    next_tok = jax.random.categorical(kr, jnp.log(resid + 1e-38))
    return j, next_tok.astype(jnp.int32)


def speculative_sample_generate_device(
    target: ServingModel,
    draft: ServingModel,
    prompt_tokens: Sequence[int],
    n_tokens: int,
    k: int = 4,
    temperature: float = 1.0,
    seed: int = 0,
) -> Tuple[np.ndarray, dict]:
    """Temperature>0 speculative generation, fully on device: the
    emitted stream follows the TARGET's sampling distribution exactly
    (rejection sampling over draft proposals; _spec_accept). Same
    single-sync round structure as speculative_generate_device."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import forward_stacked, forward_stacked_trace
    from rwkv_tpu.ops.kernels import force_mode

    assert temperature > 0.0, "use speculative_generate_device for greedy"
    logits_t, state_t = target.prefill(list(prompt_tokens))
    _, state_d = draft.prefill(list(prompt_tokens))

    t_cfg, d_cfg = target.config, draft.config
    t_force, d_force = target._mm_force, draft._mm_force
    inv_t = 1.0 / float(temperature)
    n_cap = n_tokens + k + 2
    key = ("specdev_sample", _model_sig(target), _model_sig(draft),
           n_tokens, k, float(temperature))

    if key not in target._jit_cache:

        @jax.jit
        def run(t_params, d_params, state_t, state_d, logits0, rng):
            state_t = jax.tree.map(lambda a: a[0], state_t)
            state_d = jax.tree.map(lambda a: a[0], state_d)
            rng, k0 = jax.random.split(rng)
            pred0 = jax.random.categorical(
                k0, logits0 * inv_t
            ).astype(jnp.int32)

            def cond(carry):
                return carry[4] < n_tokens

            def body(carry):
                state_t, state_d, pred, buf, count, rounds, acc, rng = carry
                rng, k_d, k_a = jax.random.split(rng, 3)

                def dstep(c, kk):
                    st, tok = c
                    with force_mode(d_force):
                        logits, st2 = forward_stacked(
                            d_params, st, tok[None], d_cfg
                        )
                    probs = jax.nn.softmax(logits * inv_t)
                    nxt = jax.random.categorical(
                        kk, logits * inv_t
                    ).astype(jnp.int32)
                    return (st2, nxt), (nxt, probs, st2)

                (_, _), (draft_toks, probs_d, d_states) = jax.lax.scan(
                    dstep, (state_d, pred),
                    jax.random.split(k_d, k + 1),
                )
                seq = jnp.concatenate([pred[None], draft_toks[:k]])

                with force_mode(t_force):
                    logits_all, trace = forward_stacked_trace(
                        t_params, state_t, seq, t_cfg
                    )
                probs_t = jax.nn.softmax(logits_all * inv_t)

                j, nxt = _spec_accept(
                    probs_t, probs_d[:k], draft_toks[:k], k_a
                )

                state_t = jax.tree.map(lambda a: a[:, j], trace)
                state_d = jax.tree.map(lambda a: a[j], d_states)

                buf = jax.lax.dynamic_update_slice(buf, seq, (count,))
                return (state_t, state_d, nxt, buf, count + j + 1,
                        rounds + 1, acc + j, rng)

            buf0 = jnp.zeros((n_cap,), jnp.int32)
            out = jax.lax.while_loop(
                cond,
                body,
                (state_t, state_d, pred0,
                 buf0, jnp.int32(0), jnp.int32(0), jnp.int32(0), rng),
            )
            _, _, _, buf, count, rounds, acc, _ = out
            return buf, count, rounds, acc

        target._jit_cache[key] = run

    buf, count, rounds, acc = target._jit_cache[key](
        target.params, draft.params, state_t, state_d,
        jnp.asarray(logits_t), jax.random.PRNGKey(seed),
    )
    buf = np.asarray(buf)
    n_rounds = int(rounds)
    n_acc = int(acc)
    stats = {
        "rounds": n_rounds,
        "drafted": n_rounds * k,
        "accepted": n_acc,
        "acceptance_rate": (n_acc / (n_rounds * k)) if n_rounds else 1.0,
    }
    return buf[:n_tokens].astype(np.int32), stats
