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

from typing import List, Optional, Sequence, Tuple

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
