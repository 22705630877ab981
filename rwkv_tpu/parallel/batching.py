"""Continuous batching: a device-resident pool of per-sequence recurrent
state slots and a scheduler that admits/evicts sequences between batched
decode steps.

The reference's concurrency story is `rwkv_clone_context` — one context per
concurrent sequence, each eval single-sequence (rwkv.cpp:123-139). RWKV's
O(1) per-sequence state makes the TPU-native design much stronger: all
sequences' states live in ONE stacked pytree [B, ...] on device, decode is
one batched jitted step for every active sequence, and admission is a
dynamic slot write. No KV-cache paging is needed — every sequence's state is
the same fixed size regardless of its length.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.utils.sampling import apply_penalties, sample_logits


def write_slot(batched_state: dict, slot: int, state: dict) -> dict:
    """Write a single-sequence state (leading dim 1) into slot `slot` of the
    batched state pytree."""
    return jax.tree.map(
        lambda pool, s: jax.lax.dynamic_update_index_in_dim(pool, s[0], slot, 0),
        batched_state,
        state,
    )


@dataclass
class Request:
    request_id: int
    prompt: List[int]
    max_new_tokens: int
    temperature: float = 1.0
    top_p: float = 0.8
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    stop_tokens: tuple = ()
    # -- filled during processing --
    generated: List[int] = field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    """Slot-based continuous batching over a ServingModel.

    Usage:
        batcher = ContinuousBatcher(model, max_batch=8)
        rid = batcher.submit(prompt_tokens, max_new_tokens=64)
        results = batcher.run()          # drain everything
    """

    def __init__(self, model: ServingModel, max_batch: int = 8, seed: int = 0):
        self.model = model
        self.max_batch = max_batch
        self.state = model.init_state(max_batch)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self._next_id = 0
        self._logits = np.zeros((max_batch, model.config.n_vocab), np.float32)
        self._rng = np.random.default_rng(seed)

    # -- submission -------------------------------------------------------
    def submit(
        self,
        prompt: List[int],
        max_new_tokens: int,
        **sampling,
    ) -> int:
        rid = self._next_id
        self._next_id += 1
        self.queue.append(Request(rid, list(prompt), max_new_tokens, **sampling))
        return rid

    # -- scheduling -------------------------------------------------------
    def _admit(self) -> None:
        """Prefill queued requests into free slots."""
        for slot in range(self.max_batch):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            logits, seq_state = self.model.prefill(req.prompt)
            self.state = write_slot(self.state, slot, seq_state)
            self._logits[slot] = np.asarray(logits)
            self.slots[slot] = req

    def _sample(self, req: Request, logits: np.ndarray) -> int:
        counts: Dict[int, int] = {}
        for t in req.generated:
            counts[t] = counts.get(t, 0) + 1
        logits = apply_penalties(
            logits, counts, req.presence_penalty, req.frequency_penalty
        )
        return sample_logits(
            logits, temperature=req.temperature, top_p=req.top_p, rng=self._rng
        )

    def step(self) -> List[Request]:
        """One scheduler iteration: admit, batched decode, sample, retire.
        Returns requests that finished this step."""
        self._admit()
        active = [i for i, r in enumerate(self.slots) if r is not None]
        if not active:
            return []

        tokens = np.zeros(self.max_batch, np.int32)
        for i in active:
            tokens[i] = self._sample(self.slots[i], self._logits[i])
            self.slots[i].generated.append(int(tokens[i]))

        logits, self.state = self.model.decode(tokens, self.state)
        self._logits = np.array(logits)  # writable copy

        done_now: List[Request] = []
        for i in active:
            req = self.slots[i]
            last = req.generated[-1]
            if len(req.generated) >= req.max_new_tokens or last in req.stop_tokens:
                req.done = True
                self.finished[req.request_id] = req
                self.slots[i] = None
                done_now.append(req)
        return done_now

    def run(self) -> Dict[int, Request]:
        """Drain the queue and all active slots; returns finished requests."""
        while self.queue or any(s is not None for s in self.slots):
            self.step()
        return self.finished

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self.slots)
