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

The decode loop runs ON DEVICE: sampling (temperature / nucleus / presence
+ frequency penalties, per slot) and the stop/length bookkeeping are part
of one jitted multi-step scan, and the host syncs once every `sync_every`
tokens instead of once per token (a host round-trip costs ~25 ms through
the TPU tunnel — many times the decode step itself). Admission prefill is
batched across queued prompts, grouped by shared power-of-two chunk
buckets, so K waiting prompts cost ~1 prefill instead of K.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.serve import PREFILL_BUCKETS, ServingModel
from rwkv_tpu.utils.sampling import (
    apply_penalties,
    device_penalized_logits,
    device_sample,
    sample_logits,
)


def write_slot(batched_state: dict, slot: int, state: dict) -> dict:
    """Write a single-sequence state (leading dim 1) into slot `slot` of the
    batched state pytree."""
    return jax.tree.map(
        lambda pool, s: jax.lax.dynamic_update_index_in_dim(pool, s[0], slot, 0),
        batched_state,
        state,
    )


def take_rows(tree, idx: np.ndarray):
    return jax.tree.map(lambda a: jnp.take(a, jnp.asarray(idx), axis=0), tree)


def scatter_rows(pool, tree, idx: np.ndarray):
    return jax.tree.map(
        lambda p, t: p.at[jnp.asarray(idx)].set(t), pool, tree
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

    `run()` drives the on-device loop (one host sync per `sync_every`
    tokens); `step()` is the single-token host-side path kept for
    fine-grained external schedulers.
    """

    # static top-k bound for the on-device nucleus sort (see device_sample);
    # exact for any nucleus that fits in this many tokens.
    DEVICE_TOP_K = 512

    def __init__(self, model: ServingModel, max_batch: int = 8, seed: int = 0,
                 sync_every: int = 8):
        self.model = model
        self.max_batch = max_batch
        self.sync_every = sync_every
        self.state = model.init_state(max_batch)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: List[Request] = []
        self.finished: Dict[int, Request] = {}
        self._next_id = 0
        self._logits = np.zeros((max_batch, model.config.n_vocab), np.float32)
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        # shared with the model so compiled scan fns survive batcher
        # re-instantiation (a fresh batcher on the same engine must not
        # pay the multi-step recompile)
        self._jit_cache: Dict[Any, Any] = model._jit_cache

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

    # -- admission --------------------------------------------------------
    def _admit(self) -> List[int]:
        """Move queued requests into free slots with BATCHED prefill:
        prompts are walked through the shared power-of-two chunk buckets,
        and every prompt needing the same chunk size this round runs in one
        batched call. Returns the admitted slot indices."""
        free = [i for i, r in enumerate(self.slots) if r is None]
        admit = []
        while free and self.queue:
            admit.append((free.pop(0), self.queue.pop(0)))
        if not admit:
            return []

        kn = len(admit)
        pool = self.model.init_state(kn)
        logits_rows = [None] * kn
        offs = [0] * kn
        lens = [len(req.prompt) for _, req in admit]

        while True:
            pending = [i for i in range(kn) if offs[i] < lens[i]]
            if not pending:
                break
            sizes = {}
            for i in pending:
                size = next(b for b in PREFILL_BUCKETS if b <= lens[i] - offs[i])
                sizes.setdefault(size, []).append(i)
            for size, group in sizes.items():
                toks = np.stack(
                    [admit[i][1].prompt[offs[i] : offs[i] + size] for i in group]
                ).astype(np.int32)
                last = [offs[i] + size >= lens[i] for i in group]
                # Pad the group to a power of two so distinct compiled batch
                # shapes stay O(log max_batch), not O(max_batch).
                g = len(group)
                g_pad = 1 << (g - 1).bit_length()
                idx = np.asarray(group + [group[0]] * (g_pad - g))
                if g_pad != g:
                    toks = np.concatenate(
                        [toks, np.zeros((g_pad - g, size), np.int32)]
                    )
                st = take_rows(pool, idx)
                logits, st = self.model._batched_fn(size, any(last))(
                    self.model.params, st, jnp.asarray(toks)
                )
                pool = scatter_rows(pool, take_rows(st, np.arange(g)),
                                    np.asarray(group))
                for gi, i in enumerate(group):
                    offs[i] += size
                    if last[gi]:
                        logits_rows[i] = logits[gi]

        admitted_slots = []
        for i, (slot, req) in enumerate(admit):
            row_state = take_rows(pool, np.asarray([i]))
            self.state = write_slot(self.state, slot, row_state)
            self._logits[slot] = np.asarray(logits_rows[i])
            self.slots[slot] = req
            admitted_slots.append(slot)
        return admitted_slots

    # -- single-token host path (kept for external schedulers) ------------
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

    # -- on-device multi-step loop ----------------------------------------
    def _multi_step_fn(self, n_steps: int, n_stop: int,
                       all_greedy: bool = False,
                       use_penalties: bool = True):
        # cached on the MODEL: the compiled multi-step scan (~12s at
        # 169M through the remote-compile tunnel) must survive batcher
        # re-instantiation — a fresh ContinuousBatcher on the same
        # ServingModel reuses it.
        # all_greedy / use_penalties are STATIC specializations computed
        # per sync round: when every active slot is temperature==0 the
        # sampler reduces to one argmax, and when no slot uses penalties
        # the [B, V] counts bookkeeping drops out of the scan entirely.
        key_cache = ("batcher-multi", self.max_batch, n_steps, n_stop,
                     self.DEVICE_TOP_K, all_greedy, use_penalties)
        if key_cache not in self._jit_cache:
            model = self.model
            cfg = model.config
            top_k = min(self.DEVICE_TOP_K, cfg.n_vocab)
            mm_force = model._mm_force

            pack_fn, step_fn, unpack_fn, loop_arrs = model.decode_loop_fns(
                self.max_batch
            )

            @jax.jit
            def run(params, loop_arrs, state, logits, counts, ctl, key):
                # ctl: dict of per-slot arrays — temperature, top_p,
                # presence, frequency [B] f32; remaining [B] i32;
                # active [B] bool; stops [B, n_stop] i32 (pad -1).
                from rwkv_tpu.ops.kernels import force_mode

                fm = force_mode(mm_force)
                fm.__enter__()  # trace-time; spans the scan below
                # Kernel-native state layout is carried ACROSS the scan:
                # pack once here, unpack once after (decode_loop_fns) —
                # not 2 state-sized layout moves per decoded token.
                ps = pack_fn(state)

                def step(carry, key_i):
                    ps, logits, counts, remaining, active = carry
                    if use_penalties:
                        pen = device_penalized_logits(
                            logits, counts, ctl["presence"], ctl["frequency"]
                        )
                    else:
                        pen = logits
                    if all_greedy:
                        tok = jnp.argmax(pen, axis=-1).astype(jnp.int32)
                    else:
                        tok = device_sample(
                            pen, ctl["temperature"], ctl["top_p"], key_i,
                            top_k,
                        )
                    tok = jnp.where(active, tok, 0)
                    if use_penalties:
                        counts = counts.at[
                            jnp.arange(tok.shape[0]), tok
                        ].add(active.astype(counts.dtype))
                    remaining = remaining - active.astype(jnp.int32)
                    hit_stop = jnp.any(tok[:, None] == ctl["stops"], axis=-1)
                    now_done = active & (hit_stop | (remaining <= 0))
                    emitted = active
                    active = active & ~now_done
                    logits, ps = step_fn(params, loop_arrs, ps, tok)
                    return (ps, logits, counts, remaining, active), (tok, emitted)

                keys = jax.random.split(key, n_steps + 1)
                carry = (ps, logits, counts, ctl["remaining"], ctl["active"])
                (ps, logits, counts, remaining, active), (toks, emitted) = (
                    jax.lax.scan(step, carry, keys[1:])
                )
                state = unpack_fn(ps)
                fm.__exit__(None, None, None)
                return (state, logits, counts, remaining, active,
                        toks.T, emitted.T, keys[0])

            self._jit_cache[key_cache] = (run, loop_arrs)
        return self._jit_cache[key_cache]

    def _run_device(self) -> None:
        # logits live ON DEVICE across sync rounds: a host round-trip of
        # the [B, V] block costs ~80 ms through the tunnel per sync and
        # is only needed for rows _admit just prefilled
        self._logits_dev = jnp.asarray(self._logits)
        try:
            self._run_device_loop()
        finally:
            # materialize the host snapshot even if the loop raises
            # mid-drain (device OOM, tunnel loss): self._logits_dev is
            # re-bound after each completed multi-step call, so the host
            # logits stay consistent with self.state and a subsequent
            # step() never samples from stale logits
            self._logits = np.array(self._logits_dev)

    def _run_device_loop(self) -> None:
        b = self.max_batch
        counts = jnp.zeros((b, self.model.config.n_vocab), jnp.float32)
        logits_dev = self._logits_dev
        while self.queue or any(s is not None for s in self.slots):
            admitted = self._admit()
            if admitted:
                # fresh sequences start with zero penalty counts
                counts = counts.at[jnp.asarray(admitted)].set(0.0)
                idx = np.asarray(admitted)
                logits_dev = logits_dev.at[jnp.asarray(idx)].set(
                    jnp.asarray(self._logits[idx])
                )

            reqs = list(self.slots)
            n_stop = max(
                [len(r.stop_tokens) for r in reqs if r is not None] + [1]
            )
            ctl = {
                "temperature": np.array(
                    [r.temperature if r else 1.0 for r in reqs], np.float32
                ),
                "top_p": np.array([r.top_p if r else 1.0 for r in reqs], np.float32),
                "presence": np.array(
                    [r.presence_penalty if r else 0.0 for r in reqs], np.float32
                ),
                "frequency": np.array(
                    [r.frequency_penalty if r else 0.0 for r in reqs], np.float32
                ),
                "remaining": np.array(
                    [r.max_new_tokens - len(r.generated) if r else 0 for r in reqs],
                    np.int32,
                ),
                "active": np.array([r is not None for r in reqs], bool),
                "stops": np.full((b, n_stop), -1, np.int32),
            }
            for i, r in enumerate(reqs):
                if r is not None and r.stop_tokens:
                    ctl["stops"][i, : len(r.stop_tokens)] = list(r.stop_tokens)

            live = [r for r in reqs if r is not None]
            fn, loop_arrs = self._multi_step_fn(
                self.sync_every, n_stop,
                all_greedy=all(r.temperature == 0.0 for r in live),
                use_penalties=any(
                    r.presence_penalty != 0.0 or r.frequency_penalty != 0.0
                    for r in live
                ),
            )
            (self.state, logits_dev, counts, _remaining, _active, toks,
             emitted, self._key) = fn(
                self.model.params, loop_arrs, self.state, logits_dev,
                counts, {k: jnp.asarray(v) for k, v in ctl.items()}, self._key,
            )
            self._logits_dev = logits_dev  # keep the recovery snapshot fresh
            # ONE (small) host sync for sync_every tokens: only the
            # [B, n_steps] token/emitted blocks transit the tunnel
            toks_h = np.asarray(toks)
            emitted_h = np.asarray(emitted)

            for i, req in enumerate(reqs):
                if req is None:
                    continue
                for t in range(toks_h.shape[1]):
                    if not emitted_h[i, t]:
                        break
                    req.generated.append(int(toks_h[i, t]))
                if (
                    len(req.generated) >= req.max_new_tokens
                    or (req.generated and req.generated[-1] in req.stop_tokens)
                ):
                    req.done = True
                    self.finished[req.request_id] = req
                    self.slots[i] = None
        # final host materialization happens in _run_device's finally

    def run(self, on_device: bool = True) -> Dict[int, Request]:
        """Drain the queue and all active slots; returns finished requests.
        on_device=True uses the multi-token jitted loop (one host sync per
        `sync_every` tokens); False falls back to per-token step()."""
        if on_device:
            self._run_device()
        else:
            while self.queue or any(s is not None for s in self.slots):
                self.step()
        return self.finished

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self.slots)
