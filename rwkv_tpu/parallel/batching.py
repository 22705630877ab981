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
    # fixed round cap for the fused whole-drain while_loop: ONE compile
    # serves every drain length (the loop exits early when all slots
    # finish; longer drains just re-dispatch). The token buffer is
    # [cap, sync_every, B] int32 — tiny.
    DRAIN_ROUNDS_CAP = 32

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
        self._ps = None  # kernel-native packed state (drain-loop carry)
        self._logits_stale = False  # host copy lags _logits_dev after runs
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
    def _admit(self, device_rows: bool = False):
        """Move queued requests into free slots with BATCHED prefill:
        prompts are walked through the shared power-of-two chunk buckets,
        and every prompt needing the same chunk size this round runs in one
        batched call. Returns the admitted slot indices; with
        device_rows=True, returns (slots, logits_rows) where logits_rows
        is a [k, V] DEVICE array (the device loop scatters it into its
        logits carry without a host round trip — a [V] download+upload
        per admission costs ~50 ms each through the remote tunnel)."""
        free = [i for i, r in enumerate(self.slots) if r is None]
        admit = []
        while free and self.queue:
            admit.append((free.pop(0), self.queue.pop(0)))
        if not admit:
            return ([], None) if device_rows else []

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
            if not device_rows:
                self._logits[slot] = np.asarray(logits_rows[i])
            self.slots[slot] = req
            admitted_slots.append(slot)
        if device_rows:
            return admitted_slots, (jnp.stack(logits_rows)
                                    if admitted_slots else None)
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
        if self._logits_stale:
            self._logits = np.array(self._logits_dev)
            self._logits_stale = False
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
            def run(params, loop_arrs, ps, logits, counts, remaining,
                    active, samp, key):
                # ps: KERNEL-NATIVE packed state, carried across sync
                # rounds (pack/unpack happen only at admission/drain —
                # see _pack_state_fn/_unpack_state_fn). remaining [B]
                # i32, active [B] bool and counts [B, V] are device
                # carries too: the host never re-uploads them. samp:
                # per-slot sampling ctl — temperature, top_p, presence,
                # frequency [B] f32; stops [B, n_stop] i32 (pad -1) —
                # uploaded only when admissions change it.
                from rwkv_tpu.ops.kernels import force_mode

                fm = force_mode(mm_force)
                fm.__enter__()  # trace-time; spans the scan below

                def step(carry, key_i):
                    ps, logits, counts, remaining, active = carry
                    if use_penalties:
                        pen = device_penalized_logits(
                            logits, counts, samp["presence"],
                            samp["frequency"],
                        )
                    else:
                        pen = logits
                    if all_greedy:
                        tok = jnp.argmax(pen, axis=-1).astype(jnp.int32)
                    else:
                        tok = device_sample(
                            pen, samp["temperature"], samp["top_p"], key_i,
                            top_k,
                        )
                    tok = jnp.where(active, tok, 0)
                    if use_penalties:
                        counts = counts.at[
                            jnp.arange(tok.shape[0]), tok
                        ].add(active.astype(counts.dtype))
                    remaining = remaining - active.astype(jnp.int32)
                    hit_stop = jnp.any(tok[:, None] == samp["stops"], axis=-1)
                    now_done = active & (hit_stop | (remaining <= 0))
                    emitted = active
                    active = active & ~now_done
                    logits, ps = step_fn(params, loop_arrs, ps, tok)
                    # one fused download per round: emitted tokens, -1
                    # where the slot was already inactive
                    return ((ps, logits, counts, remaining, active),
                            jnp.where(emitted, tok, -1))

                keys = jax.random.split(key, n_steps + 1)
                carry = (ps, logits, counts, remaining, active)
                (ps, logits, counts, remaining, active), tok_enc = (
                    jax.lax.scan(step, carry, keys[1:])
                )
                fm.__exit__(None, None, None)
                return (ps, logits, counts, remaining, active,
                        tok_enc.T, keys[0])

            self._jit_cache[key_cache] = (run, loop_arrs)
        return self._jit_cache[key_cache]

    def _pack_state_fn(self):
        key = ("batcher-pack", self.max_batch)
        if key not in self._jit_cache:
            pack_fn, _, unpack_fn, _ = self.model.decode_loop_fns(
                self.max_batch
            )
            self._jit_cache[key] = (jax.jit(pack_fn), jax.jit(unpack_fn))
        return self._jit_cache[key]

    def _drain_fn(self, n_rounds_cap: int, n_stop: int,
                  all_greedy: bool, use_penalties: bool):
        """Whole-drain device loop: a lax.while_loop over sync rounds
        (each an inner sync_every-step scan) that exits when every slot
        is done — ONE dispatch and ONE [B, cap*sync] token download for
        the entire drain segment. Through a remote-tunnel runtime a
        single dispatch costs ~100+ ms; per-round dispatching dominated
        the serving stack even with the pipelined loop.
        n_rounds_cap is bucketed by the caller (power of two) so
        compiles stay O(log max_tokens)."""
        n_steps = self.sync_every
        key_cache = ("batcher-drain", self.max_batch, n_steps,
                     n_rounds_cap, n_stop, self.DEVICE_TOP_K, all_greedy,
                     use_penalties)
        if key_cache not in self._jit_cache:
            model = self.model
            cfg = model.config
            top_k = min(self.DEVICE_TOP_K, cfg.n_vocab)
            mm_force = model._mm_force
            _, step_fn, _, loop_arrs = model.decode_loop_fns(self.max_batch)
            b = self.max_batch

            @jax.jit
            def run(params, loop_arrs, ps, logits, counts, remaining,
                    active, samp, key):
                from rwkv_tpu.ops.kernels import force_mode

                fm = force_mode(mm_force)
                fm.__enter__()

                def step(carry, key_i):
                    ps, logits, counts, remaining, active = carry
                    if use_penalties:
                        pen = device_penalized_logits(
                            logits, counts, samp["presence"],
                            samp["frequency"],
                        )
                    else:
                        pen = logits
                    if all_greedy:
                        tok = jnp.argmax(pen, axis=-1).astype(jnp.int32)
                    else:
                        tok = device_sample(
                            pen, samp["temperature"], samp["top_p"],
                            key_i, top_k,
                        )
                    tok = jnp.where(active, tok, 0)
                    if use_penalties:
                        counts = counts.at[
                            jnp.arange(b), tok
                        ].add(active.astype(counts.dtype))
                    remaining = remaining - active.astype(jnp.int32)
                    hit = jnp.any(tok[:, None] == samp["stops"], axis=-1)
                    emitted = active
                    active = active & ~(hit | (remaining <= 0))
                    logits, ps = step_fn(params, loop_arrs, ps, tok)
                    return ((ps, logits, counts, remaining, active),
                            jnp.where(emitted, tok, -1))

                buf0 = jnp.full((n_rounds_cap, n_steps, b), -1, jnp.int32)

                def round_body(carry):
                    r, ps, logits, counts, remaining, active, buf, key = carry
                    key, sub = jax.random.split(key)
                    keys = jax.random.split(sub, n_steps)
                    (ps, logits, counts, remaining, active), toks = (
                        jax.lax.scan(
                            step,
                            (ps, logits, counts, remaining, active),
                            keys,
                        )
                    )
                    buf = jax.lax.dynamic_update_slice_in_dim(
                        buf, toks[None], r, axis=0)
                    return (r + 1, ps, logits, counts, remaining, active,
                            buf, key)

                def round_cond(carry):
                    r, _ps, _l, _c, _rm, active, _buf, _k = carry
                    return (r < n_rounds_cap) & jnp.any(active)

                (r, ps, logits, counts, remaining, active, buf, key) = (
                    jax.lax.while_loop(
                        round_cond, round_body,
                        (jnp.int32(0), ps, logits, counts, remaining,
                         active, buf0, key),
                    )
                )
                fm.__exit__(None, None, None)
                # [B, cap*sync] round-major token stream per slot
                tok_all = jnp.transpose(buf, (2, 0, 1)).reshape(b, -1)
                return (ps, logits, counts, remaining, active, tok_all, key)

            self._jit_cache[key_cache] = (run, loop_arrs)
        return self._jit_cache[key_cache]

    def _run_device(self) -> None:
        # logits live ON DEVICE across sync rounds: a host round-trip of
        # the [B, V] block costs ~80 ms through the tunnel per sync and
        # is only needed for rows _admit just prefilled
        self._logits_dev = jnp.asarray(self._logits)
        self._ps = None
        try:
            self._run_device_loop()
        finally:
            # materialize the host snapshots even if the loop raises
            # mid-drain (device OOM, tunnel loss): self._logits_dev /
            # self._ps are re-bound after each completed multi-step call,
            # so the host state stays consistent and a subsequent step()
            # never samples from stale logits
            if self._ps is not None:
                _, unpack = self._pack_state_fn()
                self.state = unpack(self._ps)
                self._ps = None
            # the host logits copy is refreshed LAZILY (step() / the next
            # external reader): an eager [B, V] download costs ~50-80 ms
            # through the remote tunnel per drain
            self._logits_stale = True

    def _consume_round(self, reqs, tok_enc) -> None:
        """Fold one sync round's emitted tokens (single fused [B, n]
        download; -1 = slot inactive at that step) into the requests and
        retire finished slots."""
        toks_h = np.asarray(tok_enc)
        for i, req in enumerate(reqs):
            if req is None:
                continue
            for t in toks_h[i]:
                if t < 0:
                    break
                req.generated.append(int(t))
            if (
                len(req.generated) >= req.max_new_tokens
                or (req.generated and req.generated[-1] in req.stop_tokens)
            ):
                req.done = True
                self.finished[req.request_id] = req
                self.slots[i] = None

    def _run_device_loop(self) -> None:
        """Pipelined drain: ONE fused token download per sync round,
        overlapped with the NEXT round's device compute (the round k+1
        dispatch is issued before round k's download blocks — through a
        remote-tunnel runtime the transfer latency hides entirely behind
        the scan). remaining/active/counts and the kernel-native packed
        state are device carries across rounds; the host re-uploads only
        the per-slot sampling ctl, and only when admissions change it."""
        b = self.max_batch
        model = self.model
        pack, unpack = self._pack_state_fn()
        counts = jnp.zeros((b, model.config.n_vocab), jnp.float32)
        slots0 = list(self.slots)
        remaining = jnp.asarray(np.array(
            [r.max_new_tokens - len(r.generated) if r else 0 for r in slots0],
            np.int32))
        active = jnp.asarray(np.array([r is not None for r in slots0], bool))
        samp_dirty = True
        samp_dev = fn = loop_arrs = None
        pending = None  # (slots snapshot, tok_enc device array)

        while (self.queue or any(s is not None for s in self.slots)
               or pending is not None):
            # admissions (pending must be drained first: _admit writes
            # into the serving-layout state and changes the slot set)
            if (pending is None and self.queue
                    and any(s is None for s in self.slots)):
                if self._ps is not None:
                    self.state = unpack(self._ps)
                    self._ps = None
                admitted, rows_dev = self._admit(device_rows=True)
                if admitted:
                    idx = jnp.asarray(np.asarray(admitted))
                    counts = counts.at[idx].set(0.0)
                    self._logits_dev = self._logits_dev.at[idx].set(
                        rows_dev)
                    self._logits_stale = True
                    remaining = remaining.at[idx].set(jnp.asarray(np.array(
                        [self.slots[i].max_new_tokens for i in admitted],
                        np.int32)))
                    active = active.at[idx].set(True)
                    samp_dirty = True

            live = [r for r in self.slots if r is not None]
            if not live:
                if pending is not None:
                    self._consume_round(*pending)
                    pending = None
                continue

            if samp_dirty:
                reqs = list(self.slots)
                n_stop = max([len(r.stop_tokens) for r in live] + [1])
                stops = np.full((b, n_stop), -1, np.int32)
                for i, r in enumerate(reqs):
                    if r is not None and r.stop_tokens:
                        stops[i, : len(r.stop_tokens)] = list(r.stop_tokens)
                samp_dev = {
                    "temperature": jnp.asarray(np.array(
                        [r.temperature if r else 1.0 for r in reqs],
                        np.float32)),
                    "top_p": jnp.asarray(np.array(
                        [r.top_p if r else 1.0 for r in reqs], np.float32)),
                    "presence": jnp.asarray(np.array(
                        [r.presence_penalty if r else 0.0 for r in reqs],
                        np.float32)),
                    "frequency": jnp.asarray(np.array(
                        [r.frequency_penalty if r else 0.0 for r in reqs],
                        np.float32)),
                    "stops": jnp.asarray(stops),
                }
                flags = dict(
                    all_greedy=all(r.temperature == 0.0 for r in live),
                    use_penalties=any(
                        r.presence_penalty != 0.0
                        or r.frequency_penalty != 0.0 for r in live
                    ),
                )
                fn, loop_arrs = self._multi_step_fn(
                    self.sync_every, n_stop, **flags)
                samp_dirty = False

            if self._ps is None:
                self._ps = pack(self.state)

            if not self.queue and pending is None:
                # no admissions possible: fuse up to DRAIN_ROUNDS_CAP
                # sync rounds into one device while_loop — one dispatch
                # + one token download per segment (the loop exits early
                # when every slot finishes; longer drains re-dispatch)
                fnd, loop_arrs_d = self._drain_fn(
                    self.DRAIN_ROUNDS_CAP, n_stop, **flags)
                (self._ps, self._logits_dev, counts, remaining, active,
                 tok_all, self._key) = fnd(
                    model.params, loop_arrs_d, self._ps, self._logits_dev,
                    counts, remaining, active, samp_dev, self._key,
                )
                self._consume_round(list(self.slots), tok_all)
                continue

            (self._ps, self._logits_dev, counts, remaining, active,
             tok_enc, self._key) = fn(
                model.params, loop_arrs, self._ps, self._logits_dev,
                counts, remaining, active, samp_dev, self._key,
            )
            prev = pending
            pending = (list(self.slots), tok_enc)
            if prev is not None:
                # consume round k-1 while round k computes (async dispatch)
                self._consume_round(*prev)
            # keep one round in flight only while the host's bookkeeping
            # says some slot could still be active after it completes (a
            # slot with stop tokens may finish earlier — that costs at
            # most one idle speculative round)
            inflight_done = all(
                (r.max_new_tokens - len(r.generated)
                 - self.sync_every) <= 0
                for r in pending[0] if r is not None
            )
            if self.queue or inflight_done:
                self._consume_round(*pending)
                pending = None
        # final state/logits materialization happens in _run_device's
        # finally block

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
