"""User-facing model API.

Mirrors the capability surface of the reference's `RWKVModel`
(/root/reference/python/rwkv_cpp/rwkv_cpp_model.py) and the C API it wraps
(rwkv.h: rwkv_eval / rwkv_eval_sequence / rwkv_eval_sequence_in_chunks /
rwkv_init_state / rwkv_clone_context), re-designed for JAX execution:

- Evaluation functions are jit-compiled once per sequence length and cached
  (the reference rebuilds its ggml graph whenever T changes,
  rwkv_eval.inc:112-120; here the compile cache plays that role).
- State is a structured pytree of device arrays rather than a caller-owned
  flat buffer; `init_state` / flat conversions are provided for parity.
- "Cloning a context" is free: state is a value, so independent sequences
  just hold independent state pytrees over the same (shared) params.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import ModelConfig
from rwkv_tpu.models.graph import forward
from rwkv_tpu.models.loader import load_params
from rwkv_tpu.models.state import State, init_state, state_from_flat, state_to_flat


class RWKVModel:
    def __init__(self, model_path: str):
        self.config, self.params = load_params(model_path)
        self._jit_cache: dict[tuple[int, bool], callable] = {}

    # -- metadata (rwkv.h getters) ---------------------------------------
    @property
    def n_vocab(self) -> int:
        return self.config.n_vocab

    @property
    def n_embed(self) -> int:
        return self.config.n_embed

    @property
    def n_layer(self) -> int:
        return self.config.n_layer

    @property
    def state_len(self) -> int:
        return self.config.state_len

    @property
    def logits_len(self) -> int:
        return self.config.n_vocab

    # -- state ------------------------------------------------------------
    def init_state(self) -> State:
        return init_state(self.config)

    def state_to_flat(self, state: State) -> np.ndarray:
        return state_to_flat(self.config, state)

    def state_from_flat(self, flat: np.ndarray) -> State:
        return state_from_flat(self.config, flat)

    # -- evaluation -------------------------------------------------------
    def _fn(self, t: int, compute_logits: bool):
        key = (t, compute_logits)
        if key not in self._jit_cache:
            cfg = self.config

            @partial(jax.jit, static_argnames=())
            def run(params, state, tokens):
                return forward(params, state, tokens, cfg, compute_logits=compute_logits)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def eval(self, token: int, state: Optional[State] = None, compute_logits: bool = True):
        """Process one token (the reference's serial mode, rwkv_eval.inc:38)."""
        return self.eval_sequence([token], state, compute_logits)

    def eval_sequence(
        self,
        tokens: Sequence[int],
        state: Optional[State] = None,
        compute_logits: bool = True,
    ):
        """Process a token sequence in one compiled step (sequence mode,
        rwkv_eval.inc:79). Returns (logits for the last token | None, state)."""
        if state is None:
            state = self.init_state()
        tokens = jnp.asarray(np.asarray(tokens, dtype=np.int32))
        logits, state = self._fn(int(tokens.shape[0]), compute_logits)(
            self.params, state, tokens
        )
        return logits, state

    def eval_sequence_in_chunks(
        self,
        tokens: Sequence[int],
        chunk_size: int = 16,
        state: Optional[State] = None,
        compute_logits: bool = True,
    ):
        """Chunked prefill (rwkv_eval.inc:158-221): bounds compiled-graph
        count to {chunk_size, remainder}; logits only on the last chunk."""
        tokens = np.asarray(tokens, dtype=np.int32)
        n = len(tokens)
        if n == 0:
            raise ValueError("Sequence length is 0")
        if state is None:
            state = self.init_state()
        logits = None
        pos = 0
        while pos < n:
            chunk = tokens[pos : pos + chunk_size]
            is_last = pos + chunk_size >= n
            logits, state = self.eval_sequence(
                chunk, state, compute_logits=compute_logits and is_last
            )
            pos += chunk_size
        return logits, state
