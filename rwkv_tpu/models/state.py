"""Recurrent-state management.

The reference exposes state as a caller-owned flat FP32 buffer
(rwkv.h:106-108); internally we keep a structured pytree of stacked per-layer
arrays (device-resident, shardable). This module defines the blank state
(rwkv_eval.inc:224-241) and lossless conversion to/from the reference's flat
layout, so checkpoints/state snapshots interoperate byte-for-byte:

per layer, v4:   [ffn_xx C][att_xx C][aa C][bb C][pp C]
per layer, v5+:  [ffn_xx C][att_xx C][heads H*S*S]  (heads[h,i,j], i=value
                 dim, j=key dim — rwkv_operators_wkv_v7.inc:71-98)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import ModelConfig

State = dict[str, jnp.ndarray]


def init_state(cfg: ModelConfig) -> State:
    l, c = cfg.n_layer, cfg.n_embed
    state: State = {
        "ffn_xx": jnp.zeros((l, c), jnp.float32),
        "att_xx": jnp.zeros((l, c), jnp.float32),
    }
    if cfg.version_major >= 5:
        h, s = cfg.head_count, cfg.head_size
        state["heads"] = jnp.zeros((l, h, s, s), jnp.float32)
    else:
        state["aa"] = jnp.zeros((l, c), jnp.float32)
        state["bb"] = jnp.zeros((l, c), jnp.float32)
        # v4 max-trick accumulator starts at -1e30 (rwkv_eval.inc:235-240).
        state["pp"] = jnp.full((l, c), -1e30, jnp.float32)
    return state


def state_to_flat(cfg: ModelConfig, state: State) -> np.ndarray:
    """Pack the structured state into the reference's flat FP32 layout."""
    l, c = cfg.n_layer, cfg.n_embed
    parts = [np.asarray(state["ffn_xx"]).reshape(l, c), np.asarray(state["att_xx"]).reshape(l, c)]
    if cfg.version_major >= 5:
        parts.append(np.asarray(state["heads"]).reshape(l, -1))
    else:
        parts.extend(np.asarray(state[k]).reshape(l, c) for k in ("aa", "bb", "pp"))
    return np.concatenate(parts, axis=1).reshape(-1)


def state_from_flat(cfg: ModelConfig, flat: np.ndarray) -> State:
    """Unpack a reference-layout flat state buffer into the structured form."""
    l, c = cfg.n_layer, cfg.n_embed
    rows = np.asarray(flat, dtype=np.float32).reshape(l, -1)
    state: State = {
        "ffn_xx": jnp.asarray(rows[:, :c]),
        "att_xx": jnp.asarray(rows[:, c : 2 * c]),
    }
    if cfg.version_major >= 5:
        h, s = cfg.head_count, cfg.head_size
        state["heads"] = jnp.asarray(rows[:, 2 * c :].reshape(l, h, s, s))
    else:
        state["aa"] = jnp.asarray(rows[:, 2 * c : 3 * c])
        state["bb"] = jnp.asarray(rows[:, 3 * c : 4 * c])
        state["pp"] = jnp.asarray(rows[:, 4 * c : 5 * c])
    return state
