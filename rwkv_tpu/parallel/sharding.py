"""GSPMD sharding rules for RWKV inference over a (data, model) mesh.

The reference's only cross-device story is whole-layer offload to one GPU
(rwkv.cpp:82-115). TPU-native replacement: tensor-parallel sharding of the
projection weights over the `model` mesh axis — Megatron-style column/row
pairing so each attention block needs a single all-reduce on its output
projection — and batch sharding of per-sequence recurrent state over `data`.

RWKV's per-head wkv state makes TP natural: r/k/v/gate projections are
column-sharded (out dim = heads x head_size), the wkv recurrence is
head-local (no communication), and att.output / ffn.value are row-sharded so
their matmuls consume the sharded activations and all-reduce once. XLA
inserts the psums via sharding propagation; collectives ride ICI.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_tpu.models.config import ModelConfig
from rwkv_tpu.ops.parity import Weight

# Column-parallel (shard output dim): produces head-sharded activations.
_COL_PARALLEL = {
    "att.key.weight",
    "att.value.weight",
    "att.receptance.weight",
    "att.gate.weight",
    "ffn.key.weight",
}
# Row-parallel (shard input dim): consumes head-sharded activations,
# all-reduces the result.
_ROW_PARALLEL = {
    "att.output.weight",
    "ffn.value.weight",
}


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, f"need {dp * tp} devices, have {len(devices)}"
    import numpy as np

    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def _weight_spec(key: str) -> P | None:
    if key in _COL_PARALLEL:
        return P("model", None)
    if key in _ROW_PARALLEL:
        return P(None, "model")
    return None


def _put_weight(w: Weight, mesh: Mesh, spec: P | None) -> Weight:
    if spec is None:
        spec = P()
    if w.kind == "dense":
        return Weight(kind="dense", w=jax.device_put(w.w, NamedSharding(mesh, spec)))
    # Quantized weights: q/d/m lead with the output dim; shard it the same
    # way (codes and scales travel together).
    out_spec = P(spec[0], None, None)
    scale_spec = P(spec[0], None)
    return Weight(
        kind="quant",
        q=jax.device_put(w.q, NamedSharding(mesh, out_spec)),
        d=jax.device_put(w.d, NamedSharding(mesh, scale_spec)),
        m=None if w.m is None else jax.device_put(w.m, NamedSharding(mesh, scale_spec)),
        q8_1_act=w.q8_1_act,
    )


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Place the parameter pytree on the mesh with TP sharding rules.
    Vectors and norm scales are replicated (they're tiny)."""
    rep = NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(x, rep)

    out = {
        "emb": place(params["emb"]),
        "ln0": jax.tree.map(place, params["ln0"]),
        "ln_out": jax.tree.map(place, params["ln_out"]),
        # head: column-shard over vocab — logits come out vocab-sharded and
        # are all-gathered only if the caller materializes them.
        "head": _put_weight(params["head"], mesh, P("model", None)),
        "blocks": [],
    }
    for layer in params["blocks"]:
        new_layer = {}
        for key, val in layer.items():
            if isinstance(val, Weight):
                new_layer[key] = _put_weight(val, mesh, _weight_spec(key))
            else:
                new_layer[key] = place(val)
        out["blocks"].append(new_layer)
    return out


def shard_state(state: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Shard batched recurrent state: batch dim over `data`, wkv head dim
    over `model` (heads are local to the TP shard that computes them).
    Expects arrays with a leading batch dim (from vmap)."""

    def spec_for(key, x):
        if key == "heads":  # [B, L, H, S, S]
            return P("data", None, "model", None, None)
        return P("data")

    return {
        k: jax.device_put(v, NamedSharding(mesh, spec_for(k, v))) for k, v in state.items()
    }
