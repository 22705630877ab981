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

import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# Serving-engine sharding (stacked [L, ...] pytree from stack_layer_params)
# ---------------------------------------------------------------------------
#
# The throughput engine stacks per-layer params into [L, ...] arrays (and
# PackedQuantWeight leaves whose q/d/m lead with L) and scans over layers.
# TP rules are the same Megatron col/row pairing as the parity path, applied
# one axis deeper. This replaces the reference's whole-layer GPU offload
# (rwkv.cpp:82-115) with true tensor parallelism over the `model` mesh axis.

def _serving_dense_spec(key: str, ndim: int) -> P:
    if key == "att.rkv.weight":           # [L, 3, C, C] fused r/k/v: col
        return P(None, None, "model", None)
    if key in _COL_PARALLEL:              # [L, out, in]
        return P(None, "model", None)
    if key in _ROW_PARALLEL:              # [L, out, in] consumed as x @ W.T:
        return P(None, None, "model")     # shard the contracted in-dim
    return P()                            # loras, vectors, norms: replicated


def _serving_quant_specs(key: str, w) -> tuple[P, P]:
    """(q_spec, scale_spec) for a stacked PackedQuantWeight.

    Layout (kernels.py): q [L, k', out] (k' = k/2 if pack4), d [L, nb|1, out],
    m like d. Col-parallel shards `out` (the last dim of every leaf);
    row-parallel shards k' on q and the block dim of blockwise scales.
    """
    if key in _COL_PARALLEL or key == "head":
        return P(None, None, "model"), P(None, None, "model")
    if key in _ROW_PARALLEL:
        q_spec = P(None, "model", None)
        # rowwise scales are [L, 1, out] — nothing along k to shard.
        scale_spec = P() if w.rowwise else P(None, "model", None)
        return q_spec, scale_spec
    return P(), P()


def serving_param_specs(params: dict, cfg: ModelConfig):
    """PartitionSpec pytree matching a stack_layer_params() pytree."""
    from rwkv_tpu.ops.kernels import PackedQuantWeight

    def head_spec(w):
        if isinstance(w, PackedQuantWeight):
            # Head is NOT layer-stacked: q [k', V], d/m [nb|1, V]. Vocab-shard.
            s = P(None, "model")
            return PackedQuantWeight(
                q=s, d=s, m=None if w.m is None else s,
                pack4=w.pack4, signed4=w.signed4, rowwise=w.rowwise,
                int8_act=w.int8_act, n=w.n,
            )
        return P("model", None)  # [V, C] dense: vocab-shard

    def block_spec(key, val):
        if isinstance(val, PackedQuantWeight):
            q_spec, d_spec = _serving_quant_specs(key, val)
            return PackedQuantWeight(
                q=q_spec, d=d_spec, m=None if val.m is None else d_spec,
                pack4=val.pack4, signed4=val.signed4, rowwise=val.rowwise,
                int8_act=val.int8_act, n=val.n,
            )
        if isinstance(val, jnp.ndarray) and val.ndim >= 3 and key not in (
            "att.lora1", "att.lora2",
        ):
            return _serving_dense_spec(key, val.ndim)
        return P()

    return {
        "emb": P(),
        "ln0": jax.tree.map(lambda _: P(), params["ln0"]),
        "ln_out": jax.tree.map(lambda _: P(), params["ln_out"]),
        "head": head_spec(params["head"]),
        "blocks": {
            k: block_spec(k, v) for k, v in params["blocks"].items()
        },
    }


def shard_serving_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Place a stacked serving pytree on the mesh with TP rules.

    Sharding divisibility: the `model` axis size must divide head_count (for
    the wkv state) and every col-sharded out-dim / row-sharded in-dim; XLA
    would otherwise pad-and-mask, which breaks the quant block layout."""
    specs = serving_param_specs(params, cfg)
    flat_p, treedef = jax.tree.flatten(params)
    flat_s = jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    placed = [
        jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(flat_p, flat_s)
    ]
    return jax.tree.unflatten(treedef, placed)


def shard_serving_state(state: dict, mesh: Mesh) -> dict:
    """Serving state is batch-leading: [B, L, ...]. Batch over `data`, wkv
    heads over `model` (matching the col-sharded r/k/v projections). Axes
    whose size the mesh axis does not divide are replicated instead (e.g.
    a B=1 prefill state on a data=4 mesh)."""
    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1)

    def spec_for(key, x):
        b_ax = "data" if x.shape[0] % dp == 0 else None
        if key == "heads":  # [B, L, H, S, S]
            h_ax = "model" if x.shape[2] % tp == 0 else None
            return P(b_ax, None, h_ax, None, None)
        return P(b_ax)

    return {
        k: jax.device_put(v, NamedSharding(mesh, spec_for(k, v)))
        for k, v in state.items()
    }
