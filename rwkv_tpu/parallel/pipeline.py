"""Pipeline parallelism: GPipe-style microbatched stage execution.

SURVEY §2.6 marks PP optional for the reference (its analogue is the
heterogeneous layer offload, rwkv.cpp:82-115: first N layers on one GPU).
The TPU-native version is real pipeline parallelism: contiguous layer
ranges (stages) live on different devices of a `stage` mesh axis, a batch
is split into microbatches, and activations flow stage-to-stage with
`lax.ppermute` inside one `shard_map`-ped program. RWKV makes PP unusually
clean — per-layer recurrent state stays entirely inside its stage (no KV
broadcast), and the only cross-stage payload is the [T, Bm, C] activation
plus v7's v_first residual.

Schedule: M microbatches over S stages take M + S - 1 ticks; each tick,
stage s processes microbatch (tick - s) when it is in range. Bubble
fraction = (S-1)/(M+S-1) — choose M >= S for efficiency.

Scope: batched forward/prefill (v5+). For decode, one token must cross all
layers before the next token of the same sequence, so PP helps only with
many concurrent sequences — use the `data` axis for that instead (TP+DP
cover the decode scaling story; see parallel/sharding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_tpu.models.config import ModelConfig
from rwkv_tpu.ops.parity import layer_norm


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_stages
    return Mesh(np.asarray(devices[:n_stages]), axis_names=("stage",))


def shard_params_pp(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Place a stacked serving pytree for PP: blocks sharded over layers
    (dim 0) across `stage`; embedding/head/norms replicated (stage 0 uses
    emb, the last stage uses head — replication is simplest and they are
    read-only)."""
    n_stages = mesh.shape["stage"]
    assert cfg.n_layer % n_stages == 0, "n_layer must divide into stages"
    rep = NamedSharding(mesh, P())

    def place_block_leaf(x):
        spec = P("stage") if hasattr(x, "ndim") and x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {
        "emb": jax.device_put(params["emb"], rep),
        "ln0": jax.tree.map(lambda a: jax.device_put(a, rep), params["ln0"]),
        "ln_out": jax.tree.map(lambda a: jax.device_put(a, rep), params["ln_out"]),
        "head": jax.tree.map(lambda a: jax.device_put(a, rep), params["head"]),
        "blocks": jax.tree.map(place_block_leaf, params["blocks"]),
    }


def shard_state_pp(state: dict, mesh: Mesh) -> dict:
    """Layer-major state [L, B, ...]: layers sharded over `stage`."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P("stage")))
        for k, v in state.items()
    }


def pipeline_forward(
    params: dict,
    state: dict,
    tokens: jnp.ndarray,
    cfg: ModelConfig,
    mesh: Mesh,
    n_micro: int,
):
    """Microbatched pipelined forward (prefill/scoring) over `stage`.

    tokens: [T, B] time-major, B divisible by n_micro; state layer-major
    [L, B, ...]. Returns (logits [B, V], new_state) — identical (up to fp
    reduction order) to forward_stacked on one device.
    """
    from rwkv_tpu.models.serve import run_blocks
    from rwkv_tpu.models import graph as G
    from rwkv_tpu.ops.chunked import wkv6_auto, wkv7_auto

    major = cfg.version_major
    assert major >= 5, "pipeline_forward supports v5+"
    s_stages = mesh.shape["stage"]
    t_len, batch = tokens.shape
    assert batch % n_micro == 0
    bm = batch // n_micro
    l_local = cfg.n_layer // s_stages
    wkv_fn = None
    if t_len > 1:
        wkv_fn = wkv7_auto if major == 7 else wkv6_auto

    state_spec = {k: P("stage") for k in state}
    blocks_spec = jax.tree.map(lambda _: P("stage"), params["blocks"])
    params_spec = {
        "emb": P(), "ln0": jax.tree.map(lambda _: P(), params["ln0"]),
        "ln_out": jax.tree.map(lambda _: P(), params["ln_out"]),
        "head": jax.tree.map(lambda _: P(), params["head"]),
        "blocks": blocks_spec,
    }

    def stage_fn(params_l, state_l, tokens_l):
        stage = jax.lax.axis_index("stage")
        blocks_l = params_l["blocks"]
        n_ticks = n_micro + s_stages - 1

        def take_mb(tree, mb):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, mb * bm, bm, axis=1),
                tree,
            )

        def put_mb(tree, sub, mb):
            return jax.tree.map(
                lambda a, sm: jax.lax.dynamic_update_slice_in_dim(
                    a, sm, mb * bm, axis=1
                ),
                tree, sub,
            )

        def tick(t, carry):
            x_recv, vf_recv, st_loc, logits_acc = carry
            mb = t - stage
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            valid = (mb >= 0) & (mb < n_micro)

            toks_mb = jax.lax.dynamic_slice_in_dim(
                tokens_l, mb_c * bm, bm, axis=1
            )  # [T, Bm]
            x0 = layer_norm(
                params_l["emb"][toks_mb].astype(jnp.float32), *params_l["ln0"]
            )
            x_in = jnp.where(stage == 0, x0, x_recv)
            vf_in = jnp.where(stage == 0, jnp.zeros_like(x_in), vf_recv)

            x_out, vf_out, st_mb = run_blocks(
                blocks_l, take_mb(st_loc, mb_c), x_in, cfg,
                v_first=vf_in, layer_offset=stage * l_local, wkv_fn=wkv_fn,
            )
            st_loc = jax.tree.map(
                lambda old, new: jnp.where(valid, new, old),
                st_loc, put_mb(st_loc, st_mb, mb_c),
            )

            logits_mb = G.mm(
                layer_norm(x_out[-1], *params_l["ln_out"]), params_l["head"]
            )  # [Bm, V]
            write = valid & (stage == s_stages - 1)
            logits_acc = jax.lax.dynamic_update_slice_in_dim(
                logits_acc,
                jnp.where(write, logits_mb,
                          jax.lax.dynamic_slice_in_dim(
                              logits_acc, mb_c * bm, bm, axis=0)),
                mb_c * bm, axis=0,
            )

            # activations flow to the next stage (ring permute; the wrap
            # from the last stage is ignored by stage 0, which sources x0)
            perm = [(i, (i + 1) % s_stages) for i in range(s_stages)]
            x_next = jax.lax.ppermute(x_out, "stage", perm)
            vf_next = jax.lax.ppermute(vf_out, "stage", perm)
            return (x_next, vf_next, st_loc, logits_acc)

        x_buf = jnp.zeros((t_len, bm, cfg.n_embed), jnp.float32)
        logits0 = jnp.zeros((batch, cfg.n_vocab), jnp.float32)
        _, _, st_loc, logits = jax.lax.fori_loop(
            0, n_ticks, tick, (x_buf, jnp.zeros_like(x_buf), state_l, logits0)
        )
        # logits live on the last stage only; share them with every stage
        logits = jax.lax.psum(
            jnp.where(stage == s_stages - 1, logits, jnp.zeros_like(logits)),
            "stage",
        )
        return logits, st_loc

    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(params_spec, state_spec, P()),
        out_specs=(P(), state_spec),
        check_vma=False,
    )
    return fn(params, state, tokens)
