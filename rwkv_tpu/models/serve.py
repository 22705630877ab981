"""Serving path: TPU-optimized execution of RWKV models.

Where `rwkv_tpu.models.model.RWKVModel` is the numerics-parity engine, this
module is the throughput engine:

- Weights are dequantized once at load into dense bf16 (or f32) arrays —
  matmuls hit the MXU as bf16 x bf16 -> f32. (A Pallas fused dequant-matmul
  path that keeps weights packed in HBM lives in rwkv_tpu.ops.kernels.)
- Layers are STACKED and executed with `lax.scan` — one compiled layer body
  regardless of depth (the reference builds an O(L) ggml graph per eval;
  XLA compile time here is O(1) in depth).
- Batch is a NATIVE axis (time-major [T, B, C] activations, no vmap): the
  batched decode step compiles to single large MXU matmuls across the whole
  batch, which is what continuous batching runs on.
- Prefill uses power-of-two chunk buckets: any T is decomposed into at most
  log2(T) compiled chunk sizes, so recompiles are bounded without padding
  or masking (the reference instead rebuilds its graph per T,
  rwkv_eval.inc:112-120).
- `generate` runs the whole sample-eval-append loop on device inside one
  jit (lax.scan + jax.random.categorical) — no per-token host round-trip.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.models.config import ModelConfig
from rwkv_tpu.models import graph as G
from rwkv_tpu.models.loader import load_params
from rwkv_tpu.models.state import init_state
from rwkv_tpu.ops.parity import Weight, group_norm, l2_normalize, layer_norm

# Prefill chunk buckets, largest first. Any sequence length is greedily
# decomposed, so at most len(BUCKETS) distinct graphs are ever compiled.
PREFILL_BUCKETS = (256, 64, 16, 4, 1)

# Batched-megakernel routing. The wkv state blocks pad their lane dim
# (batch) to 128, so the kernel's step time is FLAT in B up to 128
# (measured: 2.42 ms at B=8/32/64 at 169M, scripts/bench_mega_batched.py)
# — which also means the per-op XLA path wins at small batch (0.85 ms at
# B=8) and the kernel wins once the flat cost is amortized (B=64: +48%).
# choose_tiling keeps the head-tile VMEM bounded for B > 128.
MEGA_MAX_BATCH = 256


def _densify(w, dtype):
    """Weight leaf -> dense array in serving dtype."""
    if isinstance(w, Weight):
        if w.kind == "dense":
            arr = w.w.astype(jnp.float32)
        else:
            arr = w.q.astype(jnp.float32) * w.d[..., None]
            if w.m is not None:
                arr = arr + w.m[..., None]
            arr = arr.reshape(w.q.shape[0], -1)
        return arr.astype(dtype)
    return w  # non-weight leaves stay as-is (f32 vectors)


def _prepare_weight(w, dtype, mode):
    """Weight leaf -> serving representation.

    mode 'dense': always dense in `dtype`.
    mode 'keep-quant': file-quantized tensors stay packed (fused
      dequant-matmul at run time); dense tensors go to `dtype`.
    mode 'q8': everything 2-D (including originally-dense tensors like the
      head) is packed to per-block int8 — maximum HBM bandwidth savings.
    mode 'q8r': per-output-row int8 — the cheapest dequant (convert-only in
      the kernel; row scales applied to the output), best decode latency.
    """
    from rwkv_tpu.ops.kernels import PackedQuantWeight, quantize_q8_serving

    if isinstance(w, Weight):
        if w.kind == "quant" and mode in ("keep-quant", "q8", "q8r", "w8a8"):
            return PackedQuantWeight.from_weight(w)
        if mode in ("q8", "q8r", "w8a8"):
            arr = _densify(w, jnp.float32)
            if arr.ndim == 2 and arr.shape[-1] % 32 == 0:
                return quantize_q8_serving(
                    arr, rowwise=(mode in ("q8r", "w8a8")),
                    int8_act=(mode == "w8a8"),
                )
            return arr.astype(dtype)
        return _densify(w, dtype)
    return w


_V7_FUSED_RKV = ("att.receptance.weight", "att.key.weight", "att.value.weight")
_V7_FUSED_LORA1 = ("att.w1", "att.a1", "att.g1", "att.v1")
_V7_FUSED_LORA2 = ("att.w2", "att.a2", "att.g2", "att.v2")


def stack_layer_params(
    params: dict, cfg: ModelConfig, dtype=jnp.bfloat16, mode: str = "dense",
    fuse: bool = True,
) -> dict:
    """Prepare and stack per-layer params into [L, ...] pytrees for
    scan-over-layers. v7 layer 0's missing v0/v1/v2 are zero-padded (they
    are selected away by the is_first flag in att_v7).

    For dense v7 weights, `fuse` additionally groups the r/k/v projections
    into one [3, C, C] tensor and the eight LoRA matmuls into two [4, ., .]
    tensors, so the layer runs 3 batched matmul kernels instead of 11 —
    per-kernel launch overhead dominates the decode step at small batch."""
    blocks = [dict(b) for b in params["blocks"]]
    if cfg.version_major == 7 and len(blocks) > 1:
        for key in ("att.v0", "att.v1", "att.v2"):
            if key not in blocks[0]:
                blocks[0][key] = jax.tree.map(jnp.zeros_like, blocks[1][key])
    keys = sorted(blocks[0].keys())
    stacked = {}
    for k in keys:
        leaves = [_prepare_weight(b[k], dtype, mode) for b in blocks]
        stacked[k] = jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    if (
        fuse
        and cfg.version_major == 7
        and all(isinstance(stacked[k], jnp.ndarray)
                for k in _V7_FUSED_RKV + _V7_FUSED_LORA1 + _V7_FUSED_LORA2)
    ):
        stacked["att.rkv.weight"] = jnp.stack(
            [stacked.pop(k) for k in _V7_FUSED_RKV], axis=1
        )  # [L, 3, C, C]
        stacked["att.lora1"] = jnp.stack(
            [stacked.pop(k) for k in _V7_FUSED_LORA1], axis=1
        )  # [L, 4, d, C]
        stacked["att.lora2"] = jnp.stack(
            [stacked.pop(k) for k in _V7_FUSED_LORA2], axis=1
        )  # [L, 4, C, d]
    return {
        "emb": params["emb"].astype(dtype),
        "ln0": params["ln0"],
        "ln_out": params["ln_out"],
        "head": _prepare_weight(params["head"], dtype, mode),
        "blocks": stacked,
    }


def _att_v7_fused(layer, x, att_xx, heads, v_first, cfg, is_first, wkv_fn,
                  trace=False):
    """v7 attention with batched fused projections (see stack_layer_params):
    same math as graph.att_v7, 3 matmul kernels instead of 11.

    trace=True (single-sequence [T, C] x only): additionally returns
    (xl, heads_all) — the per-position recurrent state (att_xx after
    position t is xl[t]; heads after t is heads_all[t])."""
    h, hs = cfg.head_count, cfg.head_size
    lead, c = x.shape[:-1], x.shape[-1]
    xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
    x_prev = jnp.concatenate([att_xx[None], xl[:-1]], axis=0)
    new_xx = xl[-1]
    sx = x_prev - xl
    coeff = layer["att.x_rwkvag"].reshape(6, *([1] * len(lead)), c)
    xxx = xl[None] + sx[None] * coeff  # [6, ..., C]
    xr, xw, xk, xv, xa, xg = (xxx[i] for i in range(6))

    wd = layer["att.rkv.weight"]  # [3, C, C]
    rkv_in = jnp.stack([xr, xk, xv]).reshape(3, -1, c)
    rkv = jnp.einsum(
        "pmc,pdc->pmd", rkv_in.astype(wd.dtype), wd,
        preferred_element_type=jnp.float32,
    )
    r = rkv[0].reshape(*lead, c)
    k = rkv[1].reshape(*lead, c)
    v = rkv[2].reshape(*lead, c)

    l1 = layer["att.lora1"]  # [4, d, C] (w1, a1, g1, v1)
    lora_in = jnp.stack([xw, xa, xg, xv]).reshape(4, -1, c)
    down = jnp.einsum(
        "pmc,pdc->pmd", lora_in.astype(l1.dtype), l1,
        preferred_element_type=jnp.float32,
    )
    act = jnp.stack(
        [jnp.tanh(down[0]), down[1], jax.nn.sigmoid(down[2]), down[3]]
    )
    l2 = layer["att.lora2"]  # [4, C, d] (w2, a2, g2, v2)
    up = jnp.einsum(
        "pmd,pcd->pmc", act.astype(l2.dtype), l2,
        preferred_element_type=jnp.float32,
    )
    w_l = up[0].reshape(*lead, c)
    a_l = up[1].reshape(*lead, c)
    g = up[2].reshape(*lead, c)
    vmix_l = up[3].reshape(*lead, c)

    w = jnp.exp(jax.nn.sigmoid(w_l + layer["att.w0"]) * jnp.float32(-0.606531))
    a = jax.nn.sigmoid(a_l + layer["att.a0"])

    kk = l2_normalize((k * layer["att.k_k"]).reshape(*lead, h, hs))
    ka = k * layer["att.k_a"]
    k = k + (a * ka - ka)

    v_mixed = v + (v_first - v) * jax.nn.sigmoid(vmix_l + layer["att.v0"])
    v_first = jnp.where(is_first, v, v_first)
    v = jnp.where(is_first, v, v_mixed)

    rh = r.reshape(*lead, h, hs)
    wh = w.reshape(*lead, h, hs)
    kh = k.reshape(*lead, h, hs)
    vh = v.reshape(*lead, h, hs)
    ah = a.reshape(*lead, h, hs)

    if trace:
        y, heads_all = G.wkv7_scan_trace(heads, rh, wh, kh, vh, -kk, kk * ah)
        heads = heads_all[-1]
    else:
        y, heads = (wkv_fn or G.wkv7_scan)(heads, rh, wh, kh, vh, -kk, kk * ah)
    xo = group_norm(
        y.reshape(*lead, c), layer["att.ln_x.weight"], layer["att.ln_x.bias"],
        h, eps=64e-5,
    )
    bonus = (vh * jnp.sum(kh * rh * layer["att.r_k"], axis=-1, keepdims=True)).reshape(*lead, c)
    xo = (xo + bonus) * g
    out = G.mm(xo, layer["att.output.weight"])
    if trace:
        return out, new_xx, heads, v_first, (xl, heads_all)
    return out, new_xx, heads, v_first


def run_blocks(
    blocks: dict,
    state: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    v_first=None,
    layer_offset=0,
    wkv_fn=None,
):
    """Scan a stacked [Lb, ...] blocks dict over `x` (post-ln0 activations,
    [T, ...C]). `layer_offset` is the global index of the first layer (the
    v7 value-residual selects v at GLOBAL layer 0) — pipeline stages run
    this on their local layer slice. Returns (x, v_first, new_state).
    v5+ only (v4's scalar-state att lives in forward_stacked directly)."""
    major = cfg.version_major
    n_local = state["att_xx"].shape[0]
    xs = (blocks, state["att_xx"], state["ffn_xx"], state["heads"],
          layer_offset + jnp.arange(n_local))

    def body(carry, inp):
        x, v_first = carry
        layer, att_xx, ffn_xx, heads, idx = inp
        if major == 7:
            if "att.rkv.weight" in layer:
                dx, att_xx, heads, v_first = _att_v7_fused(
                    layer, x, att_xx, heads, v_first, cfg, (idx == 0), wkv_fn
                )
            else:
                dx, att_xx, heads, v_first = G.att_v7(
                    layer, x, att_xx, heads, v_first, cfg, is_first=(idx == 0),
                    wkv_fn=wkv_fn,
                )
            x = x + dx
            dx, ffn_xx = G.ffn_v7(layer, x, ffn_xx)
        elif major == 6:
            dx, att_xx, heads = G.att_v6(layer, x, att_xx, heads, cfg, wkv_fn=wkv_fn)
            x = x + dx
            dx, ffn_xx = G.ffn_v6(layer, x, ffn_xx)
        else:
            dx, att_xx, heads = G.att_v5(layer, x, att_xx, heads, cfg, wkv_fn=wkv_fn)
            x = x + dx
            dx, ffn_xx = G.ffn_v4_v5(layer, x, ffn_xx)
        x = x + dx
        return (x, v_first), (att_xx, ffn_xx, heads)

    if v_first is None:
        v_first = jnp.zeros_like(x)
    (x, v_first), (att_xx, ffn_xx, heads) = jax.lax.scan(
        body, (x, v_first), xs
    )
    return x, v_first, {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}


def forward_stacked(
    params: dict,
    state: dict,
    tokens: jnp.ndarray,
    cfg: ModelConfig,
    compute_logits: bool = True,
):
    """Forward with lax.scan over layers; same math as graph.forward.

    tokens: [T] (single sequence, state arrays [L, ...]) or [T, B]
    (time-major batch, state arrays [L, B, ...]). Batch is a native axis —
    no vmap — so the batched decode step compiles to single large matmuls.
    """
    major = cfg.version_major
    emb = params["emb"][tokens]
    x = layer_norm(emb.astype(jnp.float32), *params["ln0"])

    # Prefill (T > 1) uses the chunked matmul wkv — same math, MXU-resident
    # (rwkv_tpu/ops/chunked.py); decode (T=1) uses the sequential scan.
    wkv_fn = None
    if major in (5, 6, 7) and tokens.shape[0] > 1:
        from rwkv_tpu.ops.chunked import wkv6_auto, wkv7_auto

        wkv_fn = wkv7_auto if major == 7 else wkv6_auto

    if major >= 5:
        x, _, new_state = run_blocks(
            params["blocks"], state, x, cfg, wkv_fn=wkv_fn
        )
    else:
        xs = (params["blocks"], state["att_xx"], state["ffn_xx"],
              state["aa"], state["bb"], state["pp"])
        wkv4_fn = None
        if tokens.shape[0] > 1:
            # prefill: associative-scan wkv4 (O(log T) recurrence depth)
            from rwkv_tpu.ops.chunked import wkv4_auto

            wkv4_fn = wkv4_auto

        def body(carry, inp):
            x = carry
            layer, att_xx, ffn_xx, aa, bb, pp = inp
            dx, att_xx, aa, bb, pp = G.att_v4(
                layer, x, att_xx, aa, bb, pp, wkv_fn=wkv4_fn
            )
            x = x + dx
            dx, ffn_xx = G.ffn_v4_v5(layer, x, ffn_xx)
            x = x + dx
            return x, (att_xx, ffn_xx, aa, bb, pp)

        x, (att_xx, ffn_xx, aa, bb, pp) = jax.lax.scan(body, x, xs)
        new_state = {"att_xx": att_xx, "ffn_xx": ffn_xx, "aa": aa, "bb": bb, "pp": pp}

    logits = None
    if compute_logits == "all":
        # Per-position logits (speculative verification / scoring):
        # [T, ...C] -> [T, ..., V]
        xo = layer_norm(x, *params["ln_out"])
        logits = G.mm(xo, params["head"])
    elif compute_logits:
        xo = layer_norm(x[-1], *params["ln_out"])  # [C] or [B, C]
        if xo.ndim == 1:
            logits = G.mm(xo[None, :], params["head"])[0]
        else:
            logits = G.mm(xo, params["head"])
    return logits, new_state


def forward_stacked_trace(params, state, tokens, cfg):
    """Single-sequence scoring pass that returns per-position logits AND
    the recurrent state after EVERY position (v7 stacked/fused params
    only). tokens [T]; state arrays [L, ...]. Returns (logits [T, V],
    trace) with trace arrays [L, T, ...]: indexing position j gives the
    exact state after consuming tokens[:j+1] — the speculative-commit
    primitive (no prefix-replay pass; cf. rwkv_eval.inc:158-221's scratch
    chunk loop, which re-evaluates to advance state). All five archs."""
    major = cfg.version_major
    emb = params["emb"][tokens]
    x = layer_norm(emb.astype(jnp.float32), *params["ln0"])

    if major == 4:
        xs = (params["blocks"], state["att_xx"], state["ffn_xx"],
              state["aa"], state["bb"], state["pp"])

        def body4(x, inp):
            layer, att_xx, ffn_xx, aa, bb, pp = inp
            dx, _, aa, bb, pp, (xl, aa_a, bb_a, pp_a) = G.att_v4(
                layer, x, att_xx, aa, bb, pp, trace=True
            )
            x = x + dx
            xl2 = layer_norm(x, layer["ln2.weight"], layer["ln2.bias"])
            dx, _ = G.ffn_v4_v5(layer, x, ffn_xx)
            x = x + dx
            return x, (xl, xl2, aa_a, bb_a, pp_a)

        x, (xl_all, xl2_all, aa_all, bb_all, pp_all) = jax.lax.scan(
            body4, x, xs
        )
        logits = G.mm(layer_norm(x, *params["ln_out"]), params["head"])
        return logits, {"att_xx": xl_all, "ffn_xx": xl2_all,
                        "aa": aa_all, "bb": bb_all, "pp": pp_all}

    xs = (params["blocks"], state["att_xx"], state["ffn_xx"],
          state["heads"], jnp.arange(cfg.n_layer))

    def body(carry, inp):
        x, v_first = carry
        layer, att_xx, ffn_xx, heads, idx = inp
        if major == 5:
            dx, _, heads, (xl, heads_all) = G.att_v5(
                layer, x, att_xx, heads, cfg, trace=True
            )
        elif major == 6:
            dx, _, heads, (xl, heads_all) = G.att_v6(
                layer, x, att_xx, heads, cfg, trace=True
            )
        elif "att.rkv.weight" in layer:
            dx, _, heads, v_first, (xl, heads_all) = _att_v7_fused(
                layer, x, att_xx, heads, v_first, cfg, (idx == 0), None,
                trace=True,
            )
        else:
            dx, _, heads, v_first, (xl, heads_all) = G.att_v7(
                layer, x, att_xx, heads, v_first, cfg, is_first=(idx == 0),
                trace=True,
            )
        x = x + dx
        # ffn_xx state after position t is ln2(x)[t] (the ffn recomputes
        # this internally for its token shift)
        xl2 = layer_norm(x, layer["ln2.weight"], layer["ln2.bias"])
        if major == 5:
            dx, _ = G.ffn_v4_v5(layer, x, ffn_xx)
        elif major == 6:
            dx, _ = G.ffn_v6(layer, x, ffn_xx)
        else:
            dx, _ = G.ffn_v7(layer, x, ffn_xx)
        x = x + dx
        return (x, v_first), (xl, xl2, heads_all)

    v0 = jnp.zeros_like(x)
    (x, _), (xl_all, xl2_all, heads_all) = jax.lax.scan(body, (x, v0), xs)
    logits = G.mm(layer_norm(x, *params["ln_out"]), params["head"])
    trace = {"att_xx": xl_all, "ffn_xx": xl2_all, "heads": heads_all}
    return logits, trace


class ServingModel:
    """Batched, compile-bounded RWKV serving engine."""

    def __init__(
        self,
        source,
        precision: str = "bf16",
        params_cfg: Optional[tuple] = None,
        mesh=None,
        megakernel: bool = False,
        mega_pack_cache: Optional[str] = None,
        batch_bf16_shadow: bool = False,
    ):
        """mega_pack_cache: path to a .npz pack cache (see
        ops.megakernel.save_mega_pack). With megakernel=True, an
        existing cache is loaded instead of re-quantizing the big mats
        on the host (minutes at 7B); a missing cache is written after
        the first build."""
        if isinstance(source, str):
            cfg, params = load_params(source)
        else:
            cfg, params = source
        self.config = cfg
        # precision: 'bf16' | 'f32' (dense), 'quant' (keep the file's packed
        # blocks, fused dequant-matmul), 'q8' (repack everything to int8).
        dtype = jnp.float32 if precision == "f32" else jnp.bfloat16
        # 'w4a8': per-row int4 weights + int8 activations on the B=1
        # phase-tiled megakernel (v7); every other path (prefill, batch,
        # score) runs this model's params as w8a8.
        mode = {"bf16": "dense", "f32": "dense", "quant": "keep-quant",
                "q8": "q8", "q8r": "q8r", "w8a8": "w8a8",
                "w4a8": "w8a8"}[precision]
        self.precision = precision
        self.params = stack_layer_params(params, cfg, dtype, mode)
        # mesh: a jax.sharding.Mesh with ("data", "model") axes. Weights are
        # TP-sharded over `model` (Megatron col/row pairing one level into
        # the stacked [L, ...] pytree), state over `data` x `model`(heads).
        # Quantized matmuls trace in XLA mode under a mesh — GSPMD cannot
        # partition a pallas_call, but it shards the int8 dequant+dot fine.
        self.mesh = mesh
        self._mm_force = None
        if mesh is not None:
            from rwkv_tpu.parallel.sharding import shard_serving_params

            self.params = shard_serving_params(self.params, cfg, mesh)
            if precision in ("quant", "q8", "q8r", "w8a8", "w4a8"):
                # GSPMD cannot partition the quantized pallas matmul
                # (w4a8 params are stacked in w8a8 mode)
                self._mm_force = "xla"
        # Whole-model Pallas decode kernel (B=1, v7, single chip): one
        # pallas_call for all layers, weights double-buffered per layer.
        self._mega = None
        self._mega_tp = None
        self._mega_big = False
        self._mega_rows = None
        if megakernel and mesh is not None:
            # Multi-chip decode: per-layer TP Pallas kernels + psum under
            # shard_map (ops/megakernel_tp.py). v4-v7, B=1, w8a8/bf16.
            if cfg.version_major not in (4, 5, 6, 7):
                raise ValueError("TP megakernel decode is v4-v7 only")
            quant = precision in ("quant", "q8", "q8r", "w8a8", "w4a8")
            w4_tp = precision == "w4a8"
            tp_n = mesh.shape["model"]
            if cfg.version_major == 7:
                from rwkv_tpu.ops.megakernel import build_mega_pack
                from rwkv_tpu.ops.megakernel_tp import build_mega_pack_tp

                base = build_mega_pack(params, cfg, quant=quant, w4=w4_tp)
                self._mega_tp = build_mega_pack_tp(base, cfg, tp_n, mesh)
            elif cfg.version_major == 6:
                from rwkv_tpu.ops.megakernel import build_mega_pack_v6
                from rwkv_tpu.ops.megakernel_tp import (
                    build_mega_pack_tp_v6,
                )

                base = build_mega_pack_v6(params, cfg, quant=quant,
                                          w4=w4_tp)
                self._mega_tp = build_mega_pack_tp_v6(
                    base, cfg, tp_n, mesh
                )
            elif cfg.version_major == 5:
                from rwkv_tpu.ops.megakernel import build_mega_pack_v5
                from rwkv_tpu.ops.megakernel_tp import (
                    build_mega_pack_tp_v5,
                )

                base = build_mega_pack_v5(params, cfg, quant=quant,
                                          w4=w4_tp)
                self._mega_tp = build_mega_pack_tp_v5(
                    base, cfg, tp_n, mesh
                )
            else:
                from rwkv_tpu.ops.megakernel import build_mega_pack_v4
                from rwkv_tpu.ops.megakernel_tp import (
                    build_mega_pack_tp_v4,
                )

                base = build_mega_pack_v4(params, cfg, quant=quant,
                                          w4=w4_tp)
                self._mega_tp = build_mega_pack_tp_v4(
                    base, cfg, tp_n, mesh
                )
            self.mega_min_batch = 64
            # B>1 under a TP mesh is the GSPMD per-op sharded route
            # (_perop_decode); no bf16 shadow or single-chip packs here.
            self._mega_big = False
            self._mega_rows = None
            self._batch_bf16_shadow = False
            self._shadow_params = None
            self._shadow_src = None
            self._jit_cache = {}
            return
        if megakernel:
            if cfg.version_major not in (4, 5, 6, 7):
                raise ValueError(
                    "megakernel supports RWKV v4-v7 decode only"
                )
            quant = precision in ("quant", "q8", "q8r", "w8a8", "w4a8")
            w4 = precision == "w4a8"
            import os as _os

            if mega_pack_cache and _os.path.exists(mega_pack_cache):
                from rwkv_tpu.ops.megakernel import load_mega_pack

                self._mega = load_mega_pack(mega_pack_cache)
                mega_pack_cache = None  # loaded — don't rewrite
            if cfg.version_major == 7:
                from rwkv_tpu.ops.megakernel import build_mega_pack

                if self._mega is None:
                    # head=True folds the LM head into the decode kernel
                    # (B=1 non-tiled path); the tiled/batched consumers
                    # ignore the extra keys. The head stays int8 under
                    # w4a8 — mirroring the reference's head-never-
                    # quantized-to-4-bit rule (rwkv_quantize.inc:1-13).
                    self._mega = build_mega_pack(params, cfg, quant=quant,
                                                 w4=w4, head=True)
                mega_mat_keys = ("rkv", "lora1", "lora2", "out", "fk", "fv")
            elif cfg.version_major == 6:
                from rwkv_tpu.ops.megakernel import (
                    _V6_MAT_KEYS, build_mega_pack_v6,
                )

                if self._mega is None:
                    self._mega = build_mega_pack_v6(params, cfg, quant=quant,
                                                    w4=w4, head=not w4)
                mega_mat_keys = _V6_MAT_KEYS
            elif cfg.version_major == 5:
                from rwkv_tpu.ops.megakernel import (
                    _V5_MAT_KEYS, build_mega_pack_v5,
                )

                if self._mega is None:
                    self._mega = build_mega_pack_v5(params, cfg, quant=quant,
                                                    w4=w4, head=not w4)
                mega_mat_keys = _V5_MAT_KEYS
            else:
                from rwkv_tpu.ops.megakernel import (
                    _V4_MAT_KEYS, build_mega_pack_v4,
                )

                if self._mega is None:
                    self._mega = build_mega_pack_v4(params, cfg, quant=quant,
                                                    w4=w4, head=not w4)
                mega_mat_keys = _V4_MAT_KEYS
            # Whole-layer weight blocks must double-buffer in VMEM; past
            # ~20MB/layer (e.g. 1.5B C=2048) decode uses the phase-tiled
            # kernel instead (ops/megakernel.py tiled sections; v7 and
            # v6 — big v4/v5 models fall back to the per-op path).
            per_layer = sum(
                int(np.prod(self._mega[k].shape[1:]))
                * self._mega[k].dtype.itemsize
                for k in mega_mat_keys
            )
            if mega_pack_cache:
                from rwkv_tpu.ops.megakernel import save_mega_pack

                save_mega_pack(mega_pack_cache, self._mega)
            # B>1 w4 is implemented on the tiled kernels only — route
            # batched decode through them; small v7 models additionally
            # get the whole-layer w4 kernel (row vectors, head-pair
            # state, in-kernel int8 head, int4 split-half big mats) for
            # B=1 — the headline single-stream path.
            small = per_layer <= 20 * 1024 * 1024
            self._mega_big = not small or w4
            self._mega_rows = None
            if (not self._mega_big
                    or (w4 and small and cfg.version_major == 7)):
                # row-stored vectors/scales for the non-tiled kernels
                # (column windows are scatter DMAs that dominate the
                # step; scripts/probe_layer_cost.py) — shares the big
                # mats with self._mega, copies only the small arrays
                from rwkv_tpu.ops.megakernel import (
                    rowify_mega_pack, rowify_mega_pack_v4,
                    rowify_mega_pack_v5, rowify_mega_pack_v6,
                )

                rowify = {
                    7: rowify_mega_pack, 6: rowify_mega_pack_v6,
                    5: rowify_mega_pack_v5, 4: rowify_mega_pack_v4,
                }[cfg.version_major]
                self._mega_rows = rowify(self._mega)
        # Measured crossovers at 169M on chip
        # (scripts/bench_batch_crossover.py, tok/s):
        #   B        1     2     4     8    16    32    64    128
        #   bf16/op  1716  3400  6447 11827 19738 22136 26232 27612
        #   w8a8/op  1371  2699  5234  9765 14172 15122 17933 19217
        #   mega8       -   874  1582  3219  6667 11609 19325 89681
        # The batched kernel's state stream lane-pads B -> 128, so it
        # beats the per-op path at B>=64 vs w8a8/op and only at B~128
        # vs bf16/op. Override per deployment (tests set 2 to force the
        # kernel path).
        self.mega_min_batch = 64
        # batch_bf16_shadow: quantized engines serve mid-B decode
        # (2 <= B < the megakernel crossover) ~20% faster through a
        # bf16 copy of the stacked weights — opt-in, costs ~2x the int8
        # weight HBM. The shadow is stacked lazily on first use.
        self._batch_bf16_shadow = (
            batch_bf16_shadow
            and precision not in ("bf16", "f32")
            and mesh is None
        )
        self._shadow_params = None
        self._shadow_src = params if self._batch_bf16_shadow else None
        if self._batch_bf16_shadow:
            # bf16/op overtakes the batched kernel until B~128
            self.mega_min_batch = 128
        self._jit_cache: dict[Any, Any] = {}

    # -- state -------------------------------------------------------------
    def init_state(self, batch_size: int = 1) -> dict:
        one = init_state(self.config)
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (batch_size,) + a.shape), one
        )
        if self.mesh is not None:
            from rwkv_tpu.parallel.sharding import shard_serving_state

            state = shard_serving_state(state, self.mesh)
        return state

    # -- compiled steps ----------------------------------------------------
    def _batched_fn(self, t: int, compute_logits: bool,
                    shadow: bool = False):
        key = ("fwd", t, compute_logits, shadow)
        if key not in self._jit_cache:
            cfg = self.config

            mm_force = None if shadow else self._mm_force

            @jax.jit
            def run(params, state, tokens):  # tokens [B, t]; state [B, L, ...]
                from rwkv_tpu.ops.kernels import force_mode

                with force_mode(mm_force):  # applies at trace time
                    state_lb = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)
                    logits, new_lb = forward_stacked(
                        params, state_lb, tokens.T, cfg, compute_logits
                    )
                    new_state = jax.tree.map(
                        lambda a: jnp.swapaxes(a, 0, 1), new_lb
                    )
                return logits, new_state

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _shadow(self):
        """bf16 copy of the stacked weights for mid-B decode (see the
        measured crossover table in __init__). Built lazily."""
        if self._shadow_params is None:
            self._shadow_params = stack_layer_params(
                self._shadow_src, self.config, jnp.bfloat16, "dense"
            )
        return self._shadow_params

    def _mega_fn(self):
        key = ("mega",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v7_decode_megakernel
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            from rwkv_tpu.ops.megakernel import head_tile_plan

            pack_src = (self._mega_rows
                        if self._mega_rows is not None else self._mega)
            in_kernel_head = head_tile_plan(pack_src, cfg) is not None
            if not in_kernel_head:
                # keep the head keys out of the kernel's arg list
                pack_src = {
                    k: v for k, v in pack_src.items()
                    if not k.startswith(("head", "ln_out"))
                }

            # static kernel config vs traced arrays: jit must not trace the
            # pack's python scalars (they select slices/kernels)
            meta = {
                k: pack_src[k]
                for k in ("quant", "w4", "d_lora", "f_dim")
            }

            L = cfg.n_layer
            h, s = cfg.head_count, cfg.head_size
            # head-pair kernel state (exact 128 lanes; see _make_kernel)
            paired = h % 2 == 0

            @jax.jit
            def run(params, pack_arrs, state, token):  # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32), *params["ln0"]
                )
                # token-shift state as [L, 1, C] ROWS (column windows
                # are scatter DMAs — see rowify_mega_pack)
                heads_t = jnp.swapaxes(state["heads"][0], -1, -2)
                if paired:
                    # [L, H, S_j, S_i] -> [L, H/2, S_j, 2*S_i]
                    hp = heads_t.reshape(L, h // 2, 2, s, s)
                    heads_t = jnp.transpose(hp, (0, 1, 3, 2, 4)).reshape(
                        L, h // 2, s, 2 * s)
                state_t = {
                    "att_xx": state["att_xx"][0][:, None, :],
                    "ffn_xx": state["ffn_xx"][0][:, None, :],
                    "heads": heads_t,
                }
                if in_kernel_head:
                    y, new_t, lg = v7_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    logits = lg[None, :]
                else:
                    y, new_t = v7_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    xo = p_ln(y[:, 0], *params["ln_out"])
                    logits = G.mm(xo[None, :], params["head"])
                nh_ = new_t["heads"]
                if paired:
                    hp = nh_.reshape(L, h // 2, s, 2, s)
                    nh_ = jnp.transpose(hp, (0, 1, 3, 2, 4)).reshape(
                        L, h, s, s)
                new_state = {
                    "att_xx": new_t["att_xx"][None, :, 0, :],
                    "ffn_xx": new_t["ffn_xx"][None, :, 0, :],
                    "heads": jnp.swapaxes(nh_, -1, -2)[None],
                }
                return logits, new_state

            arrs = {k: v for k, v in pack_src.items() if k not in meta}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega4_fn(self):
        key = ("mega4",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import (
                head_tile_plan, v4_decode_megakernel,
            )
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_src = (self._mega_rows
                        if self._mega_rows is not None else self._mega)
            in_kernel_head = head_tile_plan(pack_src, cfg) is not None
            if not in_kernel_head:
                pack_src = {
                    k: v for k, v in pack_src.items()
                    if not k.startswith(("head", "ln_out"))
                }
            meta = {k: pack_src[k]
                    for k in ("quant", "w4", "f_dim")}

            @jax.jit
            def run(params, pack_arrs, state, token):  # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32), *params["ln0"]
                )
                # all five v4 state vectors as [L, 1, C] rows
                state_t = {
                    k: state[k][0][:, None, :]
                    for k in ("att_xx", "ffn_xx", "aa", "bb", "pp")
                }
                if in_kernel_head:
                    y, new_t, lg = v4_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    logits = lg[None, :]
                else:
                    y, new_t = v4_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    xo = p_ln(y[:, 0], *params["ln_out"])
                    logits = G.mm(xo[None, :], params["head"])
                new_state = {
                    k: new_t[k][None, :, 0, :]
                    for k in ("att_xx", "ffn_xx", "aa", "bb", "pp")
                }
                return logits, new_state

            arrs = {k: v for k, v in pack_src.items() if k not in meta}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega5_fn(self):
        key = ("mega5",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import (
                head_tile_plan, v5_decode_megakernel,
            )
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_src = (self._mega_rows
                        if self._mega_rows is not None else self._mega)
            in_kernel_head = head_tile_plan(pack_src, cfg) is not None
            if not in_kernel_head:
                pack_src = {
                    k: v for k, v in pack_src.items()
                    if not k.startswith(("head", "ln_out"))
                }
            meta = {
                k: pack_src[k]
                for k in ("quant", "w4", "f_dim", "has_gate")
            }

            @jax.jit
            def run(params, pack_arrs, state, token):  # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32), *params["ln0"]
                )
                state_t = {
                    "att_xx": state["att_xx"][0][:, None, :],  # rows
                    "ffn_xx": state["ffn_xx"][0][:, None, :],
                    "heads": jnp.swapaxes(state["heads"][0], -1, -2),
                }
                if in_kernel_head:
                    y, new_t, lg = v5_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    logits = lg[None, :]
                else:
                    y, new_t = v5_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    xo = p_ln(y[:, 0], *params["ln_out"])
                    logits = G.mm(xo[None, :], params["head"])
                new_state = {
                    "att_xx": new_t["att_xx"][None, :, 0, :],
                    "ffn_xx": new_t["ffn_xx"][None, :, 0, :],
                    "heads": jnp.swapaxes(new_t["heads"], -1, -2)[None],
                }
                return logits, new_state

            arrs = {k: v for k, v in pack_src.items() if k not in meta}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega6_fn(self):
        key = ("mega6",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import (
                head_tile_plan, v6_decode_megakernel,
            )
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_src = (self._mega_rows
                        if self._mega_rows is not None else self._mega)
            in_kernel_head = head_tile_plan(pack_src, cfg) is not None
            if not in_kernel_head:
                pack_src = {
                    k: v for k, v in pack_src.items()
                    if not k.startswith(("head", "ln_out"))
                }
            meta = {
                k: pack_src[k]
                for k in ("quant", "w4", "d_maa", "d_dec", "f_dim")
            }

            @jax.jit
            def run(params, pack_arrs, state, token):  # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32), *params["ln0"]
                )
                state_t = {
                    "att_xx": state["att_xx"][0][:, None, :],  # rows
                    "ffn_xx": state["ffn_xx"][0][:, None, :],
                    "heads": jnp.swapaxes(state["heads"][0], -1, -2),
                }
                if in_kernel_head:
                    y, new_t, lg = v6_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    logits = lg[None, :]
                else:
                    y, new_t = v6_decode_megakernel(
                        pack, state_t, x0[:, None], cfg,
                        interpret=interpret,
                    )
                    xo = p_ln(y[:, 0], *params["ln_out"])
                    logits = G.mm(xo[None, :], params["head"])
                new_state = {
                    "att_xx": new_t["att_xx"][None, :, 0, :],
                    "ffn_xx": new_t["ffn_xx"][None, :, 0, :],
                    "heads": jnp.swapaxes(new_t["heads"], -1, -2)[None],
                }
                return logits, new_state

            arrs = {k: v for k, v in pack_src.items() if k not in meta}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega4_tiled_pack(self):
        """Retiled v4 pack + tile counts for the v4 phase-tiled kernel."""
        from rwkv_tpu.ops.megakernel import (
            choose_tiling, retile_mega_pack_v4,
        )

        cfg = self.config
        _, nf, nr, no = choose_tiling(
            cfg, self._mega["quant"], 1,
            f_dim=self._mega["f_dim"], n_proj=3,
        )
        key = ("megapack4", nf, nr, no)
        if key not in self._jit_cache:
            self._jit_cache[key] = retile_mega_pack_v4(
                self._mega, cfg, nf, nr, no
            )
        return self._jit_cache[key]

    def _mega4_tiled1_fn(self):
        """Single-stream v4 decode through the phase-tiled kernel (big
        models — the World 7B/14B sizes the reference benchmarks)."""
        key = ("mega4t1",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v4_decode_megakernel_tiled
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_full = self._mega4_tiled_pack()
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "f_dim", "nf", "nr", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}

            @jax.jit
            def run(params, pack_arrs, state, token):   # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32),
                    *params["ln0"],
                )
                state_t = {
                    k: state[k][0][..., None]
                    for k in ("att_xx", "ffn_xx", "aa", "bb", "pp")
                }
                y, new_t = v4_decode_megakernel_tiled(
                    pack, state_t, x0[:, None], cfg, interpret=interpret
                )
                xo = p_ln(y[:, 0], *params["ln_out"])
                logits = G.mm(xo[None, :], params["head"])
                new_state = {
                    k: new_t[k][None, ..., 0]
                    for k in ("att_xx", "ffn_xx", "aa", "bb", "pp")
                }
                return logits, new_state

            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega5_tiled_pack(self):
        """Retiled v5 pack + (nh, nf) for the v5 phase-tiled kernel."""
        from rwkv_tpu.ops.megakernel import (
            choose_tiling, retile_mega_pack_v5,
        )

        cfg = self.config
        n_mix = 4 if self._mega["has_gate"] else 3
        nh, nf, ng, no = choose_tiling(
            cfg, self._mega["quant"], 1,
            f_dim=self._mega["f_dim"], n_proj=n_mix,
        )
        key = ("megapack5", nf, ng, no)
        if key not in self._jit_cache:
            self._jit_cache[key] = retile_mega_pack_v5(
                self._mega, cfg, nh, nf, ng, no
            )
        pack = dict(self._jit_cache[key])
        pack["nh"] = nh
        return pack, nh, nf

    def _mega5_tiled1_fn(self):
        """Single-stream v5 decode through the phase-tiled kernel (big
        models — the World 7B-class v5 sizes)."""
        key = ("mega5t1",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v5_decode_megakernel_tiled
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_full, nh, nf = self._mega5_tiled_pack()
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "f_dim", "has_gate",
                              "nh", "nf", "ng", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}
            L, H, S = cfg.n_layer, cfg.head_count, cfg.head_size

            @jax.jit
            def run(params, pack_arrs, state, token):   # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32),
                    *params["ln0"],
                )
                heads = jnp.swapaxes(state["heads"][0], -1, -2)  # -> (j, i)
                state_t = {
                    "att_xx": state["att_xx"][0][..., None],
                    "ffn_xx": state["ffn_xx"][0][..., None],
                    "heads": heads.reshape(L, nh, H // nh, S, S),
                }
                y, new_t = v5_decode_megakernel_tiled(
                    pack, state_t, x0[:, None], cfg, interpret=interpret
                )
                xo = p_ln(y[:, 0], *params["ln_out"])
                logits = G.mm(xo[None, :], params["head"])
                new_heads = jnp.swapaxes(
                    new_t["heads"].reshape(L, H, S, S), -1, -2
                )
                new_state = {
                    "att_xx": new_t["att_xx"][None, ..., 0],
                    "ffn_xx": new_t["ffn_xx"][None, ..., 0],
                    "heads": new_heads[None],
                }
                return logits, new_state

            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega6_tiled_pack(self):
        """Retiled v6 pack + (nh, nf) for the v6 phase-tiled kernel."""
        from rwkv_tpu.ops.megakernel import (
            choose_tiling, retile_mega_pack_v6,
        )

        cfg = self.config
        nh, nf, ng, no = choose_tiling(
            cfg, self._mega["quant"], 1,
            f_dim=self._mega["f_dim"], n_proj=4,
        )
        key = ("megapack6", nf, ng, no)
        if key not in self._jit_cache:
            self._jit_cache[key] = retile_mega_pack_v6(
                self._mega, cfg, nh, nf, ng, no
            )
        pack = dict(self._jit_cache[key])
        pack["nh"] = nh
        return pack, nh, nf

    def _mega6_tiled1_fn(self):
        """Single-stream v6 decode through the phase-tiled kernel (big
        models — the Finch 1.6B/3B/7B/14B sizes)."""
        key = ("mega6t1",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v6_decode_megakernel_tiled
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_full, nh, nf = self._mega6_tiled_pack()
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "d_maa", "d_dec", "f_dim",
                              "nh", "nf", "ng", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}
            L, H, S = cfg.n_layer, cfg.head_count, cfg.head_size

            @jax.jit
            def run(params, pack_arrs, state, token):   # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32),
                    *params["ln0"],
                )
                heads = jnp.swapaxes(state["heads"][0], -1, -2)  # -> (j, i)
                state_t = {
                    "att_xx": state["att_xx"][0][..., None],
                    "ffn_xx": state["ffn_xx"][0][..., None],
                    "heads": heads.reshape(L, nh, H // nh, S, S),
                }
                y, new_t = v6_decode_megakernel_tiled(
                    pack, state_t, x0[:, None], cfg, interpret=interpret
                )
                xo = p_ln(y[:, 0], *params["ln_out"])
                logits = G.mm(xo[None, :], params["head"])
                new_heads = jnp.swapaxes(
                    new_t["heads"].reshape(L, H, S, S), -1, -2
                )
                new_state = {
                    "att_xx": new_t["att_xx"][None, ..., 0],
                    "ffn_xx": new_t["ffn_xx"][None, ..., 0],
                    "heads": new_heads[None],
                }
                return logits, new_state

            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega_tiled_pack(self, b: int, packed: bool = False):
        """Retiled pack + (nh, nf) for the phase-tiled kernel, cached by
        the reshape-affecting tile counts (nh has no effect on the
        pack)."""
        from rwkv_tpu.ops.megakernel import choose_tiling, retile_mega_pack

        cfg = self.config
        nh, nf, nr, no = choose_tiling(cfg, self._mega["quant"], b,
                                       packed=packed)
        key = ("megapack", nf, nr, no)
        if key not in self._jit_cache:
            self._jit_cache[key] = retile_mega_pack(
                self._mega, cfg, nh, nf, nr, no
            )
        pack = dict(self._jit_cache[key])
        pack["nh"] = nh
        return pack, nh, nf

    def _mega_tiled1_fn(self):
        """Single-stream decode through the phase-tiled kernel (models
        whose per-layer weights exceed the whole-layer VMEM budget)."""
        key = ("megat1",)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v7_decode_megakernel_tiled
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_full, nh, nf = self._mega_tiled_pack(1)
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "d_lora", "f_dim",
                              "nh", "nf", "nr", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}
            L, H, S = cfg.n_layer, cfg.head_count, cfg.head_size

            @jax.jit
            def run(params, pack_arrs, state, token):   # state [1, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32),
                    *params["ln0"],
                )
                heads = jnp.swapaxes(state["heads"][0], -1, -2)  # -> (j, i)
                state_t = {
                    "att_xx": state["att_xx"][0][..., None],
                    "ffn_xx": state["ffn_xx"][0][..., None],
                    "heads": heads.reshape(L, nh, H // nh, S, S),
                }
                y, new_t = v7_decode_megakernel_tiled(
                    pack, state_t, x0[:, None], cfg, interpret=interpret
                )
                xo = p_ln(y[:, 0], *params["ln_out"])
                logits = G.mm(xo[None, :], params["head"])
                new_heads = jnp.swapaxes(
                    new_t["heads"].reshape(L, H, S, S), -1, -2
                )
                new_state = {
                    "att_xx": new_t["att_xx"][None, ..., 0],
                    "ffn_xx": new_t["ffn_xx"][None, ..., 0],
                    "heads": new_heads[None],
                }
                return logits, new_state

            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega_batched_fn(self, b: int, packed: bool = False):
        """Batched whole-model kernel step (batch on lanes, phase-tiled
        state streaming — see ops/megakernel.py). One jit per batch.
        packed=True uses the lane-PACKED state layout [.., S_j, S_i*B]
        (zero lane padding for 2 <= B < 128 — the mid-B big-model
        serving path)."""
        key = ("megab", b, packed)
        if key not in self._jit_cache:
            cfg = self.config
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import v7_decode_megakernel_tiled
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_full, nh, nf = self._mega_tiled_pack(b, packed=packed)
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "d_lora", "f_dim",
                              "nh", "nf", "nr", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}
            L, H = cfg.n_layer, cfg.head_count
            S = cfg.head_size

            @jax.jit
            def run(params, pack_arrs, state, tokens):  # state [B, L, ...]
                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][tokens].astype(jnp.float32), *params["ln0"]
                )                                               # [B, C]
                if packed:
                    # serving heads [B, L, H, S_i, S_j] -> lane-packed
                    # [L, nh, H/nh, S_j, S_i*B]
                    hp = jnp.transpose(state["heads"], (1, 2, 4, 3, 0))
                    heads_in = hp.reshape(L, nh, H // nh, S, S * b)
                else:
                    heads = jnp.transpose(state["heads"], (1, 2, 3, 4, 0))
                    heads_in = heads.reshape(L, nh, H // nh, S, S, b)
                state_t = {
                    "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
                    "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
                    "heads": heads_in,
                }
                y, new_t = v7_decode_megakernel_tiled(
                    pack, state_t, x0.T, cfg, interpret=interpret,
                    packed=packed,
                )
                xo = p_ln(y.T, *params["ln_out"])               # [B, C]
                logits = G.mm(xo, params["head"])
                if packed:
                    nh_ = new_t["heads"].reshape(L, H, S, S, b)
                    new_heads = jnp.transpose(nh_, (4, 0, 1, 3, 2))
                else:
                    nh_ = new_t["heads"].reshape(L, H, S, S, b)
                    new_heads = jnp.transpose(nh_, (4, 0, 1, 2, 3))
                new_state = {
                    "att_xx": jnp.transpose(new_t["att_xx"], (2, 0, 1)),
                    "ffn_xx": jnp.transpose(new_t["ffn_xx"], (2, 0, 1)),
                    "heads": new_heads,
                }
                return logits, new_state

            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _mega_batched_packed_fn(self, b: int):
        """Lane-packed batched decode (2 <= B < 128): state packs
        (S_i, B) onto lanes so mid-B streams only the useful state bytes
        (the plain batched kernel lane-pads B -> 128)."""
        key = ("megabp", b)
        if key not in self._jit_cache:
            cfg = self.config
            h, s = cfg.head_count, cfg.head_size
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel import (
                pack_batched_state, unpack_batched_state,
                v7_decode_megakernel_batched_packed,
            )
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            pack_src = self._mega_rows
            meta = {k: pack_src[k]
                    for k in ("quant", "w4", "d_lora", "f_dim")}
            mm_force = self._mm_force

            @jax.jit
            def run(params, pack_arrs, state, tokens):  # state [B, L, ...]
                from rwkv_tpu.ops.kernels import force_mode

                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][tokens].astype(jnp.float32),
                    *params["ln0"],
                )  # [B, C]
                state_p = {
                    "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
                    "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
                    "heads": pack_batched_state(state["heads"], h, s),
                }
                y, new_p = v7_decode_megakernel_batched_packed(
                    pack, state_p, x0.T, cfg, interpret=interpret
                )
                xo = p_ln(y.T, *params["ln_out"])           # [B, C]
                with force_mode(mm_force):
                    logits = G.mm(xo, params["head"])
                new_state = {
                    "att_xx": jnp.transpose(new_p["att_xx"], (2, 0, 1)),
                    "ffn_xx": jnp.transpose(new_p["ffn_xx"], (2, 0, 1)),
                    "heads": unpack_batched_state(
                        new_p["heads"], b, h, s
                    ),
                }
                return logits, new_state

            arrs = {k: v for k, v in pack_src.items()
                    if k not in meta
                    and not k.startswith(("head", "ln_out"))}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def decode_loop_fns(self, b: int):
        """Kernel-native state-layout closures for a multi-step decode scan.

        Returns ``(pack, step, unpack, arrs)``: ``pack(state)`` converts the
        serving-layout state pool [B, L, ...] into the decode kernel's native
        layout ONCE, ``step(params, arrs, ps, tokens)`` runs one decode step
        entirely in that layout, and ``unpack(ps)`` converts back.  The
        per-call :meth:`decode` wrappers perform pack+unpack around EVERY
        step (~2 state-sized transposes per token at the kernel boundary);
        hoisting them outside the batcher's sync_every-step scan makes the
        layout moves O(1) per host sync instead of O(n_steps).  Routing
        mirrors :meth:`decode`; configurations it serves per-op fall back to
        ``forward_stacked`` on the layer-major layout.
        """
        key = ("loopfns", b)
        if key in self._jit_cache:
            return self._jit_cache[key]
        cfg = self.config
        interpret = jax.default_backend() != "tpu"
        from rwkv_tpu.ops.parity import layer_norm as p_ln

        use_packed_small = (
            self._mega is not None and cfg.version_major == 7
            and not self._mega_big and 2 <= b <= 32
            and self._mega_rows is not None
        )
        use_packed_tiled = (
            self._mega is not None and cfg.version_major == 7
            and self._mega_big and 2 <= b < 128
        )

        if use_packed_small:
            from rwkv_tpu.ops.megakernel import (
                pack_batched_state,
                unpack_batched_state,
                v7_decode_megakernel_batched_packed,
            )

            h, s = cfg.head_count, cfg.head_size
            pack_src = self._mega_rows
            meta = {k: pack_src[k] for k in ("quant", "w4", "d_lora", "f_dim")}
            arrs = {k: v for k, v in pack_src.items()
                    if k not in meta and not k.startswith(("head", "ln_out"))}

            def pack(state):
                return {
                    "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
                    "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
                    "heads": pack_batched_state(state["heads"], h, s),
                }

            def unpack(ps):
                return {
                    "att_xx": jnp.transpose(ps["att_xx"], (2, 0, 1)),
                    "ffn_xx": jnp.transpose(ps["ffn_xx"], (2, 0, 1)),
                    "heads": unpack_batched_state(ps["heads"], b, h, s),
                }

            def step(params, pack_arrs, ps, tokens):
                pk = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][tokens].astype(jnp.float32), *params["ln0"]
                )
                y, ps = v7_decode_megakernel_batched_packed(
                    pk, ps, x0.T, cfg, interpret=interpret
                )
                xo = p_ln(y.T, *params["ln_out"])
                logits = G.mm(xo, params["head"])
                return logits, ps

        elif use_packed_tiled:
            from rwkv_tpu.ops.megakernel import v7_decode_megakernel_tiled

            pack_full, nh, nf = self._mega_tiled_pack(b, packed=True)
            meta = {k: pack_full[k]
                    for k in ("quant", "w4", "d_lora", "f_dim",
                              "nh", "nf", "nr", "no")}
            arrs = {k: v for k, v in pack_full.items() if k not in meta}
            L, H = cfg.n_layer, cfg.head_count
            S = cfg.head_size

            def pack(state):
                hp = jnp.transpose(state["heads"], (1, 2, 4, 3, 0))
                return {
                    "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
                    "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
                    "heads": hp.reshape(L, nh, H // nh, S, S * b),
                }

            def unpack(ps):
                nh_ = ps["heads"].reshape(L, H, S, S, b)
                return {
                    "att_xx": jnp.transpose(ps["att_xx"], (2, 0, 1)),
                    "ffn_xx": jnp.transpose(ps["ffn_xx"], (2, 0, 1)),
                    "heads": jnp.transpose(nh_, (4, 0, 1, 3, 2)),
                }

            def step(params, pack_arrs, ps, tokens):
                pk = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][tokens].astype(jnp.float32), *params["ln0"]
                )
                y, ps = v7_decode_megakernel_tiled(
                    pk, ps, x0.T, cfg, interpret=interpret, packed=True
                )
                xo = p_ln(y.T, *params["ln_out"])
                logits = G.mm(xo, params["head"])
                return logits, ps

        else:
            # mirror decode()'s routing EXACTLY (same jitted closures):
            # the host per-token path and the batcher's on-device scan
            # must emit identical token streams for every configuration
            # (v7 plain-batched, all v4/v5/v6, per-op/bf16-shadow, ...).
            route = self._decode_route(b)

            def pack(state):
                return state

            unpack = pack  # serving layout IS the route's native layout
            arrs = {}

            def step(params, _arrs, ps, tokens):
                return route(ps, tokens)

        self._jit_cache[key] = (pack, step, unpack, arrs)
        return self._jit_cache[key]

    def score(self, tokens, state):
        """Sequence-score: per-position logits. tokens [B, t] ->
        (logits [B, t, V], new_state). Position i's logits predict token
        i+1 (the speculative-verification primitive)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        key = ("score", tokens.shape[1])
        if key not in self._jit_cache:
            cfg = self.config
            mm_force = self._mm_force

            @jax.jit
            def run(params, state, tokens):
                from rwkv_tpu.ops.kernels import force_mode

                with force_mode(mm_force):
                    state_lb = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)
                    logits, new_lb = forward_stacked(
                        params, state_lb, tokens.T, cfg, "all"
                    )  # [t, B, V]
                    new_state = jax.tree.map(
                        lambda a: jnp.swapaxes(a, 0, 1), new_lb
                    )
                return jnp.swapaxes(logits, 0, 1), new_state

            self._jit_cache[key] = run
        return self._jit_cache[key](self.params, state, tokens)

    def score_trace(self, tokens, state):
        """Single-sequence scoring WITH per-position states: tokens [t]
        (python list/array) + state [1, L, ...] -> (logits [t, V], trace
        arrays [L, t, ...]). See forward_stacked_trace; v7 only."""
        tokens = jnp.asarray(tokens, jnp.int32).reshape(-1)
        key = ("score_trace", tokens.shape[0])
        if key not in self._jit_cache:
            cfg = self.config
            mm_force = self._mm_force

            @jax.jit
            def run(params, state, tokens):
                from rwkv_tpu.ops.kernels import force_mode

                with force_mode(mm_force):
                    st = jax.tree.map(lambda a: a[0], state)
                    logits, trace = forward_stacked_trace(
                        params, st, tokens, cfg
                    )
                return logits, trace

            self._jit_cache[key] = run
        return self._jit_cache[key](self.params, state, tokens)

    def _megatp_fn(self):
        """B=1 decode through the TP megakernel (per-layer Pallas kernels
        + psum under shard_map; ops/megakernel_tp.py)."""
        key = ("megatp",)
        if key not in self._jit_cache:
            cfg = self.config
            mesh = self.mesh
            interpret = jax.default_backend() != "tpu"
            from rwkv_tpu.ops.megakernel_tp import tp_decode_step
            from rwkv_tpu.ops.parity import layer_norm as p_ln

            if cfg.version_major == 7:
                meta_keys = ("quant", "w4", "d_lora", "f_dim", "tp", "nf")
                step_fn = tp_decode_step
            elif cfg.version_major == 6:
                from rwkv_tpu.ops.megakernel_tp import tp_decode_step_v6

                meta_keys = ("quant", "w4", "d_maa", "d_dec", "f_dim",
                             "tp", "nf")
                step_fn = tp_decode_step_v6
            elif cfg.version_major == 5:
                from rwkv_tpu.ops.megakernel_tp import tp_decode_step_v5

                meta_keys = ("quant", "w4", "f_dim", "tp", "nf",
                             "has_gate")
                step_fn = tp_decode_step_v5
            else:
                from rwkv_tpu.ops.megakernel_tp import tp_decode_step_v4

                meta_keys = ("quant", "w4", "f_dim", "tp", "nf")
                step_fn = tp_decode_step_v4
            meta = {k: self._mega_tp[k] for k in meta_keys}
            mm_force = self._mm_force
            # v4's state is all scalar columns; v5-v7 carry wkv head mats
            scalar_keys = (
                ("att_xx", "ffn_xx", "aa", "bb", "pp")
                if cfg.version_major == 4 else ("att_xx", "ffn_xx")
            )

            @jax.jit
            def run(params, pack_arrs, state, token):  # state [1, L, ...]
                from rwkv_tpu.ops.kernels import force_mode

                pack = {**pack_arrs, **meta}
                x0 = p_ln(
                    params["emb"][token[0]].astype(jnp.float32),
                    *params["ln0"],
                )
                state_t = {k: state[k][0][..., None] for k in scalar_keys}
                if cfg.version_major != 4:
                    state_t["heads"] = jnp.swapaxes(
                        state["heads"][0], -1, -2
                    )
                y, new_t = step_fn(
                    pack, state_t, x0[:, None], cfg, mesh,
                    interpret=interpret,
                )
                xo = p_ln(y[:, 0], *params["ln_out"])
                # head weight is TP-sharded — GSPMD cannot partition the
                # pallas quant matmul, force the XLA path like every
                # other mesh-capable compiled fn
                with force_mode(mm_force):
                    logits = G.mm(xo[None, :], params["head"])
                new_state = {
                    k: new_t[k][None, ..., 0] for k in scalar_keys
                }
                if cfg.version_major != 4:
                    new_state["heads"] = jnp.swapaxes(
                        new_t["heads"], -1, -2
                    )[None]
                return logits, new_state

            arrs = {k: v for k, v in self._mega_tp.items()
                    if k not in meta}
            self._jit_cache[key] = (run, arrs)
        return self._jit_cache[key]

    def _decode_route(self, b: int):
        """Route selection for a B=b decode step, shared by :meth:`decode`
        and the batcher's multi-step loop fallback (decode_loop_fns), so
        the host per-token path and the on-device scan run IDENTICAL
        numerics for every configuration. Returns a callable
        ``(state, tokens_1d) -> (logits, state)`` on the serving-layout
        state [B, L, ...]."""
        if self._mega_tp is not None and b == 1:
            run, arrs_tp = self._megatp_fn()
            return lambda st, tk: run(self.params, arrs_tp, st, tk)
        if self._mega is not None:
            if self.config.version_major in (4, 5, 6):
                # whole-layer kernels are B=1 only; big v4/v5/v6
                # models route to their phase-tiled kernels at B=1;
                # everything else falls back to the per-op path.
                if b == 1 and self._mega_big:
                    run, arrs_t = {
                        6: self._mega6_tiled1_fn,
                        5: self._mega5_tiled1_fn,
                        4: self._mega4_tiled1_fn,
                    }[self.config.version_major]()
                    return lambda st, tk: run(self.params, arrs_t, st, tk)
                if b == 1:
                    run, arrs = {
                        6: self._mega6_fn,
                        5: self._mega5_fn,
                        4: self._mega4_fn,
                    }[self.config.version_major]()
                    return lambda st, tk: run(self.params, arrs, st, tk)
                return self._perop_route()
            if b == 1 and self._mega_rows is not None:
                # whole-layer kernel (w8a8 AND w4a8 — small models only;
                # _mega_rows exists exactly for those configs)
                run, arrs = self._mega_fn()
                return lambda st, tk: run(self.params, arrs, st, tk)
            if b == 1:
                run, arrs_t = self._mega_tiled1_fn()
                return lambda st, tk: run(self.params, arrs_t, st, tk)
            if (2 <= b <= 32 and self._mega_rows is not None
                    and not self._mega_rows["w4"]
                    and self.config.version_major == 7):
                # lane-packed batched kernel: fastest measured path for
                # every B in [2, 32] (1.3-1.8x over bf16/op, crossover
                # table above); its whole-layer state windows stop
                # fitting VMEM past B=32.
                run, arrs_p = self._mega_batched_packed_fn(b)
                return lambda st, tk: run(self.params, arrs_p, st, tk)
            if self._mega_big and 2 <= b < 128:
                # lane-packed tiled kernel: mid-B big-model decode (the
                # plain layout pads the state lane dim B -> 128)
                run, arrs_t = self._mega_batched_fn(b, packed=True)
                return lambda st, tk: run(self.params, arrs_t, st, tk)
            if self.mega_min_batch <= b <= MEGA_MAX_BATCH:
                run, arrs_t = self._mega_batched_fn(b)
                return lambda st, tk: run(self.params, arrs_t, st, tk)
        return self._perop_route()

    def _perop_route(self):
        """Per-op decode route on the serving-layout state (bf16 shadow
        for mid-B when enabled — see _perop_decode)."""
        def run(st, tk):
            if self._batch_bf16_shadow and tk.shape[0] > 1:
                return self._batched_fn(1, True, shadow=True)(
                    self._shadow(), st, tk[:, None]
                )
            return self._batched_fn(1, True)(self.params, st, tk[:, None])
        return run

    def decode(self, tokens, state):
        """One decode step for a batch: tokens [B] -> (logits [B, V], state).
        With megakernel=True, B=1 runs the whole-model Pallas kernel and
        mega_min_batch <= B <= MEGA_MAX_BATCH runs its batched variant
        (below mega_min_batch the per-op path is faster — the kernel's wkv
        state stream pads the batch lane dim to 128, so its step cost is
        flat in B while the per-op path scales down)."""
        tokens = jnp.asarray(tokens, jnp.int32).reshape(-1)
        return self._decode_route(tokens.shape[0])(state, tokens)

    def _perop_decode(self, state, tokens):
        """Per-op decode step, routed to the bf16 shadow weights for
        mid-B batches when enabled (measured ~20% over per-op w8a8,
        scripts/bench_batch_crossover.py)."""
        if self._batch_bf16_shadow and tokens.shape[0] > 1:
            return self._batched_fn(1, True, shadow=True)(
                self._shadow(), state, tokens
            )
        return self._batched_fn(1, True)(self.params, state, tokens)

    def prefill(self, tokens: Sequence[int], state: Optional[dict] = None,
                compute_logits: bool = True):
        """Single-sequence prefill with power-of-two chunk buckets."""
        if state is None:
            state = self.init_state(1)
        toks = np.asarray(tokens, dtype=np.int32)
        logits = None
        pos, n = 0, len(toks)
        while pos < n:
            remaining = n - pos
            size = next(b for b in PREFILL_BUCKETS if b <= remaining)
            chunk = jnp.asarray(toks[pos : pos + size]).reshape(1, size)
            is_last = pos + size >= n
            logits, state = self._batched_fn(size, compute_logits and is_last)(
                self.params, state, chunk
            )
            pos += size
        return (logits[0] if logits is not None else None), state

    # -- on-device generation ---------------------------------------------
    def _generate_fn(self, n_tokens: int):
        key = ("gen", n_tokens)
        if key not in self._jit_cache:
            cfg = self.config

            mm_force = self._mm_force

            @partial(jax.jit, static_argnames=())
            def run(params, state, logits, rng, temperature):
                from rwkv_tpu.ops.kernels import force_mode

                force_ctx = force_mode(mm_force)
                force_ctx.__enter__()  # trace-time; spans the scan trace below
                state = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)

                def step(carry, _):
                    state, logits, rng = carry
                    rng, k = jax.random.split(rng)
                    greedy = jnp.argmax(logits, axis=-1)
                    sampled = jax.random.categorical(
                        k, logits / jnp.maximum(temperature, 1e-6)
                    )
                    tok = jnp.where(temperature <= 0.0, greedy, sampled)  # [B]
                    logits, state = forward_stacked(
                        params, state, tok[None, :], cfg, True
                    )
                    return (state, logits, rng), tok

                (state, logits, _), toks = jax.lax.scan(
                    step, (state, logits, rng), None, length=n_tokens
                )
                state = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)
                force_ctx.__exit__(None, None, None)
                return toks.T, logits, state  # [B, n_tokens]

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def generate(
        self,
        prompt_tokens: Sequence[int],
        n_tokens: int,
        temperature: float = 1.0,
        seed: int = 0,
    ):
        """Prefill + n_tokens of on-device sampling (one jit for the whole
        decode loop). Returns (tokens [n_tokens], final logits, state)."""
        logits, state = self.prefill(prompt_tokens)
        toks, logits, state = self._generate_fn(n_tokens)(
            self.params,
            state,
            logits[None, :],
            jax.random.PRNGKey(seed),
            jnp.float32(temperature),
        )
        return np.asarray(toks[0]), logits[0], state
