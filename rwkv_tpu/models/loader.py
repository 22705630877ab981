"""ggmf model file → JAX parameter pytree.

Replaces the reference's two-pass ggml loader
(/root/reference/rwkv_model_loading.inc:288-419) with a single pass that
materializes parameters as device arrays:

- 2-D projection weights become `Weight` leaves that preserve the on-disk
  precision (FP32 / FP16 / block-quantized), so the parity compute path can
  reproduce ggml's per-precision arithmetic exactly.
- Small vectors/mixing coefficients are canonicalized to their mathematical
  shapes (the converter's packing — trailing singleton dims, fused
  `x_rwkvag`, per-head reshapes — is undone here once, at load time).

The returned pytree is a plain dict: {'emb', 'ln0': (w, b), 'blocks': [...],
'ln_out': (w, b), 'head'}.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from rwkv_tpu.io.ggmf import GgmfTensor, read_ggmf
from rwkv_tpu.io.quant import GgmlDType, is_quantized
from rwkv_tpu.models.config import ModelConfig, detect_version
from rwkv_tpu.ops.parity import Weight


def _dense(t: GgmfTensor) -> jnp.ndarray:
    if t.dtype == GgmlDType.FP16:
        return jnp.asarray(np.frombuffer(t.data, dtype=np.float16).reshape(t.shape))
    return jnp.asarray(t.to_f32())


def _weight(t: GgmfTensor) -> Weight:
    if is_quantized(t.dtype):
        return Weight.from_packed(t.data, t.dtype, t.shape)
    return Weight(kind="dense", w=_dense(t))


def _vec(t: GgmfTensor) -> jnp.ndarray:
    return jnp.asarray(t.to_f32().reshape(-1))


# Parameter-name suffixes (after "blocks.N.") that are 2-D projection
# weights consumed via mm(); everything else is a vector/coefficient.
_LAYER_WEIGHT_KEYS = {
    "att.key.weight",
    "att.value.weight",
    "att.receptance.weight",
    "att.gate.weight",
    "att.output.weight",
    "att.time_maa_w1",
    "att.time_decay_w1",
    "att.time_decay_w2",
    "att.w1",
    "att.w2",
    "att.a1",
    "att.a2",
    "att.v1",
    "att.v2",
    "att.g1",
    "att.g2",
    "ffn.key.weight",
    "ffn.value.weight",
    "ffn.receptance.weight",
}


def load_params(path: str) -> tuple[ModelConfig, dict[str, Any]]:
    """Load a ggmf model file into (config, params pytree)."""
    header, tensors = read_ggmf(path, with_data=True)
    by_name = {t.name: t for t in tensors}

    major, minor = detect_version(by_name.keys())

    head_count = head_size = 0
    if major == 7:
        head_count = by_name["blocks.0.att.r_k"].shape[0]
        head_size = header.n_embed // head_count
    elif major >= 5:
        head_count = by_name["blocks.0.att.time_decay"].shape[0]
        head_size = header.n_embed // head_count

    config = ModelConfig(
        n_vocab=header.n_vocab,
        n_embed=header.n_embed,
        n_layer=header.n_layer,
        version_major=major,
        version_minor=minor,
        head_count=head_count,
        head_size=head_size,
    )

    params: dict[str, Any] = {
        "emb": _dense(by_name["emb.weight"]),
        "ln0": (_vec(by_name["blocks.0.ln0.weight"]), _vec(by_name["blocks.0.ln0.bias"])),
        "ln_out": (_vec(by_name["ln_out.weight"]), _vec(by_name["ln_out.bias"])),
        "head": _weight(by_name["head.weight"]),
        "blocks": [],
    }

    for i in range(header.n_layer):
        prefix = f"blocks.{i}."
        layer: dict[str, Any] = {}
        for name, t in by_name.items():
            if not name.startswith(prefix):
                continue
            key = name[len(prefix):]
            if key in ("ln0.weight", "ln0.bias"):
                continue
            if key in _LAYER_WEIGHT_KEYS:
                layer[key] = _weight(t)
            elif key == "att.x_rwkvag":
                # Fused six-way token-shift coefficients [6, 1, C] -> [6, C]
                # (converter concat, convert_pytorch_to_ggml.py:51-68).
                layer[key] = jnp.asarray(t.to_f32().reshape(6, -1))
            elif key == "att.r_k":
                layer[key] = jnp.asarray(t.to_f32())  # [H, S]
            elif key in ("att.time_decay", "att.time_first", "att.time_faaaa"):
                arr = t.to_f32()
                if major == 4 or (major == 5 and minor == 1):
                    arr = arr.reshape(-1)  # [C] (v4) or per-head scalar [H] (v5.1)
                else:
                    arr = arr.reshape(arr.shape[0], -1)  # [H, S]
                layer[key] = jnp.asarray(arr)
            elif key == "att.time_maa_w2":
                layer[key] = jnp.asarray(t.to_f32())  # [5, C, dim]
            else:
                layer[key] = _vec(t)
        params["blocks"].append(layer)

    return config, params
