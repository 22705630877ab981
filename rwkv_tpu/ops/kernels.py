"""Pallas TPU kernels + packed-weight serving representations.

The serving bottleneck for RWKV decode is HBM bandwidth on weights. Keeping
weights block-quantized in HBM and fusing dequantization into the matmul
(unpack + scale in VMEM, dot on the MXU) cuts weight traffic 2-4x vs bf16.

Layout note: codes are stored TRANSPOSED, [in, out], so that the per-32
block structure lies along the SUBLANE (second-minor) axis — Mosaic supports
splitting sublanes ((K, N) -> (K/32, 32, N)) but not lanes, and the
transposed orientation feeds `x @ W` directly on the MXU.

Provided here:
- `PackedQuantWeight`: int8 codes [in, out] + per-32-block scales [in/32,
  out] (and minimums for the `_1` formats) — the device-resident form of any
  ggml block format (Q4/Q5 codes are sign-extended to int8 at load; scales
  stay f32, so dequantized values match the parity path bit-for-bit).
- `quant_matmul`: fused dequant+matmul. On TPU it runs a Pallas kernel
  (grid over output tiles; codes+scales stream HBM->VMEM; dequant on the
  VPU; dot on the MXU with f32 accumulation). Off-TPU or for unaligned
  shapes it falls back to an equivalent XLA computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.ops.parity import Weight

QK = 32


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedQuantWeight:
    """Block-quantized weight resident on device, transposed storage:
    y = x @ dequant(W), dequant(W)[b*32+i, o] = q[b*32+i, o] * d[b, o]
    (+ m[b, o])."""

    q: jnp.ndarray  # int8 [..., in, out] (format offset already applied)
    d: jnp.ndarray  # f32 [..., in//32, out]
    m: Optional[jnp.ndarray] = None  # f32 [..., in//32, out] for _1 formats

    def tree_flatten(self):
        return (self.q, self.d, self.m), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        """Logical (out, in) shape, matching Weight.shape convention."""
        return (self.q.shape[-1], self.q.shape[-2])

    @classmethod
    def from_weight(cls, w: Weight) -> "PackedQuantWeight":
        assert w.kind == "quant"
        out, nb, _ = w.q.shape
        q_t = jnp.swapaxes(w.q.reshape(out, nb * QK), -1, -2)  # [in, out]
        d_t = jnp.swapaxes(w.d, -1, -2)  # [nb, out]
        m_t = None if w.m is None else jnp.swapaxes(w.m, -1, -2)
        return cls(q=q_t, d=d_t, m=m_t)


def dequant_weight(w: PackedQuantWeight, dtype=jnp.float32) -> jnp.ndarray:
    """[in, out] dense dequantization (transposed orientation)."""
    k, out = w.q.shape[-2:]
    nb = k // QK
    lead = w.q.shape[:-2]
    arr = w.q.astype(jnp.float32).reshape(*lead, nb, QK, out) * w.d[..., :, None, :]
    if w.m is not None:
        arr = arr + w.m[..., :, None, :]
    return arr.reshape(*lead, k, out).astype(dtype)


def quantize_q8_serving(arr: jnp.ndarray) -> PackedQuantWeight:
    """Symmetric per-32-block int8 quantization of a dense [out, in] weight
    (serving-side; same scheme as ggml Q8_0 but with f32 scales)."""
    arr = np.asarray(arr, dtype=np.float32)
    out, k = arr.shape
    assert k % QK == 0
    blocks = arr.reshape(out, k // QK, QK)
    amax = np.abs(blocks).max(axis=-1)
    d = amax / 127.0
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
    q = np.clip(np.rint(blocks * inv[..., None]), -127, 127).astype(np.int8)
    return PackedQuantWeight(
        q=jnp.asarray(np.ascontiguousarray(q.reshape(out, k).T)),
        d=jnp.asarray(np.ascontiguousarray(d.astype(np.float32).T)),
    )


# ---------------------------------------------------------------------------
# Fused dequant-matmul
# ---------------------------------------------------------------------------

# Output-tile columns per kernel program; K is processed whole (RWKV decode
# weights have K <= ~4k). int8 min tile is (32, 128).
_TILE_N = 256
_MAX_K = 8192


def _dequant_dot(x, q, d, m):
    k, tn = q.shape
    nb = k // QK
    w = q.astype(jnp.float32).reshape(nb, QK, tn) * d[:, None, :]
    if m is not None:
        w = w + m[:, None, :]
    w = w.reshape(k, tn)
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_plain(x_ref, q_ref, d_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], q_ref[:], d_ref[:], None)


def _kernel_min(x_ref, q_ref, d_ref, m_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], q_ref[:], d_ref[:], m_ref[:])


def _pallas_quant_matmul(x: jnp.ndarray, w: PackedQuantWeight, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_rows, k = x.shape
    n = w.q.shape[-1]
    nb = k // QK
    # Pad batch rows to the f32 sublane minimum.
    m_pad = max(8, ((m_rows + 7) // 8) * 8)
    if m_pad != m_rows:
        x = jnp.pad(x, ((0, m_pad - m_rows), (0, 0)))

    grid = (n // _TILE_N,)
    in_specs = [
        pl.BlockSpec((m_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    args = [x, w.q, w.d]
    if w.m is not None:
        in_specs.append(
            pl.BlockSpec((nb, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w.m)
        kernel = _kernel_min
    else:
        kernel = _kernel_plain

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (m_pad, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        interpret=interpret,
    )(*args)
    return out[:m_rows]


def _xla_quant_matmul(x: jnp.ndarray, w: PackedQuantWeight) -> jnp.ndarray:
    return jnp.matmul(x, dequant_weight(w))


def _kernel_ok(k: int, n: int) -> bool:
    return k % 128 == 0 and n % _TILE_N == 0 and k <= _MAX_K


def quant_matmul(x: jnp.ndarray, w: PackedQuantWeight, force: Optional[str] = None):
    """y[..., o] = sum_i x[..., i] * dequant(W)[i, o], f32 accumulation.

    force: None (auto), 'pallas', 'xla', 'interpret'.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.q.shape[-1]
    x2 = x.reshape(-1, k).astype(jnp.float32)

    mode = force
    if mode is None:
        on_tpu = jax.default_backend() == "tpu"
        mode = "pallas" if (on_tpu and _kernel_ok(k, n)) else "xla"
    if mode == "xla":
        out = _xla_quant_matmul(x2, w)
    else:
        out = _pallas_quant_matmul(x2, w, interpret=(mode == "interpret"))
    return out.reshape(*lead, n)
