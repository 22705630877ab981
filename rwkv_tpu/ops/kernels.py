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
    (+ m[b, o]).

    pack4: 4-bit formats (Q4_0/Q4_1) store TWO codes per int8 byte along the
    in dim — byte s holds in-positions 2s (low nibble) and 2s+1 (high
    nibble); `signed4` says whether nibbles sign-extend (Q4_0, offset
    pre-applied) or are unsigned 0..15 (Q4_1). Halves code traffic again:
    0.5 B/weight + 0.125 B/weight of scales vs 2 B/weight bf16."""

    q: jnp.ndarray  # int8 [..., in, out] (or [..., in//2, out] when pack4)
    d: jnp.ndarray  # f32 [..., in//32, out]; [..., 1, out] when rowwise
    m: Optional[jnp.ndarray] = None  # f32 [..., in//32, out] for _1 formats
    pack4: bool = False
    signed4: bool = True
    # rowwise: one scale per OUTPUT row instead of per 32-block. The kernel
    # then only CONVERTS codes (1 VPU op/weight) and applies scales to the
    # [M, N] output — per-block dequant costs ~3 VPU ops/weight, which eats
    # the bandwidth savings of weight-only quantization on v5e.
    rowwise: bool = False
    # int8_act: quantize activations per row to int8 and run the matmul as
    # s8 x s8 -> s32 on the MXU (w8a8). Requires rowwise.
    int8_act: bool = False
    # n: logical output dim. The stored out dim may be zero-padded up to a
    # _TILE_N multiple at construction so ANY real vocab (e.g. Pile's 50277,
    # reference tokenizer_util.py:20-26) stays on the Pallas kernel path;
    # quant_matmul slices the output back to n. 0 means "not padded".
    n: int = 0

    def tree_flatten(self):
        return (self.q, self.d, self.m), (
            self.pack4, self.signed4, self.rowwise, self.int8_act, self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, d, m = children
        pack4, signed4, rowwise, int8_act, n = aux
        return cls(q=q, d=d, m=m, pack4=pack4, signed4=signed4,
                   rowwise=rowwise, int8_act=int8_act, n=n)

    @property
    def n_logical(self) -> int:
        return self.n or self.q.shape[-1]

    @property
    def shape(self):
        """Logical (out, in) shape, matching Weight.shape convention."""
        k = self.q.shape[-2] * (2 if self.pack4 else 1)
        return (self.n_logical, k)

    @classmethod
    def from_weight(cls, w: Weight) -> "PackedQuantWeight":
        assert w.kind == "quant"
        out, nb, _ = w.q.shape
        q_t = jnp.swapaxes(w.q.reshape(out, nb * QK), -1, -2)  # [in, out]
        d_t = jnp.swapaxes(w.d, -1, -2)  # [nb, out]
        m_t = None if w.m is None else jnp.swapaxes(w.m, -1, -2)
        n_pad = _pad_n(out)
        if n_pad:
            q_t = jnp.pad(q_t, ((0, 0), (0, n_pad)))
            d_t = jnp.pad(d_t, ((0, 0), (0, n_pad)))
            m_t = None if m_t is None else jnp.pad(m_t, ((0, 0), (0, n_pad)))
        if w.fmt in ("Q4_0", "Q4_1"):
            signed = w.fmt == "Q4_0"
            q_np = np.asarray(q_t)
            lo = q_np[0::2].astype(np.uint8) & 0xF
            hi = (q_np[1::2].astype(np.uint8) & 0xF) << 4
            packed = (lo | hi).astype(np.int8)
            return cls(q=jnp.asarray(packed), d=d_t, m=m_t, pack4=True,
                       signed4=signed, n=out)
        return cls(q=q_t, d=d_t, m=m_t, n=out)


def _unpack4(q: jnp.ndarray, signed: bool) -> jnp.ndarray:
    """[.., K/2, N] packed nibbles -> [.., K, N] int8 codes (interleaved:
    byte s -> rows 2s (low), 2s+1 (high))."""
    if signed:
        lo = jnp.left_shift(q, 4) >> 4          # arithmetic: sign-extends
        hi = q >> 4
    else:
        qu = q.astype(jnp.uint8)
        lo = (qu & 0xF).astype(jnp.int8)
        hi = (qu >> 4).astype(jnp.int8)
    stacked = jnp.stack([lo, hi], axis=-2 if q.ndim == 2 else q.ndim - 1)
    # [.., K/2, 2, N] -> [.., K, N]
    return stacked.reshape(*q.shape[:-2], q.shape[-2] * 2, q.shape[-1])


def _codes(w: PackedQuantWeight) -> jnp.ndarray:
    return _unpack4(w.q, w.signed4) if w.pack4 else w.q


def dequant_weight(w: PackedQuantWeight, dtype=jnp.float32) -> jnp.ndarray:
    """[in, out] dense dequantization (transposed orientation; padding
    columns sliced away)."""
    q = _codes(w)
    k, out = q.shape[-2:]
    lead = q.shape[:-2]
    if w.rowwise:
        arr = q.astype(jnp.float32) * w.d
    else:
        nb = k // QK
        arr = q.astype(jnp.float32).reshape(*lead, nb, QK, out) * w.d[..., :, None, :]
        if w.m is not None:
            arr = arr + w.m[..., :, None, :]
        arr = arr.reshape(*lead, k, out)
    return arr[..., : w.n_logical].astype(dtype)


def _pad_n(out: int) -> int:
    """Zero-columns to append so the stored out dim is a _TILE_N multiple
    (keeps e.g. a 50277-vocab head on the Pallas kernel path)."""
    return (-out) % _TILE_N


def quantize_q8_serving(
    arr: jnp.ndarray, rowwise: bool = False, int8_act: bool = False
) -> PackedQuantWeight:
    """Symmetric int8 quantization of a dense [out, in] weight (serving
    side). rowwise=False: per-32-block scales (ggml-Q8_0-like); rowwise=True:
    one scale per output row (slightly coarser, much cheaper to dequantize)."""
    arr = np.asarray(arr, dtype=np.float32)
    out, k = arr.shape
    assert k % QK == 0
    n_pad = _pad_n(out)
    if rowwise:
        amax = np.abs(arr).max(axis=-1)                     # [out]
        d = amax / 127.0
        inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
        q = np.clip(np.rint(arr * inv[:, None]), -127, 127).astype(np.int8)
        if n_pad:
            q = np.pad(q, ((0, n_pad), (0, 0)))
            d = np.pad(d, (0, n_pad))
        return PackedQuantWeight(
            q=jnp.asarray(np.ascontiguousarray(q.T)),
            d=jnp.asarray(d.astype(np.float32).reshape(1, out + n_pad)),
            rowwise=True,
            int8_act=int8_act,
            n=out,
        )
    blocks = arr.reshape(out, k // QK, QK)
    amax = np.abs(blocks).max(axis=-1)
    d = amax / 127.0
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
    q = np.clip(np.rint(blocks * inv[..., None]), -127, 127).astype(np.int8)
    q = q.reshape(out, k)
    d = d.astype(np.float32)
    if n_pad:
        q = np.pad(q, ((0, n_pad), (0, 0)))
        d = np.pad(d, ((0, n_pad), (0, 0)))
    return PackedQuantWeight(
        q=jnp.asarray(np.ascontiguousarray(q.T)),
        d=jnp.asarray(np.ascontiguousarray(d.T)),
        n=out,
    )


# ---------------------------------------------------------------------------
# Fused dequant-matmul
# ---------------------------------------------------------------------------

# Output-tile columns per kernel program; K is processed whole (RWKV decode
# weights have K <= ~4k). int8 min tile is (32, 128).
_TILE_N = 256
_MAX_K = 8192


def _dot(x, w):
    return jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dequant_dot(x, q, d, m):
    k, tn = q.shape
    nb = k // QK
    w = q.astype(jnp.float32).reshape(nb, QK, tn) * d[:, None, :]
    if m is not None:
        w = w + m[:, None, :]
    w = w.reshape(k, tn)
    return _dot(x, w)


def _dequant_dot4(x_even, x_odd, q, d, m, signed):
    """Packed-nibble dot without interleaving: both nibbles of byte s belong
    to the same 32-block (positions 2s, 2s+1), so
    y = x_even @ (lo*scale) + x_odd @ (hi*scale)."""
    kh, tn = q.shape          # kh = K/2
    nb = kh // (QK // 2)      # 16 packed bytes per 32-element block
    # Nibble math in int32: Mosaic cannot legalize shifts on int8 vectors.
    q32 = q.astype(jnp.int32)
    if signed:
        lo_u = q32 & 0xF
        lo = (lo_u - ((lo_u & 0x8) << 1)).astype(jnp.float32)  # sign via bit 3
        hi = (q32 >> 4).astype(jnp.float32)  # i32 arithmetic shift sign-extends
    else:
        lo = (q32 & 0xF).astype(jnp.float32)
        hi = ((q32 >> 4) & 0xF).astype(jnp.float32)

    def scale(codes):
        w = codes.reshape(nb, QK // 2, tn) * d[:, None, :]
        if m is not None:
            w = w + m[:, None, :]
        return w.reshape(kh, tn)

    return _dot(x_even, scale(lo)) + _dot(x_odd, scale(hi))


def _kernel_plain(x_ref, q_ref, d_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], q_ref[:], d_ref[:], None)


def _kernel_w8a8(x_ref, dx_ref, q_ref, d_ref, o_ref):
    # Full int8 path: activations pre-quantized per row (dx [M, 1]); the
    # MXU does s8 x s8 -> s32; scales applied to the [M, TN] output only.
    acc = jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = acc.astype(jnp.float32) * dx_ref[:] * d_ref[:]


def _kernel_rowwise(x_ref, q_ref, d_ref, o_ref):
    # Convert-only dequant: int8 -> bf16 (1 VPU op/weight), MXU dot in bf16,
    # row scales applied to the tiny [M, TN] output.
    w = q_ref[:].astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = y * d_ref[:]


def _kernel_min(x_ref, q_ref, d_ref, m_ref, o_ref):
    o_ref[:] = _dequant_dot(x_ref[:], q_ref[:], d_ref[:], m_ref[:])


def _make_kernel4(signed, with_min):
    if with_min:
        def k4(xe_ref, xo_ref, q_ref, d_ref, m_ref, o_ref):
            o_ref[:] = _dequant_dot4(
                xe_ref[:], xo_ref[:], q_ref[:], d_ref[:], m_ref[:], signed
            )
    else:
        def k4(xe_ref, xo_ref, q_ref, d_ref, o_ref):
            o_ref[:] = _dequant_dot4(
                xe_ref[:], xo_ref[:], q_ref[:], d_ref[:], None, signed
            )
    return k4


def _pallas_quant_matmul(
    x: jnp.ndarray, w: PackedQuantWeight, interpret: bool, int8_act: bool = False
):
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
    scale_spec = pl.BlockSpec((nb, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM)

    if w.rowwise and int8_act:
        # per-row activation quantization (outside the kernel; x is tiny)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        dx = amax / 127.0
        inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(x * inv), -127, 127).astype(jnp.int8)
        in_specs = [
            pl.BlockSpec((m_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        args = [x8, dx.astype(jnp.float32), w.q, w.d]
        kernel = _kernel_w8a8
    elif w.rowwise:
        in_specs = [
            pl.BlockSpec((m_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
        args = [x, w.q, w.d]
        kernel = _kernel_rowwise
    elif w.pack4:
        # Split activations by parity of the in index (outside the kernel);
        # the kernel never interleaves — see _dequant_dot4.
        x3 = x.reshape(m_pad, k // 2, 2)
        xe, xo = x3[:, :, 0], x3[:, :, 1]
        in_specs = [
            pl.BlockSpec((m_pad, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, k // 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 2, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            scale_spec,
        ]
        args = [xe, xo, w.q, w.d]
        if w.m is not None:
            in_specs.append(scale_spec)
            args.append(w.m)
        kernel = _make_kernel4(w.signed4, w.m is not None)
    else:
        in_specs = [
            pl.BlockSpec((m_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            scale_spec,
        ]
        args = [x, w.q, w.d]
        if w.m is not None:
            in_specs.append(scale_spec)
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
    if w.int8_act and w.rowwise:
        return _xla_w8a8_matmul(x, w)
    return jnp.matmul(x, dequant_weight(w))


def _xla_w8a8_matmul(x: jnp.ndarray, w: PackedQuantWeight) -> jnp.ndarray:
    """w8a8 semantics in plain XLA ops (same math as _kernel_w8a8, so the
    two paths agree bit-for-bit). Integer accumulation is associative, so a
    GSPMD K-sharded execution psums exact int32 partials — this is the
    serving precision whose TP logits are bit-identical to 1-chip."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    dx = amax / 127.0
    inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
    x8 = jnp.clip(jnp.rint(x * inv), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w.q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * dx.astype(jnp.float32) * w.d
    return y[:, : w.n_logical]


def _kernel_ok(k: int, n: int, pack4: bool = False) -> bool:
    k_eff = k // 2 if pack4 else k
    return k_eff % 128 == 0 and n % _TILE_N == 0 and k <= _MAX_K


# Trace-time mode override for quant_matmul (read during jit tracing).
# GSPMD cannot partition a pallas_call, so TP-sharded serving traces under
# force_mode("xla"): weights stay int8 in HBM, the dequant+dot is plain XLA
# ops that the partitioner shards like any matmul.
_FORCED_MODE: list = [None]


class force_mode:
    """Context manager: quant_matmul calls traced inside use this mode."""

    def __init__(self, mode: Optional[str]):
        self.mode = mode

    def __enter__(self):
        _FORCED_MODE.append(self.mode)

    def __exit__(self, *exc):
        _FORCED_MODE.pop()


def quant_matmul(x: jnp.ndarray, w: PackedQuantWeight, force: Optional[str] = None):
    """y[..., o] = sum_i x[..., i] * dequant(W)[i, o], f32 accumulation.

    force: None (auto), 'pallas', 'xla', 'interpret', or 'w8a8' (rowwise
    weights only: per-row int8 activation quantization + s8xs8->s32 MXU
    matmul, scales applied to the output).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.q.shape[-1]          # stored (possibly padded) out dim
    n_out = w.n_logical
    x2 = x.reshape(-1, k).astype(jnp.float32)

    mode = force if force is not None else _FORCED_MODE[-1]
    if mode is None:
        on_tpu = jax.default_backend() == "tpu"
        # The Pallas kernel holds the FULL [m, k] activation block in
        # VMEM per grid step (sized for decode-shaped m); long-sequence
        # prefill (m in the thousands) blows the scoped-vmem limit, and
        # at those shapes XLA's int8 GEMM is MXU-efficient anyway —
        # w8a8's _xla path is bit-identical to the kernel.
        big_m = x2.shape[0] * max(k, n) * 5 > 12 * 2**20
        mode = ("pallas" if (on_tpu and _kernel_ok(k, n, w.pack4)
                             and not big_m) else "xla")
    if mode == "xla":
        out = _xla_quant_matmul(x2, w)
    else:
        if not _kernel_ok(k, n, w.pack4):
            raise ValueError(
                f"quant_matmul kernel needs k%128==0 (k/2 for pack4), "
                f"n%{_TILE_N}==0, k<={_MAX_K}; got k={k}, n={n}"
            )
        out = _pallas_quant_matmul(
            x2, w, interpret=(mode == "interpret"),
            int8_act=(mode == "w8a8" or (w.int8_act and mode == "pallas")),
        )
        if n_out != n:
            out = out[:, :n_out]
    return out.reshape(*lead, n_out)
