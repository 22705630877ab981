"""Numerics-parity compute ops.

These ops reproduce, in pure JAX, the arithmetic the reference engine performs
through ggml — including its quantized matmul semantics, where FP32 activations
are block-quantized to 8-bit (`q8_0`/`q8_1`) before an integer dot product
against the packed 4/5/8-bit weights (the `vec_dot` contract consumed via
`ggml_mul_mat`; see /root/reference/rwkv_graph.inc and SURVEY.md §2.9).

They are the *validation* path: golden-logit tests run these on CPU to match
the reference's committed expected outputs within its own tolerances. The
performance path (bf16 MXU matmuls, Pallas fused dequant kernels) lives in
`rwkv_tpu.ops.kernels` and is checked against this path.

Everything here is jit-compatible and shape-static.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.io.quant import GgmlDType, quant_offset, unpack_blocks

_HIGHEST = jax.lax.Precision.HIGHEST

# Formats whose ggml dot product consumes q8_1-quantized activations
# (the ones with an explicit per-block minimum): Q4_1, Q5_1.
_Q8_1_ACT = (GgmlDType.Q4_1, GgmlDType.Q5_1)

# K-quant superblock formats consume q8_K activations: per-256 blocks,
# signed-max f32 scale (ggml's vec_dot_q4_K_q8_K / _q5_K contract).
_Q8_K_ACT = (GgmlDType.Q4_K, GgmlDType.Q5_K)


@jax.tree_util.register_pytree_node_class
@dataclass
class Weight:
    """A linear-layer weight in one of the reference's on-disk precisions.

    kind == "dense": `w` holds the [out, in] matrix in float32 or float16.
    kind == "quant": `q` holds integer codes [out, n_blocks, 32] (int8, with
    the format's offset already subtracted, so e.g. Q4_0 codes are -8..7),
    `d` the per-block scales [out, n_blocks] (f32, already rounded through
    fp16), and `m` the per-block minimums for the `_1` formats.
    """

    kind: str  # "dense" | "quant"
    w: Optional[jnp.ndarray] = None
    q: Optional[jnp.ndarray] = None
    d: Optional[jnp.ndarray] = None
    m: Optional[jnp.ndarray] = None
    q8_1_act: bool = False
    fmt: str = ""  # on-disk format name for quant weights (e.g. "Q4_0")
    q8_k_act: bool = False  # K-quant weights: q8_K (per-256, f32-scale) acts

    def tree_flatten(self):
        return (self.w, self.q, self.d, self.m), (
            self.kind, self.q8_1_act, self.fmt, self.q8_k_act
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        w, q, d, m = children
        kind, q8_1_act, fmt, q8_k_act = aux
        return cls(kind=kind, w=w, q=q, d=d, m=m, q8_1_act=q8_1_act,
                   fmt=fmt, q8_k_act=q8_k_act)

    @property
    def shape(self):
        if self.kind == "dense":
            return tuple(self.w.shape)
        return (self.q.shape[0], self.q.shape[1] * 32)

    @classmethod
    def from_dense(cls, w: np.ndarray) -> "Weight":
        return cls(kind="dense", w=jnp.asarray(w))

    @classmethod
    def from_packed(cls, data: bytes, dtype: GgmlDType, shape) -> "Weight":
        """Build from raw ggmf tensor bytes of a quantized 2-D tensor."""
        out_dim, in_dim = shape
        blocks = unpack_blocks(np.frombuffer(data, dtype=np.uint8), dtype)
        nb = in_dim // 32
        q = (blocks["q"] - quant_offset(dtype)).astype(np.int8).reshape(out_dim, nb, 32)
        d = blocks["d"].astype(np.float32).reshape(out_dim, nb)
        m = blocks.get("m")
        if m is not None:
            m = jnp.asarray(m.astype(np.float32).reshape(out_dim, nb))
        from rwkv_tpu.io.quant import dtype_name

        return cls(
            kind="quant",
            q=jnp.asarray(q),
            d=jnp.asarray(d),
            m=m,
            q8_1_act=dtype in _Q8_1_ACT,
            fmt=dtype_name(dtype),
            q8_k_act=dtype in _Q8_K_ACT,
        )


def _roundf(x: jnp.ndarray) -> jnp.ndarray:
    """Round to nearest, ties to even — ggml's SIMD activation quantizers
    round with the hardware default rounding mode (`_mm256_round_ps` /
    `vcvtnq_s32_f32`), which is RNE, not C roundf."""
    return jnp.round(x)


def _fp16_round(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float16).astype(jnp.float32)


def _quant_matmul(x: jnp.ndarray, w: Weight) -> jnp.ndarray:
    """ggml-parity quantized matmul: y = x @ W.T with W block-quantized.

    Mirrors ggml's CPU path: each 32-element block of the activation row is
    quantized to int8 (scale = absmax/127, round-half-away), then the dot is
    sum_blocks d_w*d_x*<q_w, q_x> (+ m_w*s_x for the `_1` formats, where
    s_x = fp16(d_x_unrounded * sum(q_x))).
    """
    t_shape = x.shape[:-1]
    in_dim = x.shape[-1]
    nb = in_dim // 32
    xb = x.reshape(*t_shape, nb, 32)
    if w.q8_k_act:
        # q8_K activations (ggml's K-quant dot contract): per-256 blocks,
        # iscale = -127/smax where smax is the SIGNED value of largest
        # magnitude, scale d = 1/iscale kept in f32 (not fp16-rounded).
        nbk = in_dim // 256
        xk = x.reshape(*t_shape, nbk, 256)
        amaxk = jnp.max(jnp.abs(xk), axis=-1)
        idx = jnp.argmax(jnp.abs(xk), axis=-1)
        smax = jnp.take_along_axis(xk, idx[..., None], axis=-1)[..., 0]
        iscale = jnp.where(
            amaxk != 0.0, jnp.float32(-127.0) / smax, jnp.float32(0.0)
        )
        d_k = jnp.where(
            amaxk != 0.0, jnp.float32(1.0) / iscale, jnp.float32(0.0)
        )
        q_x = jnp.round(xk * iscale[..., None]).reshape(*t_shape, nb, 32)
        p = jnp.einsum(
            "...bi,obi->...ob", q_x, w.q.astype(jnp.float32),
            precision=_HIGHEST,
        )
        d_x32 = jnp.repeat(d_k, 8, axis=-1)  # per-32 view of the 256 scale
        y = jnp.sum(p * (d_x32[..., None, :] * w.d), axis=-1)
        s_x = d_x32 * jnp.sum(q_x, axis=-1)
        y = y + jnp.sum(w.m * s_x[..., None, :], axis=-1)
        return y
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d_x = amax / jnp.float32(127.0)
    # ggml's runtime (SIMD) activation quantizers compute the inverse scale
    # as 127/amax directly — NOT 1/d as the _ref weight quantizers do. The
    # 1-ulp difference flips occasional codes and is visible in the golden
    # logit sums, so we mirror the runtime convention.
    inv = jnp.where(amax != 0.0, jnp.float32(127.0) / amax, jnp.float32(0.0))
    q_x = _roundf(xb * inv[..., None])  # integer-valued f32 in [-127, 127]
    # Integer block dots: exact in f32 (values < 2^24).
    p = jnp.einsum(
        "...bi,obi->...ob", q_x, w.q.astype(jnp.float32), precision=_HIGHEST
    )
    d_x16 = _fp16_round(d_x)
    y = jnp.sum(p * (d_x16[..., None, :] * w.d), axis=-1)
    if w.q8_1_act:
        s_x = _fp16_round(d_x * jnp.sum(q_x, axis=-1))
        y = y + jnp.sum(w.m * s_x[..., None, :], axis=-1)
    return y


def mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """ggml_mul_mat-equivalent: y[..., o] = sum_i x[..., i] * W[o, i].

    For `Weight` leaves, dispatches on the storage precision, reproducing
    ggml's per-precision activation handling (FP16 weights see FP16-rounded
    activations; quantized weights see q8-quantized activations).

    Plain-array weights are the SERVING path: bf16 weights run a bf16xbf16
    MXU matmul with f32 accumulation; f32 weights run a plain f32 matmul.
    """
    if not isinstance(w, Weight):
        if not isinstance(w, jnp.ndarray) and hasattr(w, "q"):
            # PackedQuantWeight — fused dequant-matmul (Pallas on TPU).
            from rwkv_tpu.ops.kernels import quant_matmul

            return quant_matmul(x, w)
        # Flatten leading dims: [T, B, C] @ W.T as a single [T*B, C] GEMM.
        # (jnp.matmul would otherwise treat T as a batch dim and emit T
        # separate M=B matvecs — ~100x MXU waste for small B.)
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if w.dtype == jnp.bfloat16:
            y = jnp.matmul(
                x2.astype(jnp.bfloat16), w.T, preferred_element_type=jnp.float32
            )
        else:
            y = jnp.matmul(x2, w.T)
        return y.reshape(*lead, w.shape[0])
    if w.kind == "dense":
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if w.w.dtype == jnp.float16:
            # Current ggml routes F16 matmuls through llamafile/tinyBLAS,
            # which consumes RAW f32 activations against f32-converted f16
            # weights (validated against the 5v1 FP16 golden constant, which
            # only matches without activation rounding).
            y = jnp.matmul(x2, w.w.astype(jnp.float32).T, precision=_HIGHEST)
        else:
            y = jnp.matmul(x2, w.w.T, precision=_HIGHEST)
        return y.reshape(*lead, w.w.shape[0])
    return _quant_matmul(x, w)


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5):
    """RWKV layer norm (reference rwkv_operators.inc:93-97): population
    variance, eps inside the sqrt, elementwise scale and shift."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + b


def group_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, n_heads: int, eps: float):
    """Head-wise group norm (reference rwkv_graph.inc:281-285 / 376-380 /
    466-470): normalize each head's slice, then scale/shift over the full
    channel dim. x: [..., C]."""
    shape = x.shape
    xh = x.reshape(*shape[:-1], n_heads, shape[-1] // n_heads)
    mu = jnp.mean(xh, axis=-1, keepdims=True)
    xc = xh - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xh = xc * jax.lax.rsqrt(var + jnp.float32(eps))
    return xh.reshape(shape) * w + b


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Row l2-normalize with the reference's eps semantics
    (rwkv_operators.inc:40-82): scale = 1/max(sqrt(sum(x^2)), 1e-12)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, jnp.float32(1e-12))
