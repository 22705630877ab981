"""Block quantization codecs: Q4_0, Q4_1, Q5_0, Q5_1, Q8_0 (+ Q8_1 for activations).

Bit-compatible with ggml's reference quantizers (the formats consumed by
rwkv.cpp via `ggml_quantize_chunk`; see /root/reference/rwkv_quantize.inc:149
and /root/reference/rwkv_file_format.inc:28-47 for the type tables).
Encoders are validated byte-for-byte against the pre-quantized tiny-model
fixtures committed in the reference's `tests/` directory.

All codecs are pure numpy and fully vectorized. Blocks are 32 elements;
scales are stored as IEEE fp16 (numpy's float16 cast rounds to nearest-even,
matching ggml's FP32->FP16 conversion).

Layout of one block (little-endian):
  Q4_0:  d:f16, qs:16B   (elem j low nibble of qs[j], elem j+16 high nibble;
                          value = (q - 8) * d)
  Q4_1:  d:f16, m:f16, qs:16B                 (value = q * d + m)
  Q5_0:  d:f16, qh:u32, qs:16B  (5th bit of elem j at qh bit j, of elem j+16
                          at qh bit j+16; value = (q - 16) * d)
  Q5_1:  d:f16, m:f16, qh:u32, qs:16B         (value = q * d + m)
  Q8_0:  d:f16, qs:32 x i8                    (value = q * d)
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import numpy as np

QK = 32  # block size (elements)


class GgmlDType(enum.IntEnum):
    """On-disk dtype ids used by the `ggmf` format (rwkv_type enum order,
    see /root/reference/rwkv_file_format.inc:5-24)."""

    FP32 = 0
    FP16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q4_1_O = 4  # unsupported legacy
    Q4_2 = 5  # unsupported legacy
    Q4_3 = 6  # unsupported legacy
    Q5_0 = 7
    Q5_1 = 8
    Q8_0 = 9
    Q8_1 = 10
    Q2_K = 11
    Q3_K = 12
    Q4_K = 13
    Q5_K = 14
    Q6_K = 15
    Q8_K = 16


@dataclass(frozen=True)
class _BlockSpec:
    block_bytes: int  # bytes per 32-element block
    quantized: bool


_SPECS = {
    GgmlDType.FP32: _BlockSpec(4 * QK, False),
    GgmlDType.FP16: _BlockSpec(2 * QK, False),
    GgmlDType.Q4_0: _BlockSpec(2 + 16, True),
    GgmlDType.Q4_1: _BlockSpec(2 + 2 + 16, True),
    GgmlDType.Q5_0: _BlockSpec(2 + 4 + 16, True),
    GgmlDType.Q5_1: _BlockSpec(2 + 2 + 4 + 16, True),
    GgmlDType.Q8_0: _BlockSpec(2 + 32, True),
    GgmlDType.Q8_1: _BlockSpec(2 + 2 + 32, True),
}

QUANT_FORMATS = ("Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0")

# Names that resolve to a dtype id but have no codec here — the K-quant
# superblock family. The reference's binding layer advertises Q4_K/Q5_K
# (rwkv_cpp_shared_library.py:8-16); requesting one must fail with a
# clear "unsupported" error, mirroring the reference's GGML_TYPE_UNKNOWN
# mapping path (rwkv_file_format.inc:5-24) rather than a KeyError.
UNSUPPORTED_FORMATS = (
    "Q4_1_O", "Q4_2", "Q4_3", "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K",
    "Q8_K",
)

_NAME_TO_DTYPE = {
    "FP32": GgmlDType.FP32,
    "FP16": GgmlDType.FP16,
    "float32": GgmlDType.FP32,
    "float16": GgmlDType.FP16,
    "Q4_0": GgmlDType.Q4_0,
    "Q4_1": GgmlDType.Q4_1,
    "Q5_0": GgmlDType.Q5_0,
    "Q5_1": GgmlDType.Q5_1,
    "Q8_0": GgmlDType.Q8_0,
}
_NAME_TO_DTYPE.update({name: GgmlDType[name] for name in UNSUPPORTED_FORMATS})


def dtype_from_name(name: str) -> GgmlDType:
    if name not in _NAME_TO_DTYPE:
        raise ValueError(f"Unknown dtype name {name!r}")
    return _NAME_TO_DTYPE[name]


def dtype_name(dtype: GgmlDType) -> str:
    return {v: k for k, v in _NAME_TO_DTYPE.items() if not k.startswith("float")}[
        GgmlDType(dtype)
    ]


def is_quantized(dtype: GgmlDType) -> bool:
    return _SPECS[GgmlDType(dtype)].quantized


def tensor_nbytes(dtype: GgmlDType, *sizes: int) -> int:
    """Byte size of a tensor, including quant block math
    (mirrors rwkv_tensor_nbytes, /root/reference/rwkv_utilities.inc:1-9)."""
    n = 1
    for s in sizes:
        n *= int(s)
    spec = _SPECS[GgmlDType(dtype)]
    if spec.quantized:
        assert n % QK == 0, f"quantized tensor size {n} not a multiple of {QK}"
        return (n // QK) * spec.block_bytes
    return n * spec.block_bytes // QK


def _f16(x: np.ndarray) -> np.ndarray:
    """Round f32 -> IEEE fp16 (RTNE), as ggml's FP32_TO_FP16 does."""
    return x.astype(np.float16)


def _trunc_i(x: np.ndarray) -> np.ndarray:
    """C integer cast: truncate toward zero."""
    return np.trunc(x).astype(np.int32)


def _roundf(x: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int32)


def _blocks(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    assert x.size % QK == 0, f"size {x.size} not a multiple of {QK}"
    return x.reshape(-1, QK)


def _signed_absmax(xb: np.ndarray) -> np.ndarray:
    """Per block: the signed value with the largest magnitude, first occurrence
    winning on strict '>' comparison of magnitudes (matches the ggml scalar loop)."""
    idx = np.argmax(np.abs(xb), axis=1)
    return xb[np.arange(xb.shape[0]), idx]


def _pack_nibbles(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return (lo.astype(np.uint8) | (hi.astype(np.uint8) << 4)).astype(np.uint8)


def _q5_qh(xi0: np.ndarray, xi1: np.ndarray) -> np.ndarray:
    """Pack the 5th bits: bit j of qh = hi bit of elem j, bit j+16 = of elem j+16."""
    nb = xi0.shape[0]
    qh = np.zeros(nb, dtype=np.uint32)
    shifts = np.arange(16, dtype=np.uint32)
    qh |= np.sum(((xi0 >> 4) & 1).astype(np.uint64) << shifts, axis=1, dtype=np.uint64).astype(np.uint32)
    qh |= np.sum(((xi1 >> 4) & 1).astype(np.uint64) << (shifts + 16), axis=1, dtype=np.uint64).astype(np.uint32)
    return qh


# ---------------------------------------------------------------------------
# Encoders (f32 -> packed bytes). Each returns a uint8 array.
# ---------------------------------------------------------------------------


def _encode_q4_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    nb = xb.shape[0]
    smax = _signed_absmax(xb)
    d = smax / -8.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    xi = np.minimum(15, _trunc_i(xb * inv[:, None] + np.float32(8.5)))
    qs = _pack_nibbles(xi[:, :16], xi[:, 16:])
    out = np.zeros((nb, 18), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = qs
    return out.reshape(-1)


def _encode_q4_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    nb = xb.shape[0]
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / np.float32(15.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    xi = np.minimum(15, _trunc_i((xb - mn[:, None]) * inv[:, None] + np.float32(0.5)))
    qs = _pack_nibbles(xi[:, :16], xi[:, 16:])
    out = np.zeros((nb, 20), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn).view(np.uint8).reshape(nb, 2)
    out[:, 4:] = qs
    return out.reshape(-1)


def _encode_q5_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    nb = xb.shape[0]
    smax = _signed_absmax(xb)
    d = smax / -16.0
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    xi = np.minimum(31, _trunc_i(xb * inv[:, None] + np.float32(16.5)))
    xi0, xi1 = xi[:, :16], xi[:, 16:]
    qs = _pack_nibbles(xi0 & 0xF, xi1 & 0xF)
    qh = _q5_qh(xi0, xi1)
    out = np.zeros((nb, 22), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:6] = qh.view(np.uint8).reshape(nb, 4)
    out[:, 6:] = qs
    return out.reshape(-1)


def _encode_q5_1(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    nb = xb.shape[0]
    mn = xb.min(axis=1)
    mx = xb.max(axis=1)
    d = (mx - mn) / np.float32(31.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    xi = np.minimum(31, _trunc_i((xb - mn[:, None]) * inv[:, None] + np.float32(0.5)))
    xi0, xi1 = xi[:, :16], xi[:, 16:]
    qs = _pack_nibbles(xi0 & 0xF, xi1 & 0xF)
    qh = _q5_qh(xi0, xi1)
    out = np.zeros((nb, 24), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn).view(np.uint8).reshape(nb, 2)
    out[:, 4:8] = qh.view(np.uint8).reshape(nb, 4)
    out[:, 8:] = qs
    return out.reshape(-1)


def _encode_q8_0(x: np.ndarray) -> np.ndarray:
    xb = _blocks(x)
    nb = xb.shape[0]
    amax = np.abs(xb).max(axis=1)
    d = amax / np.float32(127.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    q = _roundf(xb * inv[:, None]).astype(np.int8)
    out = np.zeros((nb, 34), dtype=np.uint8)
    out[:, 0:2] = _f16(d).view(np.uint8).reshape(nb, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def quantize_q8_1_blocks(x: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Activation quantization for Q4_1/Q5_1 dot products (ggml's q8_1).

    Returns (q: int32 [nb, 32], d: f32 [nb] (fp16-rounded), s: f32 [nb]
    (fp16-rounded d * sum(q))).
    """
    xb = _blocks(x)
    amax = np.abs(xb).max(axis=1)
    d = amax / np.float32(127.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    q = _roundf(xb * inv[:, None])
    s = d * q.sum(axis=1).astype(np.float32)
    return q, _f16(d).astype(np.float32), _f16(s).astype(np.float32)


def quantize_q8_0_blocks(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Activation quantization for Q4_0/Q5_0/Q8_0 dot products (ggml's q8_0).

    Returns (q: int32 [nb, 32], d: f32 [nb] (fp16-rounded)).
    """
    xb = _blocks(x)
    amax = np.abs(xb).max(axis=1)
    d = amax / np.float32(127.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(np.float32)
    q = _roundf(xb * inv[:, None])
    return q, _f16(d).astype(np.float32)


# ---------------------------------------------------------------------------
# Decoders (packed bytes -> unpacked integer codes + scales, and to f32)
# ---------------------------------------------------------------------------


def unpack_blocks(data: np.ndarray, dtype: GgmlDType) -> dict[str, np.ndarray]:
    """Unpack raw block bytes into integer codes and f32 scales.

    Returns a dict with:
      q: int32 [nb, 32] — integer codes with the format's offset NOT applied
         (q4_0: 0..15, q5_0: 0..31, q8_0: -128..127)
      d: f32 [nb] — scale
      m: f32 [nb] — min/offset (q4_1/q5_1 only)
    """
    dtype = GgmlDType(dtype)
    spec = _SPECS[dtype]
    raw = np.frombuffer(np.ascontiguousarray(data), dtype=np.uint8)
    assert raw.size % spec.block_bytes == 0
    nb = raw.size // spec.block_bytes
    b = raw.reshape(nb, spec.block_bytes)

    def f16_at(off: int) -> np.ndarray:
        return (
            b[:, off : off + 2].copy().view(np.float16).reshape(nb).astype(np.float32)
        )

    def u32_at(off: int) -> np.ndarray:
        return b[:, off : off + 4].copy().view(np.uint32).reshape(nb)

    def nibbles(off: int) -> np.ndarray:
        qs = b[:, off : off + 16]
        return np.concatenate([qs & 0xF, qs >> 4], axis=1).astype(np.int32)

    if dtype == GgmlDType.Q4_0:
        return {"q": nibbles(2), "d": f16_at(0)}
    if dtype == GgmlDType.Q4_1:
        return {"q": nibbles(4), "d": f16_at(0), "m": f16_at(2)}
    if dtype == GgmlDType.Q5_0 or dtype == GgmlDType.Q5_1:
        off = 6 if dtype == GgmlDType.Q5_0 else 8
        qh_off = 2 if dtype == GgmlDType.Q5_0 else 4
        q = nibbles(off)
        qh = u32_at(qh_off)
        bits = ((qh[:, None] >> np.arange(32, dtype=np.uint32)) & 1).astype(np.int32)
        q = q | (bits << 4)
        out = {"q": q, "d": f16_at(0)}
        if dtype == GgmlDType.Q5_1:
            out["m"] = f16_at(2)
        return out
    if dtype == GgmlDType.Q8_0:
        q = b[:, 2:34].copy().view(np.int8).astype(np.int32)
        return {"q": q, "d": f16_at(0)}
    raise ValueError(f"not a packed quant dtype: {dtype}")


_OFFSETS = {GgmlDType.Q4_0: 8, GgmlDType.Q5_0: 16}


def quant_offset(dtype: GgmlDType) -> int:
    """The integer offset subtracted at dequant time (0 for _1/_8 formats)."""
    return _OFFSETS.get(GgmlDType(dtype), 0)


def dequantize_rows(data: np.ndarray, dtype: GgmlDType, shape: tuple[int, ...]) -> np.ndarray:
    """Decode packed tensor bytes to f32 with the given logical shape."""
    dtype = GgmlDType(dtype)
    if dtype == GgmlDType.FP32:
        return np.frombuffer(np.ascontiguousarray(data), dtype=np.float32).reshape(shape).copy()
    if dtype == GgmlDType.FP16:
        return (
            np.frombuffer(np.ascontiguousarray(data), dtype=np.float16)
            .astype(np.float32)
            .reshape(shape)
        )
    blocks = unpack_blocks(data, dtype)
    q = blocks["q"].astype(np.float32) - np.float32(quant_offset(dtype))
    x = q * blocks["d"][:, None]
    if "m" in blocks:
        x = blocks["q"].astype(np.float32) * blocks["d"][:, None] + blocks["m"][:, None]
    return x.reshape(shape).astype(np.float32)


_ENCODERS = {
    GgmlDType.Q4_0: _encode_q4_0,
    GgmlDType.Q4_1: _encode_q4_1,
    GgmlDType.Q5_0: _encode_q5_0,
    GgmlDType.Q5_1: _encode_q5_1,
    GgmlDType.Q8_0: _encode_q8_0,
}


def quantize_rows(x: np.ndarray, dtype: GgmlDType) -> np.ndarray:
    """Encode an f32 array into packed quant bytes (bit-compatible with
    ggml_quantize_chunk for the supported formats)."""
    dtype = GgmlDType(dtype)
    if dtype == GgmlDType.FP32:
        return np.ascontiguousarray(x, dtype=np.float32).view(np.uint8).reshape(-1)
    if dtype == GgmlDType.FP16:
        return np.ascontiguousarray(x, dtype=np.float32).astype(np.float16).view(np.uint8).reshape(-1)
    if dtype not in _ENCODERS:
        raise ValueError(f"Unsupported quantization target {dtype}")
    return _ENCODERS[dtype](np.ascontiguousarray(x, dtype=np.float32))
