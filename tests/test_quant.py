"""Quant codec tests: byte-exact encode vs the reference's committed
pre-quantized tiny models (the same guarantee test_tiny_rwkv.c gets from
ggml_quantize_chunk), plus decode round-trips."""

import numpy as np
import pytest

from conftest import TINY_VERSIONS, require_fixture
from rwkv_tpu.io import ggmf
from rwkv_tpu.io.quant import (
    GgmlDType,
    dequantize_rows,
    dtype_from_name,
    quantize_rows,
    unpack_blocks,
)
from rwkv_tpu.io.quantize import quantize_model_file

FORMATS = ["Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0"]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("src", ["FP32", "FP16"])
@pytest.mark.parametrize("version", ["4v0-660K", "7v0-834K"])
def test_quantize_bit_exact_vs_reference(tmp_path, version, src, fmt):
    """Quantizing the committed FP32/FP16 tiny models must produce files
    byte-identical to the committed `-to-Q*` fixtures (which were produced
    by ggml_quantize_chunk)."""
    src_file = require_fixture(f"tiny-rwkv-{version}-{src}.bin")
    expected_file = require_fixture(f"tiny-rwkv-{version}-{src}-to-{fmt}.bin")
    out = tmp_path / "quantized.bin"
    quantize_model_file(str(src_file), str(out), fmt, verbose=False)
    ours = out.read_bytes()
    theirs = expected_file.read_bytes()
    assert len(ours) == len(theirs), f"size mismatch {len(ours)} vs {len(theirs)}"
    if ours != theirs:
        diff_at = next(i for i, (a, b) in enumerate(zip(ours, theirs)) if a != b)
        raise AssertionError(f"byte mismatch at offset {diff_at}")


@pytest.mark.parametrize("version", TINY_VERSIONS)
def test_all_versions_q5_1_bit_exact(tmp_path, version):
    src_file = require_fixture(f"tiny-rwkv-{version}-FP32.bin")
    expected_file = require_fixture(f"tiny-rwkv-{version}-FP32-to-Q5_1.bin")
    out = tmp_path / "q.bin"
    quantize_model_file(str(src_file), str(out), "Q5_1", verbose=False)
    assert out.read_bytes() == expected_file.read_bytes()


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip_error_bounded(fmt):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    dt = dtype_from_name(fmt)
    packed = quantize_rows(x, dt)
    y = dequantize_rows(packed, dt, (4096,))
    # error bounded by half a quantization step per block
    levels = {"Q4_0": 8, "Q4_1": 15, "Q5_0": 16, "Q5_1": 31, "Q8_0": 127}[fmt]
    xb = x.reshape(-1, 32)
    scale = np.abs(xb).max(axis=1) / levels
    err = np.abs((y - x).reshape(-1, 32))
    assert np.all(err <= scale[:, None] * 1.01 + 1e-7)


def test_unpack_blocks_matches_dequant():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(256).astype(np.float32)
    packed = quantize_rows(x, GgmlDType.Q5_1)
    blocks = unpack_blocks(packed, GgmlDType.Q5_1)
    manual = blocks["q"].astype(np.float32) * blocks["d"][:, None] + blocks["m"][:, None]
    full = dequantize_rows(packed, GgmlDType.Q5_1, (256,))
    np.testing.assert_array_equal(manual.reshape(-1), full)


def test_ggmf_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    header = ggmf.GgmfHeader(ggmf.GGMF_MAGIC, 101, 256, 64, 2, GgmlDType.FP32)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    tensors = [
        ggmf.GgmfTensor("emb.weight", GgmlDType.FP32, (256, 64), w.tobytes()),
        ggmf.GgmfTensor("blocks.0.ln0.bias", GgmlDType.FP32, (64,), b.tobytes()),
    ]
    path = tmp_path / "m.bin"
    ggmf.write_ggmf(str(path), header, tensors)
    h2, t2 = ggmf.read_ggmf(str(path))
    assert h2 == header
    assert [t.name for t in t2] == ["emb.weight", "blocks.0.ln0.bias"]
    np.testing.assert_array_equal(t2[0].to_f32(), w)
    np.testing.assert_array_equal(t2[1].to_f32(), b)


def test_read_reference_tiny_model_header():
    p = require_fixture("tiny-rwkv-4v0-660K-FP32.bin")
    header, tensors = ggmf.read_ggmf(str(p), with_data=False)
    assert header.n_vocab == 256
    assert header.n_layer >= 1
    names = {t.name for t in tensors}
    assert "emb.weight" in names and "head.weight" in names


# ---------------------------------------------------------------------------
# K-quant superblock formats (Q4_K / Q5_K)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt,block_bytes", [("Q4_K", 144), ("Q5_K", 176)])
def test_kquant_block_math(fmt, block_bytes):
    """Superblock sizes match ggml's block_q4_K/block_q5_K layouts."""
    from rwkv_tpu.io.quant import tensor_nbytes

    dt = dtype_from_name(fmt)
    assert tensor_nbytes(dt, 256, 3) == 3 * block_bytes
    assert tensor_nbytes(dt, 512) == 2 * block_bytes


def test_kquant_scale_pack_roundtrip():
    """6-bit scale/min packing (ggml get_scale_min_k4) is a bijection."""
    from rwkv_tpu.io.quant import _pack_k_scales, _unpack_k_scales

    rng = np.random.default_rng(7)
    ls = rng.integers(0, 64, (50, 8)).astype(np.uint8)
    lm = rng.integers(0, 64, (50, 8)).astype(np.uint8)
    s2, m2 = _unpack_k_scales(_pack_k_scales(ls, lm))
    np.testing.assert_array_equal(ls, s2)
    np.testing.assert_array_equal(lm, m2)


@pytest.mark.parametrize("fmt", ["Q4_K", "Q5_K"])
def test_kquant_roundtrip_error_bounded(fmt):
    """Encode/decode error is bounded AND beats the legacy format of the
    same bit width on gaussian data (the weighted-LS sub-block fit)."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((64, 512)) * 0.4).astype(np.float32)
    dt = dtype_from_name(fmt)
    y = dequantize_rows(quantize_rows(x, dt), dt, x.shape)
    rmse_k = float(np.sqrt(np.mean((y - x) ** 2)))
    legacy = dtype_from_name(fmt.replace("_K", "_1"))
    yl = dequantize_rows(quantize_rows(x, legacy), legacy, x.shape)
    rmse_legacy = float(np.sqrt(np.mean((yl - x) ** 2)))
    assert rmse_k < rmse_legacy, (rmse_k, rmse_legacy)


@pytest.mark.parametrize("fmt", ["Q4_K", "Q5_K"])
def test_kquant_degenerate_blocks(fmt):
    """Constant and all-zero superblocks encode without NaN/Inf."""
    dt = dtype_from_name(fmt)
    z = np.full((1, 256), 3.25, np.float32)
    y = dequantize_rows(quantize_rows(z, dt), dt, z.shape)
    assert np.all(np.isfinite(y)) and abs(float((y - z).max())) < 1e-3
    zn = np.zeros((2, 256), np.float32)
    y0 = dequantize_rows(quantize_rows(zn, dt), dt, zn.shape)
    np.testing.assert_array_equal(y0, zn)
    neg = np.full((1, 256), -1.5, np.float32)  # min>0 clamp path
    yn = dequantize_rows(quantize_rows(neg, dt), dt, neg.shape)
    assert np.all(np.isfinite(yn)) and abs(float((yn - neg).max())) < 1e-3


@pytest.mark.parametrize("fmt", ["Q4_K", "Q5_K"])
def test_kquant_weight_from_packed_affine(fmt):
    """A K superblock decomposes into 8 per-32 affine sub-blocks: the
    Weight(q, d, m) reconstruction equals dequantize_rows exactly."""
    from rwkv_tpu.ops.parity import Weight

    rng = np.random.default_rng(11)
    dt = dtype_from_name(fmt)
    w = (rng.standard_normal((16, 512)) * 0.3).astype(np.float32)
    packed = quantize_rows(w, dt)
    W = Weight.from_packed(packed.tobytes(), dt, (16, 512))
    assert W.q8_k_act and not W.q8_1_act
    rec = (
        np.asarray(W.q, np.float32) * np.asarray(W.d)[..., None]
        + np.asarray(W.m)[..., None]
    ).reshape(16, 512)
    np.testing.assert_array_equal(rec, dequantize_rows(packed, dt, (16, 512)))


def test_kquant_q8k_activation_blocks():
    """q8_K activation quantizer: per-256 signed-max scale, f32 d."""
    from rwkv_tpu.io.quant import quantize_q8_k_blocks

    rng = np.random.default_rng(5)
    x = rng.standard_normal(512).astype(np.float32)
    q, d = quantize_q8_k_blocks(x)
    assert q.shape == (2, 256) and d.shape == (2,)
    # the max-magnitude element quantizes to exactly -127 (signed-max trick)
    for b in range(2):
        i = np.argmax(np.abs(x[256 * b : 256 * (b + 1)]))
        assert q[b, i] == -127
    # zero block
    q0, d0 = quantize_q8_k_blocks(np.zeros(256, np.float32))
    assert np.all(q0 == 0) and np.all(d0 == 0)


@pytest.mark.parametrize("fmt", ["Q4_K", "Q5_K"])
def test_kquant_model_file_roundtrip(tmp_path, fmt):
    """quantize_model_file with a K target produces a loadable mixed file:
    256-multiple rows get the K codec, others the documented fallback
    (Q4_K -> Q5_0, Q5_K -> Q5_1 — llama.cpp's convention), skip-list
    tensors stay dense."""
    src = require_fixture("tiny-rwkv-5v2-730K-FP32.bin")
    out = tmp_path / f"m-{fmt}.bin"
    quantize_model_file(str(src), str(out), fmt, verbose=False)
    hdr, tensors = ggmf.read_ggmf(str(out), with_data=True)
    assert hdr.data_type == dtype_from_name(fmt)
    by_dtype = {}
    for t in tensors:
        by_dtype.setdefault(t.dtype, []).append(t.name)
    kdt = dtype_from_name(fmt)
    fallback = dtype_from_name("Q5_0" if fmt == "Q4_K" else "Q5_1")
    assert any(t.dtype == kdt for t in tensors), by_dtype
    for t in tensors:
        if t.dtype == kdt:
            assert t.shape[-1] % 256 == 0, (t.name, t.shape)
        elif t.dtype == fallback:
            assert t.shape[-1] % 256 != 0, (t.name, t.shape)
    # loads and evals through the parity engine
    from rwkv_tpu.models.model import RWKVModel

    model = RWKVModel(str(out))
    state = model.init_state()
    logits, state = model.eval(34, state)
    assert np.all(np.isfinite(np.asarray(logits)))
