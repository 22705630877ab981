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
