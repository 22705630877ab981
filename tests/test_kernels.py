"""Pallas kernel tests (run in interpreter mode on CPU; the same kernels
compile natively on TPU). PackedQuantWeight uses transposed [in, out]
storage — see rwkv_tpu/ops/kernels.py."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import require_fixture


def _random_packed(out, k, with_min=False, seed=0):
    from rwkv_tpu.ops.kernels import PackedQuantWeight

    rng = np.random.default_rng(seed)
    q = rng.integers(-127, 128, size=(k, out)).astype(np.int8)
    d = (rng.random((k // 32, out)).astype(np.float32) + 0.1) * 0.01
    m = (rng.random((k // 32, out)).astype(np.float32) - 0.5) * 0.01 if with_min else None
    return PackedQuantWeight(
        q=jnp.asarray(q), d=jnp.asarray(d), m=None if m is None else jnp.asarray(m)
    )


@pytest.mark.parametrize("with_min", [False, True])
@pytest.mark.parametrize("m_rows", [1, 4, 8])
def test_pallas_dequant_matmul_matches_xla(with_min, m_rows):
    from rwkv_tpu.ops.kernels import quant_matmul

    out, k = 256, 128
    w = _random_packed(out, k, with_min)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((m_rows, k)), jnp.float32)
    ref = quant_matmul(x, w, force="xla")
    ker = quant_matmul(x, w, force="interpret")
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quant_matmul_matches_parity_dequant():
    """The packed representation must dequantize identically to the parity
    path for real ggml-format weights."""
    from rwkv_tpu.models.loader import load_params
    from rwkv_tpu.ops.kernels import PackedQuantWeight, dequant_weight
    from rwkv_tpu.ops.parity import Weight

    path = str(require_fixture("tiny-rwkv-5v2-730K-FP32-to-Q4_1.bin"))
    _, params = load_params(path)
    w: Weight = params["blocks"][0]["att.key.weight"]
    packed = PackedQuantWeight.from_weight(w)
    ref = w.q.astype(jnp.float32) * w.d[..., None]
    if w.m is not None:
        ref = ref + w.m[..., None]
    ref = ref.reshape(w.q.shape[0], -1)  # [out, in]
    np.testing.assert_array_equal(
        np.asarray(dequant_weight(packed)), np.asarray(ref).T
    )


def test_quantize_q8_serving_roundtrip():
    from rwkv_tpu.ops.kernels import dequant_weight, quantize_q8_serving

    rng = np.random.default_rng(0)
    arr = rng.standard_normal((64, 128)).astype(np.float32)
    packed = quantize_q8_serving(jnp.asarray(arr))
    deq = np.asarray(dequant_weight(packed)).T  # back to [out, in]
    err = np.abs(deq - arr)
    step = np.abs(arr.reshape(64, 4, 32)).max(-1, keepdims=True) / 127.0
    assert (err.reshape(64, 4, 32) <= step * 0.51 + 1e-8).all()


def test_serving_quant_close_to_parity():
    """'quant' serving precision on a Q5_1 file must track the parity
    engine's quantized logits closely (same dequantized weights; bf16/f32
    activation differences only)."""
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-5v2-730K-FP32-to-Q5_1.bin"))
    ref = RWKVModel(path)
    srv = ServingModel(path, precision="quant")
    prompt = list(b"hello quantized world")
    rl, _ = ref.eval_sequence(prompt)
    sl, _ = srv.prefill(prompt)
    diff = np.abs(np.asarray(sl) - np.asarray(rl))
    assert diff.max() < 0.5, diff.max()


def test_serving_q8_mode_runs():
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    srv = ServingModel(path, precision="q8")
    logits, state = srv.prefill(list(b"abc"))
    assert np.isfinite(np.asarray(logits)).all()
