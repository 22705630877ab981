"""Native library tests: bit-exact agreement with the pure-Python data
plane (quant codecs, ggmf scanning, file requantization, trie tokenizer)."""

import numpy as np
import pytest

from conftest import require_fixture


@pytest.fixture(scope="module")
def native():
    from rwkv_tpu import native

    if not native.is_available():
        built = native.build()
        if built is None:
            pytest.skip("native library could not be built")
    return native


FORMATS = [("Q4_0", 2), ("Q4_1", 3), ("Q5_0", 7), ("Q5_1", 8), ("Q8_0", 9)]


@pytest.mark.parametrize("name,dtype_id", FORMATS)
def test_native_quantize_bit_exact_vs_python(native, name, dtype_id):
    from rwkv_tpu.io.quant import dtype_from_name, quantize_rows

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(32 * 1024) * 3).astype(np.float32)
    py = quantize_rows(x, dtype_from_name(name))
    nat = native.quantize_rows(x, dtype_id)
    assert py.tobytes() == nat.tobytes()


@pytest.mark.parametrize("name,dtype_id", FORMATS)
def test_native_dequantize_bit_exact(native, name, dtype_id):
    from rwkv_tpu.io.quant import dequantize_rows, dtype_from_name, quantize_rows

    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096).astype(np.float32)
    packed = quantize_rows(x, dtype_from_name(name))
    py = dequantize_rows(packed, dtype_from_name(name), (4096,))
    nat = native.dequantize_rows(packed, dtype_id, 4096)
    np.testing.assert_array_equal(py.reshape(-1), nat)


def test_native_header_and_scan(native):
    from rwkv_tpu.io.ggmf import read_ggmf

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    hdr = native.read_header(path)
    assert hdr["n_vocab"] == 256 and hdr["n_layer"] == 12

    infos = native.scan_tensors(path)
    _, tensors = read_ggmf(path, with_data=False)
    assert len(infos) == len(tensors)
    by_name = {t.name: t for t in tensors}
    for info in infos:
        t = by_name[info["name"]]
        assert tuple(info["shape"]) == t.shape
        assert info["nbytes"] == t.nbytes


def test_native_quantize_model_file_byte_identical(native, tmp_path):
    """The native streaming requantizer must produce the same bytes as the
    Python one — which is byte-identical to the reference's."""
    src = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    expected = require_fixture("tiny-rwkv-7v0-834K-FP32-to-Q5_1.bin")
    out = tmp_path / "native_q.bin"
    orig, new = native.quantize_model_file(src, str(out), 8)  # Q5_1
    assert out.read_bytes() == expected.read_bytes()
    assert new < orig


def test_native_quantize_fp16_source(native, tmp_path):
    src = str(require_fixture("tiny-rwkv-5v2-730K-FP16.bin"))
    expected = require_fixture("tiny-rwkv-5v2-730K-FP16-to-Q4_0.bin")
    out = tmp_path / "native_q.bin"
    native.quantize_model_file(src, str(out), 2)  # Q4_0
    assert out.read_bytes() == expected.read_bytes()


def test_native_tokenizer_matches_python(native):
    from rwkv_tpu.utils.world_tokenizer import WorldTokenizer

    py = WorldTokenizer()
    nat = native.NativeWorldTokenizer()
    cases = [
        "Hello, world!",
        "The quick brown fox jumps over the lazy dog.",
        "Hello 你好 こんにちは привет",
        "code: x = f(y) ** 2\n\ttabs",
    ]
    for s in cases:
        assert nat.encode(s) == py.encode(s), s
        assert nat.decode(py.encode(s)) == s
    raw = bytes(range(256))
    assert nat.encode_bytes(raw) == py.encode_bytes(raw)
    assert nat.decode_bytes(nat.encode_bytes(raw)) == raw


def test_native_kquant_codecs_match_numpy(native):
    """The C++ Q4_K/Q5_K codecs are byte-exact with io/quant.py's numpy
    implementations (both ports of ggml's reference quantizers, with
    serial f32 accumulation orders that must agree exactly)."""
    from rwkv_tpu.io.quant import GgmlDType, dequantize_rows, quantize_rows

    rng = np.random.default_rng(9)
    x = (rng.standard_normal(8 * 1024) * 0.4).astype(np.float32)
    for dt in (GgmlDType.Q4_K, GgmlDType.Q5_K):
        py = quantize_rows(x, dt)
        nat = np.asarray(native.quantize_rows(x, int(dt))).view(np.uint8)
        np.testing.assert_array_equal(py, nat)
        dec = np.asarray(native.dequantize_rows(nat, int(dt), x.size))
        np.testing.assert_array_equal(dec, dequantize_rows(py, dt, (x.size,)))


def test_native_kquant_model_file_matches_python(native, tmp_path):
    """Native rwkv_quantize_model_file with a K target produces the same
    bytes as the Python path, including the per-tensor row-divisibility
    fallback."""
    from rwkv_tpu.io.quant import dtype_from_name
    from rwkv_tpu.io.quantize import quantize_model_file

    src = require_fixture("tiny-rwkv-5v2-730K-FP32.bin")
    for fmt in ("Q4_K", "Q5_K"):
        py_out = tmp_path / f"py-{fmt}.bin"
        nat_out = tmp_path / f"nat-{fmt}.bin"
        quantize_model_file(str(src), str(py_out), fmt, verbose=False)
        native.quantize_model_file(str(src), str(nat_out),
                                   int(dtype_from_name(fmt)))
        assert py_out.read_bytes() == nat_out.read_bytes()
