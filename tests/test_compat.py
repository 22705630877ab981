"""Compatibility-layer tests: the reference-shaped API over the JAX core."""

import numpy as np
import pytest

from conftest import require_fixture


@pytest.fixture(scope="module")
def path():
    return str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin"))


def test_reference_call_pattern(path):
    from rwkv_tpu.compat import RWKVModel, load_rwkv_shared_library

    model = RWKVModel(load_rwkv_shared_library(), path, thread_count=2)
    assert model.n_vocab == 256 and model.n_layer == 12

    # Caller-owned flat buffers, exactly like the reference usage.
    state = np.zeros(model._state_buffer_element_count, np.float32)
    logits = np.zeros(model._logits_buffer_element_count, np.float32)
    for tok in (34, 105, 110):
        logits, state = model.eval(tok, state, state, logits)
    assert logits.shape == (256,)

    # Matches the core API.
    from rwkv_tpu.models.model import RWKVModel as Core

    core = Core(path)
    st = core.init_state()
    for tok in (34, 105, 110):
        ref_logits, st = core.eval(tok, st)
    np.testing.assert_allclose(logits, np.asarray(ref_logits), rtol=1e-6, atol=1e-6)


def test_eval_sequence_and_chunks(path):
    from rwkv_tpu.compat import RWKVModel

    model = RWKVModel(model_path=path)
    l1, s1 = model.eval_sequence([34, 105, 110])
    l2, s2 = model.eval_sequence_in_chunks([34, 105, 110], chunk_size=2)
    assert s1.shape == s2.shape
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-4)


def test_torch_tensors(path):
    torch = pytest.importorskip("torch")
    from rwkv_tpu.compat import RWKVModel

    model = RWKVModel(model_path=path)
    state = torch.zeros(model._state_buffer_element_count, dtype=torch.float32)
    logits, state = model.eval(34, state, use_numpy=False)
    assert logits is not None and hasattr(state, "numpy")
    np_logits, _ = model.eval(34)
    np.testing.assert_allclose(logits.numpy(), np_logits, rtol=1e-6)


def test_error_taxonomy(path):
    from rwkv_tpu.compat import RWKVError, RWKVModel, rwkv_error_flags

    with pytest.raises(RWKVError) as e:
        RWKVModel(model_path="/nonexistent/model.bin")
    assert e.value.flags == rwkv_error_flags.RWKV_ERROR_FILE_OPEN

    model = RWKVModel(model_path=path)
    with pytest.raises(RWKVError) as e:
        model.eval(34, np.zeros(3, np.float32))
    assert e.value.flags == rwkv_error_flags.RWKV_ERROR_SHAPE

    with pytest.raises(RWKVError) as e:
        model.eval(34, np.zeros(model._state_buffer_element_count, np.float64))
    assert e.value.flags == rwkv_error_flags.RWKV_ERROR_DATA_TYPE

    model.free()
    with pytest.raises(RWKVError):
        model.eval(34)


def test_system_info():
    from rwkv_tpu.compat import get_system_info_string

    s = get_system_info_string()
    assert "backend=" in s and "devices=" in s


def test_quantized_format_names_surface():
    """The binding layer advertises the same format-name tuple as the
    reference (rwkv_cpp_shared_library.py:8-16), K-quants included."""
    from rwkv_tpu.compat import QUANTIZED_FORMAT_NAMES

    assert QUANTIZED_FORMAT_NAMES == (
        "Q4_0", "Q4_1", "Q4_K", "Q5_0", "Q5_1", "Q5_K", "Q8_0",
    )


def test_legacy_format_request_rejected_gracefully(tmp_path):
    """Requesting a format with no codec fails with the reference's clear
    'unsupported data type' error path (rwkv_file_format.inc:5-24), not
    an internal KeyError."""
    import pytest

    from rwkv_tpu.io.quantize import quantize_model_file
    from tests.conftest import fixture_path

    src = fixture_path("tiny-rwkv-5v2-730K-FP32.bin")
    for name in ("Q4_2", "Q6_K"):
        with pytest.raises(ValueError, match="[Uu]nsupported"):
            quantize_model_file(src, str(tmp_path / "out.bin"), name)
