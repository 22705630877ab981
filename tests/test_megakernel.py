"""Whole-model v7 decode mega-kernel vs the serving engine's per-op path
(interpreter mode on CPU; numerics re-verified natively on TPU by
scripts/bench_megakernel.py — see the silent-miscompute hazard documented
in ops/megakernel.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import require_fixture


@pytest.mark.parametrize("quant", [False, True])
def test_megamodel_matches_serving_fixture(quant):
    """End-to-end decode on the tiny 7v0 fixture: the single-pallas_call
    whole-model path must match the per-op serving path."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel(path, precision=precision)
    mega = ServingModel(path, precision=precision, megakernel=True)
    mega.mega_min_batch = 2  # force the batched kernel at tiny B

    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in b'"in":':
        logits_r, state_r = ref.decode(np.array([tok], np.int32), state_r)
        logits_m, state_m = mega.decode(np.array([tok], np.int32), state_m)
        np.testing.assert_allclose(
            np.asarray(logits_m), np.asarray(logits_r), rtol=2e-2, atol=2e-2
        )
    # recurrent state agreement after several steps
    np.testing.assert_allclose(
        np.asarray(state_m["heads"]), np.asarray(state_r["heads"]),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(state_m["att_xx"]), np.asarray(state_r["att_xx"]),
        rtol=2e-2, atol=2e-2,
    )


def test_megamodel_synth_multilayer():
    """Synthetic 4-layer model (exercises v_first carry across layers and
    the i==0 branch inside the grid) vs the f32 parity forward."""
    from rwkv_tpu.models.graph import forward
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.state import init_state
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=4, n_embed=128, n_vocab=256, head_size=32)
    params = synth_params(cfg, seed=1, lora_dim=32)

    mega = ServingModel((cfg, params), precision="bf16", megakernel=True)
    state_m = mega.init_state(1)
    state_p = init_state(cfg)

    toks = [5, 77, 200, 13]
    for tok in toks:
        logits_p, state_p = forward(
            params, state_p, jnp.asarray([tok], jnp.int32), cfg, True
        )
        logits_m, state_m = mega.decode(np.array([tok], np.int32), state_m)
    scale = np.abs(np.asarray(logits_p)).max()
    np.testing.assert_allclose(
        np.asarray(logits_m[0]), np.asarray(logits_p),
        rtol=3e-2, atol=3e-2 * max(scale, 1.0),
    )


@pytest.mark.parametrize("quant", [False, True])
def test_megamodel_batched_matches_serving_fixture(quant):
    """Batched (B=3) whole-model kernel vs the per-op serving path, with a
    DIFFERENT token stream per batch lane (catches lane mixups in the
    [C, B] / [H, S_i, S_j, B] layouts)."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel(path, precision=precision)
    mega = ServingModel(path, precision=precision, megakernel=True)
    mega.mega_min_batch = 2  # force the batched kernel at tiny B

    B = 3
    state_r = ref.init_state(B)
    state_m = mega.init_state(B)
    streams = [b'"in:', b'abc,', b'\x00Zq.']
    for step in range(4):
        toks = np.array([s[step] for s in streams], np.int32)
        logits_r, state_r = ref.decode(toks, state_r)
        logits_m, state_m = mega.decode(toks, state_m)
        np.testing.assert_allclose(
            np.asarray(logits_m), np.asarray(logits_r), rtol=2e-2, atol=2e-2
        )
    np.testing.assert_allclose(
        np.asarray(state_m["heads"]), np.asarray(state_r["heads"]),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(state_m["att_xx"]), np.asarray(state_r["att_xx"]),
        rtol=2e-2, atol=2e-2,
    )


def test_megamodel_batched_lane_independence():
    """Lanes of one batched call carrying IDENTICAL streams must produce
    bit-identical logits and state (vs the B=1 kernel only ulp-level
    reduction-order agreement is expected — different matmul shapes). Any
    cross-lane leakage through the per-column activation scales or the
    [H, S_i, S_j, B] state layout breaks exact equality here."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=3, n_embed=128, n_vocab=256, head_size=32)
    params = synth_params(cfg, seed=3, lora_dim=32)
    mega = ServingModel((cfg, params), precision="w8a8", megakernel=True)
    mega.mega_min_batch = 2  # force the batched kernel at tiny B

    # lanes (s1, s2, s1, s2): 0 must bit-match 2, and 1 must bit-match 3
    rng = np.random.default_rng(0)
    two = rng.integers(0, 256, size=(2, 5)).astype(np.int32)
    streams = two[[0, 1, 0, 1]]

    state_b = mega.init_state(4)
    for step in range(streams.shape[1]):
        logits_b, state_b = mega.decode(streams[:, step], state_b)

    lb = np.asarray(logits_b)
    np.testing.assert_array_equal(lb[0], lb[2])
    np.testing.assert_array_equal(lb[1], lb[3])
    assert np.abs(lb[0] - lb[1]).max() > 0  # different streams DO differ
    hb = np.asarray(state_b["heads"])
    np.testing.assert_array_equal(hb[0], hb[2])
    np.testing.assert_array_equal(hb[1], hb[3])


def test_mega_pack_quant_roundtrip():
    """Pack quantization matches the serving w8a8 row-wise codes."""
    from rwkv_tpu.models.loader import load_params
    from rwkv_tpu.ops.megakernel import build_mega_pack
    from rwkv_tpu.ops.kernels import quantize_q8_serving

    cfg, params = load_params(str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin")))
    pack = build_mega_pack(params, cfg, quant=True)
    # out weights of layer 0: same rowwise int8 codes as the serving path
    w = np.asarray(params["blocks"][0]["att.output.weight"].w, np.float32)
    ref = quantize_q8_serving(jnp.asarray(w), rowwise=True)
    np.testing.assert_array_equal(
        np.asarray(pack["out"][0]), np.asarray(ref.q).T[: w.shape[0]]
    )


@pytest.mark.parametrize("quant", [False, True])
def test_megamodel_v6_matches_serving_fixture(quant):
    """v6 whole-model kernel vs the per-op serving path on the tiny 6v0
    fixture (only quantized base files exist for 6v0; Q5_1 is the
    committed format-stability fixture)."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-6v0-3m-Q5_1.bin"))
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel(path, precision=precision)
    mega = ServingModel(path, precision=precision, megakernel=True)

    # w8a8 activation scales differ in granularity (per-matvec in the
    # kernel vs per-token-row per-op) and the difference compounds through
    # the recurrent state, so the quant band is a bounded-drift gate
    # (argmax must still agree every step); bf16 stays tight.
    atol = 1e-1 if quant else 2e-2
    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in b'"in":':
        logits_r, state_r = ref.decode(np.array([tok], np.int32), state_r)
        logits_m, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(logits_r), np.asarray(logits_m)
        np.testing.assert_allclose(lm, lr, rtol=2e-2, atol=atol)
        assert lm.argmax() == lr.argmax()
    # On this fixture the per-op quant path keeps the file's Q5_1 blocks
    # (higher precision than the kernel's int8 rows), so the quant state
    # band is bounded-drift, not closeness.
    satol = 2.5e-1 if quant else 2e-2
    np.testing.assert_allclose(
        np.asarray(state_m["heads"]), np.asarray(state_r["heads"]),
        rtol=2e-2, atol=satol,
    )
    np.testing.assert_allclose(
        np.asarray(state_m["att_xx"]), np.asarray(state_r["att_xx"]),
        rtol=2e-2, atol=satol,
    )
    np.testing.assert_allclose(
        np.asarray(state_m["ffn_xx"]), np.asarray(state_r["ffn_xx"]),
        rtol=2e-2, atol=satol,
    )


def test_megamodel_v6_batched_falls_back():
    """B>1 v6 decode must fall back to the per-op path (identical
    results), not crash."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-6v0-3m-Q5_1.bin"))
    ref = ServingModel(path, precision="bf16")
    mega = ServingModel(path, precision="bf16", megakernel=True)
    toks = np.array([34, 105, 110], np.int32)
    sr, sm = ref.init_state(3), mega.init_state(3)
    lr, sr = ref.decode(toks, sr)
    lm, sm = mega.decode(toks, sm)
    np.testing.assert_array_equal(np.asarray(lm), np.asarray(lr))


@pytest.mark.parametrize("version,quant", [
    ("5v1-730K", False), ("5v1-730K", True),
    ("5v2-730K", False), ("5v2-730K", True),
])
def test_megamodel_v5_matches_serving_fixture(version, quant):
    """v5.1/v5.2 whole-model kernel vs the per-op serving path on the
    tiny fixtures (5.1: per-head scalar decay, no gate; 5.2: [H, S]
    decay + silu gate)."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture(f"tiny-rwkv-{version}-FP32.bin"))
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel(path, precision=precision)
    mega = ServingModel(path, precision=precision, megakernel=True)

    # bf16 band: the kernel keeps activations f32 (f32/HIGHEST matvecs on
    # upcast bf16 weights) while the per-op path rounds activations to
    # bf16, and the difference compounds through the recurrent state —
    # measured max abs 0.042 logits / 0.064 state over the 5-token prompt
    # (scripts/probe_bf16_xpath_tol.py); bands at ~2x with argmax checks.
    atol = 1e-1 if quant else 6e-2
    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in b'"in":':
        logits_r, state_r = ref.decode(np.array([tok], np.int32), state_r)
        logits_m, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(logits_r), np.asarray(logits_m)
        np.testing.assert_allclose(lm, lr, rtol=2e-2, atol=atol)
        assert lm.argmax() == lr.argmax()
    satol = 2.5e-1 if quant else 1.2e-1
    for key in ("heads", "att_xx", "ffn_xx"):
        np.testing.assert_allclose(
            np.asarray(state_m[key]), np.asarray(state_r[key]),
            rtol=2e-2, atol=satol,
        )


@pytest.mark.parametrize("quant", [False, True])
def test_megamodel_v4_matches_serving_fixture(quant):
    """v4 whole-model kernel (scalar aa/bb/pp state, max-trick wkv) vs
    the per-op serving path on the tiny 4v0 fixture."""
    from rwkv_tpu.models.serve import ServingModel

    path = str(require_fixture("tiny-rwkv-4v0-660K-FP32.bin"))
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel(path, precision=precision)
    mega = ServingModel(path, precision=precision, megakernel=True)

    # bf16 band calibrated like the v5 test above: measured max abs 0.038
    # logits / 0.006 state (scripts/probe_bf16_xpath_tol.py).
    atol = 1e-1 if quant else 6e-2
    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in b'"in":':
        logits_r, state_r = ref.decode(np.array([tok], np.int32), state_r)
        logits_m, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(logits_r), np.asarray(logits_m)
        np.testing.assert_allclose(lm, lr, rtol=2e-2, atol=atol)
        assert lm.argmax() == lr.argmax()
    satol = 2.5e-1 if quant else 2e-2
    for key in ("aa", "bb", "att_xx", "ffn_xx"):
        np.testing.assert_allclose(
            np.asarray(state_m[key]), np.asarray(state_r[key]),
            rtol=2e-2, atol=satol,
        )


def test_megamodel_tiled_rkv_phases():
    """Wide synth model that crosses the row-tiling thresholds (m > 1:
    rkv/out stream as row tiles, the 7B-class configuration) vs the
    per-op path. C=2304 -> m=2, nr=6, no=2, and _mega_big routes B=1
    through the phase-tiled kernel."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    cfg = synth_config("7.0", n_layer=2, n_embed=2304, n_vocab=512,
                       head_size=64)
    nh, nf, nr, no = choose_tiling(cfg, True, 1)
    assert nr > 3 and no > 1, (nr, no)  # the path under test
    params = synth_params(cfg, seed=5, lora_dim=64)
    # bf16: closeness band calibrated for the f32/HIGHEST kernel matvecs
    # vs the per-op path's bf16 activation rounding — measured rel up to
    # 8e-3 across versions (scripts/probe_bf16_xpath_tol.py);
    # w8a8: bounded drift + argmax (activation-scale granularity differs).
    for precision, tol in (("bf16", 2e-2), ("w8a8", 1e-1)):
        ref = ServingModel((cfg, params), precision=precision)
        mega = ServingModel((cfg, params), precision=precision,
                            megakernel=True)
        assert mega._mega_big  # must route through the tiled kernel

        state_r = ref.init_state(1)
        state_m = mega.init_state(1)
        for tok in (3, 77, 200):
            lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
            lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
            lr, lm = np.asarray(lr), np.asarray(lm)
            scale = max(np.abs(lr).max(), 1e-6)
            assert np.abs(lm - lr).max() / scale < tol
            assert lm.argmax() == lr.argmax()


def test_megamodel_v6_tiled_big():
    """v6 phase-tiled kernel (big-model routing) vs the per-op path:
    C=2304 L=2 crosses the row-tiling thresholds (bf16 m=3, w8a8 m=2 —
    rkvg/out/fr stream as row tiles), and _mega_big routes B=1 through
    v6_decode_megakernel_tiled."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    cfg = synth_config("6.0", n_layer=2, n_embed=2304, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=7)
    for precision, tol in (("bf16", 2e-2), ("w8a8", 1e-1)):
        quant = precision == "w8a8"
        nh, nf, ng, no = choose_tiling(cfg, quant, 1,
                                       f_dim=4 * cfg.n_embed, n_proj=4)
        assert ng > 4 and no > 1, (ng, no)  # the row-tiled branch
        ref = ServingModel((cfg, params), precision=precision)
        mega = ServingModel((cfg, params), precision=precision,
                            megakernel=True)
        assert mega._mega_big  # must route through the tiled kernel

        state_r = ref.init_state(1)
        state_m = mega.init_state(1)
        for tok in (3, 77, 200):
            lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
            lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
            lr, lm = np.asarray(lr), np.asarray(lm)
            scale = max(np.abs(lr).max(), 1e-6)
            assert np.abs(lm - lr).max() / scale < tol
            assert lm.argmax() == lr.argmax()


def test_megamodel_v6_tiled_fused():
    """v6 phase-tiled kernel in the FUSED (m=1) configuration — C=1536
    w8a8 keeps the whole [4C, C] rkvg window in one phase while still
    routing through the tiled kernel. (C>=2048 4-projection layers now
    row-tile by design: their windows overflow the 128MB VMEM on chip,
    see choose_tiling.)"""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    cfg = synth_config("6.0", n_layer=2, n_embed=1536, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=8)
    nh, nf, ng, no = choose_tiling(cfg, True, 1,
                                   f_dim=4 * cfg.n_embed, n_proj=4)
    assert ng == 4 and no == 1, (ng, no)  # the fused branch
    ref = ServingModel((cfg, params), precision="w8a8")
    mega = ServingModel((cfg, params), precision="w8a8", megakernel=True)
    assert mega._mega_big

    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in (11, 42):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lm - lr).max() / scale < 1e-1
        assert lm.argmax() == lr.argmax()


def test_megamodel_v4_tiled_big():
    """v4 phase-tiled kernel (big-model routing — the reference's own 7B
    benchmark arch) vs the per-op path: C=2304 L=2 crosses the
    row-tiling thresholds; C=2048 w8a8 exercises the fused (m=1)
    configuration."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    for c, precision, tol, expect_fused in (
        (2304, "bf16", 2e-2, False),
        (2304, "w8a8", 1e-1, False),
        (2048, "w8a8", 1e-1, True),
    ):
        cfg = synth_config("4.0", n_layer=2, n_embed=c, n_vocab=512,
                           head_size=64)
        quant = precision == "w8a8"
        _, nf, nr, no = choose_tiling(cfg, quant, 1,
                                      f_dim=4 * c, n_proj=3)
        assert (nr == 3) == expect_fused, (c, precision, nr)
        params = synth_params(cfg, seed=11)
        ref = ServingModel((cfg, params), precision=precision)
        mega = ServingModel((cfg, params), precision=precision,
                            megakernel=True)
        assert mega._mega_big  # must route through the tiled kernel

        state_r = ref.init_state(1)
        state_m = mega.init_state(1)
        for tok in (3, 77, 200):
            lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
            lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
            lr, lm = np.asarray(lr), np.asarray(lm)
            scale = max(np.abs(lr).max(), 1e-6)
            assert np.abs(lm - lr).max() / scale < tol, (c, precision)
            # random-synth w8a8 logits can have near-ties within quant
            # noise; exact argmax is only meaningful for bf16
            if precision == "bf16":
                assert lm.argmax() == lr.argmax(), (c, precision)
            else:
                top5 = np.argsort(lr[0])[-5:]
                assert lm[0].argmax() in top5, (c, precision)


@pytest.mark.parametrize("minor", ["1", "2"])
def test_megamodel_v5_tiled_big(minor):
    """v5 phase-tiled kernel (big-model routing) vs the per-op path for
    both minor versions (5.1: no gate, 3 projections; 5.2: silu gate,
    4 projections), covering fused and row-tiled configurations (the
    fused width differs per minor: C>=2048 4-projection layers row-tile
    by design — their windows overflow the on-chip VMEM, see
    choose_tiling)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    n_mix = 4 if minor == "2" else 3
    for c, precision, tol, expect_fused in (
        (2304, "bf16", 2e-2, False),
        (2048 if n_mix == 3 else 1536, "w8a8", 1e-1, True),
    ):
        cfg = synth_config(f"5.{minor}", n_layer=2, n_embed=c,
                           n_vocab=512, head_size=64)
        quant = precision == "w8a8"
        _, nf, ng, no = choose_tiling(cfg, quant, 1,
                                      f_dim=4 * c, n_proj=n_mix)
        assert (ng == n_mix) == expect_fused, (c, precision, ng)
        params = synth_params(cfg, seed=13)
        ref = ServingModel((cfg, params), precision=precision)
        mega = ServingModel((cfg, params), precision=precision,
                            megakernel=True)
        assert mega._mega_big

        state_r = ref.init_state(1)
        state_m = mega.init_state(1)
        for tok in (3, 77, 200):
            lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
            lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
            lr, lm = np.asarray(lr), np.asarray(lm)
            scale = max(np.abs(lr).max(), 1e-6)
            assert np.abs(lm - lr).max() / scale < tol, (minor, c, precision)
            if precision == "bf16":
                assert lm.argmax() == lr.argmax(), (minor, c)
            else:
                top5 = np.argsort(lr[0])[-5:]
                assert lm[0].argmax() in top5, (minor, c)


def test_megamodel_w4a8_matches_int4_dequant_reference():
    """w4a8 serving (int4 row-wise weights on the tiled kernel): the
    kernel must match a bf16 per-op reference whose big mats are
    replaced by the SAME int4 dequantization — isolating activation
    quantization noise from the (intended) int4 weight error. Covers
    fused (C=512 via forced routing) and row-tiled (C=2304) configs."""
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    BIG = ("att.receptance.weight", "att.key.weight", "att.value.weight",
           "att.output.weight", "ffn.key.weight", "ffn.value.weight")

    def deq4(w):
        from rwkv_tpu.ops.megakernel import _np_dense

        w = _np_dense(w).astype(np.float32)
        amax = np.abs(w).max(axis=-1, keepdims=True)
        d = amax / 7.0
        inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
        q = np.clip(np.rint(w * inv), -7, 7)
        return (q * d).astype(np.float32)

    for c in (512, 2304):
        cfg = synth_config("7.0", n_layer=2, n_embed=c, n_vocab=512,
                           head_size=64)
        params = synth_params(cfg, seed=17, lora_dim=64)
        params_ref = dict(params)
        params_ref["blocks"] = [
            {k: (deq4(v) if k in BIG else v) for k, v in b.items()}
            for b in params["blocks"]
        ]
        ref = ServingModel((cfg, params_ref), precision="bf16")
        w4 = ServingModel((cfg, params), precision="w4a8",
                          megakernel=True)
        assert w4._mega_big  # w4 always routes through the tiled kernel
        assert w4._mega["w4"]

        state_r = ref.init_state(1)
        state_m = w4.init_state(1)
        for tok in (3, 77, 200):
            lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
            lm, state_m = w4.decode(np.array([tok], np.int32), state_m)
            lr, lm = np.asarray(lr), np.asarray(lm)
            scale = max(np.abs(lr).max(), 1e-6)
            # residual differences: int8 activations + int8 loras vs
            # the reference's bf16 — same band as the w8a8 tests
            assert np.abs(lm - lr).max() / scale < 1.5e-1, c
            top5 = np.argsort(lr[0])[-5:]
            assert lm[0].argmax() in top5, c


def test_megamodel_w4a8_whole_layer_matches_tiled():
    """Small v7 w4a8 B=1 routes through the WHOLE-LAYER kernel (row
    vectors, head-pair state, in-kernel int8 head, split-half int4 big
    mats). It must agree with the phase-tiled w4 kernel on the same
    engine: both consume identical int4 codes with per-matvec int8
    activation quantization, so only f32 reduction order differs."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=2, n_embed=512, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=23, lora_dim=64)
    srv = ServingModel((cfg, params), precision="w4a8", megakernel=True)
    assert srv._mega_rows is not None and srv._mega_rows["w4"]
    assert srv._mega_rows["rkv"].shape[-1] == cfg.n_embed // 2
    assert "head8" in srv._mega_rows

    run_t, arrs_t = srv._mega_tiled1_fn()
    state_w = srv.init_state(1)
    state_t = srv.init_state(1)
    for tok in (3, 77, 200, 41):
        lw, state_w = srv.decode(np.array([tok], np.int32), state_w)
        lt, state_t = run_t(srv.params, arrs_t,
                            state_t, jnp.asarray([tok], jnp.int32))
        lw, lt = np.asarray(lw), np.asarray(lt)
        scale = max(np.abs(lt).max(), 1e-6)
        assert np.abs(lw - lt).max() / scale < 2e-5, tok
        assert lw.argmax() == lt.argmax()


@pytest.mark.parametrize("version", ["4.0", "5.2", "6.0"])
def test_megamodel_w4a8_other_archs(version):
    """w4a8 on the v4/v5/v6 tiled kernels (C=512, fused config — the
    row-tiled mv_big sites are shared with the v7 C=2304 case) vs a
    bf16 per-op reference carrying the same int4 dequantization."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import _np_dense

    BIG = {
        "4.0": ("att.receptance.weight", "att.key.weight",
                "att.value.weight", "att.output.weight",
                "ffn.key.weight", "ffn.value.weight",
                "ffn.receptance.weight"),
        "5.2": ("att.receptance.weight", "att.key.weight",
                "att.value.weight", "att.gate.weight",
                "att.output.weight", "ffn.key.weight",
                "ffn.value.weight", "ffn.receptance.weight"),
        "6.0": ("att.receptance.weight", "att.key.weight",
                "att.value.weight", "att.gate.weight",
                "att.output.weight", "ffn.key.weight",
                "ffn.value.weight", "ffn.receptance.weight"),
    }[version]

    def deq4(w):
        w = _np_dense(w).astype(np.float32)
        amax = np.abs(w).max(axis=-1, keepdims=True)
        d = amax / 7.0
        inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
        return (np.clip(np.rint(w * inv), -7, 7) * d).astype(np.float32)

    cfg = synth_config(version, n_layer=2, n_embed=512, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=19)
    params_ref = dict(params)
    params_ref["blocks"] = [
        {k: (deq4(v) if k in BIG else v) for k, v in b.items()}
        for b in params["blocks"]
    ]
    ref = ServingModel((cfg, params_ref), precision="bf16")
    w4 = ServingModel((cfg, params), precision="w4a8", megakernel=True)
    assert w4._mega_big and w4._mega["w4"]

    state_r = ref.init_state(1)
    state_m = w4.init_state(1)
    for tok in (3, 77, 200):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lm, state_m = w4.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lm - lr).max() / scale < 1.5e-1, version
        top5 = np.argsort(lr[0])[-5:]
        assert lm[0].argmax() in top5, version


def test_megamodel_tiled_fused_multi_ffn_tiles():
    """REGRESSION (round-2 review finding): in the fused (m=1) layout
    with nf > 1 — the 1.5B-class flagship configuration — the caller's
    BlockSpec phase constants once used the non-fused layout while the
    kernel used the fused one, so every fk/fv phase consumed tile 0's
    weights. C=1280 bf16 gives m=1, nf=4 and routes through the tiled
    kernel."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import choose_tiling

    cfg = synth_config("7.0", n_layer=2, n_embed=1280, n_vocab=512,
                       head_size=64)
    nh, nf, nr, no = choose_tiling(cfg, False, 1)
    assert nr == 3 and nf > 1, (nr, nf)  # the configuration under test
    params = synth_params(cfg, seed=31, lora_dim=64)
    ref = ServingModel((cfg, params), precision="bf16")
    mega = ServingModel((cfg, params), precision="bf16", megakernel=True)
    assert mega._mega_big

    state_r = ref.init_state(1)
    state_m = mega.init_state(1)
    for tok in (3, 77, 200):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, lm = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lm - lr).max() / scale < 5e-3
        assert lm.argmax() == lr.argmax()


def test_megamodel_w4a8_batched_tiled():
    """w4a8 through the BATCHED tiled kernel (batch on lanes) must match
    the B=1 tiled kernel per sequence — identical int4 codes, and the
    per-column activation scales equal the B=1 scalar scales (comparing
    against w8a8 instead would only measure int4 weight error, which is
    large on tiny random models)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=37, lora_dim=32)
    one = ServingModel((cfg, params), precision="w4a8", megakernel=True)
    bat = ServingModel((cfg, params), precision="w4a8", megakernel=True)
    bat.mega_min_batch = 2  # force the batched kernel at tiny B

    toks = np.array([3, 77, 200, 11], np.int32)
    refs = []
    for t in toks:
        st = one.init_state(1)
        lg, st = one.decode(np.array([t], np.int32), st)
        refs.append(np.asarray(lg)[0])
    refs = np.stack(refs)

    stb = bat.init_state(4)
    lgb, stb = bat.decode(toks, stb)
    lgb = np.asarray(lgb)
    scale = max(np.abs(refs).max(), 1e-6)
    assert np.abs(lgb - refs).max() / scale < 1e-5


def test_mega_pack_save_load_roundtrip(tmp_path):
    """save/load of a retiled pack is bit-exact and produces identical
    kernel output."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack, load_mega_pack, retile_mega_pack,
        save_mega_pack, v7_decode_megakernel_tiled,
    )
    import jax.numpy as jnp

    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=43, lora_dim=32)
    pack = retile_mega_pack(
        build_mega_pack(params, cfg, quant=True, w4=True), cfg, 1, 1, 3, 1
    )
    path = str(tmp_path / "pack.npz")
    save_mega_pack(path, pack)
    pack2 = load_mega_pack(path)

    assert set(pack2) == set(pack)
    for k in pack:
        if hasattr(pack[k], "shape"):
            np.testing.assert_array_equal(
                np.asarray(pack[k]), np.asarray(pack2[k]), err_msg=k
            )
        else:
            assert pack[k] == pack2[k], k

    state = {
        "att_xx": jnp.zeros((2, 256, 1), jnp.float32),
        "ffn_xx": jnp.zeros((2, 256, 1), jnp.float32),
        "heads": jnp.zeros((2, 1, 4, 64, 64), jnp.float32),
    }
    x0 = jnp.ones((256, 1), jnp.float32) * 0.1
    y1, _ = v7_decode_megakernel_tiled(pack, state, x0, cfg, interpret=True)
    y2, _ = v7_decode_megakernel_tiled(pack2, state, x0, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_serving_mega_pack_cache(tmp_path):
    """ServingModel(mega_pack_cache=...) writes the pack on first build
    and loads it on the next construction with identical decode."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=2, n_embed=128, n_vocab=256,
                       head_size=32)
    params = synth_params(cfg, seed=47, lora_dim=32)
    cache = str(tmp_path / "mega.npz")

    a = ServingModel((cfg, params), precision="w8a8", megakernel=True,
                     mega_pack_cache=cache)
    import os
    assert os.path.exists(cache)
    b = ServingModel((cfg, params), precision="w8a8", megakernel=True,
                     mega_pack_cache=cache)

    sa, sb = a.init_state(1), b.init_state(1)
    for tok in (3, 77):
        la, sa = a.decode(np.array([tok], np.int32), sa)
        lb, sb = b.decode(np.array([tok], np.int32), sb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("quant", [True, False])
def test_megamodel_inkernel_head(quant):
    """build_mega_pack(head=True): the decode kernel's extra head phases
    must reproduce the per-op engine's logits (w8a8 shares the exact
    rowwise-int8 + per-matvec activation-scale semantics, so it is
    bit-equal; bf16 differs only by the per-op path's bf16 activation
    rounding — same band as the other bf16 cross-path gates)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import build_mega_pack, v7_decode_megakernel
    from rwkv_tpu.ops.parity import layer_norm

    cfg = synth_config("7.0", n_layer=3, n_embed=256, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=5, lora_dim=64)
    pack = build_mega_pack(params, cfg, quant=quant, head=True)
    srv = ServingModel((cfg, params), precision="w8a8" if quant else "bf16")

    state_r = srv.init_state(1)
    state_t = {
        "att_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1), jnp.float32),
        "ffn_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1), jnp.float32),
        "heads": jnp.zeros(
            (cfg.n_layer, cfg.head_count, cfg.head_size, cfg.head_size),
            jnp.float32,
        ),
    }
    tol = 1e-5 if quant else 2e-2
    for tok in (34, 105, 110, 7, 200):
        lr, state_r = srv.decode(np.array([tok], np.int32), state_r)
        x0 = layer_norm(
            srv.params["emb"][tok].astype(jnp.float32), *srv.params["ln0"]
        )
        y, state_t, logits = v7_decode_megakernel(
            pack, state_t, x0[:, None], cfg, interpret=True
        )
        lr = np.asarray(lr)[0]
        lm = np.asarray(logits)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lm - lr).max() / scale < tol
        assert lm.argmax() == lr.argmax()


@pytest.mark.parametrize("quant", [True, False])
def test_megamodel_batched_packed(quant):
    """Lane-packed batched kernel (state [H, S_j, S_i*B]) through the
    serving fn: logits match the per-op engine across steps (same bands
    as the other cross-path gates)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=3, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=9, lora_dim=32)
    precision = "w8a8" if quant else "bf16"
    ref = ServingModel((cfg, params), precision=precision)
    mega = ServingModel((cfg, params), precision=precision,
                        megakernel=True)
    run, arrs = mega._mega_batched_packed_fn(4)

    toks = np.array([3, 77, 200, 9], np.int32)
    st_r = ref.init_state(4)
    st_m = mega.init_state(4)
    # bf16 band: kernel keeps activations f32 (f32/HIGHEST matvecs)
    # while the per-op path rounds them to bf16 — same calibrated band
    # as the whole-layer kernel gates (measured 0.034 rel here)
    tol = 5e-2 if quant else 6e-2
    for _ in range(3):
        lr, st_r = ref.decode(toks, st_r)
        lm, st_m = run(mega.params, arrs, st_m, jnp.asarray(toks))
        lr_, lm_ = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr_).max(), 1e-6)
        assert np.abs(lm_ - lr_).max() / scale < tol
        assert (lm_.argmax(-1) == lr_.argmax(-1)).all()
        toks = lr_.argmax(-1).astype(np.int32)


@pytest.mark.parametrize("quant", [True, False])
def test_packed_matches_plain_batched(quant):
    """The lane-packed batched kernel reproduces the plain batched
    kernel (B on lanes, padded) near-exactly on the same pack — the
    packed layout moves are selection dots, not relayouts."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack, pack_batched_state, rowify_mega_pack,
        unpack_batched_state, v7_decode_megakernel_batched,
        v7_decode_megakernel_batched_packed,
    )

    cfg = synth_config("7.0", n_layer=3, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=7, lora_dim=32)
    h, s, c, L = (cfg.head_count, cfg.head_size, cfg.n_embed,
                  cfg.n_layer)
    B = 4
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, B)) * 0.3, jnp.float32)
    heads0 = jnp.asarray(rng.normal(size=(B, L, h, s, s)) * 0.05,
                         jnp.float32)
    axx = jnp.asarray(rng.normal(size=(L, c, B)) * 0.1, jnp.float32)
    fxx = jnp.asarray(rng.normal(size=(L, c, B)) * 0.1, jnp.float32)

    pack = build_mega_pack(params, cfg, quant=quant)
    st_ref = {"att_xx": axx, "ffn_xx": fxx,
              "heads": jnp.transpose(heads0, (1, 2, 3, 4, 0))}
    y_ref, new_ref = v7_decode_megakernel_batched(
        pack, st_ref, x0, cfg, interpret=True
    )

    rpack = rowify_mega_pack(pack)
    st_p = {"att_xx": axx, "ffn_xx": fxx,
            "heads": pack_batched_state(heads0, h, s)}
    y_p, new_p = v7_decode_megakernel_batched_packed(
        rpack, st_p, x0, cfg, interpret=True
    )

    y_ref, y_p = np.asarray(y_ref), np.asarray(y_p)
    rel = np.abs(y_p - y_ref).max() / max(np.abs(y_ref).max(), 1e-6)
    assert rel < 2e-5, rel
    hp = np.asarray(unpack_batched_state(new_p["heads"], B, h, s))
    hr = np.asarray(jnp.transpose(new_ref["heads"], (4, 0, 1, 2, 3)))
    hrel = np.abs(hp - hr).max() / max(np.abs(hr).max(), 1e-6)
    assert hrel < 2e-5, hrel


@pytest.mark.parametrize("version", ["4.0", "5.1", "5.2", "6.0"])
def test_megamodel_inkernel_head_v456(version):
    """In-kernel LM head phases for the v4/v5/v6 whole-layer kernels
    (same interleaved-fetch design as v7): the kernel's logits must be
    equal (to 1 ulp) to running the same kernel without the head
    phases and
    applying ln_out + the identical int8 head dequant-matvec outside —
    isolating the head mechanism from the known v5/v6 cross-path
    activation-scale drift."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack_v4, build_mega_pack_v5, build_mega_pack_v6,
        rowify_mega_pack_v4, rowify_mega_pack_v5, rowify_mega_pack_v6,
        v4_decode_megakernel, v5_decode_megakernel, v6_decode_megakernel,
    )
    from rwkv_tpu.ops.parity import layer_norm

    cfg = synth_config(version, n_layer=3, n_embed=256, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=5)
    major = cfg.version_major
    build, rowify, step = {
        4: (build_mega_pack_v4, rowify_mega_pack_v4, v4_decode_megakernel),
        5: (build_mega_pack_v5, rowify_mega_pack_v5, v5_decode_megakernel),
        6: (build_mega_pack_v6, rowify_mega_pack_v6, v6_decode_megakernel),
    }[major]
    pack = rowify(build(params, cfg, quant=True, head=True))
    pack_nohead = {k: v for k, v in pack.items()
                   if not k.startswith(("head", "ln_out"))}

    L, c = cfg.n_layer, cfg.n_embed
    if major == 4:
        state0 = {k: jnp.zeros((L, c, 1), jnp.float32)
                  for k in ("att_xx", "ffn_xx", "aa", "bb")}
        state0["pp"] = jnp.full((L, c, 1), -1e30, jnp.float32)
    else:
        state0 = {
            "att_xx": jnp.zeros((L, c, 1), jnp.float32),
            "ffn_xx": jnp.zeros((L, c, 1), jnp.float32),
            "heads": jnp.zeros(
                (L, cfg.head_count, cfg.head_size, cfg.head_size),
                jnp.float32,
            ),
        }
    state_h = dict(state0)
    state_n = dict(state0)

    for tok in (34, 105, 110, 7, 200):
        x0 = layer_norm(
            jnp.asarray(np.asarray(params["emb"], np.float32)[tok]),
            *params["ln0"],
        )
        y_h, state_h, logits = step(
            pack, state_h, x0[:, None], cfg, interpret=True
        )
        y_n, state_n = step(
            pack_nohead, state_n, x0[:, None], cfg, interpret=True
        )
        # reference: same ln_out + same int8 head codes, outside
        xo = layer_norm(y_n[:, 0], jnp.asarray(pack["ln_out.weight"])[0],
                        jnp.asarray(pack["ln_out.bias"])[0])
        amax = jnp.max(jnp.abs(xo))
        dx = amax / 127.0
        inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(xo * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8[None, :], pack["head8"],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        ref_logits = (acc.astype(jnp.float32) * dx * pack["head_d"])[0]
        np.testing.assert_array_equal(np.asarray(y_h), np.asarray(y_n))
        # 1-ulp fusion-order noise between the interpret-mode kernel
        # dot and the XLA reference dot
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits),
            rtol=1e-6, atol=1e-6,
        )


def test_megamodel_tiled_packed_batched():
    """Big-model mid-B routing: decode at 2 <= B < 128 on a _mega_big
    engine runs the lane-PACKED phase-tiled kernel; logits must match
    the per-op engine (w8a8 cross-path band)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=3, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=11, lora_dim=32)
    ref = ServingModel((cfg, params), precision="w8a8")
    mega = ServingModel((cfg, params), precision="w8a8",
                        megakernel=True)
    mega._mega_big = True  # force big-model routing at a testable size

    toks = np.array([3, 77, 200, 9], np.int32)
    st_r = ref.init_state(4)
    st_m = mega.init_state(4)
    for _ in range(3):
        lr, st_r = ref.decode(toks, st_r)
        lm, st_m = mega.decode(toks, st_m)
        lr_, lm_ = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr_).max(), 1e-6)
        assert np.abs(lm_ - lr_).max() / scale < 5e-2
        assert (lm_.argmax(-1) == lr_.argmax(-1)).all()
        toks = lr_.argmax(-1).astype(np.int32)


def test_device_pack_build_matches_host():
    """build_mega_pack's device path (jnp stack/densify/quantize, used
    when the param leaves live on an accelerator) must produce the SAME
    pack as the host numpy path — int8 codes bit-identical, scales and
    vectors exact."""
    from unittest import mock

    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops import megakernel as mk

    cfg = synth_config("7.0", n_layer=2, n_embed=128, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=23, lora_dim=32)
    host = mk.build_mega_pack(params, cfg, quant=True, head=True)
    with mock.patch.object(mk, "_params_on_accel", return_value=True):
        dev = mk.build_mega_pack(params, cfg, quant=True, head=True)
    assert host.keys() == dev.keys()
    for k in host:
        a, b = host[k], dev[k]
        if not hasattr(a, "shape"):
            assert a == b, k
            continue
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            assert np.array_equal(a, b), k  # codes bit-identical
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7,
                                       err_msg=k)
