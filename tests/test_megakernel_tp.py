"""Tensor-parallel megakernel decode (shard_map + per-layer Pallas
kernels + psum) vs the single-chip phase-tiled kernel, on the 8-device
virtual CPU mesh in interpret mode. Both paths consume the SAME
build_mega_pack quantization codes, so the only expected differences
are the TP-local activation-quantization scales on the split
contractions (out/fv) and psum reduction order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


# quant band: the TP out/fv contractions quantize each chip's LOCAL
# activation slice with its own scalar scale (the single-chip kernel
# uses one global scale), a legitimate ~5% drift on random weights —
# same band as the other cross-path w8a8 gates.
@pytest.mark.parametrize("quant,tol", [(False, 1e-4), (True, 1e-1)])
def test_tp_megakernel_matches_single_chip(eight_devices, quant, tol):
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack, retile_mega_pack, v7_decode_megakernel_tiled,
    )
    from rwkv_tpu.ops.megakernel_tp import (
        build_mega_pack_tp, tp_decode_step,
    )
    from rwkv_tpu.parallel.sharding import make_mesh

    tp = 4
    mesh = make_mesh(1, tp, devices=eight_devices[:tp])
    cfg = synth_config("7.0", n_layer=3, n_embed=512, n_vocab=512,
                      head_size=64)
    params = synth_params(cfg, seed=23, lora_dim=64)
    base = build_mega_pack(params, cfg, quant=quant)

    L, c = cfg.n_layer, cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)
    heads0 = jnp.asarray(
        rng.normal(size=(L, h, s, s)) * 0.05, jnp.float32
    )
    axx0 = jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1, jnp.float32)
    fxx0 = jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1, jnp.float32)

    # single-chip reference: phase-tiled kernel (interpret), nh=1 nf=1
    ref_pack = retile_mega_pack(base, cfg, 1, 1, 3, 1)
    state_ref = {
        "att_xx": axx0,
        "ffn_xx": fxx0,
        "heads": heads0.reshape(L, 1, h, s, s),
    }
    y_ref, st_ref = v7_decode_megakernel_tiled(
        ref_pack, state_ref, x0, cfg, interpret=True
    )

    # TP path
    tp_pack = build_mega_pack_tp(base, cfg, tp, mesh)
    state_tp = {"att_xx": axx0, "ffn_xx": fxx0, "heads": heads0}
    y_tp, st_tp = tp_decode_step(
        tp_pack, state_tp, x0, cfg, mesh, interpret=True
    )

    y_ref, y_tp = np.asarray(y_ref), np.asarray(y_tp)
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert np.abs(y_tp - y_ref).max() / scale < tol, (
        quant, np.abs(y_tp - y_ref).max() / scale
    )
    # state drift compounds with x across layers under the per-shard
    # activation scales — same band as y
    hs_ref = np.asarray(st_ref["heads"]).reshape(L, h, s, s)
    hs_tp = np.asarray(st_tp["heads"])
    hscale = max(np.abs(hs_ref).max(), 1e-6)
    assert np.abs(hs_tp - hs_ref).max() / hscale < tol, (
        quant, np.abs(hs_tp - hs_ref).max() / hscale
    )
    ax_ref = np.asarray(st_ref["att_xx"])
    ax_tp = np.asarray(st_tp["att_xx"])
    ascale = max(np.abs(ax_ref).max(), 1e-6)
    assert np.abs(ax_tp - ax_ref).max() / ascale < tol


def test_serving_tp_megakernel_decode(eight_devices):
    """ServingModel(mesh=..., megakernel=True) routes B=1 decode through
    the TP megakernel; logits must track the single-chip (no-mesh)
    per-op engine across several steps."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(1, 4, devices=eight_devices[:4])
    cfg = synth_config("7.0", n_layer=2, n_embed=512, n_vocab=512,
                      head_size=64)
    params = synth_params(cfg, seed=29, lora_dim=64)

    ref = ServingModel((cfg, params), precision="w8a8")
    tpm = ServingModel((cfg, params), precision="w8a8", mesh=mesh,
                       megakernel=True)
    assert tpm._mega_tp is not None

    state_r = ref.init_state(1)
    state_t = tpm.init_state(1)
    for tok in (3, 77, 200):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lt, state_t = tpm.decode(np.array([tok], np.int32), state_t)
        lr, lt = np.asarray(lr), np.asarray(lt)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lt - lr).max() / scale < 1.5e-1
        top5 = np.argsort(lr[0])[-5:]
        assert lt[0].argmax() in top5


def test_tp_megakernel_w4_matches_single_chip(eight_devices):
    """w4a8 TP decode (per-shard split-half nibble packing on the
    sharded-K mats) vs the single-chip w4 tiled kernel — identical int4
    codes, drift only from per-shard activation scales."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack, retile_mega_pack, v7_decode_megakernel_tiled,
    )
    from rwkv_tpu.ops.megakernel_tp import (
        build_mega_pack_tp, tp_decode_step,
    )
    from rwkv_tpu.parallel.sharding import make_mesh

    tp = 4
    mesh = make_mesh(1, tp, devices=eight_devices[:tp])
    cfg = synth_config("7.0", n_layer=2, n_embed=512, n_vocab=512,
                      head_size=64)
    params = synth_params(cfg, seed=41, lora_dim=64)
    base = build_mega_pack(params, cfg, quant=True, w4=True)

    L, c = cfg.n_layer, cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)
    heads0 = jnp.asarray(rng.normal(size=(L, h, s, s)) * 0.05, jnp.float32)
    axx0 = jnp.zeros((L, c, 1), jnp.float32)
    fxx0 = jnp.zeros((L, c, 1), jnp.float32)

    ref_pack = retile_mega_pack(base, cfg, 1, 1, 3, 1)
    y_ref, _ = v7_decode_megakernel_tiled(
        ref_pack,
        {"att_xx": axx0, "ffn_xx": fxx0,
         "heads": heads0.reshape(L, 1, h, s, s)},
        x0, cfg, interpret=True,
    )

    tp_pack = build_mega_pack_tp(base, cfg, tp, mesh)
    y_tp, _ = tp_decode_step(
        tp_pack, {"att_xx": axx0, "ffn_xx": fxx0, "heads": heads0},
        x0, cfg, mesh, interpret=True,
    )
    y_ref, y_tp = np.asarray(y_ref), np.asarray(y_tp)
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert np.abs(y_tp - y_ref).max() / scale < 1e-1, (
        np.abs(y_tp - y_ref).max() / scale
    )


@pytest.mark.parametrize("quant,tol", [(False, 1e-3), (True, 1e-1)])
def test_tp_megakernel_v6_matches_single_chip(eight_devices, quant, tol):
    """v6 TP decode vs the single-chip v6 tiled kernel (interpret).
    bf16 tolerance is looser than v7's: the replicated maa2/HIGHEST
    up-projection feeds exp(-exp(.)) decay, amplifying f32 reduction-
    order differences on random weights."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack_v6, retile_mega_pack_v6, v6_decode_megakernel_tiled,
    )
    from rwkv_tpu.ops.megakernel_tp import (
        build_mega_pack_tp_v6, tp_decode_step_v6,
    )
    from rwkv_tpu.parallel.sharding import make_mesh

    tp = 4
    mesh = make_mesh(1, tp, devices=eight_devices[:tp])
    cfg = synth_config("6.0", n_layer=2, n_embed=512, n_vocab=512,
                      head_size=64)
    params = synth_params(cfg, seed=59)
    base = build_mega_pack_v6(params, cfg, quant=quant)

    L, c = cfg.n_layer, cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)
    heads0 = jnp.asarray(rng.normal(size=(L, h, s, s)) * 0.05, jnp.float32)
    axx0 = jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1, jnp.float32)
    fxx0 = jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1, jnp.float32)

    ref_pack = retile_mega_pack_v6(base, cfg, 1, 1, 4, 1)
    y_ref, st_ref = v6_decode_megakernel_tiled(
        ref_pack,
        {"att_xx": axx0, "ffn_xx": fxx0,
         "heads": heads0.reshape(L, 1, h, s, s)},
        x0, cfg, interpret=True,
    )

    tp_pack = build_mega_pack_tp_v6(base, cfg, tp, mesh)
    y_tp, st_tp = tp_decode_step_v6(
        tp_pack, {"att_xx": axx0, "ffn_xx": fxx0, "heads": heads0},
        x0, cfg, mesh, interpret=True,
    )

    y_ref, y_tp = np.asarray(y_ref), np.asarray(y_tp)
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert np.abs(y_tp - y_ref).max() / scale < tol, (
        quant, np.abs(y_tp - y_ref).max() / scale
    )
    hs_ref = np.asarray(st_ref["heads"]).reshape(L, h, s, s)
    hs_tp = np.asarray(st_tp["heads"])
    hscale = max(np.abs(hs_ref).max(), 1e-6)
    assert np.abs(hs_tp - hs_ref).max() / hscale < tol


def test_serving_tp_megakernel_v6_decode(eight_devices):
    """ServingModel v6 + mesh + megakernel routes through the v6 TP
    step."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(1, 4, devices=eight_devices[:4])
    cfg = synth_config("6.0", n_layer=2, n_embed=512, n_vocab=512,
                      head_size=64)
    params = synth_params(cfg, seed=61)

    ref = ServingModel((cfg, params), precision="w8a8")
    tpm = ServingModel((cfg, params), precision="w8a8", mesh=mesh,
                       megakernel=True)
    assert tpm._mega_tp is not None

    state_r = ref.init_state(1)
    state_t = tpm.init_state(1)
    for tok in (3, 77, 200):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lt, state_t = tpm.decode(np.array([tok], np.int32), state_t)
        lr, lt = np.asarray(lr), np.asarray(lt)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lt - lr).max() / scale < 1.5e-1
        top5 = np.argsort(lr[0])[-5:]
        assert lt[0].argmax() in top5


@pytest.mark.parametrize("quant,tol", [(False, 1e-4), (True, 1e-1)])
def test_tp_megakernel_v4_matches_single_chip(eight_devices, quant, tol):
    """v4 TP decode (channel-sharded scalar-state wkv) vs the single-chip
    whole-layer kernel, same quantization codes."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack_v4, v4_decode_megakernel,
    )
    from rwkv_tpu.ops.megakernel_tp import (
        build_mega_pack_tp_v4, tp_decode_step_v4,
    )
    from rwkv_tpu.parallel.sharding import make_mesh

    tp = 4
    mesh = make_mesh(1, tp, devices=eight_devices[:tp])
    cfg = synth_config("4.0", n_layer=3, n_embed=512, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=31)
    base = build_mega_pack_v4(params, cfg, quant=quant)

    L, c = cfg.n_layer, cfg.n_embed
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)
    state0 = {
        "att_xx": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1,
                              jnp.float32),
        "ffn_xx": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1,
                              jnp.float32),
        "aa": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.05, jnp.float32),
        "bb": jnp.asarray(1.0 + rng.random(size=(L, c, 1)), jnp.float32),
        "pp": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.2, jnp.float32),
    }

    y_ref, st_ref = v4_decode_megakernel(
        base, state0, x0, cfg, interpret=True
    )

    tp_pack = build_mega_pack_tp_v4(base, cfg, tp, mesh)
    y_tp, st_tp = tp_decode_step_v4(
        tp_pack, state0, x0, cfg, mesh, interpret=True
    )

    y_ref, y_tp = np.asarray(y_ref), np.asarray(y_tp)
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert np.abs(y_tp - y_ref).max() / scale < tol, (
        quant, np.abs(y_tp - y_ref).max() / scale
    )
    for key in ("att_xx", "ffn_xx", "aa", "bb", "pp"):
        r = np.asarray(st_ref[key])
        t = np.asarray(st_tp[key])
        kscale = max(np.abs(r).max(), 1e-6)
        assert np.abs(t - r).max() / kscale < tol, (quant, key)


@pytest.mark.parametrize("minor", [1, 2])
@pytest.mark.parametrize("quant,tol", [(False, 1e-4), (True, 1e-1)])
def test_tp_megakernel_v5_matches_single_chip(eight_devices, minor, quant,
                                              tol):
    """v5.1/v5.2 TP decode (head-sharded wkv + gated FFN) vs the
    single-chip whole-layer kernel, same quantization codes."""
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack_v5, v5_decode_megakernel,
    )
    from rwkv_tpu.ops.megakernel_tp import (
        build_mega_pack_tp_v5, tp_decode_step_v5,
    )
    from rwkv_tpu.parallel.sharding import make_mesh

    tp = 4
    mesh = make_mesh(1, tp, devices=eight_devices[:tp])
    cfg = synth_config(f"5.{minor}", n_layer=3, n_embed=512, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=37)
    base = build_mega_pack_v5(params, cfg, quant=quant)
    assert base["has_gate"] == (minor == 2)

    L, c = cfg.n_layer, cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)
    state0 = {
        "att_xx": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1,
                              jnp.float32),
        "ffn_xx": jnp.asarray(rng.normal(size=(L, c, 1)) * 0.1,
                              jnp.float32),
        "heads": jnp.asarray(rng.normal(size=(L, h, s, s)) * 0.05,
                             jnp.float32),
    }

    y_ref, st_ref = v5_decode_megakernel(
        base, state0, x0, cfg, interpret=True
    )

    tp_pack = build_mega_pack_tp_v5(base, cfg, tp, mesh)
    y_tp, st_tp = tp_decode_step_v5(
        tp_pack, state0, x0, cfg, mesh, interpret=True
    )

    y_ref, y_tp = np.asarray(y_ref), np.asarray(y_tp)
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert np.abs(y_tp - y_ref).max() / scale < tol, (
        quant, np.abs(y_tp - y_ref).max() / scale
    )
    for key in ("att_xx", "ffn_xx", "heads"):
        r = np.asarray(st_ref[key])
        t = np.asarray(st_tp[key])
        kscale = max(np.abs(r).max(), 1e-6)
        assert np.abs(t - r).max() / kscale < tol, (quant, key)


@pytest.mark.parametrize("version", ["4.0", "5.2"])
def test_serving_tp_megakernel_decode_v45(eight_devices, version):
    """ServingModel(mesh=..., megakernel=True) routes v4/v5 B=1 decode
    through the TP megakernel; logits track the single-chip per-op
    engine."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(1, 4, devices=eight_devices[:4])
    cfg = synth_config(version, n_layer=2, n_embed=512, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=41)

    ref = ServingModel((cfg, params), precision="w8a8")
    tpm = ServingModel((cfg, params), precision="w8a8", mesh=mesh,
                       megakernel=True)
    assert tpm._mega_tp is not None

    state_r = ref.init_state(1)
    state_t = tpm.init_state(1)
    for tok in (3, 77, 200):
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lt, state_t = tpm.decode(np.array([tok], np.int32), state_t)
        lr, lt = np.asarray(lr), np.asarray(lt)
        scale = max(np.abs(lr).max(), 1e-6)
        assert np.abs(lt - lr).max() / scale < 1.5e-1
        top5 = np.argsort(lr[0])[-5:]
        assert lt[0].argmax() in top5
