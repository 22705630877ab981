"""Tool tests: checkpoint converter (byte-compared against the reference
converter run as an oracle), LoRA merge, and perplexity harness."""

import subprocess
import sys

import numpy as np
import pytest

from conftest import REPO_ROOT, require_fixture

torch = pytest.importorskip("torch")


def _rand_sd_v4(n_vocab=64, n_embed=32, n_layer=2, seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g)

    sd = {"emb.weight": r(n_vocab, n_embed)}
    for i in range(n_layer):
        p = f"blocks.{i}."
        if i == 0:
            sd[p + "ln0.weight"] = r(n_embed)
            sd[p + "ln0.bias"] = r(n_embed)
        sd[p + "ln1.weight"] = r(n_embed)
        sd[p + "ln1.bias"] = r(n_embed)
        for nm in ("time_mix_k", "time_mix_v", "time_mix_r"):
            sd[p + f"att.{nm}"] = torch.rand(1, 1, n_embed, generator=g)
        sd[p + "att.time_first"] = r(n_embed)
        sd[p + "att.time_decay"] = r(n_embed)
        for nm in ("key", "value", "receptance", "output"):
            sd[p + f"att.{nm}.weight"] = r(n_embed, n_embed)
        sd[p + "ln2.weight"] = r(n_embed)
        sd[p + "ln2.bias"] = r(n_embed)
        sd[p + "ffn.time_mix_k"] = torch.rand(1, 1, n_embed, generator=g)
        sd[p + "ffn.time_mix_r"] = torch.rand(1, 1, n_embed, generator=g)
        sd[p + "ffn.key.weight"] = r(4 * n_embed, n_embed)
        sd[p + "ffn.value.weight"] = r(n_embed, 4 * n_embed)
        sd[p + "ffn.receptance.weight"] = r(n_embed, n_embed)
    sd["ln_out.weight"] = r(n_embed)
    sd["ln_out.bias"] = r(n_embed)
    sd["head.weight"] = r(n_vocab, n_embed)
    return sd


@pytest.mark.parametrize("dtype", ["FP32", "FP16"])
def test_converter_matches_reference_converter(tmp_path, dtype):
    """Our converter's output must be byte-identical to the reference
    converter's on the same checkpoint."""
    ref_script = "/root/reference/python/convert_pytorch_to_ggml.py"
    import os

    if not os.path.exists(ref_script):
        pytest.skip("reference converter not available")

    sd = _rand_sd_v4()
    pth = tmp_path / "model.pth"
    torch.save(sd, str(pth))

    theirs = tmp_path / "ref.bin"
    subprocess.run(
        [sys.executable, ref_script, str(pth), str(theirs), dtype],
        check=True,
        capture_output=True,
    )

    from rwkv_tpu.tools.convert_checkpoint import convert

    ours = tmp_path / "ours.bin"
    convert(str(pth), str(ours), dtype)
    assert ours.read_bytes() == theirs.read_bytes()


def test_converted_model_runs(tmp_path):
    sd = _rand_sd_v4()
    pth = tmp_path / "model.pth"
    torch.save(sd, str(pth))
    from rwkv_tpu.tools.convert_checkpoint import convert

    out = tmp_path / "model.bin"
    convert(str(pth), str(out), "FP32")

    from rwkv_tpu.models.model import RWKVModel

    m = RWKVModel(str(out))
    assert m.config.version_major == 4
    logits, state = m.eval_sequence([1, 2, 3])
    assert logits.shape == (64,)
    assert np.isfinite(np.asarray(logits)).all()


def test_merge_lora_roundtrip(tmp_path):
    sd = _rand_sd_v4()
    pth = tmp_path / "model.pth"
    torch.save(sd, str(pth))
    from rwkv_tpu.tools.convert_checkpoint import convert
    from rwkv_tpu.tools.merge_lora import merge_lora
    from rwkv_tpu.io.ggmf import read_ggmf

    base = tmp_path / "base.bin"
    convert(str(pth), str(base), "FP32")

    g = torch.Generator().manual_seed(7)
    r = 4
    lora = {
        "blocks.0.att.key.lora_A.weight": torch.randn(r, 32, generator=g),
        "blocks.0.att.key.lora_B.weight": torch.randn(32, r, generator=g),
        "ln_out.weight": torch.randn(32, generator=g),
    }
    lora_pth = tmp_path / "lora.pth"
    torch.save(lora, str(lora_pth))

    merged = tmp_path / "merged.bin"
    merge_lora(str(base), "v4", str(lora_pth), lora_alpha=8, dest_path=str(merged))

    _, base_t = read_ggmf(str(base))
    _, merged_t = read_ggmf(str(merged))
    base_map = {t.name: t for t in base_t}
    merged_map = {t.name: t for t in merged_t}

    expected = (
        base_map["blocks.0.att.key.weight"].to_f32()
        + (lora["blocks.0.att.key.lora_B.weight"].numpy()
           @ lora["blocks.0.att.key.lora_A.weight"].numpy()) * (8 / r)
    )
    np.testing.assert_allclose(
        merged_map["blocks.0.att.key.weight"].to_f32(), expected, rtol=1e-6
    )
    np.testing.assert_array_equal(
        merged_map["ln_out.weight"].to_f32(), lora["ln_out.weight"].numpy()
    )
    # Untouched tensors pass through bit-exactly.
    np.testing.assert_array_equal(
        merged_map["head.weight"].to_f32(), base_map["head.weight"].to_f32()
    )


def test_measure_perplexity_tiny():
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.tools.measure_perplexity import measure_perplexity

    path = require_fixture("tiny-rwkv-5v2-730K-FP32.bin")
    m = RWKVModel(str(path))
    tokens = list(b"hello world, this is a test of the perplexity harness")
    ppl, ms = measure_perplexity(m, tokens, ignore_first_n=4)
    assert np.isfinite(ppl) and ppl > 1.0


def test_serve_adapter_matches_parity_engine():
    """The --serve adapter (generate_completions/measure_perplexity)
    exposes the RWKVModel eval surface over ServingModel; its outputs
    must track the parity engine on the tiny fixture."""
    from rwkv_tpu.models.model import RWKVModel
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.tools.generate_completions import _ServeAdapter

    path = str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin"))
    ref = RWKVModel(path)
    srv = _ServeAdapter(ServingModel(path, precision="f32"))
    assert srv.n_vocab == ref.n_vocab

    lr, str_ = ref.eval_sequence_in_chunks([34, 105, 110])
    ls, sts = srv.eval_sequence_in_chunks([34, 105, 110])
    np.testing.assert_allclose(
        np.asarray(ls), np.asarray(lr), rtol=1e-4, atol=1e-4
    )
    for t in (32, 116):
        lr, str_ = ref.eval(t, str_)
        ls, sts = srv.eval(t, sts)
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lr), rtol=1e-4, atol=1e-4
        )
