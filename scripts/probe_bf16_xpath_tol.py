"""Measure megakernel-vs-per-op bf16 cross-path deviations after the
f32/HIGHEST matvec change (megakernel keeps activations f32; the per-op
serving path rounds activations to bf16), to recalibrate the test bands.
Run on CPU interpret mode like the tests."""
import numpy as np
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from conftest import require_fixture  # noqa: E402
from rwkv_tpu.models.serve import ServingModel  # noqa: E402
from rwkv_tpu.models.synth import synth_config, synth_params  # noqa: E402


def run_fixture(name):
    path = str(require_fixture(name))
    ref = ServingModel(path, precision="bf16")
    mega = ServingModel(path, precision="bf16", megakernel=True)
    sr, sm = ref.init_state(1), mega.init_state(1)
    worst_l = 0.0
    for tok in b'"in":':
        lr, sr = ref.decode(np.array([tok], np.int32), sr)
        lm, sm = mega.decode(np.array([tok], np.int32), sm)
        worst_l = max(worst_l, np.abs(np.asarray(lm) - np.asarray(lr)).max())
    worst_s = 0.0
    for key in sm:
        if key in sr:
            a, b = np.asarray(sm[key]), np.asarray(sr[key])
            if a.shape == b.shape and a.dtype.kind == "f":
                worst_s = max(worst_s, np.abs(a - b).max())
    print(f"{name}: logits max abs {worst_l:.4f}  state max abs {worst_s:.4f}")


def run_tiled(ver, c=2304):
    cfg = synth_config(ver, n_layer=2, n_embed=c, n_vocab=512, head_size=64)
    seed = {"6.0": 7, "5.1": 13, "5.2": 13, "4.0": 11, "7.0": 5}[ver]
    params = synth_params(cfg, seed=seed, **({"lora_dim": 64} if ver == "7.0" else {}))
    ref = ServingModel((cfg, params), precision="bf16")
    mega = ServingModel((cfg, params), precision="bf16", megakernel=True)
    assert mega._mega_big
    sr, sm = ref.init_state(1), mega.init_state(1)
    worst = 0.0
    for tok in (3, 77, 200):
        lr, sr = ref.decode(np.array([tok], np.int32), sr)
        lm, sm = mega.decode(np.array([tok], np.int32), sm)
        lr, lm = np.asarray(lr), np.asarray(lm)
        scale = max(np.abs(lr).max(), 1e-6)
        worst = max(worst, np.abs(lm - lr).max() / scale)
    print(f"tiled {ver} C={c}: rel {worst:.5f}")


if __name__ == "__main__":
    run_fixture("tiny-rwkv-4v0-660K-FP32.bin")
    run_fixture("tiny-rwkv-5v1-730K-FP32.bin")
    run_fixture("tiny-rwkv-5v2-730K-FP32.bin")
    run_tiled("6.0")
    run_tiled("5.1")
    run_tiled("5.2")
    run_tiled("4.0")
    run_tiled("7.0")
