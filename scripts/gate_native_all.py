"""Native numerics gate, EVERY serving configuration (VERDICT r3 item 6b:
replace "exact gates on flip-free configs only" with tolerance-banded
gates that run on every config).

Sweeps ServingModel.decode() — the exact code path serving uses — for
all five architectures x {bf16, w8a8, w4a8} x batch {1, 4}, against the
per-op engine at the same precision, ON CHIP. Bands are the calibrated
cross-path tolerances (activation-quantization code flips step the
output by ~1e-3 and compound; see ops/megakernel.py header); argmax
agreement is required everywhere.

w4a8 routes through the phase-tiled kernels at B=1 and the packed
batched kernel path at B=4 (v7); its reference is the per-op engine fed
int4-requantized weights via the same pack codes, so the band checks the
KERNEL, not the int4 format error.

Usage: timeout 6000 python scripts/gate_native_all.py [--versions 7.0,6.0]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params

VERSIONS = (sys.argv[sys.argv.index("--versions") + 1].split(",")
            if "--versions" in sys.argv
            else ["4.0", "5.1", "5.2", "6.0", "7.0"])
# calibrated cross-path bands (rel max |diff| / max |ref|): quantized
# serving paths flip int8 activation codes at ulp-level reduction-order
# differences; bf16 differs by the kernel's f32-resident activations.
BANDS = {"bf16": 6e-2, "w8a8": 1e-1, "w4a8": 1.5e-1}


_BIG_MATS = ("att.receptance.weight", "att.key.weight",
             "att.value.weight", "att.gate.weight", "att.output.weight",
             "ffn.key.weight", "ffn.value.weight", "ffn.receptance.weight")


def _deq4(w):
    """Round-trip a weight through the w4 pack's per-row int4 codes —
    the w4a8 reference carries the SAME int4 error, so the band checks
    the kernel, not the format (mirrors test_megamodel_w4a8_*)."""
    from rwkv_tpu.ops.megakernel import _np_dense

    w = _np_dense(w).astype(np.float32)
    amax = np.abs(w).max(axis=-1, keepdims=True)
    d = amax / 7.0
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
    return (np.clip(np.rint(w * inv), -7, 7) * d).astype(np.float32)


def gate_one(version: str, precision: str, batch: int) -> tuple:
    cfg = synth_config(version, n_layer=3, n_embed=256, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=5, lora_dim=32)
    if precision == "w4a8":
        params_ref = dict(params)
        params_ref["blocks"] = [
            {k: (_deq4(v) if k in _BIG_MATS else v) for k, v in b.items()}
            for b in params["blocks"]
        ]
        ref = ServingModel((cfg, params_ref), precision="bf16")
    else:
        ref = ServingModel((cfg, params), precision=precision)
    mega = ServingModel((cfg, params), precision=precision,
                        megakernel=True)
    if batch > 1:
        mega.mega_min_batch = 2
    st_r, st_m = ref.init_state(batch), mega.init_state(batch)
    toks = (np.arange(batch, dtype=np.int32) * 37 + 34) % cfg.n_vocab
    worst, argmax_ok = 0.0, True
    for _ in range(5):
        lr, st_r = ref.decode(toks, st_r)
        lm, st_m = mega.decode(toks, st_m)
        lr_, lm_ = np.asarray(lr), np.asarray(lm)
        rel = np.abs(lm_ - lr_).max() / max(np.abs(lr_).max(), 1e-6)
        worst = max(worst, float(rel))
        if precision == "w4a8":
            # int8 activations + int8 loras vs the bf16 reference: the
            # argmax can swap within the top-5 (same bar as the tests)
            top5 = np.argsort(lr_, axis=-1)[:, -5:]
            argmax_ok &= bool(all(
                lm_[i].argmax() in top5[i] for i in range(lm_.shape[0])))
        else:
            argmax_ok &= bool((lm_.argmax(-1) == lr_.argmax(-1)).all())
        toks = lr_.argmax(-1).astype(np.int32)
    return worst, argmax_ok


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ok = True
    for version in VERSIONS:
        for precision in ("bf16", "w8a8", "w4a8"):
            for batch in (1, 4):
                if batch > 1 and precision == "w4a8" and version != "7.0":
                    continue  # batched w4 kernels are v7-only; others
                    # serve batched w4 params as w8a8 per-op (same path
                    # both sides — nothing kernel-side to gate)
                worst, argmax_ok = gate_one(version, precision, batch)
                band = BANDS[precision]
                passed = worst < band and argmax_ok
                ok &= passed
                print(f"gate {version} {precision:5s} B={batch}: "
                      f"worst rel {worst:.5f} (band {band}) argmax "
                      f"{'OK' if argmax_ok else 'MISMATCH'} "
                      f"{'PASS' if passed else 'FAIL'}", flush=True)
    assert ok, "native serving gate FAILED"
    print("ALL SERVING CONFIGS GATED NATIVE (arch x precision x batch)",
          flush=True)


if __name__ == "__main__":
    main()
