"""Held-out perplexity per quantized format on a REAL trained checkpoint
(scripts/train_v4_lm.py output) — the reproduction of the reference's
README.md:33-43 quality table (BASELINE.md), previously blocked on
checkpoint availability.

Reads the trained FP32 ggmf, derives FP16 (converter keep-rules) and
every quantized format with OUR quantizer, then measures perplexity on
the held-out corpus tail through the serving engine's keep-quant path
(fused dequant-matmul on the file's own packed blocks — the golden band
tests gate its agreement with the ggml-semantics parity engine).

Expected SHAPE (reference, RWKV-4 Pile 169M): FP32 == FP16 < Q8_0 <
Q5_1 < Q5_0 < Q4_1 < Q4_0, with Q4_0 ~ +12% over FP16.

Usage: timeout 3600 python scripts/ppl_format_sweep.py
       [--model /tmp/v4lm-fp32.bin] [--eval-tokens N] [--small]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if "--small" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

MODEL = (sys.argv[sys.argv.index("--model") + 1]
         if "--model" in sys.argv else "/tmp/v4lm-fp32.bin")
N_EVAL = (int(sys.argv[sys.argv.index("--eval-tokens") + 1])
          if "--eval-tokens" in sys.argv else
          (1024 if "--small" in sys.argv else 8192))
CHUNK = 512

FORMATS = ["FP32", "FP16", "Q8_0", "Q5_1", "Q5_0", "Q4_1", "Q4_0",
           "Q5_K", "Q4_K"]


def write_fp16(src: str, dst: str) -> None:
    """FP32 ggmf -> FP16 ggmf with the converter's keep-FP32 rules."""
    from rwkv_tpu.io import ggmf
    from rwkv_tpu.tools.convert_checkpoint import _FP32_KEEP_SUBSTRINGS

    hdr, tensors = ggmf.read_ggmf(src, with_data=True)
    hdr2 = ggmf.GgmfHeader(hdr.magic, hdr.version, hdr.n_vocab,
                           hdr.n_embed, hdr.n_layer, ggmf.GgmlDType.FP16)
    with open(dst, "wb") as f:
        ggmf.write_ggmf_header(f, hdr2)
        for t in tensors:
            arr = t.to_f32()
            keep = arr.ndim == 1 or any(
                s in t.name for s in _FP32_KEEP_SUBSTRINGS)
            if keep:
                f_t = ggmf.GgmfTensor(t.name, ggmf.GgmlDType.FP32,
                                      t.shape, arr.tobytes())
            else:
                f_t = ggmf.GgmfTensor(t.name, ggmf.GgmlDType.FP16, t.shape,
                                      arr.astype(np.float16).tobytes())
            ggmf.write_ggmf_tensor(f, f_t)


def perplexity(path: str, eval_tokens: np.ndarray) -> float:
    from rwkv_tpu.models.serve import ServingModel

    # FP16 runs as f32-dense: f16 values are exactly representable in
    # f32, so the file's rounding is preserved (bf16 would re-round)
    precision = ("f32" if (path.endswith("fp32.bin") or "FP16" in path)
                 else "quant")
    srv = ServingModel(path, precision=precision)
    state = srv.init_state(1)
    total_nll, total = 0.0, 0
    for off in range(0, len(eval_tokens) - 1, CHUNK):
        seg = eval_tokens[off:off + CHUNK + 1]
        if len(seg) < 2:
            break
        logits, state_new = srv.score(seg[:-1][None, :], state)
        logp = jax.nn.log_softmax(jnp.asarray(logits[0]), axis=-1)
        nll = -np.asarray(jnp.take_along_axis(
            logp, jnp.asarray(seg[1:], jnp.int32)[:, None], axis=-1))
        total_nll += float(nll.sum())
        total += len(seg) - 1
        state = state_new
    return float(np.exp(total_nll / total))


def main():
    from train_v4_lm import load_corpus, split_corpus
    from rwkv_tpu.io.quantize import quantize_model_file

    _, hold = split_corpus(load_corpus())
    eval_tokens = hold.astype(np.int32)[:N_EVAL + 1]
    print(f"model {MODEL}; eval on {len(eval_tokens) - 1} held-out "
          f"tokens; device {jax.devices()[0]}", flush=True)

    base = MODEL[:-len("-fp32.bin")] if MODEL.endswith("-fp32.bin") \
        else MODEL[:-4]
    files = {"FP32": MODEL}
    fp16 = base + "-FP16.bin"
    write_fp16(MODEL, fp16)
    files["FP16"] = fp16
    for fmt in FORMATS:
        if fmt in ("FP32", "FP16"):
            continue
        out = f"{base}-{fmt}.bin"
        t0 = time.perf_counter()
        quantize_model_file(MODEL, out, fmt, verbose=False)
        files[fmt] = out
        print(f"quantized {fmt} in {time.perf_counter() - t0:.1f}s "
              f"({os.path.getsize(out) / 1e6:.1f} MB)", flush=True)

    results = {}
    for fmt in FORMATS:
        t0 = time.perf_counter()
        ppl = perplexity(files[fmt], eval_tokens)
        results[fmt] = ppl
        print(f"{fmt:5s}: ppl {ppl:8.3f}  "
              f"(+{(ppl / results['FP32'] - 1) * 100:6.2f}% vs FP32; "
              f"{time.perf_counter() - t0:.0f}s)", flush=True)

    # the reference's profile: Q4_0 worst, Q4_1 next, Q5_0, Q5_1, Q8_0
    # ~= FP16 == FP32 (README.md:33-43)
    assert results["FP16"] < results["Q4_0"] * 1.001
    order = ["Q8_0", "Q5_1", "Q5_0", "Q4_1", "Q4_0"]
    print("profile (reference order Q8_0 <= Q5_1 <= Q5_0 <= Q4_1 <= Q4_0):",
          " <= ".join(f"{f}:{results[f]:.3f}" for f in order), flush=True)


if __name__ == "__main__":
    main()
