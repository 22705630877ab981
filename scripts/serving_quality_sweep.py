"""Quality sweep for SERVING precisions (bf16 / quant / q8 / q8r / w8a8).

The reference publishes perplexity-per-format for its FILE formats
(README.md:33-43); round 1 matched those via the parity engine. This sweep
quantifies the additional serving-side precisions the TPU engine introduces,
on every architecture's tiny fixture:

- golden logit diff-sum vs the reference's expected-logits binaries
  (same prompt/method as tests/logit_difference_validator.inc:28-91);
- tiny-model perplexity on a fixed byte-level text (the quality metric of
  measure_pexplexity.py:70-109, shrunk to fixture scale).

Run on CPU:  python scripts/serving_quality_sweep.py [--json out.json]
"""

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.utils.sampling import softmax

TESTS = "/root/reference/tests"
VERSIONS = ["4v0-660K", "5v1-730K", "5v2-730K", "6v0-3m", "7v0-834K"]
# Serving precisions. 'quant' (keep file blocks) reads the committed Q5_1
# requant fixture; everything else loads the FP32 file.
# 'w4' measures the w4a8 kernel's WEIGHT error (per-row int4 on the big
# mats, the dominant quality effect) by dequant-emulation on the bf16
# engine — the reference's perplexity-per-format methodology
# (README.md:33-43) likewise quantifies format error.
PRECISIONS = ["f32", "bf16", "q8", "q8r", "w8a8", "w4", "quant"]

# Fixed byte-level evaluation text (tiny models are byte-tokenized).
TEXT = (
    "In the beginning the machine read every book it could find, and the "
    "books taught it the shapes of sentences. Later, when people asked it "
    "questions, it answered in the same shapes, and the people argued about "
    "whether the shapes were thought. The machine did not argue; it kept "
    "reading."
)


def _deq4_params(params):
    """Per-row int4 dequantization of every big 2-D mat (the w4a8
    kernels' weight treatment: LoRA/maa mats stay int8-or-better, so
    they are left exact here)."""
    from rwkv_tpu.ops.megakernel import _np_dense

    def deq(w):
        w = _np_dense(w).astype(np.float32)
        amax = np.abs(w).max(axis=-1, keepdims=True)
        d = amax / 7.0
        inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
        return (np.clip(np.rint(w * inv), -7, 7) * d).astype(np.float32)

    out = dict(params)
    out["blocks"] = [
        {
            # the '.weight' suffix structurally excludes the LoRA/maa
            # mats (they are named 'att.w1', 'att.time_maa_w1', ...)
            k: (deq(v)
                if (k.endswith(".weight") and k != "ln1.weight"
                    and k != "ln2.weight" and "ln_x" not in k
                    and getattr(_np_dense(v), "ndim", 1) == 2)
                else v)
            for k, v in b.items()
        }
        for b in params["blocks"]
    ]
    return out


def load(version: str, precision: str) -> ServingModel:
    if precision == "quant":
        path = f"{TESTS}/tiny-rwkv-{version}-FP32-to-Q5_1.bin"
    else:
        path = f"{TESTS}/tiny-rwkv-{version}-FP32.bin"
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if precision == "w4":
        from rwkv_tpu.models.loader import load_params

        cfg, params = load_params(path)
        return ServingModel((cfg, _deq4_params(params)), precision="bf16")
    return ServingModel(path, precision=precision)


def golden_diff(model: ServingModel, version: str) -> float:
    expected = np.fromfile(
        f"{TESTS}/expected-logits-{version}.bin", dtype=np.float32
    )
    state = model.init_state(1)
    logits = None
    for tok in b'"in':
        logits, state = model.decode(np.array([tok], np.int32), state)
    return float(np.sum(np.asarray(logits[0]) - expected))


def perplexity(model: ServingModel, text: bytes, warmup: int = 16) -> float:
    state = model.init_state(1)
    logits = None
    loss, n = 0.0, 0
    for i, tok in enumerate(text):
        if i >= warmup and logits is not None:
            probs = softmax(np.asarray(logits[0]))
            loss += -float(np.log(max(float(probs[tok]), 1e-30)))
            n += 1
        logits, state = model.decode(np.array([tok], np.int32), state)
    return float(np.exp(loss / n))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--versions", nargs="*", default=VERSIONS)
    args = ap.parse_args()

    rows = []
    text = TEXT.encode()
    for version in args.versions:
        for precision in PRECISIONS:
            try:
                model = load(version, precision)
            except FileNotFoundError:
                print(f"{version:10s} {precision:6s} (fixture missing)")
                continue
            diff = golden_diff(model, version)
            ppl = perplexity(model, text)
            rows.append(
                {"model": version, "precision": precision,
                 "golden_diff_sum": diff, "perplexity": ppl}
            )
            print(
                f"{version:10s} {precision:6s} diff_sum={diff:+12.6f} "
                f"ppl={ppl:8.4f}", flush=True,
            )

    # markdown table
    print("\n| model | " + " | ".join(PRECISIONS) + " | (perplexity; diff-sum)")
    for version in args.versions:
        cells = []
        for precision in PRECISIONS:
            r = next(
                (r for r in rows
                 if r["model"] == version and r["precision"] == precision),
                None,
            )
            cells.append(
                f"{r['perplexity']:.3f}; {r['golden_diff_sum']:+.3f}"
                if r else "—"
            )
        print(f"| {version} | " + " | ".join(cells) + " |")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
