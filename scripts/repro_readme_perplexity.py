"""Reproduce the reference's README perplexity-per-format table
(README.md:33-43, BASELINE.md 'Quality' table) on real checkpoints.

The table's numbers are RWKV-4 Pile 169M perplexity on a Pile-like text
sample, per quantized file format:

    Q4_0 17.507   Q4_1 17.187   Q5_0 16.194   Q5_1 15.851
    Q8_0 15.652   FP16 15.623   FP32 15.623

This environment has no network egress and ships no full checkpoints, so
the script GATES on the checkpoint being present and documents the exact
recipe. The tiny-fixture proxy for the same per-format error profile is
CI-enforced instead (tests/test_serve.py::test_serving_quant_file_golden_band,
tests/test_golden_logits.py).

Recipe (run wherever the checkpoint is available):
  1. Fetch RWKV-4-Pile-169M-20220807-8023.pth (BlinkDL/rwkv-4-pile-169m).
  2. python -m rwkv_tpu.tools.convert_checkpoint model.pth model-FP32.bin
     (add --data-type FP16 for the FP16 row).
  3. For each format F in Q4_0 Q4_1 Q5_0 Q5_1 Q8_0:
       python -m rwkv_tpu.tools.quantize model-FP32.bin model-F.bin F
  4. python scripts/repro_readme_perplexity.py model-FP32.bin \
       [--text <pile-sample.txt>]
     The reference's numbers used its own tokenizer + a Pile excerpt;
     any fixed ~50KB English text reproduces the RELATIVE per-format
     profile (the absolute values shift with the text).

Usage: python scripts/repro_readme_perplexity.py <model-FP32.bin>
           [--text FILE] [--formats Q4_0,Q4_1,...] [--ctx 1024]
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

README_TARGETS = {
    "Q4_0": 17.507, "Q4_1": 17.187, "Q5_0": 16.194, "Q5_1": 15.851,
    "Q8_0": 15.652, "FP16": 15.623, "FP32": 15.623,
}

DEFAULT_TEXT = (
    "In a shocking finding, scientists discovered a herd of unicorns "
    "living in a remote, previously unexplored valley in the Andes "
    "Mountains. Even more surprising to the researchers was the fact "
    "that the unicorns spoke perfect English.\n"
) * 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_fp32", help="converted FP32 .bin checkpoint")
    ap.add_argument("--text", help="evaluation text file (~50KB+)")
    ap.add_argument("--formats",
                    default="Q4_0,Q4_1,Q5_0,Q5_1,Q8_0,FP32")
    ap.add_argument("--ctx", type=int, default=1024)
    args = ap.parse_args()

    if not os.path.exists(args.model_fp32):
        print(f"checkpoint {args.model_fp32!r} not found.\n\n"
              "This script needs a real converted checkpoint — see the "
              "recipe in the module docstring (python -m rwkv_tpu.tools."
              "convert_checkpoint on RWKV-4-Pile-169M).", file=sys.stderr)
        return 2

    from rwkv_tpu import RWKVModel
    from rwkv_tpu.io.quantize import quantize_model_file
    from rwkv_tpu.tools.measure_perplexity import measure_perplexity
    from rwkv_tpu.utils.tokenizer import get_tokenizer_for_model

    if args.text:
        text = open(args.text, encoding="utf-8").read()
    else:
        print("note: no --text given; using a built-in sample — absolute "
              "perplexities will differ from the README, the per-format "
              "ORDER and deltas are what to compare.", file=sys.stderr)
        text = DEFAULT_TEXT

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for fmt in args.formats.split(","):
            fmt = fmt.strip()
            if fmt in ("FP32", "FP16"):
                path = args.model_fp32
            else:
                path = os.path.join(td, f"model-{fmt}.bin")
                quantize_model_file(args.model_fp32, path, fmt,
                                    verbose=False)
            model = RWKVModel(path)
            tokenizer = get_tokenizer_for_model(model)
            tokens = tokenizer.encode(text)[: args.ctx * 8]
            ppl, _ms = measure_perplexity(model, tokens)
            target = README_TARGETS.get(fmt)
            rows.append((fmt, ppl, target))
            print(f"{fmt:5s}  perplexity {ppl:8.3f}   "
                  f"README(RWKV-4 Pile 169M): {target}", flush=True)

    print("\n| Format | measured | README 169M target |")
    print("|--------|----------|--------------------|")
    for fmt, ppl, target in rows:
        print(f"| {fmt} | {ppl:.3f} | {target} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
