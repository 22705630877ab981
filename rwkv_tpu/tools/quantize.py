"""Quantize an FP32/FP16 ggmf model file to a block-quantized format.

CLI parity with the reference's python/quantize.py; output files are
byte-identical to the reference quantizer's (validated in tests/test_quant.py).
"""

from __future__ import annotations

import argparse
import time

from rwkv_tpu.io.quant import QUANT_FORMATS
from rwkv_tpu.io.quantize import quantize_model_file


def main():
    p = argparse.ArgumentParser(description="Quantize an RWKV ggmf model file")
    p.add_argument("src_path", help="FP32 or FP16 ggmf model file")
    p.add_argument("dest_path", help="Output quantized ggmf model file")
    p.add_argument("format_name", choices=list(QUANT_FORMATS), help="Target format")
    p.add_argument("--quiet", action="store_true")
    p.add_argument(
        "--python", action="store_true",
        help="Force the pure-Python quantizer (default: native library when built)",
    )
    args = p.parse_args()

    t0 = time.perf_counter()
    native = None
    if not args.python:
        try:
            from rwkv_tpu import native as native_mod

            if native_mod.is_available():
                native = native_mod
        except Exception:
            native = None
    if native is not None:
        from rwkv_tpu.io.quant import dtype_from_name

        orig, new = native.quantize_model_file(
            args.src_path, args.dest_path, int(dtype_from_name(args.format_name))
        )
    else:
        orig, new = quantize_model_file(
            args.src_path, args.dest_path, args.format_name, verbose=not args.quiet
        )
    dt = time.perf_counter() - t0
    print(f"Quantized in {dt:.2f}s: {orig / 1048576:.2f} MB -> {new / 1048576:.2f} MB")


if __name__ == "__main__":
    main()
