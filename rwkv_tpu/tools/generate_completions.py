"""Generate text completions from a prompt.

Parity with /root/reference/python/generate_completions.py: prefill via
chunked sequence eval, then sample N continuations with temperature/top-p;
reports ms/token.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from rwkv_tpu.models.model import RWKVModel
from rwkv_tpu.utils.sampling import sample_logits
from rwkv_tpu.utils.tokenizer import add_tokenizer_argument, get_tokenizer


def main():
    p = argparse.ArgumentParser(description="Generate completions from a prompt")
    p.add_argument("model_path")
    add_tokenizer_argument(p)
    p.add_argument("--prompt", default="One upon a time,")
    p.add_argument("--generations", type=int, default=3)
    p.add_argument("--tokens-per-generation", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--serve", default=None, metavar="PRECISION",
        help="use the throughput engine (ServingModel) at this precision "
             "(bf16/q8/q8r/w8a8/w4a8/quant) instead of the parity engine",
    )
    p.add_argument(
        "--megakernel", action="store_true",
        help="with --serve: route decode through the whole-model Pallas "
             "megakernel",
    )
    args = p.parse_args()

    if args.serve:
        from rwkv_tpu.models.serve import ServingModel

        model = _ServeAdapter(ServingModel(
            args.model_path, precision=args.serve,
            megakernel=args.megakernel,
        ))
    else:
        model = RWKVModel(args.model_path)
    decode, encode = get_tokenizer(args.tokenizer, model.n_vocab)
    prompt_tokens = encode(args.prompt)
    print(f"{len(prompt_tokens)} tokens in prompt")

    init_logits, init_state = model.eval_sequence_in_chunks(prompt_tokens)
    rng = np.random.default_rng(args.seed)

    for gen in range(args.generations):
        print(f"\n--- Generation {gen} ---\n")
        print(args.prompt, end="")
        logits, state = init_logits, init_state
        t0 = time.perf_counter()
        for _ in range(args.tokens_per_generation):
            token = sample_logits(
                logits, temperature=args.temperature, top_p=args.top_p, rng=rng
            )
            print(decode([token]), end="", flush=True)
            logits, state = model.eval(token, state)
        dt = time.perf_counter() - t0
        print(f"\nTook {dt:.3f} sec, {dt * 1000 / args.tokens_per_generation:.2f} ms per token")


class _ServeAdapter:
    """RWKVModel-shaped eval surface over ServingModel (prefill +
    single-token decode), so the generation loop is engine-agnostic."""

    def __init__(self, srv):
        self._srv = srv
        self.n_vocab = srv.config.n_vocab

    def init_state(self):
        return self._srv.init_state(1)

    def eval_sequence_in_chunks(self, tokens, state=None):
        logits, st = self._srv.prefill(list(tokens), state)
        return np.asarray(logits), st

    def eval(self, token, state):
        logits, st = self._srv.decode(
            np.asarray([token], np.int32), state
        )
        return np.asarray(logits)[0], st


if __name__ == "__main__":
    main()
