"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: single-stream decode throughput (tokens/sec) of a
169M-parameter-class RWKV v7 model (L=12, C=768, head 64, vocab 65536) on
one chip, using the serving engine (bf16 weights, scan-over-layers, whole
decode loop on device). `vs_baseline` compares against the reference's best
published 169M-class decode latency: 6.2 ms/token (cuBLAS offload,
i7-13700K + RTX 3060 Ti, README.md:45-56) = 161.3 tokens/sec.

Extra context metrics (batched decode, prefill) go to stderr.
"""

import json
import sys
import time

import numpy as np


def _time(fn, n_iter=3):
    import jax

    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    params = synth_params(cfg, seed=0)
    srv = ServingModel((cfg, params), precision="bf16")

    prompt = list(range(32))
    n_gen = 128

    # Single-stream decode: whole loop on device.
    def single():
        toks, logits, _ = srv.generate(prompt, n_tokens=n_gen, temperature=1.0, seed=0)
        return logits

    dt = _time(single)
    tps_single = n_gen / dt

    # Batched decode throughput (continuous-batching proxy), B=8.
    batch = 8
    state = srv.init_state(batch)
    tokens = np.zeros(batch, np.int32)

    def batched():
        logits, st = srv.decode(tokens, state)
        return logits

    dt_b = _time(batched, n_iter=20)
    tps_batched = batch / dt_b

    # Prefill throughput, T=256.
    long_prompt = list(np.arange(256) % cfg.n_vocab)

    def prefill():
        logits, _ = srv.prefill(long_prompt)
        return logits

    dt_p = _time(prefill)
    tps_prefill = len(long_prompt) / dt_p

    print(
        f"context: batched_decode B=8: {tps_batched:.0f} tok/s | "
        f"prefill T=256: {tps_prefill:.0f} tok/s",
        file=sys.stderr,
    )

    baseline_tps = 1000.0 / 6.2  # reference's best 169M ms/token
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_rwkv7_169M_single_stream",
                "value": round(tps_single, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tps_single / baseline_tps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
