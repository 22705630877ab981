"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: single-stream greedy decode throughput (tokens/sec) of a
169M-parameter-class RWKV v7 model (L=12, C=768, head 64, vocab 65536) on
one chip: serving engine, bf16 weights, scan-over-layers, the whole
128-token decode loop in one on-device lax.scan, timing forced by host
materialization (the tunnel's block_until_ready is asynchronous).
`vs_baseline` compares against the reference's best published 169M-class
decode latency: 6.2 ms/token (cuBLAS offload, i7-13700K + RTX 3060 Ti,
README.md:45-56) = 161.3 tokens/sec.

Context metrics (batched decode, prefill) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import ServingModel, forward_stacked
    from rwkv_tpu.models.state import init_state
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")
    stacked = srv.params
    n_gen = 128

    @jax.jit
    def gen_scan(params, state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            logits, state = forward_stacked(params, state, tok, cfg, True)
            return (state, logits), tok

        (state, logits), toks = jax.lax.scan(body, (state, logits), None, length=n_gen)
        return toks, logits, state

    state = init_state(cfg)
    logits = jnp.zeros((cfg.n_vocab,), jnp.float32)
    out = gen_scan(stacked, state, logits)
    _ = np.asarray(out[1])  # compile + settle

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen_scan(stacked, state, logits)
        _ = np.asarray(out[1])  # force completion through the tunnel
        best = min(best, (time.perf_counter() - t0) / n_gen)
    tps_single = 1.0 / best

    # Prefill throughput, T=256 (chunked matmul wkv for v5/v6; scan for v7).
    long_prompt = list(np.arange(256) % cfg.n_vocab)
    logits_p, _ = srv.prefill(long_prompt)
    _ = np.asarray(logits_p)
    t0 = time.perf_counter()
    logits_p, _ = srv.prefill(long_prompt)
    _ = np.asarray(logits_p)
    tps_prefill = len(long_prompt) / (time.perf_counter() - t0)

    print(f"context: prefill T=256: {tps_prefill:.0f} tok/s", file=sys.stderr)

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
