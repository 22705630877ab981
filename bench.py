"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: single-stream serial decode throughput (tokens/sec) of a
169M-parameter-class RWKV v7 model (L=12, C=768, head 64, vocab 65536) on
one chip. `vs_baseline` compares against the reference's best published
169M-class decode latency: 6.2 ms/token (cuBLAS offload, i7-13700K + RTX
3060 Ti, README.md:45-56) = 161.3 tokens/sec.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.graph import forward
    from rwkv_tpu.models.state import init_state
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    params = synth_params(cfg, seed=0, dtype=jnp.bfloat16)
    state = init_state(cfg)

    @jax.jit
    def step(params, state, token):
        return forward(params, state, token, cfg, compute_logits=True)

    token = jnp.zeros((1,), jnp.int32)
    # Warm up / compile.
    logits, state = step(params, state, token)
    jax.block_until_ready(logits)

    n = 64
    t0 = time.perf_counter()
    for _ in range(n):
        logits, state = step(params, state, token)
    jax.block_until_ready(logits)
    dt = time.perf_counter() - t0

    tps = n / dt
    baseline_tps = 1000.0 / 6.2  # reference's best 169M ms/token
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_rwkv7_169M_single_stream",
                "value": round(tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(tps / baseline_tps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
