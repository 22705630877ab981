"""Continuous-batcher overhead vs the raw batched decode loop (VERDICT
round-1 item 7 'done' criterion: batcher within ~10% of raw decode at B=8).

The batcher's device loop syncs the host once per `sync_every` tokens; on
the tunnel a sync costs ~25 ms, so the amortized overhead per token is
sync_cost / (B * sync_every) — measured here against the raw loop.

Run:  python scripts/bench_batcher.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rwkv_tpu.models.serve import ServingModel, forward_stacked
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.parallel.batching import ContinuousBatcher

B = 8
N_NEW = 512


def main():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536,
                       head_size=64)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")

    # raw loop: N_NEW batched greedy steps in one on-device scan
    @jax.jit
    def raw_chain(params, state, logits):
        def body(carry, _):
            state, logits = carry
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logits, state = forward_stacked(params, state, toks[None, :], cfg, True)
            return (state, logits), None

        (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=N_NEW)
        return jnp.sum(logits)

    state = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), srv.init_state(B))
    logits0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    np.asarray(raw_chain(srv.params, state, logits0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(raw_chain(srv.params, state, logits0))
        best = min(best, time.perf_counter() - t0)
    raw_tps = B * N_NEW / best
    print(f"raw decode loop   B={B}: {raw_tps:8.0f} tok/s "
          f"({best / N_NEW * 1e3:.3f} ms/step)", flush=True)

    for sync_every in (8, 32, 128):
        batcher = ContinuousBatcher(srv, max_batch=B, sync_every=sync_every)
        prompts = [[1 + i, 2, 3] for i in range(B)]
        # warmup: compile the multi-step fn + admission shapes
        for p in prompts:
            batcher.submit(p, max_new_tokens=sync_every, temperature=0.0)
        batcher.run()
        for p in prompts:
            batcher.submit(p, max_new_tokens=N_NEW, temperature=0.0)
        t0 = time.perf_counter()
        batcher.run()
        dt = time.perf_counter() - t0
        tps = B * N_NEW / dt
        print(f"batcher sync={sync_every:4d}: {tps:8.0f} tok/s "
              f"({tps / raw_tps * 100:5.1f}% of raw)", flush=True)


if __name__ == "__main__":
    main()
