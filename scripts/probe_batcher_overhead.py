"""Decompose the ContinuousBatcher's in-scan overhead at 1.5B w8a8.

Round-4 measurement: B=8 through the full serving stack = 13.2 ms/step vs
3.9 ms/step for the bare kernel chain (docs/STATUS.md). This probe times
the same multi-step scan with the control/sampling layers added one at a
time, isolating where the 3.4x goes:

  kern      step_fn only, argmax feedback (the bare chain)
  samp_full + device_sample with top_k=0 (full [B, V] sort + categorical
            — the round-4 sampler's effective cost)
  samp_k    + device_sample with top_k=512 (k-domain sampler)
  greedy    + argmax only (the all_greedy specialization)
  full      + penalties + counts + stop/remaining logic + k-sampler
            (the complete batcher step body)

Usage: timeout 3600 python scripts/probe_batcher_overhead.py [--batch N]
       [--small] [--steps N]
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
if "--small" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params_device
from rwkv_tpu.utils.sampling import device_penalized_logits, device_sample

if "--small" in sys.argv:
    L, C, VOCAB, HEAD, LORA = 2, 256, 512, 64, 32
else:
    L, C, VOCAB, HEAD, LORA = 24, 2048, 65536, 64, 96
B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv \
    else 8
STEPS = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv \
    else 32


def main():
    print(f"batcher-overhead probe: 1.5B-class v7 w8a8 B={B} "
          f"steps={STEPS} on {jax.devices()[0]}", flush=True)

    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    np.asarray(probe(x))
    ov = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        ov = min(ov, time.perf_counter() - t0)
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    params = synth_params_device(cfg, seed=0, lora_dim=LORA)
    srv = ServingModel((cfg, params), precision="w8a8", megakernel=True)
    print(f"model built in {time.perf_counter() - t0:.1f}s "
          f"(mega_big={srv._mega_big})", flush=True)

    pack_fn, step_fn, unpack_fn, loop_arrs = srv.decode_loop_fns(B)
    state = srv.init_state(B)
    logits0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    counts0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
    tempv = jnp.full((B,), 0.8, jnp.float32)
    toppv = jnp.full((B,), 0.8, jnp.float32)
    presv = jnp.full((B,), 0.3, jnp.float32)
    freqv = jnp.full((B,), 0.3, jnp.float32)
    stopsv = jnp.full((B, 1), -1, jnp.int32)
    key0 = jax.random.PRNGKey(0)

    def make(variant):
        @jax.jit
        def run(params, loop_arrs, state, logits, counts, key):
            ps = pack_fn(state)

            def step(carry, key_i):
                ps, logits, counts, remaining, active = carry
                if variant == "kern":
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                elif variant == "samp_full":
                    tok = device_sample(logits, tempv, toppv, key_i, 0)
                elif variant == "samp_k":
                    tok = device_sample(logits, tempv, toppv, key_i, 512)
                elif variant == "greedy":
                    tok = jnp.argmax(logits, -1).astype(jnp.int32)
                    tok = jnp.where(active, tok, 0)
                else:  # full
                    pen = device_penalized_logits(logits, counts, presv,
                                                  freqv)
                    tok = device_sample(pen, tempv, toppv, key_i, 512)
                    tok = jnp.where(active, tok, 0)
                    counts = counts.at[jnp.arange(B), tok].add(
                        active.astype(counts.dtype))
                if variant in ("greedy", "full"):
                    remaining = remaining - active.astype(jnp.int32)
                    hit = jnp.any(tok[:, None] == stopsv, -1)
                    active = active & ~(hit | (remaining <= 0))
                logits, ps = step_fn(params, loop_arrs, ps, tok)
                return (ps, logits, counts, remaining, active), None

            keys = jax.random.split(key, STEPS)
            carry = (ps, logits, counts,
                     jnp.full((B,), 10 ** 6, jnp.int32),
                     jnp.ones((B,), bool))
            (ps, logits, counts, _r, _a), _ = jax.lax.scan(
                step, carry, keys)
            return jnp.sum(logits)

        return run

    for variant in ("kern", "samp_full", "samp_k", "greedy", "full"):
        fn = make(variant)
        _ = np.asarray(fn(srv.params, loop_arrs, state, logits0, counts0,
                          key0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(fn(srv.params, loop_arrs, state, logits0,
                              counts0, key0))
            best = min(best, time.perf_counter() - t0)
        ms = (best - ov) * 1e3 / STEPS
        print(f"{variant:10s}: {ms:7.3f} ms/step "
              f"({B / (ms * 1e-3):8.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
