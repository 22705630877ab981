"""Dependent-chain decode benchmarks: feed each step's state into the next
so nothing can pipeline — the honest single-stream number."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rwkv_tpu.models.serve import ServingModel, forward_stacked
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params


def main():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")
    stacked = srv.params

    @jax.jit
    def step(params, state, tok):
        return forward_stacked(params, state, tok, cfg, True)

    state = init_state(cfg)
    tok = jnp.zeros((1,), jnp.int32)
    logits, state = step(stacked, state, tok)
    jax.block_until_ready(logits)

    # 1) python loop, dependent state chain, token fixed
    n = 128
    t0 = time.perf_counter()
    for _ in range(n):
        logits, state = step(stacked, state, tok)
    jax.block_until_ready(logits)
    dt = (time.perf_counter() - t0) / n
    print(f"python loop dependent (state chain):   {dt * 1e3:7.3f} ms  {1 / dt:8.1f} tok/s")

    # 2) python loop, dependent on token too (argmax on device, no transfer)
    t0 = time.perf_counter()
    for _ in range(n):
        logits, state = step(stacked, state, tok)
        tok = jnp.argmax(logits)[None].astype(jnp.int32)
    jax.block_until_ready(logits)
    dt = (time.perf_counter() - t0) / n
    print(f"python loop dependent (token+state):   {dt * 1e3:7.3f} ms  {1 / dt:8.1f} tok/s")

    # 3) device scan loop, greedy, no vmap
    @jax.jit
    def gen_scan(params, state, logits, n_steps):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            logits, state = forward_stacked(params, state, tok, cfg, True)
            return (state, logits), tok

        (state, logits), toks = jax.lax.scan(body, (state, logits), None, length=128)
        return toks, logits, state

    out = gen_scan(stacked, state, logits, 128)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = gen_scan(stacked, state, logits, 128)
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / 128
    print(f"device scan greedy (no vmap):          {dt * 1e3:7.3f} ms  {1 / dt:8.1f} tok/s")

    # 4) device scan with categorical sampling, no vmap
    @jax.jit
    def gen_scan_sample(params, state, logits, rng):
        def body(carry, _):
            state, logits, rng = carry
            rng, k = jax.random.split(rng)
            tok = jax.random.categorical(k, logits)[None].astype(jnp.int32)
            logits, state = forward_stacked(params, state, tok, cfg, True)
            return (state, logits, rng), tok

        (state, logits, _), toks = jax.lax.scan(
            body, (state, logits, rng), None, length=128
        )
        return toks, logits

    out = gen_scan_sample(stacked, state, logits, jax.random.PRNGKey(0))
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = gen_scan_sample(stacked, state, logits, jax.random.PRNGKey(0))
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / 128
    print(f"device scan categorical (no vmap):     {dt * 1e3:7.3f} ms  {1 / dt:8.1f} tok/s")

    # 5) device scan greedy WITH vmap B=1 (the ServingModel.generate path)
    bstate = srv.init_state(1)
    blogits = jnp.zeros((1, cfg.n_vocab), jnp.float32)

    @jax.jit
    def gen_scan_vmap(params, state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            def one(st, t):
                return forward_stacked(params, st, t[None], cfg, True)

            logits, state = jax.vmap(one)(state, tok)
            return (state, logits), tok

        (state, logits), toks = jax.lax.scan(body, (state, logits), None, length=128)
        return toks, logits

    out = gen_scan_vmap(stacked, bstate, blogits)
    jax.block_until_ready(out[1])
    t0 = time.perf_counter()
    out = gen_scan_vmap(stacked, bstate, blogits)
    jax.block_until_ready(out[1])
    dt = (time.perf_counter() - t0) / 128
    print(f"device scan greedy vmap B=1:           {dt * 1e3:7.3f} ms  {1 / dt:8.1f} tok/s")


if __name__ == "__main__":
    main()
