"""Ablate the decode step to find where time goes (dependent 128-step
chains, forced materialization)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rwkv_tpu.models import graph as G
from rwkv_tpu.models.serve import ServingModel, forward_stacked
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.parity import layer_norm


def chain_time(fn, state, logits, n=128):
    out = fn(state, logits)
    _ = np.asarray(out[1])
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = fn(state, logits)
        _ = np.asarray(out[1])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")
    P = srv.params

    def make_chain(step_fn):
        @jax.jit
        def chain(state, logits):
            def body(carry, _):
                state, logits = carry
                tok = jnp.argmax(logits)[None].astype(jnp.int32)
                logits, state = step_fn(tok, state)
                return (state, logits), None

            (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=128)
            return state, logits

        return chain

    state = init_state(cfg)
    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)

    # (a) full step
    def full(tok, state):
        return forward_stacked(P, state, tok, cfg, True)

    dt = chain_time(make_chain(full), state, logits0)
    print(f"full step:            {dt * 1e3:7.3f} ms", flush=True)

    # (b) no head matmul (logits = embedding row dotted to vocab? -> skip):
    def no_head(tok, state):
        _, st = forward_stacked(P, state, tok, cfg, False)
        # fake logits from the token to keep the chain dependent
        fake = jnp.zeros((cfg.n_vocab,), jnp.float32).at[tok[0]].set(1.0)
        return fake, st

    dt = chain_time(make_chain(no_head), state, logits0)
    print(f"no head matmul:       {dt * 1e3:7.3f} ms", flush=True)

    # (c) layers but wkv replaced by passthrough (measure wkv cost):
    orig = G.wkv7_scan

    def fake_wkv7(s, r, w, k, v, a, b):
        return v, s

    G.wkv7_scan = fake_wkv7
    try:
        def no_wkv(tok, state):
            return forward_stacked(P, state, tok, cfg, True)

        dt = chain_time(make_chain(no_wkv), state, logits0)
        print(f"wkv passthrough:      {dt * 1e3:7.3f} ms", flush=True)
    finally:
        G.wkv7_scan = orig

    # (d) head matmul only
    x0 = jnp.zeros((cfg.n_embed,), jnp.float32)

    @jax.jit
    def head_chain(state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            xo = layer_norm(P["emb"][tok[0]].astype(jnp.float32), *P["ln_out"])
            logits = G.mm(xo[None, :], P["head"])[0]
            return (state, logits), None

        (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=128)
        return state, logits

    dt = chain_time(head_chain, state, logits0)
    print(f"head-only chain:      {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
