"""Compare decode-step implementations on the current JAX platform."""

import time
import sys
import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from rwkv_tpu.models.graph import forward
from rwkv_tpu.models.serve import ServingModel, forward_stacked
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params


def timeit(label, fn, n=64):
    fn()
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = None
    for _ in range(n):
        outs = fn()
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt * 1e3:8.3f} ms/step  {1 / dt:8.1f} tok/s")
    return dt


def main():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    params = synth_params(cfg, seed=0, dtype=jnp.bfloat16)

    # 1) unrolled python-layer-loop graph (parity graph, bf16 dense weights)
    state = init_state(cfg)
    tok = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def unrolled(params, state, tok):
        return forward(params, state, tok, cfg, compute_logits=True)

    out = unrolled(params, state, tok)
    state_u = out[1]
    timeit("unrolled parity graph (bf16 Weight)", lambda: unrolled(params, state_u, tok))

    # 2) stacked scan-over-layers (serving engine)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")
    st = srv.init_state(1)
    toks = np.zeros(1, np.int32)
    _, st = srv.decode(toks, st)
    timeit("stacked scan decode B=1", lambda: srv.decode(toks, st))

    st8 = srv.init_state(8)
    toks8 = np.zeros(8, np.int32)
    _, st8 = srv.decode(toks8, st8)
    timeit("stacked scan decode B=8 (per step)", lambda: srv.decode(toks8, st8))

    # 3) stacked scan, single-seq no-vmap
    stacked = srv.params
    state1 = init_state(cfg)

    @jax.jit
    def stacked_novmap(params, state, tok):
        return forward_stacked(params, state, tok, cfg, True)

    out = stacked_novmap(stacked, state1, tok)
    timeit("stacked scan no-vmap", lambda: stacked_novmap(stacked, out[1], tok))

    # 4) on-device generate loop per-token cost
    def gen():
        t, l, s = srv.generate(list(range(8)), n_tokens=64, temperature=1.0)
        return l

    gen()
    t0 = time.perf_counter()
    l = gen()
    jax.block_until_ready(l)
    dt = (time.perf_counter() - t0) / 64
    print(f"{'device generate loop (per token)':42s} {dt * 1e3:8.3f} ms/step  {1 / dt:8.1f} tok/s")


if __name__ == "__main__":
    main()
