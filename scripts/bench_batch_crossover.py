"""Measure batched-decode crossovers at 169M: per-op bf16 vs per-op
w8a8 vs the batched megakernel, B in {1,2,4,8,16,32,64,128}.

Round 2 regressed the B=8 context metric (11,785 -> 9,701 tok/s) by
reusing the w8a8 engine for batched decode; this quantifies every
path's tok/s per B so ServingModel.decode can route per (arch, size, B)
on data, not one hard-coded crossover.

Usage: timeout 3000 python scripts/bench_batch_crossover.py
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
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params

N_GEN = 128
BATCHES = (1, 2, 4, 8, 16, 32, 64, 128)


def null_overhead():
    @jax.jit
    def probe(x):
        return x * 1.000001

    xp = jnp.ones((8,), jnp.float32)
    np.asarray(probe(xp))
    ov = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(xp))
        ov = min(ov, time.perf_counter() - t0)
    return ov


def time_perop(srv, cfg, batch, ov, mm_force):
    from rwkv_tpu.ops.kernels import force_mode

    bstate = jax.tree.map(
        lambda a: jnp.swapaxes(
            jnp.broadcast_to(a[None], (batch,) + a.shape), 0, 1
        ),
        init_state(cfg),
    )
    blogits = jnp.zeros((batch, cfg.n_vocab), jnp.float32)

    @jax.jit
    def chain(params, state, logits):
        def body(carry, _):
            state, logits = carry
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            with force_mode(mm_force):
                logits, state = forward_stacked(
                    params, state, toks[None, :], cfg, True
                )
            return (state, logits), None

        (state, logits), _ = jax.lax.scan(
            body, (state, logits), None, length=N_GEN
        )
        return jnp.sum(logits)

    np.asarray(chain(srv.params, bstate, blogits))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(srv.params, bstate, blogits))
        best = min(best, time.perf_counter() - t0)
    return batch * N_GEN / max(best - ov, 1e-9)


def time_mega_packed(srv, cfg, batch, ov):
    """Whole decode loop (incl. w8a8 head) in ONE jitted scan — separate
    per-step dispatches measure tunnel latency, not the kernel."""
    from rwkv_tpu.models import graph as G
    from rwkv_tpu.ops.megakernel import (
        pack_batched_state, v7_decode_megakernel_batched_packed,
    )
    from rwkv_tpu.ops.parity import layer_norm as p_ln

    h, sz = cfg.head_count, cfg.head_size
    pack_src = srv._mega_rows
    meta = {k: pack_src[k] for k in ("quant", "w4", "d_lora", "f_dim")}
    arrs = {k: v for k, v in pack_src.items()
            if k not in meta and not k.startswith(("head", "ln_out"))}

    @jax.jit
    def chain(params, pack_arrs, state_p, toks):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_p, toks = carry
            x0 = p_ln(params["emb"][toks].astype(jnp.float32),
                      *params["ln0"])
            y, state_p = v7_decode_megakernel_batched_packed(
                pack, state_p, x0.T, cfg
            )
            xo = p_ln(y.T, *params["ln_out"])
            logits = G.mm(xo, params["head"])
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            return (state_p, toks), None

        (state_p, toks), _ = jax.lax.scan(body, (state_p, toks), None,
                                          length=N_GEN)
        return jnp.sum(toks)

    state = srv.init_state(batch)
    state_p = {
        "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
        "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
        "heads": pack_batched_state(state["heads"], h, sz),
    }
    toks = jnp.zeros((batch,), jnp.int32)
    np.asarray(chain(srv.params, arrs, state_p, toks))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(srv.params, arrs, state_p, toks))
        best = min(best, time.perf_counter() - t0)
    return batch * N_GEN / max(best - ov, 1e-9)


def time_mega_batched(srv, cfg, batch, ov):
    from rwkv_tpu.models import graph as G
    from rwkv_tpu.ops.megakernel import v7_decode_megakernel_batched
    from rwkv_tpu.ops.parity import layer_norm as p_ln

    pack_src = srv._mega
    meta = {k: pack_src[k] for k in ("quant", "w4", "d_lora", "f_dim")}
    arrs = {k: v for k, v in pack_src.items()
            if k not in meta and not k.startswith(("head", "ln_out"))}

    @jax.jit
    def chain(params, pack_arrs, state4, toks):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state4, toks = carry
            x0 = p_ln(params["emb"][toks].astype(jnp.float32),
                      *params["ln0"])
            y, state4 = v7_decode_megakernel_batched(
                pack, state4, x0.T, cfg
            )
            xo = p_ln(y.T, *params["ln_out"])
            logits = G.mm(xo, params["head"])
            toks = jnp.argmax(logits, -1).astype(jnp.int32)
            return (state4, toks), None

        (state4, toks), _ = jax.lax.scan(body, (state4, toks), None,
                                         length=N_GEN)
        return jnp.sum(toks)

    state = srv.init_state(batch)
    state4 = {
        "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
        "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
        "heads": jnp.transpose(state["heads"], (1, 2, 3, 4, 0)),
    }
    toks = jnp.zeros((batch,), jnp.int32)
    np.asarray(chain(srv.params, arrs, state4, toks))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(srv.params, arrs, state4, toks))
        best = min(best, time.perf_counter() - t0)
    return batch * N_GEN / max(best - ov, 1e-9)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536,
                       head_size=64)
    params_raw = synth_params(cfg, seed=0)
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    bf16 = ServingModel((cfg, params_raw), precision="bf16")
    w8 = ServingModel((cfg, params_raw), precision="w8a8",
                      megakernel=True)
    w8.mega_min_batch = 2  # allow the batched kernel everywhere

    print(f"{'B':>4s} {'bf16/op':>10s} {'w8a8/op':>10s} {'mega8':>10s}"
          f" {'megapack':>10s}  (tok/s)", flush=True)
    for b in BATCHES:
        r_bf = time_perop(bf16, cfg, b, ov, None)
        r_w8 = time_perop(w8, cfg, b, ov, w8._mm_force)
        r_mg = r_mp = float("nan")
        if b >= 2:
            try:
                r_mg = time_mega_batched(w8, cfg, b, ov)
            except Exception as e:
                print(f"  mega B={b} failed: {type(e).__name__}",
                      file=sys.stderr, flush=True)
            try:
                r_mp = time_mega_packed(w8, cfg, b, ov)
            except Exception as e:
                print(f"  megapack B={b} failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
        print(f"{b:4d} {r_bf:10.0f} {r_w8:10.0f} {r_mg:10.0f}"
              f" {r_mp:10.0f}", flush=True)


if __name__ == "__main__":
    main()
