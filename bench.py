"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: single-stream greedy decode throughput (tokens/sec) of a
169M-parameter-class RWKV v7 model (L=12, C=768, head 64, vocab 65536) on
one chip. Primary path: the whole-model Pallas megakernel (one pallas_call
for all layers, ops/megakernel.py) serving w4a8 — split-half packed int4
big mats + int8 LoRA/head (the head stays int8, mirroring the reference's
head-never-4-bit rule) — with the whole 512-token decode loop in one
on-device lax.scan. Falls back to w8a8, then the bf16 per-op engine.
w4a8 is the fastest serving format at every measured size (1.5B/7B tables
in docs/STATUS.md), matching the reference's own "Q4 formats are fastest"
property (README.md:35-43).

Timing methodology (the axon tunnel adds ~25-60 ms fixed round-trip latency
to ANY host synchronization and block_until_ready is asynchronous): each
measurement transfers only a 4-byte probe scalar, and the separately
measured null round-trip overhead is subtracted before dividing by the
token count. The chain is 512 tokens so tunnel-latency jitter between the
null-probe measurement and the chain runs stays ~1-2% of the result
(at 256 tokens it was ~7% — the round-3/4 headline wobble).

`vs_baseline` compares against the reference's best published 169M-class
decode latency: 6.2 ms/token (cuBLAS offload, i7-13700K + RTX 3060 Ti,
README.md:45-56) = 161.3 tokens/sec.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: tunnel compiles are slow; repeat runs hit
# the cache and start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def _null_overhead(jax, jnp):
    """Fixed cost of (dispatch + tiny host transfer) through the runtime."""

    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    _ = np.asarray(probe(x))
    best = float("inf")
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from rwkv_tpu.models.serve import ServingModel, forward_stacked
    from rwkv_tpu.models.state import init_state
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    params_raw = synth_params(cfg, seed=0)
    n_gen = 512
    overhead = _null_overhead(jax, jnp)

    def time_chain(chain_fn, *args):
        _ = np.asarray(chain_fn(*args))  # compile + settle
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _ = np.asarray(chain_fn(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best - overhead, 1e-9) / n_gen

    # -- primary: whole-model megakernel with row-stored vectors,
    # head-pair wkv state, and the LM head streamed inside the kernel
    # (tile fetches interleaved with the layer phases; ops/megakernel.py).
    # w4a8 first (int4 split-half big mats — the fastest format), then
    # w8a8 if the w4 build/compile fails. --
    def run_mega(precision):
        from rwkv_tpu.ops.megakernel import (
            head_tile_plan, v7_decode_megakernel,
        )
        from rwkv_tpu.ops.parity import layer_norm

        mega = ServingModel((cfg, params_raw), precision=precision,
                            megakernel=True, batch_bf16_shadow=True)
        pack_src = mega._mega_rows
        assert pack_src is not None
        assert head_tile_plan(pack_src, cfg) is not None
        meta = {k: pack_src[k] for k in ("quant", "w4", "d_lora", "f_dim")}
        arrs = {k: v for k, v in pack_src.items() if k not in meta}

        @jax.jit
        def mega_chain(params, pack_arrs, state, logits):
            pack = {**pack_arrs, **meta}

            def body(carry, _):
                state_t, logits = carry
                tok = jnp.argmax(logits).astype(jnp.int32)
                x0 = layer_norm(
                    params["emb"][tok].astype(jnp.float32), *params["ln0"]
                )
                y, state_t, logits = v7_decode_megakernel(
                    pack, state_t, x0[:, None], cfg
                )
                return (state_t, logits), None

            heads_t = jnp.swapaxes(state["heads"][0], -1, -2)
            L_, h_, s_ = cfg.n_layer, cfg.head_count, cfg.head_size
            if h_ % 2 == 0:
                # head-pair layout [L, H/2, S_j, 2*S_i]: exact 128
                # lanes — the [H, S_j, S_i] block pads S_i 64 -> 128
                hp = heads_t.reshape(L_, h_ // 2, 2, s_, s_)
                heads_t = jnp.transpose(hp, (0, 1, 3, 2, 4)).reshape(
                    L_, h_ // 2, s_, 2 * s_)
            state_t = {
                "att_xx": state["att_xx"][0][:, None, :],  # [L, 1, C] rows
                "ffn_xx": state["ffn_xx"][0][:, None, :],
                "heads": heads_t,
            }
            (state_t, logits), _ = jax.lax.scan(
                body, (state_t, logits), None, length=n_gen
            )
            return jnp.sum(logits)  # 4-byte probe

        per_tok = time_chain(
            mega_chain, mega.params, arrs, mega.init_state(1),
            jnp.zeros((cfg.n_vocab,), jnp.float32),
        )
        return 1.0 / per_tok, mega

    tps_single = None
    srv = None
    for precision in ("w4a8", "w8a8"):
        try:
            tps_single, srv = run_mega(precision)
            print(f"megakernel headline precision: {precision}",
                  file=sys.stderr)
            break
        except Exception as e:
            print(f"megakernel {precision} path failed ({e}); "
                  "falling back", file=sys.stderr)

    if tps_single is None:
        srv = ServingModel((cfg, params_raw), precision="bf16")

        @jax.jit
        def gen_scan(params, state, logits):
            def body(carry, _):
                state, logits = carry
                tok = jnp.argmax(logits)[None].astype(jnp.int32)
                logits, state = forward_stacked(params, state, tok, cfg, True)
                return (state, logits), None

            (state, logits), _ = jax.lax.scan(
                body, (state, logits), None, length=n_gen
            )
            return jnp.sum(logits)  # 4-byte probe

        per_tok = time_chain(
            gen_scan, srv.params, init_state(cfg),
            jnp.zeros((cfg.n_vocab,), jnp.float32),
        )
        tps_single = 1.0 / per_tok

    # Batched context metric: mid-B decode routes to the bf16 shadow
    # (measured fastest 2 <= B < 128; scripts/bench_batch_crossover.py)
    stacked = (srv._shadow() if getattr(srv, "_batch_bf16_shadow", False)
               else srv.params)

    # Context metrics are best-effort: they add two more large graph
    # compiles, which through a congested tunnel can be slow. The headline
    # metric must always print.
    tps_batched = tps_prefill = float("nan")
    # Batched decode (continuous-batching proxy), B=8, probe-only
    # transfer — the lane-packed batched kernel (state [H, S_j, S_i*B]),
    # the fastest measured path for B in [2, 32]
    # (scripts/bench_batch_crossover.py); falls back to the per-op
    # bf16-shadow chain if the packed path is unavailable.
    batch = 8
    try:
        from rwkv_tpu.ops.megakernel import (
            pack_batched_state, v7_decode_megakernel_batched_packed,
        )
        from rwkv_tpu.ops.parity import layer_norm as p_ln
        from rwkv_tpu.models import graph as G

        # the lane-packed batched kernel is int8-only: when the headline
        # engine is w4a8, build a w8a8 sibling for the batched metric
        if srv is not None and srv._mega_rows is not None \
                and not srv._mega_rows["w4"]:
            srv_b = srv
        else:
            srv_b = ServingModel((cfg, params_raw), precision="w8a8",
                                 megakernel=True, batch_bf16_shadow=True)
        pack_src = srv_b._mega_rows
        assert pack_src is not None
        bmeta = {k: pack_src[k] for k in ("quant", "w4", "d_lora", "f_dim")}
        barrs = {k: v for k, v in pack_src.items()
                 if k not in bmeta and not k.startswith(("head", "ln_out"))}

        @jax.jit
        def packed_chain(params, pack_arrs, state_p, toks):
            pack = {**pack_arrs, **bmeta}

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

            (state_p, toks), _ = jax.lax.scan(body, (state_p, toks),
                                              None, length=n_gen)
            return jnp.sum(toks)

        bst = srv_b.init_state(batch)
        bstate_p = {
            "att_xx": jnp.transpose(bst["att_xx"], (1, 2, 0)),
            "ffn_xx": jnp.transpose(bst["ffn_xx"], (1, 2, 0)),
            "heads": pack_batched_state(
                bst["heads"], cfg.head_count, cfg.head_size
            ),
        }
        btoks = jnp.zeros((batch,), jnp.int32)
        _ = np.asarray(packed_chain(srv_b.params, barrs, bstate_p, btoks))
        best_b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(packed_chain(srv_b.params, barrs, bstate_p, btoks))
            best_b = min(best_b, time.perf_counter() - t0)
        tps_batched = batch * n_gen / max(best_b - overhead, 1e-9)
    except Exception as e:
        print(f"packed batched metric failed ({e}); per-op fallback",
              file=sys.stderr)
        bstate = jax.tree.map(
            lambda a: jnp.swapaxes(
                jnp.broadcast_to(a[None], (batch,) + a.shape), 0, 1
            ),
            init_state(cfg),
        )
        blogits = jnp.zeros((batch, cfg.n_vocab), jnp.float32)

        @jax.jit
        def batch_chain(params, state, logits):
            def body(carry, _):
                state, logits = carry
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                logits, state = forward_stacked(
                    params, state, toks[None, :], cfg, True
                )
                return (state, logits), None

            (state, logits), _ = jax.lax.scan(
                body, (state, logits), None, length=n_gen
            )
            return jnp.sum(logits)

        try:
            _ = np.asarray(batch_chain(stacked, bstate, blogits))
            best_b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(batch_chain(stacked, bstate, blogits))
                best_b = min(best_b, time.perf_counter() - t0)
            tps_batched = batch * n_gen / max(best_b - overhead, 1e-9)
        except Exception as e2:
            print(f"batched context metric skipped: {e2}", file=sys.stderr)

    # Prefill throughput, T=256 (chunked matmul wkv; probe-only transfer).
    # The prefill itself is ~1-4 ms — far below the ~25 ms tunnel sync — so
    # it runs `reps` times inside one device-side loop per measurement.
    prompt = jnp.asarray(np.arange(256, dtype=np.int32) % cfg.n_vocab).reshape(1, 256)
    pre_state = jax.tree.map(
        lambda a: jnp.swapaxes(a, 0, 1), srv.init_state(1)
    )
    reps_p = 32

    @jax.jit
    def prefill_probe(params, state, tokens):
        def rep(i, acc):
            toks = (tokens.T + (acc * 1e-30).astype(jnp.int32))
            logits, _ = forward_stacked(params, state, toks, cfg, True)
            return acc + jnp.sum(logits)

        return jax.lax.fori_loop(0, reps_p, rep, jnp.float32(0.0))

    try:
        _ = np.asarray(prefill_probe(stacked, pre_state, prompt))
        best_p = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(prefill_probe(stacked, pre_state, prompt))
            best_p = min(best_p, time.perf_counter() - t0)
        tps_prefill = 256 * reps_p / max(best_p - overhead, 1e-9)
    except Exception as e:
        print(f"prefill context metric skipped: {e}", file=sys.stderr)

    print(
        f"context: batched decode B=8: {tps_batched:.0f} tok/s | "
        f"prefill T=256: {tps_prefill:.0f} tok/s | "
        f"sync overhead subtracted: {overhead * 1e3:.1f} ms",
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
