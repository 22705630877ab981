"""Native gate + timing for the v7 megakernel's in-kernel LM head.

Round-2's headline (BENCH_r02: 2,130 tok/s at 169M w8a8) ran the 50MB
int8 head as a separate XLA matvec per token — ~47% of the measured
~616 GB/s DMA ceiling over the full 135 MB/token stream. This measures
the head folded into the decode pallas_call as extra grid phases
(ops/megakernel.py head_nt) against that baseline.

Usage: timeout 3000 python scripts/bench_mega_head.py [--skip-gate]
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

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import build_mega_pack, v7_decode_megakernel
from rwkv_tpu.ops.parity import layer_norm
from rwkv_tpu.models import graph as G

N_GEN = 256


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


def gate():
    """Native-vs-per-op logits on a small v7: w8a8 must match the
    interpret result's band (int8 dots are integer-exact natively)."""
    cfg = synth_config("7.0", n_layer=3, n_embed=256, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=5, lora_dim=64)
    pack = build_mega_pack(params, cfg, quant=True, head=True)
    srv = ServingModel((cfg, params), precision="w8a8")
    state_r = srv.init_state(1)
    state_t = {
        "att_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1), jnp.float32),
        "ffn_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1), jnp.float32),
        "heads": jnp.zeros((cfg.n_layer, cfg.head_count, 64, 64),
                           jnp.float32),
    }
    worst = 0.0
    for tok in (34, 105, 110, 7, 200):
        lr, state_r = srv.decode(np.array([tok], np.int32), state_r)
        x0 = layer_norm(srv.params["emb"][tok].astype(jnp.float32),
                        *srv.params["ln0"])
        y, state_t, logits = v7_decode_megakernel(
            pack, state_t, x0[:, None], cfg
        )
        lr = np.asarray(lr)[0]
        lm = np.asarray(logits)
        rel = np.abs(lm - lr).max() / max(np.abs(lr).max(), 1e-6)
        worst = max(worst, rel)
        assert lm.argmax() == lr.argmax(), (tok, rel)
    ok = worst < 2e-2
    print(f"gate w8a8 in-kernel head: worst rel {worst:.5f} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    assert ok


def timing():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536,
                       head_size=64)
    params_raw = synth_params(cfg, seed=0)
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    def run_chain(chain, *args):
        t0 = time.perf_counter()
        out = np.asarray(chain(*args))
        print(f"  compiled+first run {time.perf_counter() - t0:.1f}s "
              f"(probe {float(out):.1f})", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(*args))
            best = min(best, time.perf_counter() - t0)
        return max(best - ov, 1e-9) / N_GEN

    # -- baseline: megakernel + separate XLA head (BENCH_r02 path) -------
    mega = ServingModel((cfg, params_raw), precision="w8a8",
                        megakernel=True)
    meta = {k: mega._mega[k] for k in ("quant", "w4", "d_lora", "f_dim")}
    arrs = {k: v for k, v in mega._mega.items()
            if k not in meta and not k.startswith(("head", "ln_out"))}

    @jax.jit
    def chain_baseline(params, pack_arrs, state, logits):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_t, logits = carry
            tok = jnp.argmax(logits).astype(jnp.int32)
            x0 = layer_norm(params["emb"][tok].astype(jnp.float32),
                            *params["ln0"])
            y, state_t = v7_decode_megakernel(pack, state_t, x0[:, None],
                                              cfg)
            xo = layer_norm(y[:, 0], *params["ln_out"])
            logits = G.mm(xo[None, :], params["head"])[0]
            return (state_t, logits), None

        state_t = {
            "att_xx": state["att_xx"][0][..., None],
            "ffn_xx": state["ffn_xx"][0][..., None],
            "heads": jnp.swapaxes(state["heads"][0], -1, -2),
        }
        (state_t, logits), _ = jax.lax.scan(body, (state_t, logits), None,
                                            length=N_GEN)
        return jnp.sum(logits)

    n_stream = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in mega._mega.items() if hasattr(v, "shape")
    ) + cfg.n_vocab * cfg.n_embed  # + int8 head
    n_layers_only = n_stream - cfg.n_vocab * cfg.n_embed
    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)
    per_tok = run_chain(chain_baseline, mega.params, arrs,
                        mega.init_state(1), logits0)
    print(f"baseline (XLA head) : {per_tok * 1e6:7.1f} us/tok "
          f"{1 / per_tok:7.0f} tok/s  {n_stream / 1e9 / per_tok:.0f} GB/s",
          flush=True)

    # -- layers only (no head at all), ROW-stored vectors ----------------
    from rwkv_tpu.ops.megakernel import rowify_mega_pack

    rows_pack = mega._mega_rows
    arrs_rows = {k: v for k, v in rows_pack.items()
                 if k not in meta and not k.startswith(("head", "ln_out"))}

    @jax.jit
    def chain_layers(params, pack_arrs, state, x0):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_t, x0 = carry
            y, state_t = v7_decode_megakernel(pack, state_t, x0, cfg)
            return (state_t, y * 1e-30 + x0), None

        state_t = {
            "att_xx": state["att_xx"][0][..., None],
            "ffn_xx": state["ffn_xx"][0][..., None],
            "heads": jnp.swapaxes(state["heads"][0], -1, -2),
        }
        (state_t, x0), _ = jax.lax.scan(body, (state_t, x0), None,
                                        length=N_GEN)
        return jnp.sum(x0)

    x0c = jnp.zeros((cfg.n_embed, 1), jnp.float32)
    per_tok_l = run_chain(chain_layers, mega.params, arrs_rows,
                          mega.init_state(1), x0c)
    print(f"layers only (rows)  : {per_tok_l * 1e6:7.1f} us/tok "
          f"{1 / per_tok_l:7.0f} tok/s  "
          f"{n_layers_only / 1e9 / per_tok_l:.0f} GB/s", flush=True)

    # -- in-kernel head + row vectors (the production path) -------------
    meta_h = meta
    arrs_h = {k: v for k, v in rows_pack.items() if k not in meta_h}

    @jax.jit
    def chain_head(params, pack_arrs, state, logits):
        pack = {**pack_arrs, **meta_h}

        def body(carry, _):
            state_t, logits = carry
            tok = jnp.argmax(logits).astype(jnp.int32)
            x0 = layer_norm(params["emb"][tok].astype(jnp.float32),
                            *params["ln0"])
            y, state_t, lg = v7_decode_megakernel(
                pack, state_t, x0[:, None], cfg
            )
            return (state_t, lg), None

        state_t = {
            "att_xx": state["att_xx"][0][..., None],
            "ffn_xx": state["ffn_xx"][0][..., None],
            "heads": jnp.swapaxes(state["heads"][0], -1, -2),
        }
        (state_t, logits), _ = jax.lax.scan(body, (state_t, logits), None,
                                            length=N_GEN)
        return jnp.sum(logits)

    per_tok_h = run_chain(chain_head, mega.params, arrs_h,
                          mega.init_state(1), logits0)
    print(f"rows + inkern head  : {per_tok_h * 1e6:7.1f} us/tok "
          f"{1 / per_tok_h:7.0f} tok/s  "
          f"{n_stream / 1e9 / per_tok_h:.0f} GB/s", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    if "--skip-gate" not in sys.argv:
        gate()
    timing()


if __name__ == "__main__":
    main()
