"""Native-TPU verification + timing of the v5.2 whole-model megakernel.

Same harness as bench_mega_v6.py: cross-path gate at shallow depth
(argmax + bounded drift vs the per-op serving path), then chained decode
timing at the 169M-class config.

Usage:  timeout 3000 python scripts/bench_mega_v5.py [--small] [--bf16]
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
from rwkv_tpu.ops.megakernel import v5_decode_megakernel
from rwkv_tpu.ops.parity import layer_norm
from rwkv_tpu.models import graph as G

SMALL = "--small" in sys.argv
QUANT = "--bf16" not in sys.argv
if SMALL:
    L, C, VOCAB, HEAD, LORA = 4, 512, 4096, 64, 64
else:
    L, C, VOCAB, HEAD, LORA = 12, 768, 65536, 64, 64  # 169M-class


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


def main():
    cfg = synth_config("5.2", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    precision = "w8a8" if QUANT else "bf16"
    print(f"v5.2 model L={L} C={C} V={VOCAB} precision={precision}",
          flush=True)
    params = synth_params(cfg, seed=0, lora_dim=LORA)

    # ---- quality gate at shallow depth (see bench_mega_v6.py note) ----
    cfg_g = synth_config("5.2", n_layer=4, n_embed=C, n_vocab=VOCAB,
                         head_size=HEAD)
    params_g = synth_params(cfg_g, seed=0, lora_dim=LORA)
    mega_g = ServingModel((cfg_g, params_g), precision=precision,
                          megakernel=True)
    ref_g = ServingModel((cfg_g, params_g), precision=precision)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.n_vocab, size=6).astype(np.int32)
    state_m = mega_g.init_state(1)
    state_r = ref_g.init_state(1)
    worst, argmax_ok = 0.0, True
    for t in toks:
        lm, state_m = mega_g.decode(np.array([t], np.int32), state_m)
        lr, state_r = ref_g.decode(np.array([t], np.int32), state_r)
        lm, lr = np.asarray(lm), np.asarray(lr)
        scale = max(np.abs(lr).max(), 1e-6)
        worst = max(worst, float(np.abs(lm - lr).max() / scale))
        argmax_ok = argmax_ok and (lm.argmax(-1) == lr.argmax(-1)).all()
    print(f"L=4 gate vs per-op: rel err {worst:.2e}, argmax agree "
          f"{argmax_ok}", flush=True)
    ok = worst < 1e-2 and argmax_ok
    print("NUMERICS", "PASS" if ok else "FAIL", flush=True)
    if not ok:
        return 1
    del mega_g, ref_g

    t0 = time.perf_counter()
    mega = ServingModel((cfg, params), precision=precision, megakernel=True)
    ref = ServingModel((cfg, params), precision=precision)
    print(f"build+upload {time.perf_counter()-t0:.0f}s", flush=True)

    # ---- chained timing ----
    meta = {k: mega._mega[k] for k in ("quant", "f_dim", "has_gate")}
    arrs = {k: v for k, v in mega._mega.items() if k not in meta}
    n_gen = 64
    ov = null_overhead()
    h, s = cfg.head_count, cfg.head_size

    @jax.jit
    def chain(params, pack_arrs, state, logits):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_t, logits = carry
            tok = jnp.argmax(logits)
            x0 = layer_norm(
                params["emb"][tok].astype(jnp.float32), *params["ln0"]
            )
            y, state_t = v5_decode_megakernel(
                pack, state_t, x0[:, None], cfg,
                interpret=jax.default_backend() != "tpu",
            )
            xo = layer_norm(y[:, 0], *params["ln_out"])
            logits = G.mm(xo[None, :], params["head"])[0]
            return (state_t, logits), None

        state_t = {
            "att_xx": jnp.zeros((L, C, 1), jnp.float32),
            "ffn_xx": jnp.zeros((L, C, 1), jnp.float32),
            "heads": jnp.zeros((L, h, s, s), jnp.float32),
        }
        (state_t, logits), _ = jax.lax.scan(
            body, (state_t, logits), None, length=n_gen
        )
        return jnp.sum(logits)

    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)
    t0 = time.perf_counter()
    np.asarray(chain(mega.params, arrs, None, logits0))
    print(f"mega chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(mega.params, arrs, None, logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / n_gen
    print(f"v5 mega : {per_tok*1e3:7.3f} ms/tok  {1/per_tok:7.1f} tok/s",
          flush=True)

    from rwkv_tpu.models.state import init_state

    @jax.jit
    def chain_std(params, state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            logits2, state = forward_stacked(params, state, tok, cfg, True)
            return (state, logits2), None

        (state, logits), _ = jax.lax.scan(
            body, (state, logits), None, length=n_gen
        )
        return jnp.sum(logits)

    state0 = init_state(cfg)
    t0 = time.perf_counter()
    np.asarray(chain_std(ref.params, state0, logits0))
    print(f"std chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain_std(ref.params, state0, logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok_std = max(best - ov, 1e-9) / n_gen
    print(f"v5 perop: {per_tok_std*1e3:7.3f} ms/tok  "
          f"{1/per_tok_std:7.1f} tok/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
