"""Native-TPU verification + timing of the whole-MODEL v7 decode megakernel.

Per the silent-miscompute hazard (ops/megakernel.py header): numerics are
checked ON CHIP against the per-op serving path before timing. Timing uses
the round-1 methodology: long on-device chains, 4-byte sync probes, null
round-trip subtraction (the tunnel adds ~25 ms to any host sync).

Usage:  python scripts/bench_megakernel.py [--small] [--bf16]
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
from rwkv_tpu.ops.megakernel import v7_decode_megakernel
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
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB, head_size=HEAD)
    print(f"model L={L} C={C} V={VOCAB} quant={QUANT}", flush=True)
    params = synth_params(cfg, seed=0, lora_dim=LORA)
    precision = "w8a8" if QUANT else "bf16"

    t0 = time.perf_counter()
    mega = ServingModel((cfg, params), precision=precision, megakernel=True)
    print(f"build+upload {time.perf_counter()-t0:.0f}s", flush=True)
    ref = ServingModel((cfg, params), precision=precision)

    # ---- on-chip numerics: several chained steps vs the per-op path.
    # int8 dots are exact, but an ulp-level layer-norm reduction-order
    # difference can flip an activation-quantization code (see
    # megakernel.py header) — so this is a QUALITY gate (argmax agreement
    # + bounded relative drift), not bit equality. The exact-match gate is
    # the --small config, where no boundary flip occurs.
    state_m = mega.init_state(1)
    state_r = ref.init_state(1)
    worst, argmax_ok = 0.0, True
    for tok in (3, 77, 200, 5):
        lm, state_m = mega.decode(np.array([tok], np.int32), state_m)
        lr, state_r = ref.decode(np.array([tok], np.int32), state_r)
        lm, lr = np.asarray(lm), np.asarray(lr)
        scale = max(np.abs(lr).max(), 1e-6)
        worst = max(worst, float(np.abs(lm - lr).max() / scale))
        argmax_ok = argmax_ok and int(lm.argmax()) == int(lr.argmax())
    hs = max(float(np.abs(np.asarray(state_r["heads"])).max()), 1e-6)
    dh = float(
        np.abs(np.asarray(state_m["heads"]) - np.asarray(state_r["heads"])).max()
    ) / hs
    print(f"on-chip quality: rel logit err {worst:.2e}, rel heads err "
          f"{dh:.2e}, argmax agree {argmax_ok}", flush=True)
    ok = worst < 2e-1 and dh < 2e-1 and argmax_ok
    print("NUMERICS", "PASS" if ok else "FAIL", flush=True)
    if not ok:
        return 1

    # ---- chained decode timing (device-resident loop) ----
    meta = {k: mega._mega[k] for k in ("quant", "d_lora", "f_dim")}
    arrs = {k: v for k, v in mega._mega.items() if k not in meta}
    n_gen = 64

    @jax.jit
    def chain(params, pack_arrs, state, logits):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_t, logits = carry
            tok = jnp.argmax(logits).astype(jnp.int32)
            x0 = layer_norm(params["emb"][tok].astype(jnp.float32), *params["ln0"])
            y, state_t = v7_decode_megakernel(pack, state_t, x0[:, None], cfg)
            xo = layer_norm(y[:, 0], *params["ln_out"])
            logits = G.mm(xo[None, :], params["head"])[0]
            return (state_t, logits), None

        state_t = {
            "att_xx": state["att_xx"][0][..., None],
            "ffn_xx": state["ffn_xx"][0][..., None],
            "heads": jnp.swapaxes(state["heads"][0], -1, -2),
        }
        (state_t, logits), _ = jax.lax.scan(
            body, (state_t, logits), None, length=n_gen
        )
        return jnp.sum(logits)

    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)
    state0 = mega.init_state(1)
    t0 = time.perf_counter()
    np.asarray(chain(mega.params, arrs, state0, logits0))
    print(f"chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    ov = null_overhead()
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(mega.params, arrs, state0, logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / n_gen
    print(f"megakernel decode: {per_tok*1e3:7.3f} ms/tok  "
          f"{1/per_tok:7.1f} tok/s", flush=True)

    # ---- reference per-op path timing (same chain shape) ----
    from rwkv_tpu.models.serve import forward_stacked

    @jax.jit
    def chain_std(params, state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            state_lb = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)
            logits2, new_lb = forward_stacked(params, state_lb, tok[None], cfg, True)
            state = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), new_lb)
            return (state, logits2[0]), None

        (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=n_gen)
        return jnp.sum(logits)

    t0 = time.perf_counter()
    np.asarray(chain_std(ref.params, state0, logits0))
    print(f"std chain compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain_std(ref.params, state0, logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok_std = max(best - ov, 1e-9) / n_gen
    print(f"per-op {precision} decode: {per_tok_std*1e3:7.3f} ms/tok  "
          f"{1/per_tok_std:7.1f} tok/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
