"""Native-TPU verification + timing of the BATCHED whole-model megakernel.

Gates (per the silent-miscompute methodology, ops/megakernel.py header):
  1. lane-dup EXACTNESS: lanes carrying identical streams inside one
     batched call must stay BIT-identical natively (catches layout/lane
     miscomputes precisely, immune to activation-flip noise);
  2. quality vs the per-op path: argmax agreement + bounded drift.
Then: chained decode timing at several B, batched megakernel vs per-op.

Usage:  python scripts/bench_mega_batched.py [--small] [--bf16]
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
from rwkv_tpu.ops.megakernel import v7_decode_megakernel_tiled
from rwkv_tpu.ops.parity import layer_norm
from rwkv_tpu.models import graph as G

SMALL = "--small" in sys.argv
QUANT = "--bf16" not in sys.argv
if SMALL:
    L, C, VOCAB, HEAD, LORA = 4, 512, 4096, 64, 64
else:
    L, C, VOCAB, HEAD, LORA = 12, 768, 65536, 64, 64  # 169M-class

BATCHES = (8, 32, 64, 128, 256)


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
    precision = "w8a8" if QUANT else "bf16"
    print(f"model L={L} C={C} V={VOCAB} precision={precision}", flush=True)
    params = synth_params(cfg, seed=0, lora_dim=LORA)

    t0 = time.perf_counter()
    mega = ServingModel((cfg, params), precision=precision, megakernel=True)
    mega.mega_min_batch = 2  # force the batched kernel at tiny B
    ref = ServingModel((cfg, params), precision=precision)
    print(f"build+upload {time.perf_counter()-t0:.0f}s", flush=True)

    # ---- gate 1: native lane-dup exactness (B=4, lanes s1,s2,s1,s2) ----
    rng = np.random.default_rng(0)
    two = rng.integers(0, cfg.n_vocab, size=(2, 4)).astype(np.int32)
    streams = two[[0, 1, 0, 1]]
    state_b = mega.init_state(4)
    for step in range(streams.shape[1]):
        logits_b, state_b = mega.decode(streams[:, step], state_b)
    lb = np.asarray(logits_b)
    hb = np.asarray(state_b["heads"])
    dup_ok = (
        np.array_equal(lb[0], lb[2]) and np.array_equal(lb[1], lb[3])
        and np.array_equal(hb[0], hb[2]) and np.array_equal(hb[1], hb[3])
        and np.abs(lb[0] - lb[1]).max() > 0
    )
    print(f"lane-dup exactness: {'PASS' if dup_ok else 'FAIL'}", flush=True)

    # ---- gate 2: quality vs per-op path (argmax + drift) ----
    B = 4
    state_m = mega.init_state(B)
    state_r = ref.init_state(B)
    toks = rng.integers(0, cfg.n_vocab, size=(B, 4)).astype(np.int32)
    worst, argmax_ok = 0.0, True
    for step in range(toks.shape[1]):
        lm, state_m = mega.decode(toks[:, step], state_m)
        lr, state_r = ref.decode(toks[:, step], state_r)
        lm, lr = np.asarray(lm), np.asarray(lr)
        scale = max(np.abs(lr).max(), 1e-6)
        worst = max(worst, float(np.abs(lm - lr).max() / scale))
        argmax_ok = argmax_ok and (lm.argmax(-1) == lr.argmax(-1)).all()
    print(f"vs per-op: rel err {worst:.2e}, argmax agree {argmax_ok}",
          flush=True)
    ok = dup_ok and worst < 2e-1 and argmax_ok
    print("NUMERICS", "PASS" if ok else "FAIL", flush=True)
    if not ok:
        return 1

    # ---- chained timing (TILED batched kernel — the whole-layer batched
    # variant OOMs scoped VMEM natively at B>=8: the [H,S,S,B] state blocks
    # pad lanes to 128, x4 double-buffered output windows) ----
    n_gen = 64
    ov = null_overhead()
    L_, H_, S_ = cfg.n_layer, cfg.head_count, cfg.head_size

    for B in BATCHES:
        pack_full, nh, nf = mega._mega_tiled_pack(B)
        meta = {k: pack_full[k]
                for k in ("quant", "d_lora", "f_dim", "nh", "nf", "nr", "no")}
        arrs = {k: v for k, v in pack_full.items() if k not in meta}

        @jax.jit
        def chain(params, pack_arrs, state, logits):
            pack = {**pack_arrs, **meta}

            def body(carry, _):
                state4, logits = carry
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
                x0 = layer_norm(
                    params["emb"][tok].astype(jnp.float32), *params["ln0"]
                )                                                    # [B, C]
                y, state4 = v7_decode_megakernel_tiled(
                    pack, state4, x0.T, cfg,
                    interpret=jax.default_backend() != "tpu",
                )
                xo = layer_norm(y.T, *params["ln_out"])
                logits = G.mm(xo, params["head"])
                return (state4, logits), None

            heads = jnp.transpose(state["heads"], (1, 2, 3, 4, 0))
            state4 = {
                "att_xx": jnp.transpose(state["att_xx"], (1, 2, 0)),
                "ffn_xx": jnp.transpose(state["ffn_xx"], (1, 2, 0)),
                "heads": heads.reshape(L_, nh, H_ // nh, S_, S_, B),
            }
            (state4, logits), _ = jax.lax.scan(
                body, (state4, logits), None, length=n_gen
            )
            return jnp.sum(logits)

        logits0 = jnp.zeros((B, cfg.n_vocab), jnp.float32)
        state0 = mega.init_state(B)
        t0 = time.perf_counter()
        np.asarray(chain(mega.params, arrs, state0, logits0))
        print(f"B={B} chain compile {time.perf_counter()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain(mega.params, arrs, state0, logits0))
            best = min(best, time.perf_counter() - t0)
        per_step = max(best - ov, 1e-9) / n_gen
        print(f"mega  B={B:3d}: {per_step*1e3:7.3f} ms/step  "
              f"{B/per_step:9.0f} tok/s", flush=True)

        @jax.jit
        def chain_std(params, state, logits):
            def body(carry, _):
                state, logits = carry
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
                state_lb = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), state)
                logits2, new_lb = forward_stacked(
                    params, state_lb, tok[None, :], cfg, True
                )
                state = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), new_lb)
                return (state, logits2), None

            (state, logits), _ = jax.lax.scan(
                body, (state, logits), None, length=n_gen
            )
            return jnp.sum(logits)

        t0 = time.perf_counter()
        np.asarray(chain_std(ref.params, state0, logits0))
        print(f"B={B} std compile {time.perf_counter()-t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain_std(ref.params, state0, logits0))
            best = min(best, time.perf_counter() - t0)
        per_step_std = max(best - ov, 1e-9) / n_gen
        print(f"perop B={B:3d}: {per_step_std*1e3:7.3f} ms/step  "
              f"{B/per_step_std:9.0f} tok/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
