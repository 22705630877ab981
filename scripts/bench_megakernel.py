"""Native-TPU trial of the whole-layer v7 decode mega-kernel at 1.5B dims:
correctness vs the standard serving path + chained decode timing."""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rwkv_tpu.models.serve import forward_stacked
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import v7_layer_decode
from rwkv_tpu.ops.parity import layer_norm, mm

SMALL = "--small" in sys.argv
if SMALL:
    L, C, VOCAB, HEAD, LORA = 4, 512, 4096, 64, 64
else:
    L, C, VOCAB, HEAD, LORA = 24, 2048, 65536, 64, 96


def main():
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB, head_size=HEAD)
    if SMALL:
        from rwkv_tpu.models.serve import ServingModel

        srv = ServingModel((cfg, synth_params(cfg, seed=0, lora_dim=LORA)),
                           precision="bf16")
        stacked = srv.params
    else:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_15b import synth_device

        # device-side synth (3 GB transfer would take minutes via tunnel)
        import bench_15b as B15
        B15.L, B15.C, B15.VOCAB, B15.HEAD, B15.LORA = L, C, VOCAB, HEAD, LORA
        params = synth_device(cfg, "bf16")
        # fuse the stacked weights like stack_layer_params does
        blocks = params["blocks"]
        blocks["att.rkv.weight"] = jnp.stack(
            [blocks.pop(k) for k in
             ("att.receptance.weight", "att.key.weight", "att.value.weight")],
            axis=1,
        )
        blocks["att.lora1"] = jnp.stack(
            [blocks.pop(k) for k in ("att.w1", "att.a1", "att.g1", "att.v1")], axis=1
        )
        blocks["att.lora2"] = jnp.stack(
            [blocks.pop(k) for k in ("att.w2", "att.a2", "att.g2", "att.v2")], axis=1
        )
        stacked = params

    h, s = cfg.head_count, cfg.head_size
    B = 1

    # ---- correctness: one decode step, mega vs standard ----
    tok = jnp.zeros((1,), jnp.int32)
    state = init_state(cfg)

    @jax.jit
    def std_step(params, state, tok):
        return forward_stacked(params, state, tok, cfg, True)

    logits_std, st_std = std_step(stacked, state, tok)

    def mega_forward(params, state, tok):
        emb = params["emb"][tok]
        x = layer_norm(emb.astype(jnp.float32), *params["ln0"])  # [1, C]
        v_first = jnp.zeros_like(x)
        att_xx, ffn_xx, heads_all = state["att_xx"], state["ffn_xx"], state["heads"]
        new_xx, new_fxx, new_heads = [], [], []
        for i in range(cfg.n_layer):
            layer = {k: v[i] for k, v in params["blocks"].items()}
            x, xx_i, fxx_i, heads_i, v_first = v7_layer_decode(
                x, att_xx[i][None], ffn_xx[i][None], heads_all[i][None],
                v_first, i == 0, layer, cfg,
            )
            new_xx.append(xx_i[0]); new_fxx.append(fxx_i[0]); new_heads.append(heads_i[0])
        xo = layer_norm(x[0], *params["ln_out"])
        logits = mm(xo[None, :], params["head"])[0]
        return logits, {
            "att_xx": jnp.stack(new_xx), "ffn_xx": jnp.stack(new_fxx),
            "heads": jnp.stack(new_heads),
        }

    mega_jit = jax.jit(mega_forward)
    t0 = time.perf_counter()
    logits_mega, st_mega = mega_jit(stacked, state, tok)
    d = np.abs(np.asarray(logits_mega) - np.asarray(logits_std)).max()
    print(f"mega vs std logits max|d|: {d} (compile {time.perf_counter()-t0:.0f}s)", flush=True)
    dh = np.abs(np.asarray(st_mega["heads"]) - np.asarray(st_std["heads"])).max()
    print(f"mega vs std heads  max|d|: {dh}", flush=True)

    # ---- chained decode timing ----
    @jax.jit
    def probe(x):
        return x * 1.000001

    xp = jnp.ones((8,), jnp.float32)
    _ = np.asarray(probe(xp))
    ov = 1e9
    for _i in range(5):
        t0 = time.perf_counter(); _ = np.asarray(probe(xp))
        ov = min(ov, time.perf_counter() - t0)

    n_gen = 64

    @jax.jit
    def chain(params, state, logits):
        def body(carry, _):
            state, logits = carry
            tok = jnp.argmax(logits)[None].astype(jnp.int32)
            logits, state = mega_forward(params, state, tok)
            return (state, logits), None

        (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=n_gen)
        return jnp.sum(logits)

    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)
    _ = np.asarray(chain(stacked, state, logits0))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(stacked, state, logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / n_gen
    print(f"megakernel decode: {per_tok*1e3:7.3f} ms/tok  {1/per_tok:7.1f} tok/s", flush=True)


if __name__ == "__main__":
    main()
