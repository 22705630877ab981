"""Big-model prefill throughput + MFU (VERDICT r3 item 7: the number
didn't exist). Single sequence, chunked matmul-form wkv7 (ops/chunked.py)
through forward_stacked — the ServingModel.prefill compute path — at
1.5B and 7B dims with on-device bf16 param synthesis (the tunnel moves
~36 MB/s; params must never transit the host).

MFU counts the weight matmuls (2*K*N MACs/token: rkv, out, 4 LoRA pairs,
fk, fv) plus the [P, P] intra-chunk attention term, against the v5e bf16
peak (197 TFLOP/s).

Usage: timeout 3600 python scripts/bench_prefill_big.py [--7b] [--t N]
       [--w8a8] [--chunk P]
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

from rwkv_tpu.models.serve import forward_stacked
from rwkv_tpu.models.synth import synth_config

if "--7b" in sys.argv:
    L, C, LORA = 32, 4096, 128
    SIZE = "7B"
else:
    L, C, LORA = 24, 2048, 96
    SIZE = "1.5B"
VOCAB, HEAD = 65536, 64
T = int(sys.argv[sys.argv.index("--t") + 1]) if "--t" in sys.argv else 2048
CHUNK = (int(sys.argv[sys.argv.index("--chunk") + 1])
         if "--chunk" in sys.argv else 16)
PRECISION = "w8a8" if "--w8a8" in sys.argv else "bf16"

PEAK = 197e12  # v5e bf16 (int8 ~394, but the prefill path is bf16 MXU)


def synth_stacked_device(cfg, seed=0, big_mats=True):
    """Stacked serving params (v7) on device, bf16 mats / f32 vectors.
    big_mats=False skips the six big projections (the w8a8 mode fills
    them with direct int8 synth — a 7B bf16 pytree alone is ~14GB)."""
    key = jax.random.PRNGKey(seed)

    def nk():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    def w(shape):
        scale = 1.0 / np.sqrt(shape[-1])
        return (jax.random.normal(nk(), (cfg.n_layer,) + shape, jnp.float32)
                * scale).astype(jnp.bfloat16)

    def v(*shape, scale=0.1, offset=0.0):
        return (jax.random.normal(nk(), (cfg.n_layer,) + shape, jnp.float32)
                * scale + offset)

    blocks = {
        "ln1.weight": v(C, offset=1.0, scale=0.02),
        "ln1.bias": v(C, scale=0.02),
        "ln2.weight": v(C, offset=1.0, scale=0.02),
        "ln2.bias": v(C, scale=0.02),
        "att.x_rwkvag": v(6, C, scale=0.2, offset=0.5),
        "att.w0": v(C, scale=0.3),
        "att.w1": w((LORA, C)),
        "att.w2": w((C, LORA)),
        "att.a0": v(C, scale=0.3),
        "att.a1": w((LORA, C)),
        "att.a2": w((C, LORA)),
        "att.g1": w((LORA, C)),
        "att.g2": w((C, LORA)),
        "att.v0": v(C, scale=0.3),
        "att.v1": w((LORA, C)),
        "att.v2": w((C, LORA)),
        "att.k_k": v(C, scale=0.3, offset=0.5),
        "att.k_a": v(C, scale=0.3, offset=0.5),
        "att.r_k": v(cfg.head_count, cfg.head_size, scale=0.3),
        "att.ln_x.weight": v(C, offset=1.0, scale=0.02),
        "att.ln_x.bias": v(C, scale=0.02),
        "ffn.x_k": v(C, scale=0.2, offset=0.5),
    }

    if big_mats:
        blocks.update({
            "att.key.weight": w((C, C)),
            "att.value.weight": w((C, C)),
            "att.receptance.weight": w((C, C)),
            "att.output.weight": w((C, C)),
            "ffn.key.weight": w((4 * C, C)),
            "ffn.value.weight": w((C, 4 * C)),
        })

    def v1(*shape, scale=0.1, offset=0.0):
        return (jax.random.normal(nk(), shape, jnp.float32) * scale + offset)

    return {
        "emb": (jax.random.normal(nk(), (VOCAB, C), jnp.float32)
                * 0.02).astype(jnp.bfloat16),
        "ln0": (v1(C, offset=1.0, scale=0.02), v1(C, scale=0.02)),
        "ln_out": (v1(C, offset=1.0, scale=0.02), v1(C, scale=0.02)),
        "head": (jax.random.normal(nk(), (VOCAB, C), jnp.float32)
                 * (1.0 / np.sqrt(C))).astype(jnp.bfloat16),
        "blocks": blocks,
    }


def init_state_stacked(cfg):
    h, s = cfg.head_count, cfg.head_size
    return {
        "att_xx": jnp.zeros((cfg.n_layer, C), jnp.float32),
        "ffn_xx": jnp.zeros((cfg.n_layer, C), jnp.float32),
        "heads": jnp.zeros((cfg.n_layer, h, s, s), jnp.float32),
    }


def main():
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    print(f"{SIZE} v7 prefill T={T} chunk={CHUNK} {PRECISION} "
          f"on {jax.devices()[0]}", flush=True)

    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    _ = np.asarray(probe(x))
    ov = 1e9
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(x))
        ov = min(ov, time.perf_counter() - t0)
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    params = synth_stacked_device(cfg, big_mats=PRECISION != "w8a8")
    if PRECISION == "w8a8":
        # big mats as DIRECT int8 synth (a 7B bf16 pytree is ~14GB and
        # OOMs the 16GB chip before any quantization could run)
        from rwkv_tpu.ops.kernels import PackedQuantWeight

        key = jax.random.PRNGKey(7)

        def wq(out, kin):
            nonlocal key
            qs = []
            for _ in range(L):
                key, k1 = jax.random.split(key)
                qs.append(jax.random.randint(
                    k1, (kin, out), -127, 128, jnp.int8))
            q = jnp.stack(qs)
            d = jnp.full((L, 1, out), 1.0 / (127.0 * np.sqrt(kin)),
                         jnp.float32)
            return PackedQuantWeight(q=q, d=d, pack4=False, signed4=True,
                                     rowwise=True, int8_act=True)

        shapes = {
            "att.key.weight": (C, C), "att.value.weight": (C, C),
            "att.receptance.weight": (C, C), "att.output.weight": (C, C),
            "ffn.key.weight": (4 * C, C), "ffn.value.weight": (C, 4 * C),
        }
        for k, (out, kin) in shapes.items():
            params["blocks"][k] = wq(out, kin)
    jax.block_until_ready(params["blocks"]["ln1.weight"])
    print(f"params on device in {time.perf_counter() - t0:.1f}s",
          flush=True)

    from rwkv_tpu.ops import chunked as ch

    orig_auto = ch.wkv7_auto

    if "--nowkv" in sys.argv:
        # timing ablation (WRONG math): wkv replaced by a zero-flop
        # passthrough — isolates the recurrence's share of prefill time
        def auto_override(s, r, w, k, v, a, b, chunk_size=16):
            return v, s
    elif "--preponly" in sys.argv:
        # timing ablation (WRONG math): the chunk kernel's XLA-side
        # operand prep (cumsum + de-decay exps + transposes) runs and
        # is forced live, but the kernel itself is skipped — splits the
        # wkv block into prep vs kernel in the REAL layer graph
        def auto_override(s, r, w, k, v, a, b, chunk_size=16):
            t_len = r.shape[0]
            p_ = 32 if (t_len >= 1024 and t_len % 32 == 0) else CHUNK
            nc = t_len // p_
            h_, s_d = r.shape[-2], r.shape[-1]
            lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
            lw_c = lw.reshape(nc, p_, h_, s_d)
            lcum = jnp.cumsum(lw_c, axis=1)
            lcum_ex = lcum - lw_c

            def pre(x, sc):
                return jnp.swapaxes(
                    x.reshape(nc, p_, h_, s_d) * sc, 1, 2)

            acc = (pre(a, jnp.exp(lcum_ex)) + pre(b, jnp.exp(-lcum))
                   + pre(k, jnp.exp(-lcum)) + pre(r, jnp.exp(lcum))
                   + pre(v, 1.0))
            out = jnp.swapaxes(acc, 1, 2).reshape(t_len, h_, s_d)
            return out, s
    else:
        def auto_override(s, r, w, k, v, a, b, chunk_size=16):
            return orig_auto(s, r, w, k, v, a, b, chunk_size=CHUNK)

    ch.wkv7_auto = auto_override

    @jax.jit
    def prefill(params, state, tokens):
        logits, st = forward_stacked(params, state, tokens, cfg, True)
        return jnp.argmax(logits), st

    state = init_state_stacked(cfg)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, VOCAB, T),
                         jnp.int32)
    t0 = time.perf_counter()
    out, st = prefill(params, state, tokens)
    jax.block_until_ready((out, st))
    print(f"compiled+first run in {time.perf_counter() - t0:.1f}s",
          flush=True)

    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out, st = prefill(params, state, tokens)
        jax.block_until_ready((out, st))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - ov, 1e-9)

    # weight-matmul MACs per token + intra-chunk attention
    per_tok = L * (4 * C * C + 8 * C * LORA + 8 * C * C)
    h = cfg.head_count
    # [P,P] intra-chunk attention + state read/write/einsum terms
    att = L * h * (T * CHUNK * HEAD + 4 * T * HEAD * HEAD)
    flops = 2 * (per_tok * T + att)
    tps = T / dt
    mfu = flops / dt / PEAK
    print(
        f"{SIZE} {PRECISION} prefill T={T} chunk={CHUNK}: "
        f"{dt * 1e3:8.2f} ms  {tps:9.0f} tok/s  MFU {mfu * 100:5.1f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
