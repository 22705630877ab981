"""v6 (Finch) prefill throughput + MFU at 1.5B dims — exercises the
natural-layout wkv6 chunk kernel at scale (the v7 analogue measured the
operand relayout as the dominant wkv cost). Params synthesized on
device as the STACKED serving pytree (w8a8 big mats).

Usage: timeout 2400 python scripts/bench_prefill_v6.py [--t N] [--chunk P]
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

L, C, MAA, DEC = 24, 2048, 32, 96
VOCAB, HEAD = 65536, 64
T = int(sys.argv[sys.argv.index("--t") + 1]) if "--t" in sys.argv else 2048
CHUNK = (int(sys.argv[sys.argv.index("--chunk") + 1])
         if "--chunk" in sys.argv else 16)
PEAK = 197e12


def synth_stacked_v6(seed=0):
    from rwkv_tpu.ops.kernels import PackedQuantWeight

    key = jax.random.PRNGKey(seed)

    def nk():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    def v(*shape, scale=0.1, offset=0.0):
        return (jax.random.normal(nk(), (L,) + shape, jnp.float32)
                * scale + offset)

    def wq(out, kin):
        q = jax.random.randint(nk(), (L, kin, out), -127, 128, jnp.int8)
        d = jnp.full((L, 1, out), 1.0 / (127.0 * np.sqrt(kin)), jnp.float32)
        return PackedQuantWeight(q=q, d=d, pack4=False, signed4=True,
                                 rowwise=True, int8_act=True)

    def wbf(out, kin):
        return (jax.random.normal(nk(), (L, out, kin), jnp.float32)
                * (1.0 / np.sqrt(kin))).astype(jnp.bfloat16)

    blocks = {
        "ln1.weight": v(C, offset=1.0, scale=0.02),
        "ln1.bias": v(C, scale=0.02),
        "ln2.weight": v(C, offset=1.0, scale=0.02),
        "ln2.bias": v(C, scale=0.02),
        "att.time_maa_x": v(C, scale=0.2, offset=0.5),
        "att.time_maa_w": v(C, scale=0.2, offset=0.5),
        "att.time_maa_k": v(C, scale=0.2, offset=0.5),
        "att.time_maa_v": v(C, scale=0.2, offset=0.5),
        "att.time_maa_r": v(C, scale=0.2, offset=0.5),
        "att.time_maa_g": v(C, scale=0.2, offset=0.5),
        "att.time_maa_w1": wbf(5 * MAA, C),
        "att.time_maa_w2": v(5, C, MAA, scale=1.0 / np.sqrt(MAA)),
        "att.time_decay": v(C // HEAD, HEAD, scale=0.5),
        "att.time_decay_w1": wbf(DEC, C),
        "att.time_decay_w2": wbf(C, DEC),
        "att.time_faaaa": v(C // HEAD, HEAD, scale=0.3),
        "att.ln_x.weight": v(C, offset=1.0, scale=0.02),
        "att.ln_x.bias": v(C, scale=0.02),
        "ffn.time_maa_k": v(C, scale=0.2, offset=0.5),
        "ffn.time_maa_r": v(C, scale=0.2, offset=0.5),
        "att.key.weight": wq(C, C),
        "att.value.weight": wq(C, C),
        "att.receptance.weight": wq(C, C),
        "att.gate.weight": wq(C, C),
        "att.output.weight": wq(C, C),
        "ffn.key.weight": wq(4 * C, C),
        "ffn.value.weight": wq(C, 4 * C),
        "ffn.receptance.weight": wq(C, C),
    }

    def v1(*shape, scale=0.1, offset=0.0):
        return jax.random.normal(nk(), shape, jnp.float32) * scale + offset

    return {
        "emb": (jax.random.normal(nk(), (VOCAB, C), jnp.float32)
                * 0.02).astype(jnp.bfloat16),
        "ln0": (v1(C, offset=1.0, scale=0.02), v1(C, scale=0.02)),
        "ln_out": (v1(C, offset=1.0, scale=0.02), v1(C, scale=0.02)),
        "head": (jax.random.normal(nk(), (VOCAB, C), jnp.float32)
                 * (1.0 / np.sqrt(C))).astype(jnp.bfloat16),
        "blocks": blocks,
    }


def main():
    cfg = synth_config("6.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    print(f"1.5B v6 prefill T={T} chunk={CHUNK} w8a8 on {jax.devices()[0]}",
          flush=True)

    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    np.asarray(probe(x))
    ov = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        ov = min(ov, time.perf_counter() - t0)
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    params = synth_stacked_v6()
    jax.block_until_ready(params["blocks"]["ln1.weight"])
    print(f"params on device in {time.perf_counter() - t0:.1f}s", flush=True)

    from rwkv_tpu.ops import chunked as ch

    orig = ch.wkv6_auto

    def auto_override(s, r, k, v, w, tf, chunk_size=16):
        return orig(s, r, k, v, w, tf, chunk_size=CHUNK)

    ch.wkv6_auto = auto_override

    @jax.jit
    def prefill(params, state, tokens):
        logits, st = forward_stacked(params, state, tokens, cfg, True)
        return jnp.argmax(logits), st

    h = C // HEAD
    state = {
        "att_xx": jnp.zeros((L, C), jnp.float32),
        "ffn_xx": jnp.zeros((L, C), jnp.float32),
        "heads": jnp.zeros((L, h, HEAD, HEAD), jnp.float32),
    }
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, VOCAB, T), jnp.int32)
    t0 = time.perf_counter()
    out, st = prefill(params, state, tokens)
    jax.block_until_ready((out, st))
    print(f"compiled+first run in {time.perf_counter() - t0:.1f}s", flush=True)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out, st = prefill(params, state, tokens)
        jax.block_until_ready((out, st))
        best = min(best, time.perf_counter() - t0)
    dt = max(best - ov, 1e-9)
    # weight matmuls: r/k/v/g/out (5C^2) + fk/fv (8C^2) + fr (C^2) + loras
    per_tok = L * (14 * C * C + 2 * C * (5 * MAA) + 2 * C * DEC)
    flops = 2 * per_tok * T
    print(f"1.5B v6 w8a8 prefill T={T} chunk={CHUNK}: {dt * 1e3:8.2f} ms  "
          f"{T / dt:9.0f} tok/s  MFU {flops / dt / PEAK * 100:5.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
