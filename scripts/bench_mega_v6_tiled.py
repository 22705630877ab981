"""Native-TPU verification + timing of the v6 PHASE-TILED megakernel.

Gates first, at a small width with FORCED tiling so every branch (fused
m=1 and row-tiled m>1) executes natively without streaming GB of weights
through the tunnel:
  1. bf16 native vs interpret — tight rel bound (no quantization noise).
  2. w8a8 native vs interpret — bounded drift + argmax (rint ties at
     activation-quantization boundaries can flip a code — exact equality
     does not hold across compile modes).

Then timing: 1.5B-class v6 (L=24 C=2048, fused) or --7b (L=32 C=4096,
row-tiled) with the retiled w8a8 pack synthesized ON DEVICE.

Usage:  timeout 3000 python scripts/bench_mega_v6_tiled.py [--7b|--14b]
        [--w4] [--skip-gate]
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

from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import (
    _V6_TILED_ROW_VECS,
    build_mega_pack_v6,
    choose_tiling,
    retile_mega_pack_v6,
    v6_decode_megakernel_tiled,
)

N_GEN = 64


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


def run_pack(pack, cfg, state, x0, interpret):
    meta_keys = ("quant", "w4", "d_maa", "d_dec", "f_dim",
                 "nh", "nf", "ng", "no")
    meta = {k: pack[k] for k in meta_keys if k in pack}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    @jax.jit
    def step(arrs, state, x0):
        return v6_decode_megakernel_tiled(
            {**arrs, **meta}, state, x0, cfg, interpret=interpret
        )

    return step(arrs, state, x0)


def gate():
    cfg = synth_config("6.0", n_layer=4, n_embed=512, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=3)
    h, s = cfg.head_count, cfg.head_size
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(cfg.n_embed, 1)) * 0.3, jnp.float32)

    for quant, w4 in ((False, False), (True, False), (True, True)):
        base = build_mega_pack_v6(params, cfg, quant=quant, w4=w4)
        for label, (nh, nf, ng, no) in (
            ("fused", (2, 2, 4, 1)),
            ("row-tiled", (2, 2, 8, 2)),
        ):
            pack = retile_mega_pack_v6(base, cfg, nh, nf, ng, no)
            state = {
                "att_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1),
                                    jnp.float32),
                "ffn_xx": jnp.zeros((cfg.n_layer, cfg.n_embed, 1),
                                    jnp.float32),
                "heads": jnp.asarray(
                    rng.normal(size=(cfg.n_layer, nh, h // nh, s, s)) * 0.05,
                    jnp.float32,
                ),
            }
            y_n, st_n = run_pack(pack, cfg, state, x0, interpret=False)
            y_i, st_i = run_pack(pack, cfg, state, x0, interpret=True)
            y_n, y_i = np.asarray(y_n), np.asarray(y_i)
            rel = np.abs(y_n - y_i).max() / max(np.abs(y_i).max(), 1e-6)
            hrel = (
                np.abs(np.asarray(st_n["heads"]) - np.asarray(st_i["heads"]))
                .max() / max(np.abs(np.asarray(st_i["heads"])).max(), 1e-6)
            )
            mode = ("w4a8" if w4 else "w8a8") if quant else "bf16"
            tol = 2e-2 if quant else 5e-3
            ok = rel < tol and hrel < tol
            print(f"gate {mode:5s} {label:9s}: y rel {rel:.2e} "
                  f"heads rel {hrel:.2e}  {'OK' if ok else 'FAIL'}",
                  flush=True)
            assert ok, (mode, label, rel, hrel)


def synth_pack_device(cfg, d_maa, d_dec, nh, nf, ng, no, seed=0):
    """Synthesize the retiled w8a8 v6 mega pack directly on device."""
    L, c = cfg.n_layer, cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    f = 4 * c
    m = ng // 4
    c_g, c_o, f4 = c // m, c // no, f // nf
    key = jax.random.PRNGKey(seed)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def _build_mat(k, shape):
        # jitted fori_loop fill: one planned result buffer (in-place
        # carry) + one slice temp — the eager per-slice .at[].set
        # churned fresh buffers and OOMed the 14B-scale synthesis.
        def body(i, q):
            return q.at[i].set(jax.random.randint(
                jax.random.fold_in(k, i), shape[1:], -127, 128, jnp.int8))

        return jax.lax.fori_loop(
            0, shape[0], body, jnp.zeros(shape, jnp.int8))

    def qmat(shape):
        return _build_mat(nxt(), shape)

    def scale(shape):
        return jnp.full(shape, 0.01, jnp.float32)

    w4 = "--w4" in sys.argv
    kk = c // 2 if w4 else c      # split-half packed nibbles along K
    pack = {"quant": True, "w4": w4, "d_maa": d_maa, "d_dec": d_dec,
            "f_dim": f, "nh": nh, "nf": nf, "ng": ng, "no": no}
    pack["rkvg"] = qmat((L, ng, c_g, kk))
    pack["rkvg_d"] = scale((L, ng, 1, c_g))
    pack["maa1"] = qmat((L, 5 * d_maa, c))
    pack["maa1_d"] = scale((L, 1, 5 * d_maa))
    pack["dw1"] = qmat((L, d_dec, c))
    pack["dw1_d"] = scale((L, 1, d_dec))
    pack["dw2"] = qmat((L, c, d_dec))
    pack["dw2_d"] = scale((L, 1, c))
    pack["out"] = qmat((L, no, c_o, kk))
    pack["out_d"] = scale((L, no, 1, c_o))
    pack["fr"] = qmat((L, no, c_o, kk))
    pack["fr_d"] = scale((L, no, 1, c_o))
    pack["fk"] = qmat((L, nf, f4, kk))
    pack["fk_d"] = scale((L, nf, 1, f4))
    pack["fv"] = qmat((L, nf, c, f4 // 2 if w4 else f4))
    pack["fv_d"] = scale((L, 1, c))
    # TRANSPOSED [L, d, 5C] — retile_mega_pack_v6's layout (no 64->128
    # lane padding on the window)
    pack["maa2"] = (
        jax.random.normal(nxt(), (L, d_maa, 5 * c), jnp.float32) * 0.01
    )
    for name in _V6_TILED_ROW_VECS:
        off = 1.0 if name.endswith("weight") else 0.0
        pack[name] = (
            jax.random.normal(nxt(), (L, 1, c), jnp.float32) * 0.02 + off
        )
    pack["att.ln_x.weight"] = jnp.ones((L, c, 1), jnp.float32)
    pack["att.ln_x.bias"] = jnp.zeros((L, c, 1), jnp.float32)
    pack["maa5"] = (
        jax.random.normal(nxt(), (L, 1, 5 * c), jnp.float32) * 0.1 + 0.5
    )
    pack["tdecay"] = (
        jax.random.normal(nxt(), (L, 1, c), jnp.float32) * 0.3 - 4.0
    )
    pack["tf"] = (
        jax.random.normal(nxt(), (L, h, s, 1), jnp.float32) * 0.1
    )
    return pack


def timing():
    if "--14b" in sys.argv:
        # Finch 14B class (RWKV-6 World 14B: L=61 C=4096); w4a8 is the
        # only single-chip format at this size
        L, C, VOCAB, HEAD, size = 61, 4096, 65536, 64, "14B"
    elif "--7b" in sys.argv:
        L, C, VOCAB, HEAD, size = 32, 4096, 65536, 64, "7B"
    else:
        L, C, VOCAB, HEAD, size = 24, 2048, 65536, 64, "1.5B"
    D_MAA, D_DEC = 64, 128
    cfg = synth_config("6.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    h, s = cfg.head_count, cfg.head_size
    nh, nf, ng, no = choose_tiling(cfg, True, 1, f_dim=4 * C, n_proj=4)
    print(f"{size} tiling: nh={nh} nf={nf} ng={ng} no={no}", flush=True)
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    pack = synth_pack_device(cfg, D_MAA, D_DEC, nh, nf, ng, no)
    emb = (jax.random.normal(jax.random.PRNGKey(9), (VOCAB, C), jnp.float32)
           * 0.02).astype(jnp.bfloat16)
    hq = jax.random.randint(jax.random.PRNGKey(10), (VOCAB, C), -127, 128,
                            jnp.int8)
    hd = jnp.full((VOCAB, 1), 0.01, jnp.float32)
    nbytes = sum(
        int(np.prod(v.shape)) * v.dtype.itemsize
        for k, v in pack.items()
        if hasattr(v, "shape")
    ) + hq.size
    print(f"weights streamed/step incl. head: {nbytes / 1e9:.2f} GB",
          flush=True)

    meta_keys = ("quant", "w4", "d_maa", "d_dec", "f_dim",
                 "nh", "nf", "ng", "no")
    meta = {k: pack[k] for k in meta_keys if k in pack}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    def ln(v, w, b):
        mu = jnp.mean(v)
        vc = v - mu
        return vc * jax.lax.rsqrt(jnp.mean(vc * vc) + 1e-5) * w + b

    def head_mm(xo, hq, hd):
        amax = jnp.max(jnp.abs(xo), axis=-1, keepdims=True)
        dx = amax / 127.0
        inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(xo * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, hq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * dx * hd[:, 0][None, :]

    @jax.jit
    def chain(arrs, consts, state, tokens):
        emb, hq, hd = consts
        pk = {**arrs, **meta}

        def body(carry, _):
            state, tokens = carry
            x0 = ln(emb[tokens[0]].astype(jnp.float32),
                    jnp.float32(1.0), jnp.float32(0.0))[:, None]
            y, state = v6_decode_megakernel_tiled(
                pk, state, x0, cfg,
                interpret=jax.default_backend() != "tpu",
            )
            xo = ln(y[:, 0], jnp.float32(1.0), jnp.float32(0.0))
            logits = head_mm(xo[None, :], hq, hd)
            return (state, jnp.argmax(logits, -1).astype(jnp.int32)), None

        (state, tokens), _ = jax.lax.scan(
            body, (state, tokens), None, length=N_GEN
        )
        return jnp.sum(tokens.astype(jnp.float32))

    state = {
        "att_xx": jnp.zeros((L, C, 1), jnp.float32),
        "ffn_xx": jnp.zeros((L, C, 1), jnp.float32),
        "heads": jnp.zeros((L, nh, h // nh, s, s), jnp.float32),
    }
    tokens = jnp.zeros((1,), jnp.int32)
    consts = (emb, hq, hd)

    t0 = time.perf_counter()
    out = np.asarray(chain(arrs, consts, state, tokens))
    print(f"compiled+first run in {time.perf_counter() - t0:.1f}s "
          f"(probe {float(out):.1f})", flush=True)
    assert np.isfinite(out)

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(arrs, consts, state, tokens))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / N_GEN
    print(
        f"{size} v6 {'w4a8' if '--w4' in sys.argv else 'w8a8'} "
        f"TILED megakernel decode, B=1: "
        f"{per_tok * 1e3:7.3f} ms/tok  {1 / per_tok:8.1f} tok/s  "
        f"(weight stream {nbytes / 1e9 / per_tok:.0f} GB/s)",
        flush=True,
    )


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    if "--skip-gate" not in sys.argv:
        gate()
    timing()


if __name__ == "__main__":
    main()
