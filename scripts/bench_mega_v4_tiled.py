"""Native-TPU verification + timing of the v4 PHASE-TILED megakernel.

The reference's own 7B benchmark is RWKV-4 World 7B (README.md:65-76,
best 75 ms/tok Q4_0 hipBLAS-offloaded) — this measures the same
architecture class on one chip. Gates run at a small width with FORCED
tiling (fused and row-tiled branches) native-vs-interpret; timing
synthesizes the retiled w8a8 pack ON DEVICE.

Usage:  timeout 3000 python scripts/bench_mega_v4_tiled.py [--14b] [--skip-gate]
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
    _V4_TILED_ROW_VECS,
    build_mega_pack_v4,
    choose_tiling,
    retile_mega_pack_v4,
    v4_decode_megakernel_tiled,
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
    meta_keys = ("quant", "w4", "f_dim", "nf", "nr", "no")
    meta = {k: pack[k] for k in meta_keys if k in pack}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    @jax.jit
    def step(arrs, state, x0):
        return v4_decode_megakernel_tiled(
            {**arrs, **meta}, state, x0, cfg, interpret=interpret
        )

    return step(arrs, state, x0)


def gate():
    cfg = synth_config("4.0", n_layer=4, n_embed=512, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=4)
    c, L = cfg.n_embed, cfg.n_layer
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)

    for quant, w4 in ((False, False), (True, False), (True, True)):
        base = build_mega_pack_v4(params, cfg, quant=quant, w4=w4)
        for label, (nf, nr, no) in (
            ("fused", (2, 3, 1)),
            ("row-tiled", (2, 6, 2)),
        ):
            pack = retile_mega_pack_v4(base, cfg, nf, nr, no)
            state = {
                "att_xx": jnp.zeros((L, c, 1), jnp.float32),
                "ffn_xx": jnp.zeros((L, c, 1), jnp.float32),
                "aa": jnp.zeros((L, c, 1), jnp.float32),
                "bb": jnp.zeros((L, c, 1), jnp.float32),
                "pp": jnp.full((L, c, 1), -1e30, jnp.float32),
            }
            y_n, st_n = run_pack(pack, cfg, state, x0, interpret=False)
            y_i, st_i = run_pack(pack, cfg, state, x0, interpret=True)
            y_n, y_i = np.asarray(y_n), np.asarray(y_i)
            rel = np.abs(y_n - y_i).max() / max(np.abs(y_i).max(), 1e-6)
            arel = (
                np.abs(np.asarray(st_n["aa"]) - np.asarray(st_i["aa"]))
                .max() / max(np.abs(np.asarray(st_i["aa"])).max(), 1e-6)
            )
            mode = ("w4a8" if w4 else "w8a8") if quant else "bf16"
            tol = 2e-2 if quant else 5e-3
            ok = rel < tol and arel < tol
            print(f"gate {mode:5s} {label:9s}: y rel {rel:.2e} "
                  f"aa rel {arel:.2e}  {'OK' if ok else 'FAIL'}",
                  flush=True)
            assert ok, (mode, label, rel, arel)


def synth_pack_device(cfg, nf, nr, no, seed=0):
    """Synthesize the retiled w8a8 v4 mega pack directly on device."""
    L, c = cfg.n_layer, cfg.n_embed
    f = 4 * c
    m = nr // 3
    c_r, c_o, f4 = c // m, c // no, f // nf
    key = jax.random.PRNGKey(seed)

    def nxt():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def _build_mat(key, shape):
        # jitted fori_loop fill: XLA plans ONE result buffer with the
        # loop carry updated in place, so peak memory = the mat + one
        # slice's randint temp. The round-4 eager per-slice .at[].set
        # churned a fresh buffer per slice and RESOURCE_EXHAUSTED the
        # 16GB chip during the 7.2GB 14B pack synthesis.
        def body(i, q):
            return q.at[i].set(jax.random.randint(
                jax.random.fold_in(key, i), shape[1:], -127, 128,
                jnp.int8))

        return jax.lax.fori_loop(
            0, shape[0], body, jnp.zeros(shape, jnp.int8))

    def qmat(shape):
        return _build_mat(nxt(), shape)

    def scale(shape):
        return jnp.full(shape, 0.01, jnp.float32)

    w4 = "--w4" in sys.argv
    kk = c // 2 if w4 else c      # split-half packed nibbles along K
    pack = {"quant": True, "w4": w4, "f_dim": f,
            "nf": nf, "nr": nr, "no": no}
    pack["rkv"] = qmat((L, nr, c_r, kk))
    pack["rkv_d"] = scale((L, nr, 1, c_r))
    pack["out"] = qmat((L, no, c_o, kk))
    pack["out_d"] = scale((L, no, 1, c_o))
    pack["fr"] = qmat((L, no, c_o, kk))
    pack["fr_d"] = scale((L, no, 1, c_o))
    pack["fk"] = qmat((L, nf, f4, kk))
    pack["fk_d"] = scale((L, nf, 1, f4))
    pack["fv"] = qmat((L, nf, c, f4 // 2 if w4 else f4))
    pack["fv_d"] = scale((L, 1, c))
    for name in _V4_TILED_ROW_VECS:
        off = 1.0 if name.endswith("weight") else 0.0
        pack[name] = (
            jax.random.normal(nxt(), (L, 1, c), jnp.float32) * 0.02 + off
        )
    pack["amix"] = (
        jax.random.normal(nxt(), (L, 1, 3 * c), jnp.float32) * 0.1 + 0.5
    )
    pack["fmix"] = (
        jax.random.normal(nxt(), (L, 1, 2 * c), jnp.float32) * 0.1 + 0.5
    )
    pack["tf"] = (
        jax.random.normal(nxt(), (L, 1, c), jnp.float32) * 0.3
    )
    pack["td"] = (
        -jnp.exp(jax.random.normal(nxt(), (L, 1, c), jnp.float32))
    )
    return pack


def timing():
    if "--14b" in sys.argv:
        L, C, VOCAB, size = 40, 5120, 65536, "14B"
    else:
        L, C, VOCAB, size = 32, 4096, 65536, "7B"
    cfg = synth_config("4.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=64)
    _, nf, nr, no = choose_tiling(cfg, True, 1, f_dim=4 * C, n_proj=3)
    print(f"{size} tiling: nf={nf} nr={nr} no={no}", flush=True)
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    pack = synth_pack_device(cfg, nf, nr, no)
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

    meta_keys = ("quant", "w4", "f_dim", "nf", "nr", "no")
    meta = {k: pack[k] for k in meta_keys}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    def ln(v):
        mu = jnp.mean(v)
        vc = v - mu
        return vc * jax.lax.rsqrt(jnp.mean(vc * vc) + 1e-5)

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
            x0 = ln(emb[tokens[0]].astype(jnp.float32))[:, None]
            y, state = v4_decode_megakernel_tiled(
                pk, state, x0, cfg,
                interpret=jax.default_backend() != "tpu",
            )
            logits = head_mm(ln(y[:, 0])[None, :], hq, hd)
            return (state, jnp.argmax(logits, -1).astype(jnp.int32)), None

        (state, tokens), _ = jax.lax.scan(
            body, (state, tokens), None, length=N_GEN
        )
        return jnp.sum(tokens.astype(jnp.float32))

    state = {
        "att_xx": jnp.zeros((L, C, 1), jnp.float32),
        "ffn_xx": jnp.zeros((L, C, 1), jnp.float32),
        "aa": jnp.zeros((L, C, 1), jnp.float32),
        "bb": jnp.zeros((L, C, 1), jnp.float32),
        "pp": jnp.full((L, C, 1), -1e30, jnp.float32),
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
        f"{size} v4 {'w4a8' if '--w4' in sys.argv else 'w8a8'} TILED megakernel decode, B=1: "
        f"{per_tok * 1e3:7.3f} ms/tok  {1 / per_tok:8.1f} tok/s  "
        f"(weight stream {nbytes / 1e9 / per_tok:.0f} GB/s; reference "
        f"7B best: 75 ms/tok)",
        flush=True,
    )


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    if "--skip-gate" not in sys.argv:
        gate()
    timing()


if __name__ == "__main__":
    main()
