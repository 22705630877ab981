"""1.5B-class decode through the phase-tiled whole-model megakernel.

Round-2 context: the per-op XLA w8a8 path measured 3.73 ms/tok at these
dims (scripts/bench_15b.py), with ~1.7 ms of that attributed to per-op
launch overhead and the s8 weight stream walled at ~405 GB/s
(scripts/probe_megakernel2.py).  The whole-layer megakernel cannot compile
at C=2048 (per-layer weights blow the VMEM double-buffer budget); this
script times the (layer, phase)-tiled variant (ops/megakernel.py), which
streams phase-sized weight blocks instead.

The pack is synthesized DIRECTLY ON DEVICE (the tunnel moves ~36 MB/s; the
1.5 GB int8 pack must never transit the host).  Timing chains N_GEN full
steps (embed + ln0 + megakernel + ln_out + int8 head + argmax feedback)
inside one jit and subtracts the measured null sync round-trip — same
methodology as bench_15b.py.

Usage: timeout 3000 python scripts/bench_mega_15b.py [--batch N]
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

from rwkv_tpu.models.synth import synth_config
from rwkv_tpu.ops.megakernel import (
    _VEC_KEYS, choose_tiling, v7_decode_megakernel_tiled,
)

if "--small" in sys.argv:  # CPU smoke (interpret mode)
    L, C, VOCAB, HEAD, LORA = 2, 256, 1024, 64, 32
elif "--7b" in sys.argv:   # 7B-class (row-tiled rkv/out phases)
    L, C, VOCAB, HEAD, LORA = 32, 4096, 65536, 64, 128
else:
    L, C, VOCAB, HEAD, LORA = 24, 2048, 65536, 64, 96
F = 4 * C
N_GEN = 4 if "--small" in sys.argv else 64
BATCH = 1
if "--batch" in sys.argv:
    BATCH = int(sys.argv[sys.argv.index("--batch") + 1])


def synth_pack_device(cfg, nh, nf, nr, no, seed=0):
    """Synthesize the retiled w8a8 mega pack directly on device."""
    key = jax.random.PRNGKey(seed)

    def nk():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    def qmat(shape, k_in):
        q = jax.random.randint(nk(), shape, -127, 128, jnp.int8)
        d = (
            jnp.abs(jax.random.normal(nk(), shape[:-1] + (1,), jnp.float32))
            * (1.0 / (127.0 * np.sqrt(k_in)))
            + 1e-5
        )
        return q, d

    def vec(scale=0.1, offset=0.0, shape=(C,)):
        return (
            jax.random.normal(nk(), (L,) + shape + (1,), jnp.float32) * scale
            + offset
        )

    f4 = F // nf
    c_r = 3 * C // nr
    c_o = C // no
    w4 = "--w4" in sys.argv
    pack = {"quant": True, "w4": w4, "d_lora": LORA, "f_dim": F,
            "nh": nh, "nf": nf, "nr": nr, "no": no}
    kd = 2 if w4 else 1   # big mats store K/2 packed bytes under w4
    pack["rkv"], pack["rkv_d"] = qmat((L, nr, c_r, C // kd), C)
    pack["lora1"], pack["lora1_d"] = qmat((L, 4 * LORA, C), C)
    pack["lora2"], pack["lora2_d"] = qmat((L, 4 * C, LORA), LORA)
    pack["out"], pack["out_d"] = qmat((L, no, c_o, C // kd), C)
    pack["fk"], pack["fk_d"] = qmat((L, nf, f4, C // kd), C)
    pack["fv"], fv_d = qmat((L, nf, C, f4 // kd), F)
    pack["fv_d"] = fv_d[:, 0]  # [L, C, 1] — output-row scales, tile-invariant
    # tiled-kernel row layout (retile_mega_pack contract): scales and
    # most vectors as rows; ln_x + r_k stay columns; rkv/out scales are
    # tile-indexed [L, nt, 1, rows].
    for name in ("lora1", "lora2", "fv"):
        pack[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    pack["fk_d"] = jnp.swapaxes(pack["fk_d"], 2, 3)
    pack["rkv_d"] = jnp.swapaxes(pack["rkv_d"], 2, 3)
    pack["out_d"] = jnp.swapaxes(pack["out_d"], 2, 3)
    from rwkv_tpu.ops.megakernel import _TILED_ROW_VECS

    for name in _VEC_KEYS:
        ofs = 1.0 if name.endswith("weight") else 0.0
        scl = 0.02 if ("ln" in name) else 0.3
        v = vec(scale=scl, offset=ofs)
        pack[name] = (
            jnp.swapaxes(v, 1, 2) if name in _TILED_ROW_VECS else v
        )
    pack["coeff"] = jnp.swapaxes(vec(scale=0.2, offset=0.5, shape=(6 * C,)), 1, 2)
    pack["r_k"] = vec(scale=0.3, shape=(cfg.head_count, HEAD))
    return pack


def gate():
    """Native-vs-interpret gates for the v7 tiled kernel at a small
    width with FORCED tiling: (fused, row-tiled) x (w8a8, w4). Run
    before trusting any new matv path natively (silent-miscompute
    hazard — see ops/megakernel.py header)."""
    import numpy as np

    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.ops.megakernel import (
        build_mega_pack, retile_mega_pack, v7_decode_megakernel_tiled,
    )

    cfg = synth_config("7.0", n_layer=3, n_embed=512, n_vocab=1024,
                       head_size=64)
    params = synth_params(cfg, seed=3, lora_dim=64)
    h, s = cfg.head_count, cfg.head_size
    c = cfg.n_embed
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(c, 1)) * 0.3, jnp.float32)

    ok_all = True
    for w4 in (False, True):
        base = build_mega_pack(params, cfg, quant=True, w4=w4)
        for label, (nh, nf, nr, no) in (
            ("fused", (2, 2, 3, 1)),
            ("row-tiled", (2, 2, 6, 2)),
        ):
            pack = retile_mega_pack(base, cfg, nh, nf, nr, no)
            state = {
                "att_xx": jnp.zeros((cfg.n_layer, c, 1), jnp.float32),
                "ffn_xx": jnp.zeros((cfg.n_layer, c, 1), jnp.float32),
                "heads": jnp.asarray(
                    rng.normal(
                        size=(cfg.n_layer, nh, h // nh, s, s)
                    ) * 0.05,
                    jnp.float32,
                ),
            }
            meta_keys = ("quant", "w4", "d_lora", "f_dim",
                         "nh", "nf", "nr", "no")
            meta = {k: pack[k] for k in meta_keys}
            arrs = {k: v for k, v in pack.items() if k not in meta}

            def step(arrs, state, x0, interpret):
                return v7_decode_megakernel_tiled(
                    {**arrs, **meta}, state, x0, cfg, interpret=interpret
                )

            # off-TPU this degenerates to interpret-vs-interpret (a
            # plumbing smoke); the real gate needs the chip
            native = jax.default_backend() != "tpu"
            y_n, _ = jax.jit(
                lambda a, st, x: step(a, st, x, native)
            )(arrs, state, x0)
            y_i, _ = step(arrs, state, x0, True)
            y_n, y_i = np.asarray(y_n), np.asarray(y_i)
            rel = np.abs(y_n - y_i).max() / max(np.abs(y_i).max(), 1e-6)
            mode = "w4a8" if w4 else "w8a8"
            ok = rel < 2e-2
            ok_all = ok_all and ok
            print(f"gate {mode} {label:9s}: y rel {rel:.2e}  "
                  f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok_all


def main():
    if "--ablate" in sys.argv:
        # timing-only w4 ablation (WRONG math): 'nomask' | 'onedot'
        from rwkv_tpu.ops.megakernel import set_w4_ablate

        set_w4_ablate(sys.argv[sys.argv.index("--ablate") + 1])
    if "--gate" in sys.argv:
        return 0 if gate() else 1
    cfg = synth_config(
        "7.0", n_layer=L, n_embed=C, n_vocab=VOCAB, head_size=HEAD
    )
    h, s = cfg.head_count, cfg.head_size
    nh, nf, nr, no = choose_tiling(cfg, True, BATCH)
    if os.environ.get("RWKV_TILING"):   # "nh,nf,nr,no" override (probes)
        nh, nf, nr, no = (int(v) for v in
                          os.environ["RWKV_TILING"].split(","))
    print(f"tiling: nh={nh} nf={nf} nr={nr} no={no} batch={BATCH}",
          flush=True)

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
    pack = synth_pack_device(cfg, nh, nf, nr, no)
    key = jax.random.PRNGKey(99)
    emb = (jax.random.normal(key, (VOCAB, C), jnp.float32) * 0.02).astype(
        jnp.bfloat16
    )
    hq = jax.random.randint(jax.random.PRNGKey(98), (VOCAB, C), -127, 128,
                            jnp.int8)
    hd = jnp.full((VOCAB, 1), 1.0 / (127.0 * np.sqrt(C)), jnp.float32)
    ln_out_w = jnp.ones((C,), jnp.float32)
    ln_out_b = jnp.zeros((C,), jnp.float32)
    jax.block_until_ready(pack["rkv"])
    nbytes = sum(
        v.nbytes for v in jax.tree_util.tree_leaves(pack)
        if hasattr(v, "nbytes")
    ) + hq.nbytes
    print(
        f"pack built on device in {time.perf_counter() - t0:.1f}s "
        f"({nbytes / 1e9:.2f} GB streamed/step incl. head)",
        flush=True,
    )

    meta = {k: pack[k]
            for k in ("quant", "w4", "d_lora", "f_dim",
                      "nh", "nf", "nr", "no")}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    def ln(v, w, b):
        mu = jnp.mean(v)
        vc = v - mu
        return vc * jax.lax.rsqrt(jnp.mean(vc * vc) + 1e-5) * w + b

    def head_mm(xo, hq, hd):  # [B, C] -> [B, V] via s8 MXU
        amax = jnp.max(jnp.abs(xo), axis=-1, keepdims=True)
        dx = amax / 127.0
        inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(xo * inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, hq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * dx * hd[:, 0][None, :]

    # emb/head/ln arrays are passed as ARGUMENTS (closure capture would
    # bake them into the HLO as constants — hundreds of MB through the
    # tunnel's remote-compile endpoint, which rejects the request).
    @jax.jit
    def chain(arrs, consts, state, tokens):
        emb, hq, hd, ln_out_w, ln_out_b = consts
        pk = {**arrs, **meta}

        def body(carry, _):
            state, tokens = carry
            x0 = jax.vmap(lambda t: ln(emb[t].astype(jnp.float32),
                                       jnp.float32(1.0), jnp.float32(0.0)))(
                tokens
            )                                             # [B, C]
            y, state = v7_decode_megakernel_tiled(
                pk, state, x0.T, cfg,
                interpret=jax.default_backend() != "tpu",
            )
            xo = jax.vmap(lambda v: ln(v, ln_out_w, ln_out_b))(y.T)
            logits = head_mm(xo, hq, hd)
            return (state, jnp.argmax(logits, -1).astype(jnp.int32)), None

        (state, tokens), _ = jax.lax.scan(
            body, (state, tokens), None, length=N_GEN
        )
        return jnp.sum(tokens.astype(jnp.float32))

    if BATCH == 1:
        heads = jnp.zeros((L, nh, h // nh, s, s), jnp.float32)
    else:
        heads = jnp.zeros((L, nh, h // nh, s, s, BATCH), jnp.float32)
    state = {
        "att_xx": jnp.zeros((L, C, BATCH), jnp.float32),
        "ffn_xx": jnp.zeros((L, C, BATCH), jnp.float32),
        "heads": heads,
    }
    tokens = jnp.zeros((BATCH,), jnp.int32)
    consts = (emb, hq, hd, ln_out_w, ln_out_b)

    t0 = time.perf_counter()
    out = np.asarray(chain(arrs, consts, state, tokens))
    print(f"compiled+first run in {time.perf_counter() - t0:.1f}s "
          f"(probe {float(out):.1f})", flush=True)
    assert np.isfinite(out)

    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(chain(arrs, consts, state, tokens))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / N_GEN
    wt_gb = nbytes / 1e9
    size = "7B" if "--7b" in sys.argv else (
        "small" if "--small" in sys.argv else "1.5B")
    fmt = "w4a8" if "--w4" in sys.argv else "w8a8"
    print(
        f"{size} {fmt} TILED megakernel decode, B={BATCH}: "
        f"{per_tok * 1e3:7.3f} ms/tok  {BATCH / per_tok:8.1f} tok/s  "
        f"(weight stream {wt_gb / per_tok:.0f} GB/s; per-op path was "
        f"3.73 ms/tok)",
        flush=True,
    )


if __name__ == "__main__":
    main()
