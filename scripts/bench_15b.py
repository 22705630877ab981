"""1.5B-class RWKV v7 decode benchmark: bf16 vs q8 vs q4 packed.

At this scale the decode step is HBM-bound on weights (~3 GB bf16), so the
fused dequant kernels should win roughly in proportion to bytes/weight.
Weights are synthesized AND quantized on device (host->device transfer
through the tunnel runs at ~36 MB/s — shipping 3 GB would take minutes).

Reference point: rwkv.cpp's published RWKV-4 Pile 1.5B numbers are
72-198 ms/token on a 4C/8T AVX2 CPU (README.md:35-43).
"""

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
from rwkv_tpu.models.synth import synth_config
from rwkv_tpu.ops.kernels import QK, PackedQuantWeight

L, C, VOCAB, HEAD = 24, 2048, 65536, 64
LORA = 96
N_GEN = 64


def _normal(key, shape, scale, dtype=jnp.bfloat16):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def synth_device(cfg, precision: str, seed: int = 0):
    """Build stacked serving params for v7 directly on device."""
    key = jax.random.PRNGKey(seed)

    def nk():
        nonlocal key
        key, k = jax.random.split(key)
        return k

    def wmat(shape):
        w = _normal(nk(), shape, 1.0 / np.sqrt(shape[-1]))
        if precision == "bf16":
            return w
        return quantize_device(w.astype(jnp.float32), precision)

    def vec(*shape, scale=0.1, offset=0.0):
        return _normal(nk(), shape, scale, jnp.float32) + offset

    def stacked_w(shape):
        return jax.tree.map(
            lambda *xs: jnp.stack(xs), *[wmat(shape) for _ in range(cfg.n_layer)]
        )

    def stacked_v(*shape, scale=0.1, offset=0.0):
        return jnp.stack([vec(*shape, scale=scale, offset=offset) for _ in range(cfg.n_layer)])

    h, s = cfg.head_count, cfg.head_size
    blocks = {
        "ln1.weight": stacked_v(C, offset=1.0, scale=0.02),
        "ln1.bias": stacked_v(C, scale=0.02),
        "ln2.weight": stacked_v(C, offset=1.0, scale=0.02),
        "ln2.bias": stacked_v(C, scale=0.02),
        "att.key.weight": stacked_w((C, C)),
        "att.value.weight": stacked_w((C, C)),
        "att.receptance.weight": stacked_w((C, C)),
        "att.output.weight": stacked_w((C, C)),
        "ffn.key.weight": stacked_w((4 * C, C)),
        "ffn.value.weight": stacked_w((C, 4 * C)),
        "att.x_rwkvag": stacked_v(6, C, scale=0.2, offset=0.5),
        "att.w0": stacked_v(C, scale=0.3),
        "att.w1": stacked_w((LORA, C)),
        "att.w2": stacked_w((C, LORA)),
        "att.a0": stacked_v(C, scale=0.3),
        "att.a1": stacked_w((LORA, C)),
        "att.a2": stacked_w((C, LORA)),
        "att.g1": stacked_w((LORA, C)),
        "att.g2": stacked_w((C, LORA)),
        "att.v0": stacked_v(C, scale=0.3),
        "att.v1": stacked_w((LORA, C)),
        "att.v2": stacked_w((C, LORA)),
        "att.k_k": stacked_v(C, scale=0.3, offset=0.5),
        "att.k_a": stacked_v(C, scale=0.3, offset=0.5),
        "att.r_k": stacked_v(h, s, scale=0.3),
        "att.ln_x.weight": stacked_v(C, offset=1.0, scale=0.02),
        "att.ln_x.bias": stacked_v(C, scale=0.02),
        "ffn.x_k": stacked_v(C, scale=0.2, offset=0.5),
    }
    return {
        "emb": _normal(nk(), (VOCAB, C), 0.02),
        "ln0": (vec(C, offset=1.0, scale=0.02), vec(C, scale=0.02)),
        "ln_out": (vec(C, offset=1.0, scale=0.02), vec(C, scale=0.02)),
        "head": wmat((VOCAB, C)),
        "blocks": blocks,
    }


@partial(jax.jit, static_argnames=("precision",))
def _quantize_device_jit(arr, precision):
    out, k = arr.shape
    if precision in ("q8r", "w8a8"):
        amax = jnp.max(jnp.abs(arr), axis=-1)
        d = amax / 127.0
        inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        q = jnp.clip(jnp.rint(arr * inv[:, None]), -127, 127).astype(jnp.int8)
        return q.T, d.reshape(1, out).astype(jnp.float32)
    blocks = arr.reshape(out, k // QK, QK)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    if precision == "q8":
        d = amax / 127.0
        inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        q = jnp.clip(jnp.rint(blocks * inv[..., None]), -127, 127).astype(jnp.int8)
        return q.reshape(out, k).T, d.T.astype(jnp.float32)
    # q4: symmetric per-block 4-bit, codes in [-7, 7]
    d = amax / 7.0
    inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    q = jnp.clip(jnp.rint(blocks * inv[..., None]), -7, 7).astype(jnp.int32)
    qt = q.reshape(out, k).T  # [k, out]
    lo = qt[0::2] & 0xF
    hi = (qt[1::2] & 0xF) << 4
    packed = (lo | hi).astype(jnp.int8)
    return packed, d.T.astype(jnp.float32)


def quantize_device(arr, precision):
    q, d = _quantize_device_jit(arr, precision)
    return PackedQuantWeight(
        q=q, d=d, pack4=(precision == "q4"), signed4=True,
        rowwise=(precision in ("q8r", "w8a8")),
        int8_act=(precision == "w8a8"),
    )


def main():
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB, head_size=HEAD)

    # overhead probe
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

    for precision in ("bf16", "w8a8"):
        t0 = time.perf_counter()
        params = synth_device(cfg, precision)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        print(f"{precision}: params built in {time.perf_counter() - t0:.1f}s", flush=True)

        @jax.jit
        def chain(params, state, logits):
            def body(carry, _):
                state, logits = carry
                tok = jnp.argmax(logits)[None].astype(jnp.int32)
                logits, state = forward_stacked(params, state, tok, cfg, True)
                return (state, logits), None

            (state, logits), _ = jax.lax.scan(body, (state, logits), None, length=N_GEN)
            return jnp.sum(logits)

        state = init_state(cfg)
        logits = jnp.zeros((cfg.n_vocab,), jnp.float32)
        _ = np.asarray(chain(params, state, logits))
        best = 1e9
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(chain(params, state, logits))
            best = min(best, time.perf_counter() - t0)
        per_tok = max(best - ov, 1e-9) / N_GEN
        print(
            f"1.5B {precision:4s} decode: {per_tok * 1e3:7.3f} ms/tok  "
            f"{1 / per_tok:7.1f} tok/s",
            flush=True,
        )

        if "--batch" in sys.argv:
            B = int(sys.argv[sys.argv.index("--batch") + 1])

            @jax.jit
            def bchain(params, state, logits):
                def body(carry, _):
                    state, logits = carry
                    toks = jnp.argmax(logits, -1).astype(jnp.int32)
                    logits, state = forward_stacked(
                        params, state, toks[None, :], cfg, True
                    )
                    return (state, logits), None

                (state, logits), _ = jax.lax.scan(
                    body, (state, logits), None, length=N_GEN
                )
                return jnp.sum(logits)

            bstate = jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a[:, None], (a.shape[0], B) + a.shape[1:]
                ),
                init_state(cfg),
            )
            blogits = jnp.zeros((B, cfg.n_vocab), jnp.float32)
            _ = np.asarray(bchain(params, bstate, blogits))
            best = 1e9
            for _i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(bchain(params, bstate, blogits))
                best = min(best, time.perf_counter() - t0)
            per_step = max(best - ov, 1e-9) / N_GEN
            print(
                f"1.5B {precision:4s} decode B={B}: "
                f"{per_step * 1e3:7.3f} ms/step  "
                f"{B / per_step:7.1f} tok/s",
                flush=True,
            )
        del params


if __name__ == "__main__":
    main()
