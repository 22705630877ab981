"""Consolidated TPU measurement: native Pallas kernel validation + decode
throughput matrix (precision x batch), tunnel-overhead-corrected."""

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
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params


def null_overhead():
    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    _ = np.asarray(probe(x))
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    # ---- native pallas kernel validation (q8 + pack4) ----
    from rwkv_tpu.ops.kernels import (
        PackedQuantWeight, quant_matmul, quantize_q8_serving,
    )

    rng = np.random.default_rng(0)
    arr = rng.standard_normal((512, 768)).astype(np.float32)
    w8 = quantize_q8_serving(jnp.asarray(arr))
    x = jnp.asarray(rng.standard_normal((4, 768)), jnp.float32)
    err8 = np.abs(
        np.asarray(quant_matmul(x, w8, force="pallas"))
        - np.asarray(quant_matmul(x, w8, force="xla"))
    ).max()
    print(f"pallas q8 native max err: {err8}", flush=True)

    codes = rng.integers(-8, 8, size=(768, 512)).astype(np.int8)
    d4 = (rng.random((24, 512)).astype(np.float32) + 0.1) * 0.02
    lo = codes[0::2].astype(np.uint8) & 0xF
    hi = (codes[1::2].astype(np.uint8) & 0xF) << 4
    w4 = PackedQuantWeight(
        q=jnp.asarray((lo | hi).astype(np.int8)), d=jnp.asarray(d4),
        pack4=True, signed4=True,
    )
    ref8 = PackedQuantWeight(q=jnp.asarray(codes), d=jnp.asarray(d4))
    err4 = np.abs(
        np.asarray(quant_matmul(x, w4, force="pallas"))
        - np.asarray(quant_matmul(x, ref8, force="xla"))
    ).max()
    print(f"pallas pack4 native max err: {err4}", flush=True)

    # ---- decode throughput matrix ----
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    base_params = synth_params(cfg, seed=0)
    n_gen = 256

    for prec in ("bf16", "q8", "quant-q4"):
        if prec == "quant-q4":
            # quantize a copy of the dense params to ggml Q4_0 first
            from rwkv_tpu.io.quant import GgmlDType, quantize_rows
            from rwkv_tpu.ops.parity import Weight

            def q4ify(w):
                if isinstance(w, Weight) and w.kind == "dense" and w.w.ndim == 2 \
                        and w.w.shape[-1] % 32 == 0:
                    packed = quantize_rows(np.asarray(w.w, np.float32), GgmlDType.Q4_0)
                    return Weight.from_packed(packed.tobytes(), GgmlDType.Q4_0,
                                              tuple(w.w.shape))
                return w

            params = {
                "emb": base_params["emb"],
                "ln0": base_params["ln0"],
                "ln_out": base_params["ln_out"],
                "head": q4ify(base_params["head"]),
                "blocks": [
                    {k: q4ify(v) for k, v in b.items()} for b in base_params["blocks"]
                ],
            }
            srv = ServingModel((cfg, params), precision="quant")
        else:
            srv = ServingModel((cfg, base_params), precision=prec)
        stacked = srv.params

        for batch in (1, 8):
            if batch == 1:
                state = init_state(cfg)
                logits = jnp.zeros((cfg.n_vocab,), jnp.float32)

                @jax.jit
                def chain(params, state, logits):
                    def body(carry, _):
                        state, logits = carry
                        tok = jnp.argmax(logits)[None].astype(jnp.int32)
                        logits, state = forward_stacked(params, state, tok, cfg, True)
                        return (state, logits), None

                    (state, logits), _ = jax.lax.scan(
                        body, (state, logits), None, length=n_gen
                    )
                    return jnp.sum(logits)
            else:
                state = jax.tree.map(
                    lambda a: jnp.swapaxes(
                        jnp.broadcast_to(a[None], (batch,) + a.shape), 0, 1
                    ),
                    init_state(cfg),
                )
                logits = jnp.zeros((batch, cfg.n_vocab), jnp.float32)

                @jax.jit
                def chain(params, state, logits):
                    def body(carry, _):
                        state, logits = carry
                        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                        logits, state = forward_stacked(
                            params, state, toks[None, :], cfg, True
                        )
                        return (state, logits), None

                    (state, logits), _ = jax.lax.scan(
                        body, (state, logits), None, length=n_gen
                    )
                    return jnp.sum(logits)

            _ = np.asarray(chain(stacked, state, logits))
            best = 1e9
            for _i in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(chain(stacked, state, logits))
                best = min(best, time.perf_counter() - t0)
            per_step = max(best - ov, 1e-9) / n_gen
            print(
                f"{prec:9s} B={batch}: {per_step * 1e3:7.3f} ms/step  "
                f"{batch / per_step:9.0f} tok/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
