"""Native timing of on-device speculative decoding.

Target: 169M-class v7 (L=12 C=768); draft: 4-layer C=256. Measures
 (a) the target's plain greedy decode tok/s (generate loop),
 (b) speculative tok/s at k in {2, 4, 8} with the REAL acceptance the
     random-weight pair produces (usually low — random weights have no
     shared distribution), and
 (c) a perfect-draft run (draft == target's own params at 4 layers is
     still imperfect; target==target gives acceptance 1.0 and bounds the
     mechanism's best case).

The point of (c): per accepted token the target pays 1/(j+1) of a
sequence pass instead of one full weight stream, so the mechanism's
ceiling is visible even with a meaningless draft.

Usage: timeout 3000 python scripts/bench_speculative.py
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
if "--small" in sys.argv:
    # CPU smoke must actually run on CPU: this image's jaxlib
    # force-registers the axon TPU and ignores JAX_PLATFORMS.
    jax.config.update("jax_platforms", "cpu")

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.speculative import speculative_generate_device
from rwkv_tpu.models.synth import synth_config, synth_params

SMALL = "--small" in sys.argv  # CPU smoke
N_GEN = 16 if SMALL else 128
PROMPT = list(range(16))


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
    print(f"backend: {jax.default_backend()}", flush=True)
    big = "--15b" in sys.argv
    if SMALL:
        cfg_t = synth_config("7.0", n_layer=4, n_embed=256, n_vocab=1024,
                             head_size=64)
        cfg_d = synth_config("7.0", n_layer=2, n_embed=128, n_vocab=1024,
                             head_size=32)
    elif big:
        # the motivating scale: 1.5B-class target, 169M-class draft,
        # params synthesized on device (w8a8 serving precision)
        cfg_t = synth_config("7.0", n_layer=24, n_embed=2048,
                             n_vocab=65536, head_size=64)
        cfg_d = synth_config("7.0", n_layer=12, n_embed=768,
                             n_vocab=65536, head_size=64)
    else:
        cfg_t = synth_config("7.0", n_layer=12, n_embed=768,
                             n_vocab=65536, head_size=64)
        cfg_d = synth_config("7.0", n_layer=4, n_embed=256,
                             n_vocab=65536, head_size=64)
    if big:
        from rwkv_tpu.models.synth import synth_params_device

        params_t = synth_params_device(cfg_t, seed=0, lora_dim=96)
        params_d = synth_params_device(cfg_d, seed=1)
        target = ServingModel((cfg_t, params_t), precision="w8a8")
        draft = ServingModel((cfg_d, params_d), precision="w8a8")
    else:
        params_t = synth_params(cfg_t, seed=0)
        params_d = synth_params(cfg_d, seed=1)
        target = ServingModel((cfg_t, params_t), precision="bf16")
        draft = ServingModel((cfg_d, params_d), precision="bf16")
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    # (a) plain greedy baseline via the on-device generate loop
    toks, _, _ = target.generate(PROMPT, N_GEN, temperature=0.0)
    np.asarray(toks)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _, _ = target.generate(PROMPT, N_GEN, temperature=0.0)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    base = (best - ov) / N_GEN
    print(f"plain greedy decode: {base * 1e3:6.3f} ms/tok "
          f"({1 / base:7.1f} tok/s)", flush=True)

    # weak-draft = real acceptance of the random-weight pair (~0, the
    # honest lower bound); forced-accept = acceptance-1 ceiling with the
    # SAME cheap draft (benchmark knob); perfect-draft (draft==target)
    # validates acceptance-1 semantics but with an expensive draft.
    modes = [("weak-draft", draft, False), ("forced-accept", draft, True)]
    if not big:
        modes.append(("perfect-draft", target, False))
    for label, d, force in modes:
        for k in ((4,) if SMALL else (2, 4, 8)):
            out, stats = speculative_generate_device(
                target, d, PROMPT, N_GEN, k=k, force_accept=force
            )  # compile + acceptance measurement
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out, stats = speculative_generate_device(
                    target, d, PROMPT, N_GEN, k=k, force_accept=force
                )
                best = min(best, time.perf_counter() - t0)
            per = (best - ov) / N_GEN
            print(
                f"speculative {label:13s} k={k}: {per * 1e3:6.3f} ms/tok "
                f"({1 / per:7.1f} tok/s, {per and base / per:.2f}x) "
                f"acc={stats['acceptance_rate']:.2f} "
                f"rounds={stats['rounds']}",
                flush=True,
            )


if __name__ == "__main__":
    main()
