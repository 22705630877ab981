"""Speculative decoding with a REAL trained draft/target pair.

The synthetic benchmark (bench_speculative.py) could only show the
acceptance-1 ceiling — random-weight pairs accept ~0 of their
proposals. This script uses the two organically-trained byte-level v4
checkpoints (scripts/train_v4_lm.py: 85M target, 4.6M --draft) that
share a corpus, measures the REAL acceptance rate on held-out text,
and times speculative vs plain greedy decode on chip.

Usage: timeout 2400 python scripts/bench_speculative_real.py
       [--target /tmp/v4lm2-fp32.bin] [--draft /tmp/v4draft-fp32.bin]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

TARGET = (sys.argv[sys.argv.index("--target") + 1]
          if "--target" in sys.argv else "/tmp/v4lm2-fp32.bin")
DRAFT = (sys.argv[sys.argv.index("--draft") + 1]
         if "--draft" in sys.argv else "/tmp/v4draft-fp32.bin")
N_GEN = 256


def main():
    import jax.numpy as jnp

    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import speculative_generate_device
    from train_v4_lm import load_corpus, split_corpus

    target = ServingModel(TARGET, precision="bf16")
    draft = ServingModel(DRAFT, precision="bf16")
    _, hold = split_corpus(load_corpus())
    prompt = [int(b) for b in hold[:64]]
    print(f"target {TARGET} (L={target.config.n_layer} "
          f"C={target.config.n_embed}); draft {DRAFT} "
          f"(L={draft.config.n_layer} C={draft.config.n_embed}); "
          f"prompt 64 held-out bytes", flush=True)

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

    toks, _, _ = target.generate(prompt, N_GEN, temperature=0.0)
    ref = np.asarray(toks)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        toks, _, _ = target.generate(prompt, N_GEN, temperature=0.0)
        np.asarray(toks)
        best = min(best, time.perf_counter() - t0)
    base = (best - ov) / N_GEN
    print(f"plain greedy: {base * 1e3:6.3f} ms/tok ({1 / base:7.1f} tok/s)",
          flush=True)

    for k in (2, 4, 8):
        out, stats = speculative_generate_device(
            target, draft, prompt, N_GEN, k=k)
        assert np.array_equal(np.asarray(out), ref), "greedy mismatch"
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out, stats = speculative_generate_device(
                target, draft, prompt, N_GEN, k=k)
            best = min(best, time.perf_counter() - t0)
        per = (best - ov) / N_GEN
        print(f"speculative k={k}: {per * 1e3:6.3f} ms/tok "
              f"({1 / per:7.1f} tok/s, {base / per:4.2f}x) "
              f"acc={stats['acceptance_rate']:.2f} "
              f"rounds={stats['rounds']}", flush=True)


if __name__ == "__main__":
    main()
