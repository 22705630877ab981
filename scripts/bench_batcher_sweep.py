"""ContinuousBatcher-measured decode tok/s at 1.5B (VERDICT r3 item 2:
"a STATUS table of ContinuousBatcher tok/s, not bare-kernel tok/s").

End to end through the real serving stack: device-synthesized 1.5B v7
params -> ServingModel(megakernel=True) -> ContinuousBatcher.run()
(admission prefill + on-device multi-step scan via decode_loop_fns,
which carries the lane-packed tiled kernel state layout across the
scan). B sweeps {4, 8, 16, 32, 64}.

The tunnel's ~23 ms host sync is an artifact of the remote chip (a
production host syncs in microseconds), so both raw and sync-corrected
tok/s are printed; the corrected number is the table entry.

Usage: timeout 3600 python scripts/bench_batcher_sweep.py [--w4a8]
       [--batches 4,8,16] [--new N] [--sync N]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if "--small" in sys.argv:
    # this image's jaxlib force-registers the axon TPU; config override
    # is the only way to actually run on CPU
    jax.config.update("jax_platforms", "cpu")

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params_device
from rwkv_tpu.parallel.batching import ContinuousBatcher

if "--small" in sys.argv:   # CPU smoke (forces the cpu backend)
    L, C, VOCAB, HEAD, LORA = 2, 256, 512, 64, 32
elif "--169m" in sys.argv:  # 169M-class on chip
    L, C, VOCAB, HEAD, LORA = 12, 768, 65536, 64, 64
elif "--7b" in sys.argv:    # 7B-class on chip
    L, C, VOCAB, HEAD, LORA = 32, 4096, 65536, 64, 128
else:
    L, C, VOCAB, HEAD, LORA = 24, 2048, 65536, 64, 96
PRECISION = "w4a8" if "--w4a8" in sys.argv else "w8a8"
BATCHES = ([int(b) for b in
            sys.argv[sys.argv.index("--batches") + 1].split(",")]
           if "--batches" in sys.argv else [4, 8, 16, 32, 64])
N_NEW = int(sys.argv[sys.argv.index("--new") + 1]) if "--new" in sys.argv \
    else 128
SYNCS = ([int(s) for s in sys.argv[sys.argv.index("--syncs") + 1]
          .split(",")]
         if "--syncs" in sys.argv else
         [int(sys.argv[sys.argv.index("--sync") + 1])]
         if "--sync" in sys.argv else [32])
TEMPS = ([float(t) for t in
          sys.argv[sys.argv.index("--temps") + 1].split(",")]
         if "--temps" in sys.argv else
         [float(sys.argv[sys.argv.index("--temp") + 1])]
         if "--temp" in sys.argv else [0.0])


def main():
    size = ("small" if "--small" in sys.argv
            else "169M" if "--169m" in sys.argv
            else "7B" if "--7b" in sys.argv else "1.5B")
    print(f"{size} v7 {PRECISION} ContinuousBatcher sweep on "
          f"{jax.devices()[0]}", flush=True)

    @jax.jit
    def probe(x):
        return x * 1.000001

    import jax.numpy as jnp
    x = jnp.ones((8,), jnp.float32)
    np.asarray(probe(x))
    ov = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        ov = min(ov, time.perf_counter() - t0)
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    t0 = time.perf_counter()
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=VOCAB,
                       head_size=HEAD)
    params = synth_params_device(cfg, seed=0, lora_dim=LORA)
    srv = ServingModel((cfg, params), precision=PRECISION, megakernel=True)
    print(f"model built on device in {time.perf_counter() - t0:.1f}s "
          f"(mega_big={srv._mega_big})", flush=True)

    for temp in TEMPS:
      for b in BATCHES:
       for SYNC in SYNCS:
        try:
            batcher = ContinuousBatcher(srv, max_batch=b, sync_every=SYNC)
            # warmup: compiles admission shapes + the multi-step loop fn
            for i in range(b):
                batcher.submit([1 + i, 2, 3, 4], max_new_tokens=SYNC,
                               temperature=temp)
            t0 = time.perf_counter()
            batcher.run()
            warm = time.perf_counter() - t0

            batcher = ContinuousBatcher(srv, max_batch=b, sync_every=SYNC)
            for i in range(b):
                batcher.submit([1 + i, 2, 3, 4], max_new_tokens=N_NEW,
                               temperature=temp)
            t0 = time.perf_counter()
            done = batcher.run()
            dt = time.perf_counter() - t0
            assert all(len(r.generated) == N_NEW for r in done.values())
            # pipelined drain: one dispatch+download per sync window
            n_syncs = (N_NEW + SYNC - 1) // SYNC
            raw = b * N_NEW / dt
            corr = b * N_NEW / max(dt - n_syncs * ov, 1e-9)
            print(f"T={temp} B={b:3d} sync={SYNC:3d}: {raw:8.0f} tok/s "
                  f"raw, {corr:8.0f} tok/s sync-corrected "
                  f"({dt * 1e3 / N_NEW:7.3f} ms/step raw, "
                  f"warmup {warm:.1f}s)", flush=True)
        except Exception as e:
            print(f"T={temp} B={b} sync={SYNC}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
