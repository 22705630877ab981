"""Pipeline-parallel (GPipe) measurement on the virtual 8-device mesh
(VERDICT r4 item 10: "one PP number").

Runs pipeline_forward (parallel/pipeline.py) for a v7 model on a `stage`
mesh of virtual CPU devices, sweeping microbatch counts, and reports:
  - correctness vs single-device forward_stacked (max rel)
  - measured wall time per call and the tick count M + S - 1
  - the theoretical bubble fraction (S-1)/(M+S-1) vs the measured
    efficiency loss relative to the M -> inf asymptote

On one host the virtual devices share the same cores, so absolute wall
times are schedule-overhead indicators, not real PP perf; the decision
variable is the bubble trend + the correctness gate. Real-chip PP perf
needs a multi-chip slice (single-chip-only environment here).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/bench_pipeline.py [--stages 4] [--t 32] [--batch 32]
"""

import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

S = int(sys.argv[sys.argv.index("--stages") + 1]) if "--stages" in sys.argv \
    else 4
T = int(sys.argv[sys.argv.index("--t") + 1]) if "--t" in sys.argv else 32
B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv \
    else 32


def main():
    from rwkv_tpu.models.serve import ServingModel, forward_stacked
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.pipeline import (
        make_pp_mesh, pipeline_forward, shard_params_pp, shard_state_pp,
    )

    cfg = synth_config("7.0", n_layer=8, n_embed=256, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=3, lora_dim=32)
    srv = ServingModel((cfg, params), precision="f32")
    mesh = make_pp_mesh(S)
    print(f"PP bench: v7 L={cfg.n_layer} C={cfg.n_embed} T={T} B={B} "
          f"stages={S} ({len(jax.devices())} virtual devices)", flush=True)

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.n_vocab, (T, B)), jnp.int32
    )

    # single-device reference
    state1 = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), srv.init_state(B))
    ref_fn = jax.jit(lambda p, s, t: forward_stacked(p, s, t, cfg, True))
    ref_logits, _ = ref_fn(srv.params, state1, tokens)
    ref_logits = np.asarray(ref_logits)
    t0 = time.perf_counter()
    for _ in range(3):
        out = ref_fn(srv.params, state1, tokens)
        jax.block_until_ready(out)
    t_single = (time.perf_counter() - t0) / 3
    print(f"single-device forward_stacked: {t_single * 1e3:8.1f} ms", flush=True)

    pp_params = shard_params_pp(srv.params, cfg, mesh)
    pp_fn = jax.jit(
        lambda p, s, t, m: pipeline_forward(p, s, t, cfg, mesh, m),
        static_argnums=(3,),
    )

    results = []
    for m in (1, 2, 4, 8, 16, 32):
        if B % m or (B // m) < 1:
            continue
        pp_state = shard_state_pp(state1, mesh)
        logits, _ = pp_fn(pp_params, pp_state, tokens, m)
        logits = np.asarray(logits)
        rel = np.abs(logits - ref_logits).max() / np.abs(ref_logits).max()
        t0 = time.perf_counter()
        for _ in range(3):
            out = pp_fn(pp_params, pp_state, tokens, m)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        ticks = m + S - 1
        bubble = (S - 1) / ticks
        results.append((m, dt, ticks, bubble, rel))
        print(f"M={m:3d}: {dt * 1e3:8.1f} ms  ticks={ticks:3d}  "
              f"bubble={bubble * 100:5.1f}%  rel vs 1-dev={rel:.2e}",
              flush=True)

    # per-tick cost from consecutive M (amortizes fixed overhead)
    if len(results) >= 2:
        (m1, d1, k1, _, _), (m2, d2, k2, _, _) = results[-2], results[-1]
        per_tick = (d2 - d1) / (k2 - k1) if k2 != k1 else float("nan")
        print(f"marginal per-tick cost: {per_tick * 1e3:.1f} ms "
              f"(tick = Bm x T through L/S layers on every stage)",
              flush=True)


if __name__ == "__main__":
    main()
