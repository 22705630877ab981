"""Native numerics gate: v4/v5.1/v5.2/v6 ServingModel megakernel decode
(rowified pack + row state + in-kernel head) vs the per-op engine, ON
CHIP, at the cross-path w8a8 bands.

Usage: timeout 3000 python scripts/gate_v456_serve.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    seeds = ([int(s) for s in sys.argv[sys.argv.index("--seeds") + 1]
              .split(",")] if "--seeds" in sys.argv else [5])
    ok = True
    for version in ("4.0", "5.1", "5.2", "6.0", "7.0"):
      for seed in seeds:
        cfg = synth_config(version, n_layer=3, n_embed=256, n_vocab=1024,
                           head_size=64)
        params = synth_params(cfg, seed=seed, lora_dim=32)
        ref = ServingModel((cfg, params), precision="w8a8")
        mega = ServingModel((cfg, params), precision="w8a8",
                            megakernel=True)
        st_r, st_m = ref.init_state(1), mega.init_state(1)
        worst = 0.0
        argmax_ok = True
        for tok in (34, 105, 110, 7, 200):
            lr, st_r = ref.decode(np.array([tok], np.int32), st_r)
            lm, st_m = mega.decode(np.array([tok], np.int32), st_m)
            lr_, lm_ = np.asarray(lr)[0], np.asarray(lm)[0]
            rel = np.abs(lm_ - lr_).max() / max(np.abs(lr_).max(), 1e-6)
            worst = max(worst, rel)
            argmax_ok &= lm_.argmax() == lr_.argmax()
        band = 1e-1  # cross-path w8a8 band (v5/v6 activation scales)
        passed = worst < band and argmax_ok
        ok &= passed
        print(f"gate {version} seed={seed}: worst rel {worst:.5f} argmax "
              f"{'OK' if argmax_ok else 'MISMATCH'} "
              f"{'PASS' if passed else 'FAIL'}", flush=True)
    assert ok
    print("ALL V4-V7 SERVE MEGAKERNEL GATES PASS (native)", flush=True)


if __name__ == "__main__":
    main()
