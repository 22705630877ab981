"""Bisect the v6 megakernel native miscompute with per-layer debug dumps.

Runs v6_decode_megakernel(debug=True) natively AND in interpret mode on
the same small synth model + state, then reports the first dumped
quantity whose native/interpret difference exceeds ulp noise.

Dump layout per layer ([8C, 1]): xl | mixdn(padded) | m_w | xw | r |
w_dec | g | xo.

Run: timeout 1800 python scripts/probe_v6_bisect.py [--bf16]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import v6_decode_megakernel
from rwkv_tpu.ops.parity import layer_norm

QUANT = "--bf16" not in sys.argv
L, C, HEAD = 2, 256, 64
if "--big" in sys.argv:
    L, C, HEAD = 12, 768, 64

cfg = synth_config("6.0", n_layer=L, n_embed=C, n_vocab=512, head_size=HEAD)
params = synth_params(cfg, seed=0, lora_dim=64)
mega = ServingModel(
    (cfg, params), precision="w8a8" if QUANT else "bf16", megakernel=True
)
pack = mega._mega
h, s = cfg.head_count, cfg.head_size

x0 = layer_norm(
    mega.params["emb"][7].astype(jnp.float32), *mega.params["ln0"]
)[:, None]
state_t = {
    "att_xx": jnp.zeros((L, C, 1), jnp.float32),
    "ffn_xx": jnp.zeros((L, C, 1), jnp.float32),
    "heads": jnp.zeros((L, h, s, s), jnp.float32),
}

outs = {}
for mode, interp in (("interp", True), ("native", False)):
    if interp is False and jax.default_backend() != "tpu":
        print("no TPU; skipping native run")
        sys.exit(0)
    y, st = v6_decode_megakernel(pack, state_t, x0, cfg, interpret=interp,
                                 debug=True)
    outs[mode] = (np.asarray(y), {k: np.asarray(v) for k, v in st.items()})

names = ["xl", "mixdn", "m_w", "xw", "r", "w_dec", "g", "xo"]
yi, sti = outs["interp"]
yn, stn = outs["native"]
for layer in range(L):
    for q in range(8):
        a = sti["dbg"][layer, q * C:(q + 1) * C, 0]
        b = stn["dbg"][layer, q * C:(q + 1) * C, 0]
        d = np.abs(a - b).max()
        rel = d / max(np.abs(a).max(), 1e-9)
        flag = "<-- DIVERGES" if rel > 1e-4 else ""
        print(f"L{layer} {names[q]:6s}: max|diff| {d:.3e}  rel {rel:.3e} {flag}",
              flush=True)
print("y    :", np.abs(yi - yn).max(),
      " rel", np.abs(yi - yn).max() / max(np.abs(yi).max(), 1e-9))
for kname in ("att_xx", "ffn_xx", "heads"):
    d = np.abs(sti[kname] - stn[kname]).max()
    print(f"state {kname}: max|diff| {d:.3e}")
