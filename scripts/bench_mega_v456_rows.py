"""On-chip timing: v4/v5/v6 non-tiled decode with column vs ROW vector
packs (the scatter-DMA fix that took v7 from 2,130 to 3,666+ tok/s;
scripts/probe_layer_cost.py).

169M-class dims per arch (L=12, C=768, vocab 65536), w8a8, B=1, whole
decode chain (embed + ln0 + kernel + ln_out + int8 head) in one jitted
scan.

Usage: timeout 3000 python scripts/bench_mega_v456_rows.py
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

from rwkv_tpu.models import graph as G
from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.state import init_state
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.parity import layer_norm as p_ln

N_GEN = 256


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


def time_arch(version, ov, rows, inhead=False):
    cfg = synth_config(version, n_layer=12, n_embed=768, n_vocab=65536,
                       head_size=64)
    params_raw = synth_params(cfg, seed=0)
    srv = ServingModel((cfg, params_raw), precision="w8a8",
                       megakernel=True)
    major = cfg.version_major
    if major == 6:
        from rwkv_tpu.ops.megakernel import v6_decode_megakernel as step
        meta_keys = ("quant", "w4", "d_maa", "d_dec", "f_dim")
        skeys = ("att_xx", "ffn_xx")
    elif major == 5:
        from rwkv_tpu.ops.megakernel import v5_decode_megakernel as step
        meta_keys = ("quant", "w4", "f_dim", "has_gate")
        skeys = ("att_xx", "ffn_xx")
    else:
        from rwkv_tpu.ops.megakernel import v4_decode_megakernel as step
        meta_keys = ("quant", "w4", "f_dim")
        skeys = ("att_xx", "ffn_xx", "aa", "bb", "pp")
    pack_src = srv._mega_rows if rows else srv._mega
    if not inhead:
        pack_src = {k: v for k, v in pack_src.items()
                    if not k.startswith(("head", "ln_out"))}
    meta = {k: pack_src[k] for k in meta_keys}
    arrs = {k: v for k, v in pack_src.items() if k not in meta}

    @jax.jit
    def chain(params, pack_arrs, state, logits):
        pack = {**pack_arrs, **meta}

        def body(carry, _):
            state_t, logits = carry
            tok = jnp.argmax(logits).astype(jnp.int32)
            x0 = p_ln(params["emb"][tok].astype(jnp.float32),
                      *params["ln0"])
            if inhead:
                y, state_t, logits = step(pack, state_t, x0[:, None], cfg)
            else:
                y, state_t = step(pack, state_t, x0[:, None], cfg)
                xo = p_ln(y[:, 0], *params["ln_out"])
                logits = G.mm(xo[None, :], params["head"])[0]
            return (state_t, logits), None

        state_t = {k: state[k][0][..., None] for k in skeys}
        if major != 4:
            state_t["heads"] = jnp.swapaxes(state["heads"][0], -1, -2)
        (state_t, logits), _ = jax.lax.scan(body, (state_t, logits), None,
                                            length=N_GEN)
        return jnp.sum(logits)

    logits0 = jnp.zeros((cfg.n_vocab,), jnp.float32)
    t0 = time.perf_counter()
    out = np.asarray(chain(srv.params, arrs, srv.init_state(1), logits0))
    assert np.isfinite(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(srv.params, arrs, srv.init_state(1), logits0))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / N_GEN
    label = ("rows+inkern-head" if inhead
             else ("rows" if rows else "cols"))
    print(f"{version} {label:16s}: "
          f"{per_tok * 1e6:7.1f} us/tok  {1 / per_tok:7.0f} tok/s",
          flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ov = null_overhead()
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)
    for version in ("4.0", "5.2", "6.0"):
        for rows, inhead in ((False, False), (True, False), (True, True)):
            time_arch(version, ov, rows, inhead)


if __name__ == "__main__":
    main()
