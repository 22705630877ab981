"""Bisect the megakernel native-vs-interpret mismatch over (L, C, S).

Runs v7_decode_megakernel on the SAME random pack/state natively and in
interpret mode and reports the max errors, for a matrix of dims. The
(L=4, C=512, S=64) config passed at 2e-7 natively; (L=12, C=768, S=64)
failed at 1.7e-1 — find which dimension flips it.
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

from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import build_mega_pack, v7_decode_megakernel

CASES = [
    (6, 512, 64, True),
    (12, 512, 64, True),
    (12, 768, 64, True),
    (8, 768, 64, False),
    (12, 1024, 64, False),
    (12, 768, 64, False),
]


def run_case(L, C, S, quant):
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=256, head_size=S)
    params = synth_params(cfg, seed=0, lora_dim=64)
    pack = build_mega_pack(params, cfg, quant=quant)
    rs = np.random.RandomState(1)
    h = cfg.head_count
    state_t = {
        "att_xx": jnp.asarray(rs.randn(L, C, 1) * 0.1, jnp.float32),
        "ffn_xx": jnp.asarray(rs.randn(L, C, 1) * 0.1, jnp.float32),
        "heads": jnp.asarray(rs.randn(L, h, S, S) * 0.1, jnp.float32),
    }
    x0 = jnp.asarray(rs.randn(C, 1), jnp.float32)

    meta = {k: pack[k] for k in ("quant", "d_lora", "f_dim")}
    arrs = {k: v for k, v in pack.items() if k not in meta}

    y_n, st_n = jax.jit(
        lambda p, s, x: v7_decode_megakernel(
            {**p, **meta}, s, x, cfg, interpret=False
        )
    )(arrs, state_t, x0)
    y_i, st_i = v7_decode_megakernel(pack, state_t, x0, cfg, interpret=True)

    ey = float(np.abs(np.asarray(y_n) - np.asarray(y_i)).max())
    eh = float(
        np.abs(np.asarray(st_n["heads"]) - np.asarray(st_i["heads"])).max()
    )
    ex = float(
        np.abs(np.asarray(st_n["att_xx"]) - np.asarray(st_i["att_xx"])).max()
    )
    print(f"L={L:3d} C={C:4d} S={S:3d} H={C//S:3d} quant={int(quant)}: "
          f"y={ey:.2e} heads={eh:.2e} att_xx={ex:.2e} "
          f"{'OK' if max(ey, eh, ex) < 1e-3 else 'MISMATCH'}", flush=True)


def main():
    if "--per-layer" in sys.argv:
        per_layer(6, 512, 64, True)
        return
    for case in CASES:
        try:
            run_case(*case)
        except Exception as e:
            print(f"{case}: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()


def per_layer(L, C, S, quant):
    """Print per-layer att_xx/heads divergence for a failing config."""
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=256, head_size=S)
    params = synth_params(cfg, seed=0, lora_dim=64)
    pack = build_mega_pack(params, cfg, quant=quant)
    rs = np.random.RandomState(1)
    h = cfg.head_count
    state_t = {
        "att_xx": jnp.asarray(rs.randn(L, C, 1) * 0.1, jnp.float32),
        "ffn_xx": jnp.asarray(rs.randn(L, C, 1) * 0.1, jnp.float32),
        "heads": jnp.asarray(rs.randn(L, h, S, S) * 0.1, jnp.float32),
    }
    x0 = jnp.asarray(rs.randn(C, 1), jnp.float32)
    meta = {k: pack[k] for k in ("quant", "d_lora", "f_dim")}
    arrs = {k: v for k, v in pack.items() if k not in meta}
    y_n, st_n = jax.jit(
        lambda p, s, x: v7_decode_megakernel(
            {**p, **meta}, s, x, cfg, interpret=False
        )
    )(arrs, state_t, x0)
    y_i, st_i = v7_decode_megakernel(pack, state_t, x0, cfg, interpret=True)
    for li in range(L):
        ex = float(np.abs(np.asarray(st_n["att_xx"][li]) - np.asarray(st_i["att_xx"][li])).max())
        ef = float(np.abs(np.asarray(st_n["ffn_xx"][li]) - np.asarray(st_i["ffn_xx"][li])).max())
        eh = float(np.abs(np.asarray(st_n["heads"][li]) - np.asarray(st_i["heads"][li])).max())
        print(f"  layer {li:2d}: att_xx={ex:.2e} ffn_xx={ef:.2e} heads={eh:.2e}", flush=True)
