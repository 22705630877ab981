"""Isolate prefill cost components: run the 12-layer stack with pieces
disabled to see what 47ms of a T=256 prefill is made of."""

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

from rwkv_tpu.models.serve import ServingModel
from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.parity import layer_norm, group_norm, l2_normalize, mm

T = 256


def timed(label, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:38s} {best * 1e3:8.2f} ms", flush=True)


def main():
    cfg = synth_config("7.0", n_layer=12, n_embed=768, n_vocab=65536, head_size=64)
    srv = ServingModel((cfg, synth_params(cfg, seed=0)), precision="bf16")
    P = srv.params
    C, H, S, L = cfg.n_embed, cfg.head_count, cfg.head_size, cfg.n_layer
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((T, 1, C)), jnp.float32)

    blocks = P["blocks"]

    # (a) matmuls only: scan over layers, 7 projections + 4 lora matmuls
    @jax.jit
    def mats_only(x):
        def body(x, layer):
            y = x
            for kk in ("att.receptance.weight", "att.key.weight", "att.value.weight",
                       "att.output.weight"):
                y = mm(y, layer[kk])
            f = mm(x, layer["ffn.key.weight"])
            y = y + mm(jnp.square(jax.nn.relu(f)), layer["ffn.value.weight"])
            lo = mm(mm(x, layer["att.w1"]), layer["att.w2"])
            lo = lo + mm(mm(x, layer["att.a1"]), layer["att.a2"])
            lo = lo + mm(mm(x, layer["att.g1"]), layer["att.g2"])
            return x + 0.001 * (y + lo), None

        x, _ = jax.lax.scan(body, x, blocks)
        return x

    timed("matmuls only (scan 12 layers)", mats_only, x0)

    # (b) + norms and elementwise mixing
    @jax.jit
    def mats_norms(x):
        def body(x, layer):
            xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
            coeff = layer["att.x_rwkvag"].reshape(6, 1, 1, C)
            xxx = xl[None] + (xl[None] * 0.5) * coeff
            y = sum(mm(xxx[i], layer[kk]) for i, kk in
                    [(0, "att.receptance.weight"), (2, "att.key.weight"),
                     (3, "att.value.weight")])
            y = group_norm(y, layer["att.ln_x.weight"], layer["att.ln_x.bias"], H, 64e-5)
            y = mm(y, layer["att.output.weight"])
            xl2 = layer_norm(x + 0.001 * y, layer["ln2.weight"], layer["ln2.bias"])
            f = mm(xl2, layer["ffn.key.weight"])
            y2 = mm(jnp.square(jax.nn.relu(f)), layer["ffn.value.weight"])
            return x + 0.001 * (y + y2), None

        x, _ = jax.lax.scan(body, x, blocks)
        return x

    timed("+ norms/shifts (no wkv)", mats_norms, x0)

    # (c) wkv chunked alone, 12 layers
    from rwkv_tpu.ops.chunked import wkv7_chunked

    r = jnp.asarray(np.random.default_rng(1).standard_normal((T, 1, H, S)), jnp.float32) * 0.3
    w = jnp.exp(jax.nn.sigmoid(r) * -0.6065)
    s0 = jnp.zeros((1, H, S, S), jnp.float32)

    @jax.jit
    def wkv_only(r, w, s0):
        def body(s, _):
            y, s = wkv7_chunked(s, r, w, r, r, -r, r, 16)
            return s, y

        s, ys = jax.lax.scan(body, s0, None, length=12)
        return ys

    timed("wkv7 chunked x12", wkv_only, r, w, s0)

    @jax.jit
    def wkv_scan_only(r, w, s0):
        from rwkv_tpu.models.graph import wkv7_scan

        def body(s, _):
            y, s = wkv7_scan(s, r, w, r, r, -r, r)
            return s, y

        s, ys = jax.lax.scan(body, s0, None, length=12)
        return ys

    timed("wkv7 scan x12", wkv_scan_only, r, w, s0)

    # (d) full prefill for reference
    prompt = list(np.arange(T) % cfg.n_vocab)
    l, _ = srv.prefill(prompt)
    _ = np.asarray(l)
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        l, _ = srv.prefill(prompt)
        _ = np.asarray(l)
        best = min(best, time.perf_counter() - t0)
    print(f"{'full prefill T=256':38s} {best * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
