"""Minimal repro: sliced s8 matvec over a blocked, pipelined input.

grid=(G,); input W [G, 3C, C] int8 blocked per step; kernel computes
y[i] = W[i][C:2C] @ x (the middle sublane slice). Megakernel debugging
found this pattern silently wrong at grid steps >= 1 for (G=6, C=512).
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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(G, C, quant=True, scale=True, dims=3):
    rs = np.random.RandomState(0)
    if quant:
        w = rs.randint(-127, 128, (G, dims * C, C), dtype=np.int8)
    else:
        w = (rs.randn(G, dims * C, C) * 0.05).astype(np.float32)
    d = (rs.rand(G, dims * C, 1).astype(np.float32) + 0.5)
    x8 = rs.randint(-127, 128, (C, 1), dtype=np.int8)
    xf = rs.randn(C, 1).astype(np.float32) * 0.1

    def kern(x_ref, w_ref, d_ref, o_ref):
        wslice = w_ref[0][C:2 * C]
        acc = jax.lax.dot_general(
            wslice, x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )
        out = acc.astype(jnp.float32)
        if scale:
            out = out * d_ref[0][C:2 * C]
        o_ref[0] = out

    fn = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dims * C, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dims * C, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, C, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    x_in = jnp.asarray(x8 if quant else xf.astype(np.float32))
    out = jax.jit(fn)(
        x_in,
        jnp.asarray(w if quant else w.astype(jnp.bfloat16)),
        jnp.asarray(d),
    )
    xs = (x8 if quant else xf).astype(np.float32)
    want = np.einsum("gnk,kz->gnz", w[:, C:2 * C].astype(np.float32), xs)
    if scale:
        want = want * d[:, C:2 * C]
    got = np.asarray(out)
    per_step = [float(np.abs(got[g] - want[g]).max() /
                      (np.abs(want[g]).max() + 1e-9)) for g in range(G)]
    worst = max(per_step)
    tag = "OK" if worst < (1e-6 if quant else 2e-2) else "MISMATCH"
    print(f"G={G} C={C} quant={int(quant)} scale={int(scale)} dims={dims}: "
          f"{tag} per-step relerr {['%.1e' % e for e in per_step]}",
          flush=True)


if __name__ == "__main__":
    run(6, 512)
    run(6, 512, scale=False)
    run(4, 512)
    run(6, 768)
    run(6, 512, quant=False)
    run(2, 512)
