"""On-chip probe: lane-packed vector storage for the tiled megakernel.

The 1.5B tiled kernel OOMs scoped VMEM (161.7M / 128M) and ~70MB of that
is LANE PADDING: every [N, 1] f32 vector/scale window pads its lane dim
1 -> 128 (a [2048, 1] block is 1MB for 8KB of data, x2 buffers, x ~25
operands).  Candidate fix: store vectors [N/128, 128] (lanes full) and
`reshape(N, 1)` inside the kernel.

Mosaic relayouts of this shape class have silently miscomputed before
(module header of ops/megakernel.py), so each primitive is verified
natively with integer-exact data before use:

  p1  reshape [n/128, 128] -> [n, 1] for n in {2048, 12288, 384}
  p2  elementwise use: x[C,1] * packed_vec.reshape(C,1)
  p3  dynamic sublane slice of the reshaped column (the _wkv_tile use:
      lax.dynamic_slice((rows_lo, 0), (h4*s, 1)) with a phase-dependent
      start)

Run: timeout 1800 python scripts/probe_vec_packed.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

INTERP = jax.default_backend() != "tpu"
fails = 0


def check(name, got, want):
    global fails
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{name}: {'PASS' if ok else 'FAIL'}", flush=True)
    if not ok:
        d = np.abs(np.asarray(got) - np.asarray(want))
        print("   max diff", d.max(), "at", np.unravel_index(d.argmax(), d.shape))
        fails += 1


# ---- p1: reshape packed -> column ----------------------------------------
for n in (2048, 12288, 384):
    v = np.arange(n, dtype=np.float32)
    packed = v.reshape(n // 128, 128)

    def k1(pin, out):
        out[:] = pin[:].reshape(n, 1)

    got = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=INTERP,
    )(jnp.asarray(packed))
    check(f"p1 reshape n={n}", got, v.reshape(n, 1))


# ---- p2: elementwise multiply with a real column -------------------------
n = 2048
rng = np.random.default_rng(0)
x = rng.integers(-8, 8, size=(n, 1)).astype(np.float32)
v = rng.integers(-8, 8, size=(n,)).astype(np.float32)


def k2(xin, pin, out):
    out[:] = xin[:] * pin[:].reshape(n, 1)


got = pl.pallas_call(
    k2,
    out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    interpret=INTERP,
)(jnp.asarray(x), jnp.asarray(v.reshape(n // 128, 128)))
check("p2 multiply", got, x * v.reshape(n, 1))


# ---- p3: dynamic sublane slice of the reshaped column --------------------
# grid over 4 tiles; each tile t writes slice [t*512 : (t+1)*512] of the
# output from the packed vector (mirrors _wkv_tile's lnxw use).
n, tile = 2048, 512


def k3(pin, out):
    t = pl.program_id(0)
    col = pin[:].reshape(n, 1)
    sl = jax.lax.dynamic_slice(col, (t * tile, 0), (tile, 1))
    out[pl.dslice(t * tile, tile)] = sl * 2.0


got = pl.pallas_call(
    k3,
    grid=(4,),
    in_specs=[pl.BlockSpec((n // 128, 128), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((n, 1), lambda t: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)),
    interpret=INTERP,
)(jnp.asarray(np.arange(n, dtype=np.float32).reshape(n // 128, 128)))
check("p3 dynamic slice", got, (np.arange(n, dtype=np.float32) * 2).reshape(n, 1))

print("FAILS:", fails, flush=True)
sys.exit(1 if fails else 0)
