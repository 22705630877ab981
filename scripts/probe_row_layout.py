"""On-chip probes: row-layout alternatives for the tiled megakernel's
[N, 1] lane-padding problem (~70MB of the 1.5B kernel's VMEM is padding;
the packed [N/128, 128] -> [N, 1] reshape is rejected by Mosaic).

  pA  transpose [1, n] -> [n, 1] (row-stored vector to column) — the
      adjacent relayout (transpose THEN sublane-split) silently
      miscomputed in round 1, so this must be verified exactly.
  pB  row matvec: y[1, N] = dot(x8[1, C], W[N, C] contracting C-with-C)
      — if correct, activations/scales/vectors can all live as rows and
      the column layout disappears entirely (except the wkv head ops).
  pC  row matvec stream rate at 1.5B-layer size vs the column matvec.

Run: timeout 1800 python scripts/probe_row_layout.py
"""

import os
import sys
import time

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
        d = np.abs(np.asarray(got).astype(np.float64)
                   - np.asarray(want).astype(np.float64))
        print("   max diff", d.max())
        fails += 1


# ---- pA: row -> column transpose -----------------------------------------
for n in (2048, 384):
    v = np.arange(n, dtype=np.float32)

    def kA(pin, out):
        out[:] = pin[:].T

    got = pl.pallas_call(
        kA,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=INTERP,
    )(jnp.asarray(v.reshape(1, n)))
    check(f"pA transpose n={n}", got, v.reshape(n, 1))


# ---- pB: row matvec correctness (integer-exact) --------------------------
N, C = 2048, 2048
rng = np.random.default_rng(0)
W = rng.integers(-127, 128, size=(N, C)).astype(np.int8)
x8 = rng.integers(-127, 128, size=(1, C)).astype(np.int8)


def kB(w_ref, x_ref, out):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out[:] = acc


got = pl.pallas_call(
    kB,
    out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
    interpret=INTERP,
)(jnp.asarray(W), jnp.asarray(x8))
want = (x8.astype(np.int64) @ W.astype(np.int64).T).astype(np.int32)
check("pB row matvec", got, want)


# ---- pC: stream rate, row vs column matvec over a big stacked mat --------
if not INTERP:
    L, N, C = 24, 8192, 2048   # fk-sized: 16.8MB/layer int8
    Wb = jnp.asarray(
        rng.integers(-127, 128, size=(L, N, C), dtype=np.int64), jnp.int8
    )

    def bench(kind):
        if kind == "row":
            x = jnp.asarray(rng.integers(-127, 128, (1, C)), jnp.int8)

            def kern(w_ref, x_ref, out):
                acc = jax.lax.dot_general(
                    x_ref[:], w_ref[0],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out[0] = acc

            out_shape = jax.ShapeDtypeStruct((L, 1, N), jnp.int32)
            out_spec = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            x_spec = pl.BlockSpec((1, C), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            x = jnp.asarray(rng.integers(-127, 128, (C, 1)), jnp.int8)

            def kern(w_ref, x_ref, out):
                acc = jax.lax.dot_general(
                    w_ref[0], x_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                out[0] = acc

            out_shape = jax.ShapeDtypeStruct((L, N, 1), jnp.int32)
            out_spec = pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
            x_spec = pl.BlockSpec((C, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

        run = pl.pallas_call(
            kern,
            grid=(L,),
            in_specs=[
                pl.BlockSpec((1, N, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                x_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )
        f = jax.jit(lambda W, x: jnp.sum(run(W, x)))
        np.asarray(f(Wb, x))
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            o = f(Wb, x)
        np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        gbps = Wb.nbytes / dt / 1e9
        print(f"pC {kind}: {dt*1e3:.3f} ms  {gbps:.0f} GB/s", flush=True)

    bench("col")
    bench("row")


# ---- pD: transpose then DYNAMIC sublane slice (grid-phase dependent) -----
# _wkv_tile reads lnxw rows [t*h4*s : (t+1)*h4*s] with t = program_id-based;
# with row storage this becomes dynamic_slice of the transposed column.
n, tile = 2048, 512
v = np.arange(n, dtype=np.float32)


def kD(pin, out):
    t = pl.program_id(0)
    col = pin[:].T                                  # [1, n] -> [n, 1]
    sl = jax.lax.dynamic_slice(col, (t * tile, 0), (tile, 1))
    out[pl.dslice(t * tile, tile)] = sl * 3.0


gotD = pl.pallas_call(
    kD,
    grid=(4,),
    in_specs=[pl.BlockSpec((1, n), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((n, 1), lambda t: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)),
    interpret=INTERP,
)(jnp.asarray(v.reshape(1, n)))
check("pD transpose+dynslice", gotD, (v * 3).reshape(n, 1))

print("FAILS after pD:", fails, flush=True)
sys.exit(1 if fails else 0)
