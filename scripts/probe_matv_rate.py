"""MXU matvec consume-rate probe: how fast does the MXU eat RESIDENT s8
weights in a [N, K] x [K, 1] matvec (no HBM streaming — the window stays
in VMEM across reps)?

This separates the two candidate walls for the w4 kernels:
  - DMA wall (~616 GB/s): halving weight bytes should halve time;
  - MXU matvec consume wall: time is per-MAC, unchanged by packing.

Variants: s8 full-K dot; two half-K dots (the w4 shape); bf16 dot.

Run on chip: timeout 900 python scripts/probe_matv_rate.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 4096, 2048
REPS = 256


def mmi(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def _xsel(x_ref, i):
    # cheap per-iteration variation (defeats loop-invariant hoisting
    # without a serial scalar dependency on the accumulator); int8 neg
    # does not legalize in Mosaic, AND masks do
    x = x_ref[...]
    return jnp.where((i & 1) == 0, x, x & jnp.int8(15))


def kern_full(w_ref, x_ref, o_ref):
    i = pl.program_id(0)
    o_ref[0] = mmi(w_ref[...], _xsel(x_ref, i))


def kern_two_half(w_ref, x_ref, o_ref):
    kh = K // 2
    i = pl.program_id(0)
    x = _xsel(x_ref, i)
    o_ref[0] = mmi(w_ref[:, :kh], x[:kh]) + mmi(w_ref[:, kh:], x[kh:])


def kern_two_half_masked(w_ref, x_ref, o_ref):
    """w4 real shape: half-size window, 2 AND masks + 2 half dots."""
    kh = K // 2
    i = pl.program_id(0)
    x = _xsel(x_ref, i)
    w = w_ref[:, :kh]
    lo_u = w & jnp.int8(15)
    hi16 = w & jnp.int8(-16)
    sx = jnp.sum(x[:kh].astype(jnp.int32))
    o_ref[0] = mmi(hi16, x[kh:]) + 16 * mmi(lo_u, x[:kh]) - 128 * sx


def kern_wide8(w_ref, x_ref, o_ref):
    """8-wide activations: is the wall the 1-wide output?"""
    i = pl.program_id(0)
    x8 = jnp.broadcast_to(_xsel(x_ref, i), (K, 8))
    o_ref[0] = mmi(w_ref[...], x8)[:, :1]


def run(kernel, w, label):
    # grid of REPS steps over the SAME resident window (constant
    # index_map: Pallas skips the refetch) — mirrors the real kernel's
    # pipelined grid instead of a serial in-kernel accumulator chain.
    f = pl.pallas_call(
        kernel,
        grid=(REPS,),
        in_specs=[
            pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((REPS, N, 1), jnp.int32),
    )
    jf = jax.jit(f)
    x = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, (K, 1)).astype(np.int8))
    _ = np.asarray(jf(w, x))
    best = 1e9
    for _i in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(jf(w, x))
        best = min(best, time.perf_counter() - t0)
    macs = N * K * REPS  # logical MACs per launch (two_half* do the same)
    per = best / REPS
    print(f"{label:16s} {per * 1e6:8.2f} us/dot  "
          f"{macs / best / 1e12:6.2f} T MAC/s  "
          f"(equiv weight-consume {macs / best / 1e9:6.1f} GB/s s8)")
    return per


def main():
    rng = np.random.default_rng(0)
    w_full = jnp.asarray(rng.integers(-127, 128, (N, K)).astype(np.int8))
    w_half = jnp.asarray(rng.integers(-127, 128, (N, K // 2)).astype(np.int8))
    print(f"resident matvec [N={N}, K={K}] x{REPS} reps,", jax.devices()[0])
    run(kern_full, w_full, "s8 full-K")
    run(kern_two_half, w_full, "s8 2x half-K")
    run(kern_two_half_masked, w_half, "w4 masked 2-dot")
    run(kern_wide8, w_full, "s8 8-wide")
    return 0


if __name__ == "__main__":
    sys.exit(main())
