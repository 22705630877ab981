"""Probe: can Mosaic serve the w4 stream as NATIVE jnp.int4 (hardware
nibble unpack), and what does it cost vs the biased-lo AND-mask scheme?

Variants (same [N, K] int4 logical weights, L tiles streamed):
  s8-full   [N, K]   int8 codes             (w8a8 stream, 2x bytes)
  w4-mask   [N, K/2] packed biased-lo bytes (round-4 scheme: 2 AND masks)
  w4-s4     [N, K]   jnp.int4 ref           (Mosaic native s4, K bytes/2)

If w4-s4 compiles + matches, the unpack moves from the VPU to the memory
path and the mask cost disappears.  Exactness is integer-exact (int dots).

Run on chip: timeout 1200 python scripts/probe_w4_int4.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 2048, 2048
L = 64
KH = K // 2


def mmi(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def kern_s8(w_ref, x_ref, o_ref):
    o_ref[0] = mmi(w_ref[0], x_ref[...][: w_ref.shape[2]])


def kern_w4_mask(w_ref, x_ref, o_ref):
    w = w_ref[0]
    x8 = x_ref[...]
    lo_u = w & jnp.int8(15)
    hi16 = w & jnp.int8(-16)
    sx = jnp.sum(x8[:KH].astype(jnp.int32))
    acc16 = mmi(hi16, x8[KH:]) + 16 * mmi(lo_u, x8[:KH]) - 128 * sx
    o_ref[0] = acc16  # caller folds /16 into scales


def kern_w4_s4(w_ref, x_ref, o_ref):
    w = w_ref[0].astype(jnp.int8)   # s4 -> s8 upcast (hw unpack)
    o_ref[0] = 16 * mmi(w, x_ref[...])


def run(kernel, w_stream, label, scale=1):
    shape = w_stream.shape[1:]
    f = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N, 1), jnp.int32),
    )
    reps = 30

    @jax.jit
    def chain(w3, xx):
        def rep(i, acc):
            y = f(w3, xx + (acc % 2).astype(jnp.int8) - (acc % 2).astype(jnp.int8))
            return acc + y[0, 0, 0]

        return jax.lax.fori_loop(0, reps, rep, jnp.int32(0))

    x = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, (K, 1)).astype(np.int8))
    first = int(chain(w_stream, x))
    t0 = time.perf_counter()
    _ = int(chain(w_stream, x))
    dt = (time.perf_counter() - t0) / reps
    nbytes = int(np.prod(w_stream.shape)) * (
        1 if w_stream.dtype != jnp.int4 else 0.5)
    print(f"{label:10s} {dt*1e6:9.1f} us  {nbytes/1e9/dt:7.1f} GB/s "
          f"({nbytes/1e6:.1f} MB stream)  out0/16={first/16:.0f}")
    return dt, first


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(-7, 8, size=(L, N, K)).astype(np.int8)
    lo = codes[..., :KH].astype(np.int32)
    hi = codes[..., KH:].astype(np.int32)
    w_mask = jnp.asarray(
        (((hi & 0xF) << 4) | ((lo + 8) & 0xF)).astype(np.int8))
    w_full = jnp.asarray(codes)
    x = np.random.default_rng(1).integers(-127, 128, (K, 1)).astype(np.int8)

    # exactness target: plain integer dot
    want = codes[0].astype(np.int64) @ x.astype(np.int64)

    print(f"tile [N={N}, K={K}] int4, {L} tiles,", jax.devices()[0])
    reps = 30
    t_full, a_full = run(kern_s8, w_full, "s8-full")
    assert a_full == reps * int(want[0, 0]), (a_full, want[0, 0])
    t_mask, a_mask = run(kern_w4_mask, w_mask, "w4-mask")
    assert a_mask == reps * 16 * int(want[0, 0]), (a_mask, want[0, 0])
    try:
        w_s4 = jnp.asarray(codes, jnp.int4)
        t_s4, a_s4 = run(kern_w4_s4, w_s4, "w4-s4")
        ok = a_s4 == reps * 16 * int(want[0, 0])
        print(f"w4-s4 exact: {ok}   mask/s4 speed ratio: {t_mask/t_s4:.2f}x")
    except Exception as e:  # noqa: BLE001
        print(f"w4-s4 FAILED to lower/run: {type(e).__name__}: "
              f"{str(e)[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
