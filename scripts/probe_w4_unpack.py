"""Probe: int8-native nibble unpack vs the int32 unpack (w4a8 matvec).

The round-3 w4a8 kernels unpack split-half nibble pairs in int32
(megakernel.py::_nibble_halves) — ~8 VPU ops per element at 4-byte
register width. At 1.5B that is ~3.2G int32 vector ops per token,
which makes the w4 path compute-bound (312 GB/s effective vs 543 for
w8a8, docs/STATUS.md) instead of cashing in the halved DMA.

Candidate: BIASED-LO packing — byte = (hi << 4) | ((lo + 8) & 0xF).
Unpack with two int8 ops:
    lo_u = w & 15            # in [0, 15]  (int8 bitwise and)
    hi16 = w - lo_u          # = 16*hi exactly (two's complement wrap)
and fold the corrections into the accumulate:
    acc  = mm(hi16, x_hi) + 16*mm(lo_u, x_lo) - 128*sum(x_lo)
    out  = acc * (d * dx / 16)
(The /16 folds into the row-scale multiply; sum(x_lo) is one scalar
per activation column.)

Checks on chip: (1) Mosaic legalizes int8 & / - inside a kernel;
(2) bit-exactness vs the reference integer math; (3) wall-clock of a
many-tile matvec stream, old vs new unpack, vs a pure-s8 (w8) stream.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K = 2048, 2048          # one weight tile [N, K] int4 -> [N, K/2] bytes
L = 64                     # tiles (simulated layer stream)
KH = K // 2


def pack_old(codes):
    """Split-half two's-complement packing (round-3 layout)."""
    lo = codes[..., :KH].astype(np.int32)
    hi = codes[..., KH:].astype(np.int32)
    return (((hi & 0xF) << 4) | (lo & 0xF)).astype(np.int8)


def pack_biased(codes):
    """Split-half BIASED-LO packing: low nibble stores lo+8 in [1, 15]."""
    lo = codes[..., :KH].astype(np.int32) + 8
    hi = codes[..., KH:].astype(np.int32)
    return (((hi & 0xF) << 4) | (lo & 0xF)).astype(np.int8)


def kernel_old(w_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    q32 = w_ref[0].astype(jnp.int32)
    lo_u = q32 & 0xF
    lo = (lo_u - ((lo_u & 0x8) << 1)).astype(jnp.int8)
    hi = (q32 >> 4).astype(jnp.int8)
    x = x_ref[...]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    acc = mm(lo, x[:KH]) + mm(hi, x[KH:])
    o_ref[...] += acc.astype(jnp.float32)


def kernel_new(w_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    w = w_ref[0]
    lo_u = w & jnp.int8(15)          # int8 bitwise and: lo + 8 in [1, 15]
    hi16 = w & jnp.int8(-16)         # 0xF0 mask == 16*hi in two's compl.
    # (int8 subtract does NOT legalize in Mosaic; the masks both do)
    x = x_ref[...]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    sx = jnp.sum(x[:KH].astype(jnp.int32))
    acc16 = mm(hi16, x[KH:]) + 16 * mm(lo_u, x[:KH]) - 128 * sx
    o_ref[...] += acc16.astype(jnp.float32) * jnp.float32(1.0 / 16.0)


def kernel_s8(w_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    o_ref[...] += mm(w_ref[0], x[:KH]).astype(jnp.float32)


def run(kernel, w_stream, x, label):
    f = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, N, w_stream.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
    )

    g = jax.jit(lambda w3, xx: f(w3, xx))
    out = np.asarray(g(w_stream, x))  # correctness sample + compile

    # Chained timing (the repo's probe methodology): reps of the full
    # L-tile stream inside ONE jit, output feeding the next rep's input
    # so nothing dedupes or overlaps across reps.
    reps = 30

    @jax.jit
    def chain(w3, xx):
        def rep(i, carry):
            xx, acc = carry
            y = f(w3, xx)
            x2 = jnp.clip(y[:K] * 1e-6, -100.0, 100.0).astype(jnp.int8)
            return xx, acc + jnp.sum(y)

        _, acc = jax.lax.fori_loop(0, reps, rep, (xx, jnp.float32(0.0)))
        return acc

    float(chain(w_stream, x))  # compile + warm
    t0 = time.perf_counter()
    float(chain(w_stream, x))
    dt = (time.perf_counter() - t0) / reps
    gb = w_stream.nbytes / 1e9
    print(f"{label:18s} {dt*1e6:9.1f} us  {gb/dt:7.1f} GB/s "
          f"({w_stream.nbytes/1e6:.1f} MB stream)")
    return out


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(-7, 8, size=(L, N, K)).astype(np.int8)
    x8 = rng.integers(-127, 128, size=(K, 1)).astype(np.int8)

    # integer reference: sum over layers of full-K dot
    ref = np.zeros((N, 1), np.float64)
    for i in range(L):
        ref += codes[i].astype(np.int64) @ x8.astype(np.int64)

    w_old = jnp.asarray(np.stack([pack_old(codes[i]) for i in range(L)]))
    w_new = jnp.asarray(np.stack([pack_biased(codes[i]) for i in range(L)]))
    w_s8 = jnp.asarray(codes[:, :, :KH])   # same byte count as packed
    xj = jnp.asarray(x8)

    print(f"tile [N={N}, K={K}] int4, {L} tiles")
    o_old = run(kernel_old, w_old, xj, "old int32 unpack")
    o_new = run(kernel_new, w_new, xj, "new int8 unpack")
    o_s8 = run(kernel_s8, w_s8, xj, "pure s8 (floor)")

    err_old = np.abs(o_old.astype(np.float64) - ref).max()
    err_new = np.abs(o_new.astype(np.float64) - ref).max()
    print(f"max |err| old={err_old:g} new={err_new:g}")
    ok = err_old == 0.0 and err_new == 0.0
    print("EXACT" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
