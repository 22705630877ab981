"""Probe: are Mosaic lane-merge/split reshapes exact natively?

The packed batched kernel currently implements every (S_i, B) <-> lane
layout move as a dot with a 0/1 selection matrix — exact but O(B^2 s)
FLOPs, which collapses past B~8. If the straight value reshapes
(broadcast-merge [*, s_i, B] -> [*, s_i*B] and the split back) are
exact natively, they are O(1). Each pattern is checked element-wise
against numpy on random data.

Usage: timeout 1200 python scripts/probe_lane_pack.py
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

H, S, B = 12, 64, 8
SIB = S * B
C = H * S


def run_kernel(fn, out_shape, *args):
    def kernel(*refs):
        *ins, out = refs
        out[:] = fn(*[r[:] for r in ins])

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(a.shape, lambda: (0,) * a.ndim,
                               memory_space=pltpu.VMEM) for a in args],
        out_specs=pl.BlockSpec(out_shape, lambda: (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
    )(*args)


def check(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    exact = np.array_equal(got, want)
    rel = (np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
           if not exact else 0.0)
    print(f"{name:28s}: {'EXACT' if exact else f'rel {rel:.3e}'}",
          flush=True)
    return exact


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # A. broadcast-merge: [C, B] -> [h, s, 1, B] -> [h, s, s, B] ->
    #    [h, s, s*B]  (the j-operand broadcast over s_i lanes)
    x = jnp.asarray(rng.normal(size=(C, B)), jnp.float32)

    def bmerge(x):
        t = x.reshape(H, S, 1, B)
        t = jnp.broadcast_to(t, (H, S, S, B))
        return t.reshape(H, S, SIB)

    want = np.broadcast_to(
        np.asarray(x).reshape(H, S, 1, B), (H, S, S, B)
    ).reshape(H, S, SIB)
    try:
        check("A broadcast-merge j-op", run_kernel(bmerge, (H, S, SIB), x),
              want)
    except Exception as e:
        print(f"A broadcast-merge j-op       : FAILS TO LOWER "
              f"({type(e).__name__})", flush=True)

    # B. i-indexed merge: [C, B] -> [h, 1, s*B] (v operand)
    def imerge(x):
        return x.reshape(H, 1, SIB)

    want = np.asarray(x).reshape(H, 1, SIB)
    try:
        check("B flat-merge v", run_kernel(imerge, (H, 1, SIB), x), want)
    except Exception as e:
        print(f"B flat-merge v              : FAILS ({type(e).__name__})",
              flush=True)

    # C. split-reduce: [h, sib] -> [h, s, B] -> sum over s (group stats)
    y = jnp.asarray(rng.normal(size=(H, SIB)), jnp.float32)

    def splitsum(y):
        return jnp.sum(y.reshape(H, S, B), axis=1)

    want = np.asarray(y).reshape(H, S, B).sum(axis=1)
    try:
        check("C split-reduce stats", run_kernel(splitsum, (H, B), y), want)
    except Exception as e:
        print(f"C split-reduce stats        : FAILS ({type(e).__name__})",
              flush=True)

    # D. stat re-broadcast: [h, B] -> [h, sib]
    m = jnp.asarray(rng.normal(size=(H, B)), jnp.float32)

    def statb(m):
        t = jnp.broadcast_to(m.reshape(H, 1, B), (H, S, B))
        return t.reshape(H, SIB)

    want = np.broadcast_to(
        np.asarray(m).reshape(H, 1, B), (H, S, B)
    ).reshape(H, SIB)
    try:
        check("D stat re-broadcast", run_kernel(statb, (H, SIB), m), want)
    except Exception as e:
        print(f"D stat re-broadcast         : FAILS ({type(e).__name__})",
              flush=True)

    # E. unpack: [h, sib] -> [C, B] (the final xo unpack)
    def unpack(y):
        return y.reshape(H, S, B).reshape(C, B)

    want = np.asarray(y).reshape(C, B)
    try:
        check("E unpack to [C, B]", run_kernel(unpack, (C, B), y), want)
    except Exception as e:
        print(f"E unpack to [C, B]          : FAILS ({type(e).__name__})",
              flush=True)


if __name__ == "__main__":
    main()
