"""On-chip probes for the BATCHED whole-model decode kernel layout.

Design under test (batch on LANES everywhere):
  - activations [C, B] columns (C on sublanes, batch on lanes);
  - matvecs become W[N, K] @ X[K, B] — the weight stream (the measured
    ~405 GB/s s8 wall) is paid ONCE per layer regardless of B;
  - wkv7 state [H, S_i, S_j, B]: slab=(h, s_i), sublane=s_j, lane=b.
    j-indexed operands broadcast FREE over the s_i slab dim; only two
    relayouts per layer: v-unpack [h,s,B]->[h,s,1,B] and the out-pack
    reduction [h,s_i,s_j,B]->[h,s_i,B].

Round-1/2 lesson (ops/megakernel.py header): these relayouts can compile
and silently miscompute — verify each natively with integer-exact data.

Probes:
  bwkv    batched wkv7 step in the 4D layout vs per-b reference (exact).
  bmm     batched s8 matvec [N,K]@[K,B] w/ per-column activation scales:
          correctness + stream rate vs B (expect flat in B).
  Run: timeout 1800 python scripts/probe_mega_batched.py [probe ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, S = 12, 64
C = H * S


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def report(name, ok, extra=""):
    print(f"[{name}] {'PASS' if ok else 'FAIL'} {extra}", flush=True)


def ints(rng, shape, lo=-3, hi=4):
    return rng.integers(lo, hi, size=shape).astype(np.float32)


# ------------------------------------------------------------------ bwkv
def probe_bwkv(B=8):
    """One wkv7 step, state [H, S_i, S_j, B], all operands integer-valued
    so native-vs-reference must agree EXACTLY."""
    rng = np.random.default_rng(0)
    st0 = ints(rng, (H, S, S, B))          # [h, i, j, b]
    r = ints(rng, (H, S, B))               # j-indexed
    w = ints(rng, (H, S, B), 1, 3)         # decay (keep >0)
    k = ints(rng, (H, S, B))
    v = ints(rng, (H, S, B))               # i-indexed
    a = ints(rng, (H, S, B))
    b_ = ints(rng, (H, S, B))

    def kern(st_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
             st_out, y_out):
        st = st_ref[:]                      # [h, s_i, s_j, B]
        r4 = r_ref[:][:, None, :, :]        # [h, 1, s_j, B] (free)
        w4 = w_ref[:][:, None, :, :]
        k4 = k_ref[:][:, None, :, :]
        a4 = a_ref[:][:, None, :, :]
        b4 = b_ref[:][:, None, :, :]
        v4 = v_ref[:][:, :, None, :]        # [h, s_i, 1, B] (the unpack)
        sa = jnp.sum(st * a4, axis=2, keepdims=True)   # [h, s_i, 1, B]
        st = st * w4 + k4 * v4 + b4 * sa
        y = jnp.sum(st * r4, axis=2)        # [h, s_i, B] (the out-pack)
        st_out[:] = st
        y_out[:] = y.reshape(C, B)

    st_n, y_n = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((H, S, S, B), jnp.float32),
            jax.ShapeDtypeStruct((C, B), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*map(jnp.asarray, (st0, r, w, k, v, a, b_)))
    st_n, y_n = np.asarray(st_n), np.asarray(y_n)

    # reference: per (h, b) scalar formulas, numpy
    st_ref = np.empty_like(st0)
    y_ref = np.empty((C, B), np.float32)
    for h in range(H):
        for bb in range(B):
            Sm = st0[h, :, :, bb]                     # [i, j]
            sa = Sm @ a[h, :, bb]                     # [i]
            Sm2 = (Sm * w[h, None, :, bb]
                   + np.outer(v[h, :, bb], k[h, :, bb])
                   + np.outer(sa, b_[h, :, bb]))
            st_ref[h, :, :, bb] = Sm2
            y_ref[h * S:(h + 1) * S, bb] = Sm2 @ r[h, :, bb]
    ok = np.array_equal(st_n, st_ref) and np.array_equal(y_n, y_ref)
    if not ok:
        ds = np.abs(st_n - st_ref)
        dy = np.abs(y_n - y_ref)
        report("bwkv", False,
               f"B={B} max|dS|={ds.max()} at {np.unravel_index(ds.argmax(), ds.shape)}"
               f" max|dy|={dy.max()}")
    else:
        report("bwkv", True, f"B={B} exact (state+out)")
    return ok


# ------------------------------------------------------------------ bmm
def probe_bmm(N=4096, K=4096, bs=(1, 8, 32, 64), layers=24):
    """Streamed s8 matmul W[N,K] @ X[K,B] with per-column activation
    scales and per-row weight scales, grid over `layers` stacked weight
    blocks (the megakernel pipeline shape). Correctness exact (integer
    codes), timing per B."""
    rng = np.random.default_rng(1)
    Wq = rng.integers(-127, 128, size=(layers, N, K)).astype(np.int8)
    Wd = (rng.random((layers, N, 1)).astype(np.float32) + 0.5) / 127.0

    results = {}
    for B in bs:
        # full-range integer codes with amax pinned to 127 per column so
        # dx == 1.0 and quantization is the identity — the int32 dots are
        # then integer-exact and native MUST match numpy bit-for-bit
        # (avoids the .5-boundary activation-flip noise, see
        # ops/megakernel.py header).
        X = rng.integers(-127, 128, size=(K, B)).astype(np.float32)
        X[0, :] = 127.0

        def kern(x_ref, w_ref, d_ref, o_ref, acc):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            x = x_ref[:]
            amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)   # [1, B]
            dx = amax / 127.0
            inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
            x8 = jnp.clip(jnp.rint(x * inv), -127., 127.).astype(jnp.int8)
            p = jax.lax.dot_general(
                w_ref[0], x8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc[:] += p.astype(jnp.float32) * dx * d_ref[0]

            @pl.when(i == layers - 1)
            def _():
                o_ref[:] = acc[:]

        f = pl.pallas_call(
            kern,
            grid=(layers,),
            in_specs=[
                pl.BlockSpec((K, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, B), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
            scratch_shapes=[pltpu.VMEM((N, B), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        Wqj, Wdj, Xj = jnp.asarray(Wq), jnp.asarray(Wd), jnp.asarray(X)
        out = jax.jit(f)(Xj, Wqj, Wdj)
        # reference (integer-exact: X codes == X since |X|<=8 ints; but
        # per-column scale rounds — replicate exactly in numpy)
        amax = np.abs(X).max(axis=0, keepdims=True)
        dx = amax / 127.0
        inv = np.where(dx > 0, 1.0 / np.maximum(dx, 1e-30), 0.0)
        X8 = np.clip(np.rint(X * inv), -127, 127).astype(np.int32)
        ref = np.zeros((N, B), np.float32)
        for l in range(layers):
            p = Wq[l].astype(np.int32) @ X8
            ref += p.astype(np.float32) * dx * Wd[l]
        got = np.asarray(out)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        ok = bool(err < 1e-5)
        # timing: long on-device chain with a data dependency between
        # reps (defeats loop-invariant hoisting), null round-trip
        # subtracted
        reps = 50

        @jax.jit
        def chain(x, wq, wd):
            def rep(i, x):
                y = f(x, wq, wd)
                return y[:K] * 1e-6 + x
            return jax.lax.fori_loop(0, reps, rep, x)

        sync(chain(Xj, Wqj, Wdj))
        null = _null_overhead()
        t0 = time.perf_counter()
        sync(chain(Xj, Wqj, Wdj))
        dt = (time.perf_counter() - t0 - null) / reps
        gb = layers * N * K / 1e9
        results[B] = (ok, dt, gb / dt)
        report("bmm", ok,
               f"B={B} {dt*1e3:.3f} ms  {gb/dt:.0f} GB/s weight-stream"
               f"  err={err:.2e}")
    flat = results[bs[-1]][1] / results[bs[0]][1]
    report("bmm-scaling", flat < 1.35,
           f"t(B={bs[-1]})/t(B={bs[0]}) = {flat:.2f} (want ~1)")
    return all(r[0] for r in results.values())


# ---------------------------------------------------------------- tiles
def probe_tiles(N=4096, K=4096, B=8, layers=24):
    """Stream rate vs output-tile height: grid (layers, N/TO) with
    [TO, K] weight blocks. Round-1's probe used TO=512 and concluded a
    ~405 GB/s 's8 matvec wall'; whole-matrix blocks measured ~660 —
    quantify the tile-size dependence to pick the megakernel's shape."""
    rng = np.random.default_rng(2)
    Wq = rng.integers(-127, 128, size=(layers, N, K)).astype(np.int8)
    X = rng.integers(-127, 128, size=(K, B)).astype(np.float32)
    Wqj, Xj = jnp.asarray(Wq), jnp.asarray(X)
    for TO in (512, 1024, 2048, 4096):
        def kern(x_ref, w_ref, o_ref):
            x8 = x_ref[:].astype(jnp.int8)
            p = jax.lax.dot_general(
                w_ref[0], x8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = p.astype(jnp.float32)

        f = pl.pallas_call(
            kern,
            grid=(layers, N // TO),
            in_specs=[
                pl.BlockSpec((K, B), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TO, K), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TO, B), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        reps = 50

        @jax.jit
        def chain(x, wq):
            def rep(i, x):
                y = f(x, wq)
                return y[:K] * 1e-6 + x
            return jax.lax.fori_loop(0, reps, rep, x)

        sync(chain(Xj, Wqj))
        null = _null_overhead()
        t0 = time.perf_counter()
        sync(chain(Xj, Wqj))
        dt = (time.perf_counter() - t0 - null) / reps
        gb = layers * N * K / 1e9
        report("tiles", True, f"TO={TO} {dt*1e3:.3f} ms  {gb/dt:.0f} GB/s")
    return True


def _null_overhead():
    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    np.asarray(probe(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        best = min(best, time.perf_counter() - t0)
    return best


PROBES = {"bwkv": probe_bwkv, "bmm": probe_bmm, "tiles": probe_tiles}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print("backend:", jax.default_backend(), flush=True)
    ok = True
    for n in names:
        try:
            ok &= bool(PROBES[n]())
        except Exception as e:
            report(n, False, f"EXC {type(e).__name__}: {e}")
            ok = False
    sys.exit(0 if ok else 1)
