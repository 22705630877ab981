"""Hardware probes for the round-2 whole-layer decode kernel design.

Round-1 lesson (docs/STATUS.md, ops/megakernel.py header): Mosaic layout
tricks can compile cleanly and SILENTLY miscompute — every primitive the
new kernel relies on must be numerics-verified on the real chip first.

Probes (each independent, PASS/FAIL):
  1. vmem:     how much VMEM scratch a kernel may allocate (bisect).
  2. split:    sublane split of a column vector [C, 1] -> [H, S, 1].
  3. lane1:    static size-1 lane slice consts[:, m:m+1] from [C, M].
  4. eye:      col->row relayout via multiply-by-identity + reduce.
  5. bdot:     batched dot_general [H,S,S] x [H,S,1] (batch dim H).
  6. wkv7:     full wkv7 single step in transposed col layout vs scan.
  7. matvec:   streamed int8 matvec W[out,in] @ x[in,1] w/ row scales,
               auto-pipelined grid, correctness + bandwidth.
  8. dma:      same but hand-DMA from ANY memory space, double buffered.

Run:  timeout 1800 python scripts/probe_megakernel2.py [probe ...]
"""

import os
import sys
import time
from functools import partial

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

C, H, S = 2048, 32, 64
F = 8192


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


def report(name, ok, extra=""):
    print(f"[{name}] {'PASS' if ok else 'FAIL'} {extra}", flush=True)


# --------------------------------------------------------------- 1. vmem
def probe_vmem():
    def try_mb(mb):
        n = mb * 1024 * 1024 // 4 // 1024  # rows of [1024] f32

        def kern(o_ref, scratch):
            scratch[0:8, 0:128] = jnp.ones((8, 128), jnp.float32)
            scratch[n - 8 : n, 0:128] = jnp.full((8, 128), 2.0, jnp.float32)
            o_ref[:] = scratch[0:8, 0:128] + scratch[n - 8 : n, 0:128]

        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((n, 1024), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=mb * 1024 * 1024 + (1 << 20)
                ),
            )()
            return abs(sync(out) - 3.0 * 8 * 128) < 1e-3
        except Exception as e:
            print(f"  vmem {mb}MB: {type(e).__name__}: {str(e)[:120]}")
            return False

    ok_mb = 0
    for mb in (16, 32, 48, 64, 96, 110, 120, 128):
        if try_mb(mb):
            ok_mb = mb
            print(f"  vmem {mb}MB ok", flush=True)
        else:
            break
    report("vmem", ok_mb >= 16, f"max_ok={ok_mb}MB")


# -------------------------------------------------------------- 1b. merge
def probe_merge():
    """[H, S, 1] -> [C, 1] sublane merge (the inverse of `split`)."""
    v = jnp.asarray(np.random.RandomState(9).randn(H, S, 1), jnp.float32)

    def kern(v_ref, o_ref):
        o_ref[:] = v_ref[:].reshape(C, 1) * 2.0

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v)
    want = np.asarray(v).reshape(C, 1) * 2.0
    err = float(np.abs(np.asarray(out) - want).max())
    report("merge", err == 0.0, f"err={err}")


# ------------------------------------------------------------ 1c. onehot
def probe_onehot():
    """Extract column m of [C, M] as a [C, 1] col via one-hot multiply +
    lane reduction (the size-1 lane slice alternative); verify + time."""
    m = 24
    consts = jnp.asarray(np.random.RandomState(10).randn(C, m), jnp.float32)

    def kern(c_ref, o_ref):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        acc = jnp.zeros((C, 1), jnp.float32)
        for i in range(m):
            sel = (lanes == i).astype(jnp.float32)
            col = jnp.sum(c_ref[:] * sel, axis=1, keepdims=True)
            acc = acc + col * jnp.float32(i + 1)
        o_ref[:] = acc

    fn = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = fn(consts)
    want = (np.asarray(consts) * (np.arange(m) + 1.0)).sum(-1, keepdims=True)
    err = float(np.abs(np.asarray(out) - want).max())

    @jax.jit
    def reps(c):
        def body(i, acc):
            return acc + jnp.sum(fn(c + acc * 1e-30))
        return jax.lax.fori_loop(0, 100, body, jnp.float32(0.0))

    sync(reps(consts))
    null = _null_overhead()
    t0 = time.perf_counter()
    sync(reps(consts))
    dt = (time.perf_counter() - t0 - null) / 100 / m
    report("onehot", err < 1e-3, f"err={err} per-extract={dt*1e6:.2f}us")


# -------------------------------------------------------------- 2. split
def probe_split():
    x = jnp.asarray(np.random.RandomState(0).randn(C, 1), jnp.float32)

    def kern(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(H, S, 1) * 2.0

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, S, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = np.asarray(x).reshape(H, S, 1) * 2.0
    err = float(np.abs(np.asarray(out) - want).max())
    report("split", err == 0.0, f"err={err}")


# -------------------------------------------------------------- 3. lane1
def probe_lane1():
    m = 24
    consts = jnp.asarray(np.random.RandomState(1).randn(C, m), jnp.float32)

    def kern(c_ref, o_ref):
        acc = c_ref[:, 0:1] * 0.0
        for i in range(m):
            acc = acc + c_ref[:, i : i + 1] * jnp.float32(i + 1)
        o_ref[:] = acc

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(consts)
    want = (np.asarray(consts) * (np.arange(m) + 1.0)).sum(-1, keepdims=True)
    err = float(np.abs(np.asarray(out) - want).max())
    report("lane1", err < 1e-4, f"err={err}")


# ---------------------------------------------------------------- 4. eye
def probe_eye():
    v = jnp.asarray(np.random.RandomState(2).randn(H, S, 1), jnp.float32)

    def kern(v_ref, o_ref):
        i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        eye = (i == j).astype(jnp.float32)
        # col [H, S, 1] -> row [H, 1, S]: sum_i eye[i, j] * v[h, i]
        o_ref[:] = jnp.sum(v_ref[:] * eye[None, :, :], axis=1, keepdims=True)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((H, 1, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(v)
    want = np.swapaxes(np.asarray(v), 1, 2)
    err = float(np.abs(np.asarray(out) - want).max())
    report("eye", err == 0.0, f"err={err}")


# --------------------------------------------------------------- 5. bdot
def probe_bdot():
    rs = np.random.RandomState(3)
    st = jnp.asarray(rs.randn(H, S, S), jnp.float32)
    a = jnp.asarray(rs.randn(H, S, 1), jnp.float32)

    def kern(s_ref, a_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            s_ref[:], a_ref[:],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, S_i, 1]

    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((H, S, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(st, a)
        want = np.einsum("hji,hjx->hix", np.asarray(st), np.asarray(a))
        err = float(np.abs(np.asarray(out) - want).max())
        report("bdot", err < 1e-3, f"err={err}")
    except Exception as e:
        report("bdot", False, f"{type(e).__name__}: {str(e)[:150]}")


# --------------------------------------------------------------- 6. wkv7
def wkv7_col_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, st_ref,
                    o_ref, new_st_ref):
    """One wkv7 step, transposed layout. Inputs r/w/k/v/a/b: [C, 1] col.
    State st: [H, S_j, S_i] (TRANSPOSED vs parity layout: j = key dim on
    sublanes, i = value dim on lanes). Outputs: out col [C, 1], new state.
    """
    def col3(ref):
        return ref[:].reshape(H, S, 1)

    r, w, k, a, b = col3(r_ref), col3(w_ref), col3(k_ref), col3(a_ref), col3(b_ref)
    v = col3(v_ref)
    i_ = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_ = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    eye = (i_ == j_).astype(jnp.float32)[None]

    st = st_ref[:]
    # sa[h, i] = sum_j a[h, j] * st[h, j, i]  -> row layout [H, 1, S_i]
    sa_row = jnp.sum(st * a, axis=1, keepdims=True)
    v_row = jnp.sum(v * eye, axis=1, keepdims=True)  # col -> row
    st = st * w + k * v_row + b * sa_row
    out_row = jnp.sum(st * r, axis=1, keepdims=True)  # [H, 1, S_i]
    out_col = jnp.sum(out_row * eye, axis=2, keepdims=True)  # row -> col
    o_ref[:] = out_col.reshape(C, 1)
    new_st_ref[:] = st


def probe_wkv7():
    rs = np.random.RandomState(4)
    ops = {n: rs.randn(C, 1).astype(np.float32) * 0.3 for n in "rwkvab"}
    st0 = rs.randn(H, S, S).astype(np.float32) * 0.3

    out, new_st = pl.pallas_call(
        wkv7_col_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, S, S), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
    )(*[jnp.asarray(ops[n]) for n in "rwkvab"],
      jnp.asarray(np.swapaxes(st0, 1, 2)))  # parity [H,i,j] -> [H,j,i]

    # Reference: wkv7 scan semantics (graph.wkv7_scan, state [H, i, j])
    def ref():
        s = st0.copy()
        r, w, k, v, a, b = (ops[n].reshape(H, S) for n in "rwkvab")
        sa = np.einsum("hij,hj->hi", s, a)
        s = s * w[:, None, :] + v[:, :, None] * k[:, None, :] + sa[:, :, None] * b[:, None, :]
        y = np.einsum("hij,hj->hi", s, r)
        return y.reshape(C, 1), s

    want_y, want_s = ref()
    err_y = float(np.abs(np.asarray(out) - want_y).max())
    err_s = float(np.abs(np.swapaxes(np.asarray(new_st), 1, 2) - want_s).max())
    report("wkv7", err_y < 1e-4 and err_s < 1e-4, f"err_y={err_y} err_s={err_s}")


# ------------------------------------------------------------- 7. matvec
def probe_matvec():
    """Streamed q8-row matvec in col orientation, auto-pipelined grid.
    W int8 [OUT, K] tiles [TO, K]; x [K, 1] col; scales folded per tile via
    d stored [n_tiles, TO] -> passed as [OUT, 1]? -> probe the simplest:
    d as f32 [OUT, 1] col input blocked [TO, 1]."""
    OUT, K, TO = F, C, 512
    rs = np.random.RandomState(5)
    wq = rs.randint(-127, 128, (OUT, K), dtype=np.int8)
    d = (rs.rand(OUT, 1).astype(np.float32) + 0.5) / 127.0
    x = rs.randn(K, 1).astype(np.float32) * 0.1

    def kern(x_ref, q_ref, d_ref, o_ref):
        wt = q_ref[:].astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            wt, x_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = acc * d_ref[:]

    fn = pl.pallas_call(
        kern,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
    )
    jit_fn = jax.jit(lambda xx, qq, dd: fn(xx, qq, dd))
    out = jit_fn(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(d))
    want = (wq.astype(np.float32) @ x) * d
    err = float(np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9))
    ok = err < 2e-2  # bf16 conversion of codes is exact; x bf16 rounds

    # bandwidth: loop the matvec over fresh weight "layers"
    L = 24
    wbig = jnp.asarray(
        rs.randint(-127, 128, (L, OUT, K), dtype=np.int8)
    )
    dbig = jnp.asarray((rs.rand(L, OUT, 1).astype(np.float32) + 0.5) / 127.0)

    reps = 50

    @jax.jit
    def chain(x, wbig, dbig):
        def layer(x, inp):
            q, dd = inp
            y = fn(x, q, dd)
            return y[:K] * 1e-3, jnp.sum(y)

        def rep(i, carry):
            x, acc = carry
            x2, ys = jax.lax.scan(layer, x, (wbig, dbig))
            return x2, acc + jnp.sum(ys)

        _, acc = jax.lax.fori_loop(0, reps, rep, (x, jnp.float32(0.0)))
        return acc

    xj = jnp.asarray(x)
    sync(chain(xj, wbig, dbig))
    null = _null_overhead()
    t0 = time.perf_counter()
    s = sync(chain(xj, wbig, dbig))
    dt = (time.perf_counter() - t0 - null) / reps
    gb = L * OUT * K / 1e9
    report("matvec", ok, f"relerr={err:.2e} bw={gb/dt:.0f}GB/s t={dt*1e3:.2f}ms")


def _null_overhead():
    @jax.jit
    def probe(x):
        return x * 1.000001

    x = jnp.ones((8,), jnp.float32)
    np.asarray(probe(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(x))
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------- 8. dma
def probe_dma():
    """Hand-DMA double-buffered matvec: W stays in HBM (ANY), kernel DMAs
    [TO, K] int8 tiles; grid-free single program."""
    OUT, K, TO = F, C, 512
    NT = OUT // TO
    rs = np.random.RandomState(6)
    wq = rs.randint(-127, 128, (OUT, K), dtype=np.int8)
    d = (rs.rand(OUT, 1).astype(np.float32) + 0.5) / 127.0
    x = rs.randn(K, 1).astype(np.float32) * 0.1

    def kern(x_ref, q_hbm, d_ref, o_ref, buf, sem):
        def get(slot, t):
            return pltpu.make_async_copy(
                q_hbm.at[pl.ds(t * TO, TO), :], buf.at[slot], sem.at[slot]
            )

        get(0, 0).start()

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < NT)
            def _():
                get(nxt, t + 1).start()

            get(slot, t).wait()
            wt = buf[slot].astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                wt, x_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[pl.ds(t * TO, TO), :] = acc * d_ref[pl.ds(t * TO, TO), :]
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    fn = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TO, K), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    try:
        out = jax.jit(fn)(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(d))
        want = (wq.astype(np.float32) @ x) * d
        err = float(np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9))
        ok = err < 2e-2

        L = 24
        wbig = jnp.asarray(rs.randint(-127, 128, (L, OUT, K), dtype=np.int8))
        dbig = jnp.asarray((rs.rand(L, OUT, 1).astype(np.float32) + 0.5) / 127.0)

        reps = 50

        @jax.jit
        def chain(x, wbig, dbig):
            def layer(x, inp):
                q, dd = inp
                y = fn(x, q, dd)
                return y[:K] * 1e-3, jnp.sum(y)

            def rep(i, carry):
                x, acc = carry
                x2, ys = jax.lax.scan(layer, x, (wbig, dbig))
                return x2, acc + jnp.sum(ys)

            _, acc = jax.lax.fori_loop(0, reps, rep, (x, jnp.float32(0.0)))
            return acc

        xj = jnp.asarray(x)
        sync(chain(xj, wbig, dbig))
        null = _null_overhead()
        t0 = time.perf_counter()
        sync(chain(xj, wbig, dbig))
        dt = (time.perf_counter() - t0 - null) / reps
        gb = L * OUT * K / 1e9
        report("dma", ok, f"relerr={err:.2e} bw={gb/dt:.0f}GB/s t={dt*1e3:.2f}ms")
    except Exception as e:
        report("dma", False, f"{type(e).__name__}: {str(e)[:200]}")


# ------------------------------------------------------------ 9. dmaonly
def probe_dmaonly():
    """Pure HBM->VMEM DMA bandwidth ceiling: stream int8 tiles, touch
    nothing but a tiny reduction per tile so nothing is elided."""
    OUT, K, TO = F, C, 1024
    NT = OUT // TO
    rs = np.random.RandomState(11)

    def make(TO_, nbuf):
        NT_ = OUT // TO_

        def kern(q_hbm, o_ref, buf, sem):
            def get(slot, t):
                return pltpu.make_async_copy(
                    q_hbm.at[pl.ds(t * TO_, TO_), :], buf.at[slot], sem.at[slot]
                )

            for s in range(nbuf - 1):
                get(s, s).start()

            def body(t, acc):
                slot = jax.lax.rem(t, nbuf)
                nxt = jax.lax.rem(t + nbuf - 1, nbuf)

                @pl.when(t + nbuf - 1 < NT_)
                def _():
                    get(nxt, t + nbuf - 1).start()

                get(slot, t).wait()
                # touch 8 sublanes only: negligible compute
                return acc + jnp.sum(buf[slot][0:8, 0:128].astype(jnp.float32))

            acc = jax.lax.fori_loop(0, NT_, body, jnp.float32(0.0))
            o_ref[:] = jnp.full((8, 128), acc, jnp.float32)

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, TO_, K), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        ), NT_

    L = 24
    wbig = jnp.asarray(rs.randint(-127, 128, (L, OUT, K), dtype=np.int8))
    reps = 50

    for TO_, nbuf in ((512, 2), (1024, 2), (2048, 2), (2048, 4), (4096, 2)):
        fn, _ = make(TO_, nbuf)

        @jax.jit
        def chain(wbig):
            def rep(i, acc):
                def layer(a, q):
                    return a + fn(q)[0, 0], 0
                a, _ = jax.lax.scan(layer, acc, wbig)
                return a
            return jax.lax.fori_loop(0, reps, rep, jnp.float32(0.0))

        try:
            sync(chain(wbig))
            null = _null_overhead()
            t0 = time.perf_counter()
            sync(chain(wbig))
            dt = (time.perf_counter() - t0 - null) / reps
            gb = L * OUT * K / 1e9
            print(f"  dmaonly TO={TO_} nbuf={nbuf}: bw={gb/dt:.0f}GB/s "
                  f"t={dt*1e3:.2f}ms", flush=True)
        except Exception as e:
            print(f"  dmaonly TO={TO_} nbuf={nbuf}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    report("dmaonly", True, "see variants above")


# ------------------------------------------------------------ 10. matvec8
def probe_matvec8():
    """w8a8 streamed matvec: s8 weights x s8 activations -> s32 on MXU,
    no int->float convert of the weight stream; scale applied per row."""
    OUT, K, TO = F, C, 1024
    rs = np.random.RandomState(12)
    wq = rs.randint(-127, 128, (OUT, K), dtype=np.int8)
    d = (rs.rand(OUT, 1).astype(np.float32) + 0.5) / 127.0
    xq = rs.randint(-127, 128, (K, 1), dtype=np.int8)
    xs = np.float32(0.013)

    def kern(x_ref, q_ref, d_ref, o_ref):
        acc = jax.lax.dot_general(
            q_ref[:], x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:] = acc.astype(jnp.float32) * d_ref[:]

    fn = pl.pallas_call(
        kern,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
    )
    try:
        out = jax.jit(fn)(jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(d))
        want = (wq.astype(np.float32) @ xq.astype(np.float32)) * d
        err = float(np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9))
        ok = err < 1e-6

        L = 24
        wbig = jnp.asarray(rs.randint(-127, 128, (L, OUT, K), dtype=np.int8))
        dbig = jnp.asarray((rs.rand(L, OUT, 1).astype(np.float32) + 0.5) / 127.0)
        reps = 50

        @jax.jit
        def chain(x, wbig, dbig):
            def layer(x, inp):
                q, dd = inp
                y = fn(x, q, dd)
                xn = jnp.clip(y[:K] * 1e-2, -127, 127).astype(jnp.int8)
                return xn, jnp.sum(y)

            def rep(i, carry):
                x, acc = carry
                x2, ys = jax.lax.scan(layer, x, (wbig, dbig))
                return x2, acc + jnp.sum(ys)

            _, acc = jax.lax.fori_loop(0, reps, rep, (jnp.asarray(x), jnp.float32(0.0)))
            return acc

        sync(chain(xq, wbig, dbig))
        null = _null_overhead()
        t0 = time.perf_counter()
        sync(chain(xq, wbig, dbig))
        dt = (time.perf_counter() - t0 - null) / reps
        gb = L * OUT * K / 1e9
        report("matvec8", ok, f"relerr={err:.2e} bw={gb/dt:.0f}GB/s t={dt*1e3:.2f}ms")
    except Exception as e:
        report("matvec8", False, f"{type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------- 10b. matvec8v
def probe_matvec8v():
    """w8a8 matvec variants: chase the gap to the ~616GB/s DMA ceiling.
    Variants: (a) x widened to 8 lanes, (b) x widened to 128 lanes,
    (c) hand-DMA double buffer + s8 dot, (d) K split into two half dots."""
    OUT, K = F, C
    rs = np.random.RandomState(14)
    L, reps = 24, 50
    wbig_np = rs.randint(-127, 128, (L, OUT, K), dtype=np.int8)
    wbig = jnp.asarray(wbig_np)
    dbig = jnp.asarray((rs.rand(L, OUT, 1).astype(np.float32) + 0.5) / 127.0)
    xq = rs.randint(-127, 128, (K, 1), dtype=np.int8)

    def bench(name, fn, xmake, TO):
        @jax.jit
        def chain(x, wbig, dbig):
            def layer(x, inp):
                q, dd = inp
                y = fn(x, q, dd)
                xn = jnp.clip(y[:K] * 1e-2, -127, 127).astype(jnp.int8)
                return xmake(xn), jnp.sum(y)

            def rep(i, carry):
                x, acc = carry
                x2, ys = jax.lax.scan(layer, x, (wbig, dbig))
                return x2, acc + jnp.sum(ys)

            x0 = xmake(jnp.asarray(xq))
            _, acc = jax.lax.fori_loop(0, reps, rep, (x0, jnp.float32(0.0)))
            return acc

        try:
            sync(chain(jnp.asarray(xq), wbig, dbig))
            null = _null_overhead()
            t0 = time.perf_counter()
            sync(chain(jnp.asarray(xq), wbig, dbig))
            dt = (time.perf_counter() - t0 - null) / reps
            gb = L * OUT * K / 1e9
            print(f"  matvec8v {name}: bw={gb/dt:.0f}GB/s t={dt*1e3:.2f}ms",
                  flush=True)
        except Exception as e:
            print(f"  matvec8v {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    def grid_fn(TO, n_lanes):
        def kern(x_ref, q_ref, d_ref, o_ref):
            acc = jax.lax.dot_general(
                q_ref[:], x_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_ref[:] = acc[:, 0:1].astype(jnp.float32) * d_ref[:]

        return pl.pallas_call(
            kern,
            grid=(OUT // TO,),
            in_specs=[
                pl.BlockSpec((K, n_lanes), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
        )

    def widen(n_lanes):
        def xmake(x):  # [K, 1] int8 -> [K, n_lanes] with col 0 = x
            return jnp.pad(x.reshape(K, 1), ((0, 0), (0, n_lanes - 1)))
        return xmake

    bench("lanes8-TO1024", grid_fn(1024, 8), widen(8), 1024)
    bench("lanes128-TO1024", grid_fn(1024, 128), widen(128), 1024)
    bench("lanes1-TO2048", grid_fn(2048, 1), widen(1), 2048)

    # hand-DMA double buffer + s8 dot
    def dma_fn(TO, nbuf):
        NT = OUT // TO

        def kern(x_ref, q_hbm, d_ref, o_ref, buf, sem):
            def get(slot, t):
                return pltpu.make_async_copy(
                    q_hbm.at[pl.ds(t * TO, TO), :], buf.at[slot], sem.at[slot]
                )

            for s in range(nbuf - 1):
                get(s, s).start()

            def body(t, _):
                slot = jax.lax.rem(t, nbuf)
                nxt = jax.lax.rem(t + nbuf - 1, nbuf)

                @pl.when(t + nbuf - 1 < NT)
                def _():
                    get(nxt, t + nbuf - 1).start()

                get(slot, t).wait()
                acc = jax.lax.dot_general(
                    buf[slot], x_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                o_ref[pl.ds(t * TO, TO), :] = (
                    acc.astype(jnp.float32) * d_ref[pl.ds(t * TO, TO), :]
                )
                return 0

            jax.lax.fori_loop(0, NT, body, 0)

        return pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((nbuf, TO, K), jnp.int8),
                pltpu.SemaphoreType.DMA((nbuf,)),
            ],
        )

    bench("dma-TO1024-nb2", dma_fn(1024, 2), widen(1), 1024)
    bench("dma-TO1024-nb3", dma_fn(1024, 3), widen(1), 1024)
    bench("dma-TO512-nb4", dma_fn(512, 4), widen(1), 512)
    report("matvec8v", True, "see variants above")


# ----------------------------------------------------------- 11. matvecbf
def probe_matvecbf():
    """bf16 streamed matvec bandwidth (2 bytes/weight, no convert)."""
    OUT, K, TO = F, C, 1024
    rs = np.random.RandomState(13)
    w = (rs.randn(OUT, K) * 0.05).astype(np.float32)
    x = rs.randn(K, 1).astype(np.float32) * 0.1

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], x_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    fn = pl.pallas_call(
        kern,
        grid=(OUT // TO,),
        in_specs=[
            pl.BlockSpec((K, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TO, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TO, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT, 1), jnp.float32),
    )
    wb = jnp.asarray(w, jnp.bfloat16)
    xb = jnp.asarray(x, jnp.bfloat16)
    out = jax.jit(fn)(xb, wb)
    want = w @ x
    err = float(np.abs(np.asarray(out) - want).max() / (np.abs(want).max() + 1e-9))
    ok = err < 2e-2

    L = 24
    wbig = jnp.asarray(rs.randn(L, OUT, K).astype(np.float32) * 0.05, jnp.bfloat16)
    reps = 50

    @jax.jit
    def chain(x, wbig):
        def layer(x, q):
            y = fn(x, q)
            return y[:K].astype(jnp.bfloat16) * jnp.bfloat16(1e-3), jnp.sum(y)

        def rep(i, carry):
            x, acc = carry
            x2, ys = jax.lax.scan(layer, x, wbig)
            return x2, acc + jnp.sum(ys)

        _, acc = jax.lax.fori_loop(0, reps, rep, (x, jnp.float32(0.0)))
        return acc

    sync(chain(xb, wbig))
    null = _null_overhead()
    t0 = time.perf_counter()
    sync(chain(xb, wbig))
    dt = (time.perf_counter() - t0 - null) / reps
    gb = L * OUT * K * 2 / 1e9
    report("matvecbf", ok, f"relerr={err:.2e} bw={gb/dt:.0f}GB/s t={dt*1e3:.2f}ms")


PROBES = {
    "vmem": probe_vmem,
    "merge": probe_merge,
    "onehot": probe_onehot,
    "split": probe_split,
    "lane1": probe_lane1,
    "eye": probe_eye,
    "bdot": probe_bdot,
    "wkv7": probe_wkv7,
    "matvec": probe_matvec,
    "dma": probe_dma,
    "dmaonly": probe_dmaonly,
    "matvec8": probe_matvec8,
    "matvec8v": probe_matvec8v,
    "matvecbf": probe_matvecbf,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    for n in names:
        t0 = time.perf_counter()
        try:
            PROBES[n]()
        except Exception as e:
            report(n, False, f"{type(e).__name__}: {str(e)[:300]}")
        print(f"  ({n} took {time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
