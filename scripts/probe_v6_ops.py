"""On-chip isolation probes for the v6 megakernel native miscompute.

bench_mega_v6.py fails NATIVELY in both bf16 and w8a8 (interpret mode and
the per-op path agree with each other), so some v6-specific op compiles
but miscomputes on hardware.  v6-only primitives, each probed with
integer-exact data (methodology: ops/megakernel.py header):

  p1  VALUE sublane slicing: mixdn[lo:lo+32] slices of a [160, 1] column
      (v7 only ever sliced REFS; v6 slices a computed value).
  p2  bf16 dot with K=32 lanes: W[c, 32] @ x[32, 1] from a [5C, 32]
      sliced weight (maa_up).
  p3  p1+p2 composed: five slice->dot chains, summed.
  p4  wkv6 head op in the transposed [H, S_j, S_i] state layout
      (old-state output + tf bonus + state update).

Run: timeout 1800 python scripts/probe_v6_ops.py
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
rng = np.random.default_rng(0)


def check(name, got, want):
    global fails
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{name}: {'PASS' if ok else 'FAIL'}", flush=True)
    if not ok:
        g, w = np.asarray(got, np.float64), np.asarray(want, np.float64)
        d = np.abs(g - w)
        print("   max diff", d.max(), "first bad idx",
              np.unravel_index(d.argmax(), d.shape), flush=True)
        fails += 1


D, C = 32, 768

# ---- p1: value sublane slices --------------------------------------------
v = rng.integers(-100, 100, size=(5 * D, 1)).astype(np.float32)


def k1(pin, out):
    x = pin[:] * 1.0  # force a computed VALUE, not a ref read
    for s in range(5):
        out[pl.dslice(s * D, D)] = x[s * D:(s + 1) * D] * np.float32(s + 1)


got = pl.pallas_call(
    k1, out_shape=jax.ShapeDtypeStruct((5 * D, 1), jnp.float32),
    interpret=INTERP,
)(jnp.asarray(v))
want = np.concatenate([v[s * D:(s + 1) * D] * (s + 1) for s in range(5)])
check("p1 value slices", got, want)

# ---- p2: bf16 dot K=32 ----------------------------------------------------
W = rng.integers(-8, 8, size=(5 * C, D)).astype(np.float32)
x2 = rng.integers(-8, 8, size=(D, 1)).astype(np.float32)


def k2(w_ref, x_ref, out):
    w = w_ref[:][2 * C:3 * C]  # slice split 2, like maa_up
    acc = jax.lax.dot_general(
        w.astype(jnp.bfloat16), x_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out[:] = acc


got = pl.pallas_call(
    k2, out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
    interpret=INTERP,
)(jnp.asarray(W), jnp.asarray(x2))
check("p2 bf16 K=32 dot", got, W[2 * C:3 * C] @ x2)

# ---- p3: composed slice -> dot chain -------------------------------------
xm = rng.integers(-4, 4, size=(5 * D, 1)).astype(np.float32)


def k3(w_ref, x_ref, out):
    x = x_ref[:] * 1.0
    acc = jnp.zeros((C, 1), jnp.float32)
    for s in range(5):
        w = w_ref[:][s * C:(s + 1) * C]
        xs = x[s * D:(s + 1) * D]
        acc = acc + jax.lax.dot_general(
            w.astype(jnp.bfloat16), xs.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out[:] = acc


got = pl.pallas_call(
    k3, out_shape=jax.ShapeDtypeStruct((C, 1), jnp.float32),
    interpret=INTERP,
)(jnp.asarray(W), jnp.asarray(xm))
want = sum(W[s * C:(s + 1) * C] @ xm[s * D:(s + 1) * D] for s in range(5))
check("p3 slice+dot chain", got, want)

# ---- p4: wkv6 head op in [H, S_j, S_i] -----------------------------------
H, S = 12, 64
st0 = rng.integers(-4, 4, size=(H, S, S)).astype(np.float32)   # [H, j, i]
r = rng.integers(-3, 3, size=(H, S, 1)).astype(np.float32)
k_ = rng.integers(-3, 3, size=(H, S, 1)).astype(np.float32)
vv = rng.integers(-3, 3, size=(H, S, 1)).astype(np.float32)
w_ = rng.integers(1, 3, size=(H, S, 1)).astype(np.float32)
tf = rng.integers(-2, 2, size=(H, S, 1)).astype(np.float32)


def k4(st_ref, r_ref, k_ref, v_ref, w_ref, tf_ref, y_out, st_out):
    i_ = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_ = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    eye = (i_ == j_).astype(jnp.float32)[None]
    st = st_ref[:]
    r3, k3_, v3, w3, tf3 = r_ref[:], k_ref[:], v_ref[:], w_ref[:], tf_ref[:]
    v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
    dot = jnp.sum(r3 * tf3 * k3_, axis=1, keepdims=True)
    out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
    st = st * w3 + k3_ * v_row
    y_col = jnp.sum(out_row * eye, axis=2, keepdims=True)
    y_out[:] = y_col.reshape(H * S, 1)
    st_out[:] = st


got_y, got_st = pl.pallas_call(
    k4,
    out_shape=(jax.ShapeDtypeStruct((H * S, 1), jnp.float32),
               jax.ShapeDtypeStruct((H, S, S), jnp.float32)),
    interpret=INTERP,
)(*[jnp.asarray(a) for a in (st0, r, k_, vv, w_, tf)])
# numpy reference: out[h,i] = sum_j r[h,j]*(tf[h,j]k[h,j]v[h,i] + S[h,j,i])
want_y = np.zeros((H, S), np.float32)
want_st = np.zeros_like(st0)
for h in range(H):
    Sh = st0[h]                     # [j, i]
    rh, kh, vh, wh, tfh = (a[h, :, 0] for a in (r, k_, vv, w_, tf))
    want_y[h] = Sh.T @ rh + vh * np.sum(rh * tfh * kh)
    want_st[h] = Sh * wh[:, None] + np.outer(kh, vh)
check("p4 wkv6 y", got_y, want_y.reshape(H * S, 1))
check("p4 wkv6 st", got_st, want_st)

print("FAILS:", fails, flush=True)
sys.exit(1 if fails else 0)
