"""Decompose the chunked-wkv7 prefill cost at 1.5B dims: the full
wkv7_chunked_pallas call vs its XLA-side operand preparation alone
(cumsum + 4 exp-multiplies + 5 [NC,P,H,S]->[NC,H,P,S] transposes) vs
the pallas_call alone on pre-prepared operands."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

from rwkv_tpu.ops import chunked as ch

T, H, S, P, L = 2048, 32, 64, 16, 24
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
r, k, v, a = (jax.random.normal(ks[i], (T, H, S), jnp.float32) * 0.3
              for i in range(4))
b = -a
w = jnp.exp(-jnp.exp(jax.random.normal(ks[5], (T, H, S), jnp.float32) * 0.3 - 1.0) * 0.606)
s0 = jnp.zeros((H, S, S), jnp.float32)

def timeit(fn, *args, reps=3, n_inner=L):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            # vary the first operand per iteration so XLA cannot CSE the
            # call out of the loop
            a2 = (a[0],) + (a[1] + acc * 1e-20,) + a[2:]
            out, s = fn(*a2)
            return acc + jnp.sum(out) * 1e-9 + jnp.sum(s) * 1e-9
        return jax.lax.fori_loop(0, n_inner, body, jnp.float32(0.0))
    _ = np.asarray(loop(*args)); best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); _ = np.asarray(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best

@jax.jit
def probe_sync(x): return x * 1.0
_ = np.asarray(probe_sync(jnp.ones(8))); ov = 1e9
for _ in range(5):
    t0 = time.perf_counter(); _ = np.asarray(probe_sync(jnp.ones(8)))
    ov = min(ov, time.perf_counter() - t0)
print(f"sync {ov*1e3:.1f} ms")

full = timeit(lambda *a: ch.wkv7_chunked_pallas(*a, chunk_size=P), s0, r, w, k, v, a, b) - ov
print(f"wkv7_chunked_pallas x{L}: {full*1e3:8.2f} ms ({full*1e3/L:6.3f} ms/layer)")

def prep_only(s0, r, w, k, v, a, b):
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
    nc = T // P
    lw_c = lw.reshape(nc, P, H, S)
    lcum = jnp.cumsum(lw_c, axis=1); lcum_ex = lcum - lw_c
    def chunked(x): return x.reshape(nc, P, H, S)
    def to_nhps(x): return jnp.swapaxes(x, 1, 2)
    atil = to_nhps(chunked(a) * jnp.exp(lcum_ex))
    btil = to_nhps(chunked(b) * jnp.exp(-lcum))
    ktil = to_nhps(chunked(k) * jnp.exp(-lcum))
    rhat = to_nhps(chunked(r) * jnp.exp(lcum))
    v_op = to_nhps(chunked(v))
    out = atil + btil + ktil + rhat + v_op
    return out.reshape(T, H, S), jnp.exp(lcum[:, -1])
prep = timeit(prep_only, s0, r, w, k, v, a, b) - ov
print(f"XLA operand prep  x{L}: {prep*1e3:8.2f} ms ({prep*1e3/L:6.3f} ms/layer)")

two = timeit(lambda *a: ch.wkv7_chunked_twopass(*a, chunk_size=P),
             s0, r, w, k, v, a, b) - ov
print(f"wkv7 two-pass     x{L}: {two*1e3:8.2f} ms ({two*1e3/L:6.3f} ms/layer)")
