"""Ablate the 169M v7 decode megakernel's per-layer cost on chip.

The layer section runs ~30us/layer where the weight fetch alone is
~12us — this isolates which section (input matvecs, lora chain, wkv,
FFN matvecs, vector elementwise) owns the rest. Variants strip parts of
the layer body while keeping the SAME input streams, so fetch cost is
constant across variants.

Usage: timeout 3000 python scripts/probe_layer_cost.py
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rwkv_tpu.models.synth import synth_config, synth_params
from rwkv_tpu.ops.megakernel import build_mega_pack, _MAT_KEYS, _VEC_KEYS

N_GEN = 256
C, H, S, L, DL, FD = 768, 12, 64, 12, 64, 3072


def make_kernel(variant):
    c, h, s, d_lora, f_dim, n_layer = C, H, S, DL, FD, L
    quant = True

    def mm(w, x):
        return jax.lax.dot_general(
            w, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def qx(x):
        amax = jnp.max(jnp.abs(x))
        dx = amax / 127.0
        inv = jnp.where(dx > 0.0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(x * inv), -127.0, 127.0).astype(jnp.int8)
        return x8, dx

    def ln(v, w, b, eps):
        mu = jnp.mean(v, axis=0, keepdims=True)
        vc = v - mu
        var = jnp.mean(vc * vc, axis=0, keepdims=True)
        return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + b

    def kernel(*refs):
        (x0_ref, att_in, ffn_in, heads_in,
         rkv, rkv_d, lora1, lora1_d, lora2, lora2_d,
         out_w, out_d, fk_w, fk_d, fv_w, fv_d,
         ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
         coeff, rk,
         y_out, att_out, ffn_out, heads_out,
         x_s, vf_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        def matv(w_ref, d_ref, row_lo, row_hi, xcol):
            w = w_ref[0][row_lo:row_hi]
            x8, dx = qx(xcol)
            acc = mm(w, x8)
            return acc.astype(jnp.float32) * dx * d_ref[0][row_lo:row_hi]

        x = x_s[:]

        if variant == "fetch-only":
            # touch one element of each weight block so fetches happen
            acc = (rkv[0][0:8, 0:64].astype(jnp.float32)
                   + out_w[0][0:8, 0:64] + fk_w[0][0:8, 0:64]
                   + fv_w[0][0:8, 0:64] + lora1[0][0:8, 0:64]
                   + lora2[0][0:8, 0:64])
            x_s[0:8] = x[0:8] + jnp.sum(acc, axis=1, keepdims=True) * 1e-30
            y_out[:] = x_s[:]
            att_out[0] = x[0:c]
            ffn_out[0] = x
            heads_out[0] = heads_in[0]
            return

        xl = ln(x, ln1w[0], ln1b[0], 1e-5)
        sx = att_in[0] - xl
        att_out[0] = xl

        cf = coeff[0].reshape(6, c, 1)
        xr = xl + sx * cf[0]
        xw = xl + sx * cf[1]
        xk = xl + sx * cf[2]
        xv = xl + sx * cf[3]
        xa = xl + sx * cf[4]
        xg = xl + sx * cf[5]

        r = matv(rkv, rkv_d, 0 * c, 1 * c, xr)
        k = matv(rkv, rkv_d, 1 * c, 2 * c, xk)
        v = matv(rkv, rkv_d, 2 * c, 3 * c, xv)

        if variant == "no-lora":
            w_dec = jnp.exp(jax.nn.sigmoid(w0[0]) * jnp.float32(-0.606531))
            a_gate = jax.nn.sigmoid(a0[0])
            g = jax.nn.sigmoid(r * 0.01)
            vmix_l = v0[0]
            # still touch lora weights so the stream is identical
            r = r + jnp.sum(lora1[0][0:8, 0:64].astype(jnp.float32)
                            + lora2[0][0:8, 0:64]) * 1e-30
        else:
            d = d_lora
            w_dn = jnp.tanh(matv(lora1, lora1_d, 0 * d, 1 * d, xw))
            a_dn = matv(lora1, lora1_d, 1 * d, 2 * d, xa)
            g_dn = jax.nn.sigmoid(matv(lora1, lora1_d, 2 * d, 3 * d, xg))
            v_dn = matv(lora1, lora1_d, 3 * d, 4 * d, xv)
            w_l = matv(lora2, lora2_d, 0 * c, 1 * c, w_dn)
            a_l = matv(lora2, lora2_d, 1 * c, 2 * c, a_dn)
            g = matv(lora2, lora2_d, 2 * c, 3 * c, g_dn)
            vmix_l = matv(lora2, lora2_d, 3 * c, 4 * c, v_dn)
            w_dec = jnp.exp(
                jax.nn.sigmoid(w_l + w0[0]) * jnp.float32(-0.606531))
            a_gate = jax.nn.sigmoid(a_l + a0[0])

        kk = (k * kkw[0]).reshape(h, s, 1)
        nrm = jnp.sqrt(jnp.sum(kk * kk, axis=1, keepdims=True))
        kk = kk / jnp.maximum(nrm, jnp.float32(1e-12))
        ka = k * kaw[0]
        k = k + (a_gate * ka - ka)

        @pl.when(i == 0)
        def _():
            vf_s[:] = v

        vf = vf_s[:]
        v_mixed = v + (vf - v) * jax.nn.sigmoid(vmix_l + v0[0])
        v = jnp.where(i == 0, v, v_mixed)

        if variant == "no-wkv":
            xo = (v * 0.01 + k * 0.001) * g
            heads_out[0] = heads_in[0]
        else:
            def col3(vec):
                return vec.reshape(h, s, 1)

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            r3, w3, k3, v3 = col3(r), col3(w_dec), col3(k), col3(v)
            a3 = -kk
            b3 = kk * col3(a_gate.reshape(c, 1))
            st = heads_in[0]
            sa_row = jnp.sum(st * a3, axis=1, keepdims=True)
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            st = st * w3 + k3 * v_row + b3 * sa_row
            out_row = jnp.sum(st * r3, axis=1, keepdims=True)
            heads_out[0] = st
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            xo = y_col.reshape(c, 1) * lnxw[0] + lnxb[0]
            dots = jnp.sum(k3 * r3 * rk[0], axis=1, keepdims=True)
            bonus = (v3 * dots).reshape(c, 1)
            xo = (xo + bonus) * g

        x = x + matv(out_w, out_d, 0, c, xo)

        xl2 = ln(x, ln2w[0], ln2b[0], 1e-5)
        sx2 = ffn_in[0] - xl2
        ffn_out[0] = xl2
        xk2 = xl2 + sx2 * xkw[0]
        fk = matv(fk_w, fk_d, 0, f_dim, xk2)
        fk = jnp.square(jnp.maximum(fk, 0.0))
        x = x + matv(fv_w, fv_d, 0, c, fk)

        x_s[:] = x
        y_out[:] = x

    return kernel


def run_variant(variant, pack, cfg, ov):
    c, h, s = C, H, S
    kernel = make_kernel(variant)

    def blocked(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    mat_args, mat_specs = [], []
    for name in _MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        d = pack[name + "_d"]
        mat_args.append(d)
        mat_specs.append(blocked(d.shape[1:]))
    vec_args = [pack[k] for k in _VEC_KEYS]
    vec_specs = [blocked((c, 1)) for _ in _VEC_KEYS]

    def step(state_t, x0):
        args = ([x0, state_t["att_xx"], state_t["ffn_xx"],
                 state_t["heads"]] + mat_args + vec_args
                + [pack["coeff"], pack["r_k"]])
        in_specs = ([whole((c, 1)), blocked((c, 1)), blocked((c, 1)),
                     blocked((h, s, s))] + mat_specs + vec_specs
                    + [blocked((6 * c, 1)), blocked((h, s, 1))])
        out_shapes = (
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, c, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, c, 1), jnp.float32),
            jax.ShapeDtypeStruct((L, h, s, s), jnp.float32),
        )
        out_specs = (whole((c, 1)), blocked((c, 1)), blocked((c, 1)),
                     blocked((h, s, s)))
        return pl.pallas_call(
            kernel, grid=(L,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((c, 1), jnp.float32),
                            pltpu.VMEM((c, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)

    @jax.jit
    def chain(state_t, x0):
        def body(carry, _):
            state_t, x0 = carry
            y, axx, fxx, hds = step(state_t, x0)
            return ({"att_xx": axx, "ffn_xx": fxx, "heads": hds},
                    y * 1e-30 + x0), None

        (state_t, x0), _ = jax.lax.scan(body, (state_t, x0), None,
                                        length=N_GEN)
        return jnp.sum(x0)

    state0 = {
        "att_xx": jnp.zeros((L, C, 1), jnp.float32),
        "ffn_xx": jnp.zeros((L, C, 1), jnp.float32),
        "heads": jnp.zeros((L, H, S, S), jnp.float32),
    }
    x0 = jnp.ones((C, 1), jnp.float32) * 0.01
    np.asarray(chain(state0, x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(state0, x0))
        best = min(best, time.perf_counter() - t0)
    per_tok = max(best - ov, 1e-9) / N_GEN
    print(f"{variant:12s}: {per_tok * 1e6:7.1f} us/tok "
          f"({per_tok * 1e6 / L:5.2f} us/layer)", flush=True)
    return per_tok


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    cfg = synth_config("7.0", n_layer=L, n_embed=C, n_vocab=512,
                       head_size=S)
    params = synth_params(cfg, seed=0)
    pack = build_mega_pack(params, cfg, quant=True)

    @jax.jit
    def probe(x):
        return x * 1.000001

    xp = jnp.ones((8,), jnp.float32)
    np.asarray(probe(xp))
    ov = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(xp))
        ov = min(ov, time.perf_counter() - t0)
    print(f"sync overhead: {ov * 1e3:.1f} ms", flush=True)

    for variant in ("full", "no-wkv", "no-lora", "fetch-only"):
        run_variant(variant, pack, cfg, ov)


if __name__ == "__main__":
    main()
