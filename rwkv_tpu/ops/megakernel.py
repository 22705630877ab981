"""Experimental: whole-layer Pallas decode kernel for RWKV v7 (T=1).

Motivation (measured, see docs/STATUS.md): the 1.5B decode step spends
~1.7 ms on per-op overhead — each of the ~10 ops per layer is its own XLA
kernel launch with its own HBM round trips for activations. This kernel
executes an ENTIRE v7 layer (ln1, token shift, six-way mix, fused r/k/v,
LoRA gates, wkv7 state update, group norm, bonus, gate, output projection,
ln2 + relu^2 FFN) in ONE pallas_call: weights stream HBM->VMEM once,
activations never leave VMEM.

Decode-only (T=1), dense bf16 weights, batch padded to 8 rows.

STATUS: EXPERIMENTAL. Validated against the reference layer math in
interpreter mode (tests/test_megakernel.py). Native Mosaic compilation
currently fails at the matmul->wkv boundary: `[B, C] -> [B*H, S]` is a
LANE-dim split, which Mosaic cannot relayout (same constraint hit by the
quant kernels, solved there with transposed storage). The fix is to carry
the attention operands TRANSPOSED through the kernel — produce r/k/v as
[C, B] (sublane-major) from `W @ x^T`, split sublanes (C -> H, S), and run
the wkv update in [H, S, ...] sublane layout. Probes show that sequence
COMPILES natively but SILENTLY MISCOMPUTES (transpose+sublane-split of a
[1, C] vector returns wrong element order on hardware while interpret mode
is correct) — so any Mosaic layout trick here must be numerics-verified on
the chip, never assumed from a clean compile. Until the layout redesign
lands, serving keeps the per-op XLA path (within ~2x of the
weight-bandwidth bound at 1.5B).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _layer_kernel(
    # activations
    x_ref,            # [B, C] f32
    att_xx_ref,       # [B, C] f32 (previous token's ln1 output)
    ffn_xx_ref,       # [B, C] f32
    heads_ref,        # [B*H, S, S] f32 wkv state (flattened batch*heads)
    v_first_ref,      # [B, C] f32
    is_first_ref,     # [1, 1] int32 (1 for layer 0)
    # weights (bf16 unless noted)
    ln1_w_ref, ln1_b_ref, ln2_w_ref, ln2_b_ref,          # [1, C] f32
    coeff_ref,                                            # [6, C] f32
    rkv_w_ref,                                            # [3*C, C]
    lora1_ref,                                            # [4*D, C]
    lora2_ref,                                            # [4*C, D]
    w0_ref, a0_ref, v0_ref, kk_ref, ka_ref,               # [1, C] f32
    rk_ref,                                               # [H, S] f32
    lnx_w_ref, lnx_b_ref,                                 # [1, C] f32
    out_w_ref,                                            # [C, C]
    xk_ref,                                               # [1, C] f32 (ffn.x_k)
    fk_w_ref,                                             # [F, C]
    fv_w_ref,                                             # [C, F]
    # outputs
    y_ref,            # [B, C] f32 (new x)
    new_att_xx_ref,   # [B, C]
    new_ffn_xx_ref,   # [B, C]
    new_heads_ref,    # [B*H, S, S]
    new_v_first_ref,  # [B, C]
    *, n_heads: int, head_size: int, lora_dim: int,
):
    b, c = x_ref.shape
    h, s, d = n_heads, head_size, lora_dim

    def ln(v, w, bias, eps):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        vc = v - mu
        var = jnp.mean(vc * vc, axis=-1, keepdims=True)
        return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + bias

    def mmat(act, w_t):  # act [B, K] f32, w_t [N, K] -> [B, N] f32
        return jax.lax.dot_general(
            act.astype(jnp.bfloat16), w_t.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    x = x_ref[:]
    xl = ln(x, ln1_w_ref[0], ln1_b_ref[0], 1e-5)
    sx = att_xx_ref[:] - xl
    new_att_xx_ref[:] = xl

    # six-way shifted inputs; coeff rows: r, w, k, v, a, g
    def mix(i):
        return xl + sx * coeff_ref[i]

    xr, xw, xk_a, xv, xa, xg = (mix(i) for i in range(6))

    rkv_w = rkv_w_ref[:]
    r = mmat(xr, rkv_w[0:c])
    k = mmat(xk_a, rkv_w[c:2 * c])
    v = mmat(xv, rkv_w[2 * c:3 * c])

    l1 = lora1_ref[:]
    l2 = lora2_ref[:]
    w_dn = jnp.tanh(mmat(xw, l1[0:d]))
    a_dn = mmat(xa, l1[d:2 * d])
    g_dn = jax.nn.sigmoid(mmat(xg, l1[2 * d:3 * d]))
    v_dn = mmat(xv, l1[3 * d:4 * d])
    w_l = mmat(w_dn, l2[0:c])
    a_l = mmat(a_dn, l2[c:2 * c])
    g = mmat(g_dn, l2[2 * c:3 * c])
    vmix_l = mmat(v_dn, l2[3 * c:4 * c])

    w = jnp.exp(jax.nn.sigmoid(w_l + w0_ref[0]) * jnp.float32(-0.606531))
    a = jax.nn.sigmoid(a_l + a0_ref[0])

    kk = (k * kk_ref[0]).reshape(b * h, s)
    norm = jnp.sqrt(jnp.sum(kk * kk, axis=-1, keepdims=True))
    kk = kk / jnp.maximum(norm, jnp.float32(1e-12))

    ka = k * ka_ref[0]
    k = k + (a * ka - ka)

    is_first = is_first_ref[0, 0] == 1
    v_mixed = v + (v_first_ref[:] - v) * jax.nn.sigmoid(vmix_l + v0_ref[0])
    v_first = jnp.where(is_first, v, v_first_ref[:])
    v = jnp.where(is_first, v, v_mixed)
    new_v_first_ref[:] = v_first

    # wkv7 single step on [B*H, S] operands, state [B*H, S, S]
    rh = r.reshape(b * h, s)
    wh = w.reshape(b * h, s)
    kh = k.reshape(b * h, s)
    vh = v.reshape(b * h, s)
    ah = -kk
    bh = kk * a.reshape(b * h, s)

    st = heads_ref[:]
    sa = jnp.einsum("nij,nj->ni", st, ah)
    st = st * wh[:, None, :] + vh[:, :, None] * kh[:, None, :] + sa[:, :, None] * bh[:, None, :]
    y = jnp.einsum("nij,nj->ni", st, rh)
    new_heads_ref[:] = st

    # group norm over head dim + bonus + gate + output projection
    yb = y  # [B*H, S]
    mu = jnp.mean(yb, axis=-1, keepdims=True)
    yc = yb - mu
    var = jnp.mean(yc * yc, axis=-1, keepdims=True)
    yb = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
    xo = yb.reshape(b, c) * lnx_w_ref[0] + lnx_b_ref[0]

    # r_k bonus term: per-head coefficients
    rk = rk_ref[:].reshape(1, h, s)
    dots = jnp.sum(
        (kh.reshape(b, h, s) * rh.reshape(b, h, s)) * rk, axis=-1, keepdims=True
    )
    bonus = (vh.reshape(b, h, s) * dots).reshape(b, c)

    xo = (xo + bonus) * g
    att_out = mmat(xo, out_w_ref[:])
    x = x + att_out

    # FFN
    xl2 = ln(x, ln2_w_ref[0], ln2_b_ref[0], 1e-5)
    sx2 = ffn_xx_ref[:] - xl2
    new_ffn_xx_ref[:] = xl2
    xk2 = xl2 + sx2 * xk_ref[0]
    fk = mmat(xk2, fk_w_ref[:])
    fk = jnp.square(jnp.maximum(fk, 0.0))
    ffn_out = mmat(fk, fv_w_ref[:])
    y_ref[:] = x + ffn_out


def v7_layer_decode(
    x, att_xx, ffn_xx, heads, v_first, is_first,
    layer, cfg, interpret: bool = False,
):
    """One v7 layer decode step as a single pallas_call.

    x/att_xx/ffn_xx/v_first: [B, C] f32; heads: [B, H, S, S] f32;
    is_first: python bool or int. `layer` is a stacked-serving layer dict
    slice with fused keys (att.rkv.weight [3, C, C], att.lora1 [4, D, C],
    att.lora2 [4, C, D]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = x.shape
    h, s = cfg.head_count, cfg.head_size
    d = layer["att.lora1"].shape[-2]
    f = layer["ffn.key.weight"].shape[-2]

    b_pad = max(8, ((b + 7) // 8) * 8)

    def pad(arr):
        if arr.shape[0] == b_pad:
            return arr
        return jnp.pad(arr, ((0, b_pad - arr.shape[0]),) + ((0, 0),) * (arr.ndim - 1))

    args = [
        pad(x.astype(jnp.float32)),
        pad(att_xx.astype(jnp.float32)),
        pad(ffn_xx.astype(jnp.float32)),
        pad(heads.reshape(b, h, s, s)).reshape(b_pad * h, s, s).astype(jnp.float32),
        pad(v_first.astype(jnp.float32)),
        jnp.full((1, 1), 1 if is_first else 0, jnp.int32),
        layer["ln1.weight"].reshape(1, c), layer["ln1.bias"].reshape(1, c),
        layer["ln2.weight"].reshape(1, c), layer["ln2.bias"].reshape(1, c),
        layer["att.x_rwkvag"].reshape(6, c),
        layer["att.rkv.weight"].reshape(3 * c, c),
        layer["att.lora1"].reshape(4 * d, c),
        layer["att.lora2"].reshape(4 * c, d),
        layer["att.w0"].reshape(1, c), layer["att.a0"].reshape(1, c),
        layer["att.v0"].reshape(1, c), layer["att.k_k"].reshape(1, c),
        layer["att.k_a"].reshape(1, c),
        layer["att.r_k"].reshape(h, s),
        layer["att.ln_x.weight"].reshape(1, c), layer["att.ln_x.bias"].reshape(1, c),
        layer["att.output.weight"],
        layer["ffn.x_k"].reshape(1, c),
        layer["ffn.key.weight"],
        layer["ffn.value.weight"],
    ]

    out_shapes = (
        jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
        jax.ShapeDtypeStruct((b_pad * h, s, s), jnp.float32),
        jax.ShapeDtypeStruct((b_pad, c), jnp.float32),
    )

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = partial(
        _layer_kernel, n_heads=h, head_size=s, lora_dim=d
    )
    y, new_xx, new_fxx, new_heads, new_vf = pl.pallas_call(
        kernel,
        in_specs=[vm() for _ in args],
        out_specs=tuple(vm() for _ in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)

    return (
        y[:b],
        new_xx[:b],
        new_fxx[:b],
        new_heads.reshape(b_pad, h, s, s)[:b],
        new_vf[:b],
    )
