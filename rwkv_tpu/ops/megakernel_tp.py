"""Tensor-parallel Pallas decode kernels (v7, B=1, multi-chip).

The whole-model megakernel (ops/megakernel.py) is single-chip: GSPMD
cannot partition a pallas_call, and the layer recurrence needs an
all-reduce after the attention out-projection and after the FFN — points
that live INSIDE the whole-model grid. This module restructures decode
for TP the TPU way: under `shard_map` over a `model` mesh axis, each
chip runs per-layer Pallas kernels on its OWN weight shard, and the two
[C, 1] partial outputs per layer are `lax.psum`-ed over ICI between the
kernels (2 collectives of ~8-16 KB per layer — latency-bound, they
overlap poorly with nothing, but replace ~30 per-op launches per layer
with 2).

Sharding (Megatron-style, head-aligned — replaces the reference's
single-GPU layer offload, rwkv.cpp:82-115):
  - activations x, ln/mix vectors, lora1 (down-projections): REPLICATED;
  - rkv rows, lora2 rows (per gate), per-channel gate vectors
    (w0/a0/v0/k_k/k_a/ln_x/r_k) and the wkv head state: sharded by
    head block (c_loc = C/tp channels per chip);
  - att.out and ffn.value: sharded along the CONTRACTION dim (each chip
    multiplies its c_loc/f_loc slice -> full-C partial, then psum);
  - ffn.key rows: sharded (f_loc = F/tp).

B=1 and v7 only; quant = w8a8 (int8 + per-row scales) or bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.ops.megakernel import (
    _pack_nibbles_split_half, _w4_acc, _W4_INV16,
)

# Vectors stored as [L, 1, N] rows (lane-padding rule — an [N, 1] f32
# column window lane-pads 1 -> 128; see ops/megakernel.py).
_TP_SHARD_VECS = ("att.w0", "att.a0", "att.v0", "att.k_k", "att.k_a")
# ln_x w/b and r_k stay columns (grid-dependent head-tile slices).


def build_mega_pack_tp(pack: dict, cfg, tp: int, mesh) -> dict:
    """Re-layout a build_mega_pack (v7) output for TP execution and
    attach NamedShardings over mesh axis 'model'.

    Returns a dict of jax.Arrays placed with their TP shardings; meta
    keys: quant, d_lora, f_dim, tp."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    L = cfg.n_layer
    f_dim = pack["f_dim"]
    d = pack["d_lora"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    assert c % tp == 0 and h % tp == 0 and f_dim % tp == 0

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    out = {"quant": quant, "w4": w4, "d_lora": d, "f_dim": f_dim,
           "tp": tp}
    # (out["nf"] is added below with the FFN tiling)

    def pk_repl_k(a):
        """Pack nibbles along a REPLICATED K (last axis, whole)."""
        return _pack_nibbles_split_half(a) if w4 else a

    def pk_shard_k(a):
        """Pack nibbles along a SHARDED K: split-half WITHIN each
        chip's contiguous K block, so the per-chip matv4 halves line
        up with its local activation slice."""
        if not w4:
            return a
        k = a.shape[-1]
        blk = a.reshape(*a.shape[:-1], tp, k // tp)
        return _pack_nibbles_split_half(blk).reshape(*a.shape[:-1], k // 2)

    # rkv [L, 3C, C] -> [L, 3, C, C(/2)], rows (dim 2) sharded
    out["rkv"] = put(pk_repl_k(pack["rkv"].reshape(L, 3, c, c)),
                     (None, None, "model", None))
    # lora1 [L, 4d, C] replicated
    out["lora1"] = put(pack["lora1"], (None, None, None))
    # lora2 [L, 4C, d] -> [L, 4, C, d], rows (dim 2) sharded
    out["lora2"] = put(pack["lora2"].reshape(L, 4, c, d),
                       (None, None, "model", None))
    # out [L, C, C(/2)]: contraction dim (2) sharded
    out["out"] = put(pk_shard_k(pack["out"]), (None, None, "model"))
    # FFN mats are pre-tiled HERE (nf tiles over the hidden dim) so the
    # per-layer kernel consumes them directly — re-laying fv out inside
    # the lax.scan body would re-materialize ~MBs per layer per token.
    f_loc = f_dim // tp
    nf = 1
    while (f_loc // nf) * c > 4 * 1024 * 1024 or f_loc % nf:
        nf += 1
        if nf > f_loc:
            nf = f_loc
            break
    out["nf"] = nf
    f4 = f_dim // nf
    # fk [L, F, C] -> [L, nf, F/nf, C(/2)], tile rows (2) sharded;
    # fv [L, C, F] -> [L, nf, C, F/nf(/2)], contraction (3) sharded
    out["fk"] = put(pk_repl_k(pack["fk"].reshape(L, nf, f4, c)),
                    (None, None, "model", None))
    out["fv"] = put(
        pk_shard_k(jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)),
        (None, None, None, "model"),
    )
    if quant:
        out["rkv_d"] = put(pack["rkv_d"].reshape(L, 3, c, 1),
                           (None, None, "model", None))
        out["lora1_d"] = put(pack["lora1_d"], (None, None, None))
        out["lora2_d"] = put(pack["lora2_d"].reshape(L, 4, c, 1),
                             (None, None, "model", None))
        out["out_d"] = put(pack["out_d"], (None, None, None))  # full rows
        out["fk_d"] = put(
            jnp.swapaxes(pack["fk_d"].reshape(L, nf, f4, 1), 2, 3),
            (None, None, None, "model"),
        )  # [L, nf, 1, F/nf]
        out["fv_d"] = put(jnp.swapaxes(pack["fv_d"], 1, 2),
                          (None, None, None))  # [L, 1, C] full rows

    # replicated row vectors
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "ffn.x_k"):
        out[key] = put(jnp.swapaxes(pack[key], 1, 2), (None, None, None))
    out["coeff"] = put(jnp.swapaxes(pack["coeff"], 1, 2),
                       (None, None, None))
    # head-sharded row vectors
    for key in _TP_SHARD_VECS:
        out[key] = put(jnp.swapaxes(pack[key], 1, 2),
                       (None, None, "model"))
    # columns, head-sharded on their channel/head dim
    out["att.ln_x.weight"] = put(pack["att.ln_x.weight"],
                                 (None, "model", None))
    out["att.ln_x.bias"] = put(pack["att.ln_x.bias"],
                               (None, "model", None))
    out["r_k"] = put(pack["r_k"], (None, "model", None, None))
    return out


def _math_helpers(quant):
    """Shared mm/qx/ln closures for the per-layer kernels (one source —
    a qx tweak must reach both the att and ffn factories)."""

    def mm(w, x):
        return jax.lax.dot_general(
            w, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

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

    def matv(w, dd, xcol):
        if quant:
            x8, dx = qx(xcol)
            acc = mm(w, x8)
            return acc.astype(jnp.float32) * dx * dd
        # bf16 weights upcast in-register, f32/HIGHEST accumulation —
        # must match megakernel.py's single-chip matvecs exactly so the
        # TP-vs-1chip equality tests stay at their tight tolerances.
        return jax.lax.dot_general(
            w.astype(jnp.float32), xcol,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def matv4(w, dd, xcol):
        """split-half biased-lo packed int4 (see megakernel._w4_acc)."""
        kh = w.shape[1]
        x8, dx = qx(xcol)
        acc16 = _w4_acc(mm, w, x8[:kh], x8[kh:])
        return acc16.astype(jnp.float32) * (
            dx * jnp.float32(_W4_INV16)) * dd

    return mm, qx, ln, matv, matv4


def _make_att_kernel(c, c_loc, h_loc, s, d_lora, quant, nh, no,
                     w4=False):
    """Single-layer attention kernel on one chip's head shard.
    Grid (1 + nh + no,): [shift+loras+rkv | nh wkv tiles | no out tiles].
    Emits the FULL-C partial att output (pre-psum) plus the local state
    updates."""
    h4 = h_loc // nh
    c_o = c // no
    P_WKV0 = 1
    P_OUT0 = P_WKV0 + nh
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, att_in, heads_in, vf_in, first_ref,
             rkv, rkv_d, lora1, lora1_d, lora2, lora2_d, out_w, out_d,
             ln1w, ln1b, w0, a0, v0, kkw, kaw, lnxw, lnxb,
             coeff, rk,
             part_out, att_out, heads_out, vf_out,
             r_s, k_s, v_s, wd_s, ag_s, kk_s, g_s, xo_s) = refs
        else:
            (x_ref, att_in, heads_in, vf_in, first_ref,
             rkv, lora1, lora2, out_w,
             ln1w, ln1b, w0, a0, v0, kkw, kaw, lnxw, lnxb,
             coeff, rk,
             part_out, att_out, heads_out, vf_out,
             r_s, k_s, v_s, wd_s, ag_s, kk_s, g_s, xo_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            """Row window [1, N] -> column [N, 1] (exact natively —
            probe_row_layout.py pA)."""
            return ref[:].T

        @pl.when(p == 0)
        def _shift_loras():
            x = x_ref[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            sx = att_in[:] - xl
            att_out[:] = xl

            cf = coeff[:].T.reshape(6, c, 1)
            xr = xl + sx * cf[0]
            xw = xl + sx * cf[1]
            xk = xl + sx * cf[2]
            xv = xl + sx * cf[3]
            xa = xl + sx * cf[4]
            xg = xl + sx * cf[5]

            d = d_lora

            def l1_slice(lo):
                w = lora1[lo:lo + d]
                return w, (lora1_d[lo:lo + d] if quant else None)

            w_dn = jnp.tanh(matv(*l1_slice(0 * d), xw))
            a_dn = matv(*l1_slice(1 * d), xa)
            g_dn = jax.nn.sigmoid(matv(*l1_slice(2 * d), xg))
            v_dn = matv(*l1_slice(3 * d), xv)

            def l2(q, xin):
                return matv(
                    lora2[q], lora2_d[q] if quant else None, xin
                )

            w_l = l2(0, w_dn)
            a_l = l2(1, a_dn)
            g_s[:] = l2(2, g_dn)
            vm = l2(3, v_dn)

            wd_s[:] = jnp.exp(
                jax.nn.sigmoid(w_l + cv(w0)) * jnp.float32(-0.606531)
            )
            a_gate = jax.nn.sigmoid(a_l + cv(a0))
            ag_s[:] = a_gate

            def proj(q, xin):
                return mv_big(
                    rkv[q], rkv_d[q] if quant else None, xin
                )

            r_s[:] = proj(0, xr)
            k = proj(1, xk)
            v = proj(2, xv)

            kkv = (k * cv(kkw)).reshape(h_loc, s, 1)
            nrm = jnp.sqrt(jnp.sum(kkv * kkv, axis=1, keepdims=True))
            kkv = kkv / jnp.maximum(nrm, jnp.float32(1e-12))
            kk_s[:] = kkv.reshape(c_loc, 1)

            ka = k * cv(kaw)
            k_s[:] = k + (a_gate * ka - ka)

            first = first_ref[0, 0] > 0
            vf = vf_in[:]
            v_mixed = v + (vf - v) * jax.nn.sigmoid(vm + cv(v0))
            v_sel = jnp.where(first, v, v_mixed)
            v_s[:] = v_sel
            vf_out[:] = jnp.where(first, v, vf)

        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                return ref[pl.dslice(rows_lo, h4 * s)].reshape(h4, s, 1)

            r3, k3, v3, w3 = tile(r_s), tile(k_s), tile(v_s), tile(wd_s)
            a3 = -tile(kk_s)
            b3 = tile(kk_s) * tile(ag_s)

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            st = heads_in[pl.dslice(t * h4, h4)]
            sa_row = jnp.sum(st * a3, axis=1, keepdims=True)
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            st = st * w3 + k3 * v_row + b3 * sa_row
            out_row = jnp.sum(st * r3, axis=1, keepdims=True)
            heads_out[pl.dslice(t * h4, h4)] = st

            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            yn = y_col.reshape(h4 * s, 1)

            lw = lnxw[pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[pl.dslice(rows_lo, h4 * s)]
            xo = yn * lw + lb

            rkt = rk[pl.dslice(t * h4, h4)]
            dots = jnp.sum(k3 * r3 * rkt, axis=1, keepdims=True)
            bonus = (v3 * dots).reshape(h4 * s, 1)
            gt = g_s[pl.dslice(rows_lo, h4 * s)]
            xo_s[pl.dslice(rows_lo, h4 * s)] = (xo + bonus) * gt

        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[pl.dslice(t * c_o, c_o)]        # [c_o, c_loc(/2)]
            dd = (out_d[pl.dslice(t * c_o, c_o)]      # [c_o, 1] full rows
                  if quant else None)
            part_out[pl.dslice(t * c_o, c_o)] = mv_big(w, dd, xo_s[:])

    return kernel, 1 + nh + no, P_OUT0


def _make_ffn_kernel(c, f_loc, quant, nf, w4=False):
    """Single-layer v7 FFN kernel on one chip's F shard.
    Grid (1 + nf + 1,): [shift | nf fk tiles // nf fv tiles | last fv].
    Emits the FULL-C partial FFN output (pre-psum)."""
    f4 = f_loc // nf
    P_FK0 = 1
    P_FV0 = P_FK0 + 1
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, ffn_in,
             fk_w, fk_d, fv_w, fv_d,
             ln2w, ln2b, xkw,
             part_out, ffn_out,
             xk2_s, h_s, acc_s) = refs
        else:
            (x_ref, ffn_in,
             fk_w, fv_w,
             ln2w, ln2b, xkw,
             part_out, ffn_out,
             xk2_s, h_s, acc_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            return ref[:].T

        @pl.when(p == 0)
        def _shift():
            x = x_ref[:]
            xl2 = ln(x, cv(ln2w), cv(ln2b), 1e-5)
            sx2 = ffn_in[:] - xl2
            ffn_out[:] = xl2
            xk2_s[:] = xl2 + sx2 * cv(xkw)
            acc_s[:] = jnp.zeros_like(acc_s)

        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0], fk_d[0][0].T if quant else None, xk2_s[:]
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            h_s[pl.dslice(t * f4, f4)] = hk

        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = h_s[pl.dslice(t * f4, f4)]
            acc_s[:] += mv_big(
                fv_w[0][0], fv_d[0].T if quant else None, hk
            )

        @pl.when(p == P_FK0 + nf)
        def _finish():
            part_out[:] = acc_s[:]

    return kernel, 1 + nf + 1


def _whole(shape):
    return pl.BlockSpec(shape, lambda p: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _att_layer_call(lyr, x, att_xx, heads, v_first, first, cfg, tp,
                    quant, interpret, w4=False):
    """One chip's attention partial for one layer. All arrays LOCAL."""
    c = cfg.n_embed
    h_loc = cfg.head_count // tp
    s = cfg.head_size
    c_loc = c // tp
    d_lora = lyr["lora1"].shape[-2] // 4
    # head tiles: keep each state block <= ~1MB (B=1, lanes pad to 128)
    nh = 1
    while (h_loc // nh) * s * 128 * 4 > 1024 * 1024 or h_loc % nh:
        nh += 1
        if nh > h_loc:
            nh = h_loc
            break
    no = 1  # out rows [C, c_loc] — small K, keep one tile

    kernel, n_phase, _ = _make_att_kernel(
        c, c_loc, h_loc, s, d_lora, quant, nh, no, w4=w4
    )

    mat_names = ["rkv", "lora1", "lora2", "out"]
    mat_args, mat_specs = [], []
    for name in mat_names:
        w = lyr[name]
        mat_args.append(w)
        mat_specs.append(_whole(w.shape))
        if quant:
            dd = lyr[name + "_d"]
            mat_args.append(dd)
            mat_specs.append(_whole(dd.shape))

    vec_names = ["ln1.weight", "ln1.bias", "att.w0", "att.a0", "att.v0",
                 "att.k_k", "att.k_a", "att.ln_x.weight", "att.ln_x.bias"]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = (
        [x, att_xx, heads, v_first, first]
        + mat_args + vec_args + [lyr["coeff"], lyr["r_k"]]
    )
    in_specs = (
        [_whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s)),
         _whole((c_loc, 1)), _whole((1, 1))]
        + mat_specs + vec_specs
        + [_whole(lyr["coeff"].shape), _whole(lyr["r_k"].shape)]
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),       # partial out
        jax.ShapeDtypeStruct((c, 1), jnp.float32),       # new att_xx
        jax.ShapeDtypeStruct((h_loc, s, s), jnp.float32),
        jax.ShapeDtypeStruct((c_loc, 1), jnp.float32),   # new v_first
    )
    out_specs = (
        _whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s)),
        _whole((c_loc, 1)),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c_loc, 1), jnp.float32) for _ in range(7)
        ] + [pltpu.VMEM((c_loc, 1), jnp.float32)],  # xo_s
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _ffn_layer_call(lyr, x, ffn_xx, cfg, tp, quant, interpret,
                    w4=False):
    """One chip's FFN partial for one layer. All arrays LOCAL and
    PRE-TILED by build_mega_pack_tp (fk [nf, f4, C], fv [nf, C, f4],
    fk_d [nf, 1, f4], fv_d [1, C]) — only free [None] reshapes here."""
    c = cfg.n_embed
    nf = lyr["fk"].shape[0]
    f4 = lyr["fk"].shape[1]        # hidden rows per tile (unpacked)
    f_loc = nf * f4
    kernel, n_phase = _make_ffn_kernel(c, f_loc, quant, nf, w4=w4)

    fk = lyr["fk"][None]
    fv = lyr["fv"][None]

    def fk_spec(shape, first_p):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda p: (0, jnp.clip(p - first_p, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    mat_args = [fk]
    mat_specs = [fk_spec(lyr["fk"].shape[1:], 1)]  # K may be packed
    if quant:
        fk_d = lyr["fk_d"][None]
        mat_args.append(fk_d)
        mat_specs.append(fk_spec((1, f4), 1))
    mat_args.append(fv)
    mat_specs.append(fk_spec(lyr["fv"].shape[1:], 2))
    if quant:
        fv_d = lyr["fv_d"][None]               # [1, 1, C] rows
        mat_args.append(fv_d)
        mat_specs.append(_whole(fv_d.shape))

    vec_names = ["ln2.weight", "ln2.bias", "ffn.x_k"]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = [x, ffn_xx] + mat_args + vec_args
    in_specs = [_whole((c, 1)), _whole((c, 1))] + mat_specs + vec_specs
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),   # partial out
        jax.ShapeDtypeStruct((c, 1), jnp.float32),   # new ffn_xx
    )
    out_specs = (_whole((c, 1)), _whole((c, 1)))
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),       # xk2_s
            pltpu.VMEM((f_loc, 1), jnp.float32),   # h_s
            pltpu.VMEM((c, 1), jnp.float32),       # acc_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def tp_decode_step(pack, state_t, x0, cfg, mesh, interpret=False):
    """One v7 decode step TP-sharded over mesh axis 'model'.

    pack: build_mega_pack_tp output. state_t (global, sharded):
      att_xx/ffn_xx [L, C, 1] replicated, heads [L, H, S_j, S_i] sharded
      on H, v_first unused (recomputed per step). x0 [C, 1] f32
      replicated. Returns (x [C, 1], new state_t)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = pack["tp"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    L = cfg.n_layer

    meta = ("quant", "w4", "d_lora", "f_dim", "tp", "nf")
    arrs = {k: v for k, v in pack.items() if k not in meta}

    specs_in = {
        "rkv": P(None, None, "model", None),
        "lora1": P(None, None, None),
        "lora2": P(None, None, "model", None),
        "out": P(None, None, "model"),
        "fk": P(None, None, "model", None),
        "fv": P(None, None, None, "model"),
        "rkv_d": P(None, None, "model", None),
        "lora1_d": P(None, None, None),
        "lora2_d": P(None, None, "model", None),
        "out_d": P(None, None, None),
        "fk_d": P(None, None, None, "model"),
        "fv_d": P(None, None, None),
        "att.ln_x.weight": P(None, "model", None),
        "att.ln_x.bias": P(None, "model", None),
        "r_k": P(None, "model", None, None),
    }
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "ffn.x_k", "coeff"):
        specs_in[key] = P(None, None, None)
    for key in _TP_SHARD_VECS:
        specs_in[key] = P(None, None, "model")
    arr_specs = {k: specs_in[k] for k in arrs}

    state_specs = {
        "att_xx": P(None, None, None),
        "ffn_xx": P(None, None, None),
        "heads": P(None, "model", None, None),
    }

    def local_step(arrs, state, x0):
        def body(carry, inp):
            x, v_first, idx = carry
            lyr, att_xx, ffn_xx, heads = inp
            first = (idx == 0).astype(jnp.float32).reshape(1, 1)
            att_p, new_axx, new_heads, v_first = _att_layer_call(
                lyr, x, att_xx, heads, v_first, first, cfg, tp, quant,
                interpret, w4=w4,
            )
            att_full = jax.lax.psum(att_p, "model")
            x = x + att_full
            ffn_p, new_fxx = _ffn_layer_call(
                lyr, x, ffn_xx, cfg, tp, quant, interpret, w4=w4
            )
            x = x + jax.lax.psum(ffn_p, "model")
            return (x, v_first, idx + 1), (new_axx, new_fxx, new_heads)

        c_loc = cfg.n_embed // tp
        v0 = jnp.zeros((c_loc, 1), jnp.float32)
        (x, _, _), (axx, fxx, heads) = jax.lax.scan(
            body, (x0, v0, jnp.int32(0)),
            (arrs, state["att_xx"], state["ffn_xx"], state["heads"]),
        )
        return x, {"att_xx": axx, "ffn_xx": fxx, "heads": heads}

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(arr_specs, state_specs, P(None, None)),
        out_specs=(P(None, None), state_specs),
        check_vma=False,
    )
    return fn(arrs, state_t, x0.astype(jnp.float32))


# ---------------------------------------------------------------------------
# v6 TP kernels (Finch family, B=1)
# ---------------------------------------------------------------------------
#
# Same structure as the v7 pair above with the v6 layer math: the maa
# five-way LoRA chain runs REPLICATED in the att kernel's phase 0 (its
# outputs are full-C token-shift inputs to the sharded rkvg matvecs;
# maa1/maa2 are bandwidth-trivial), the decay LoRA's up-projection rows
# are sharded (w_dec is per-channel), and the FFN's receptance gate rows
# are sharded with the [c_loc, 1] gate all-gathered after the kernel
# (rg ⊙ psum(fv) needs the full gate; an 8-16KB collective).


def build_mega_pack_tp_v6(pack: dict, cfg, tp: int, mesh) -> dict:
    """Re-layout a build_mega_pack_v6 output for TP execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = cfg.n_embed
    L = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    def pk_repl_k(a):
        from rwkv_tpu.ops.megakernel import _pack_nibbles_split_half

        return _pack_nibbles_split_half(a) if w4 else a

    def pk_shard_k(a):
        from rwkv_tpu.ops.megakernel import _pack_nibbles_split_half

        if not w4:
            return a
        k = a.shape[-1]
        blk = a.reshape(*a.shape[:-1], tp, k // tp)
        return _pack_nibbles_split_half(blk).reshape(*a.shape[:-1], k // 2)

    out = {"quant": quant, "w4": w4, "d_maa": pack["d_maa"],
           "d_dec": pack["d_dec"], "f_dim": f_dim, "tp": tp}
    # rkvg [L, 4C, C] -> [L, 4, C, C(/2)] rows sharded
    out["rkvg"] = put(pk_repl_k(pack["rkvg"].reshape(L, 4, c, c)),
                      (None, None, "model", None))
    # maa1 [L, 5D, C] + maa2 [L, 5C, D] f32: replicated
    out["maa1"] = put(pack["maa1"], (None, None, None))
    out["maa2"] = put(pack["maa2"], (None, None, None))
    # dw1 [L, Dd, C] replicated; dw2 [L, C, Dd] rows sharded
    out["dw1"] = put(pack["dw1"], (None, None, None))
    out["dw2"] = put(pack["dw2"], (None, "model", None))
    # out [L, C, C(/2)] contraction sharded; fr [L, C, C] rows sharded
    out["out"] = put(pk_shard_k(pack["out"]), (None, None, "model"))
    out["fr"] = put(pk_repl_k(pack["fr"]), (None, "model", None))
    nf = 1
    f_loc = f_dim // tp
    while (f_loc // nf) * c > 4 * 1024 * 1024 or f_loc % nf:
        nf += 1
        if nf > f_loc:
            nf = f_loc
            break
    out["nf"] = nf
    f4 = f_dim // nf
    out["fk"] = put(pk_repl_k(pack["fk"].reshape(L, nf, f4, c)),
                    (None, None, "model", None))
    out["fv"] = put(
        pk_shard_k(jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)),
        (None, None, None, "model"),
    )
    if quant:
        out["rkvg_d"] = put(pack["rkvg_d"].reshape(L, 4, c, 1),
                            (None, None, "model", None))
        out["maa1_d"] = put(pack["maa1_d"], (None, None, None))
        out["dw1_d"] = put(pack["dw1_d"], (None, None, None))
        out["dw2_d"] = put(pack["dw2_d"], (None, "model", None))
        out["out_d"] = put(pack["out_d"], (None, None, None))  # full rows
        out["fr_d"] = put(pack["fr_d"], (None, "model", None))
        out["fk_d"] = put(
            jnp.swapaxes(pack["fk_d"].reshape(L, nf, f4, 1), 2, 3),
            (None, None, None, "model"),
        )
        out["fv_d"] = put(jnp.swapaxes(pack["fv_d"], 1, 2),
                          (None, None, None))
    # replicated row vectors
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "att.time_maa_x", "ffn.time_maa_k", "ffn.time_maa_r"):
        out[key] = put(jnp.swapaxes(pack[key], 1, 2), (None, None, None))
    out["maa5"] = put(jnp.swapaxes(pack["maa5"], 1, 2),
                      (None, None, None))
    # sharded per-channel rows / columns
    out["tdecay"] = put(jnp.swapaxes(pack["tdecay"], 1, 2),
                        (None, None, "model"))
    out["att.ln_x.weight"] = put(pack["att.ln_x.weight"],
                                 (None, "model", None))
    out["att.ln_x.bias"] = put(pack["att.ln_x.bias"],
                               (None, "model", None))
    out["tf"] = put(pack["tf"], (None, "model", None, None))
    return out


def _make_att_kernel_v6(c, c_loc, h_loc, s, d_maa, d_dec, quant, nh, no,
                        w4):
    h4 = h_loc // nh
    c_o = c // no
    P_WKV0 = 1
    P_OUT0 = P_WKV0 + nh
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, att_in, heads_in,
             rkvg, rkvg_d, maa1, maa1_d, dw1, dw1_d, dw2, dw2_d,
             out_w, out_d, maa2,
             ln1w, ln1b, maax, lnxw, lnxb,
             maa5, tdecay, tf,
             part_out, att_out, heads_out,
             r_s, k_s, v_s, g_s, wd_s, xo_s) = refs
        else:
            (x_ref, att_in, heads_in,
             rkvg, maa1, dw1, dw2, out_w, maa2,
             ln1w, ln1b, maax, lnxw, lnxb,
             maa5, tdecay, tf,
             part_out, att_out, heads_out,
             r_s, k_s, v_s, g_s, wd_s, xo_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            return ref[:].T

        @pl.when(p == 0)
        def _shift_loras():
            x = x_ref[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            sx = att_in[:] - xl
            att_out[:] = xl

            xxx = xl + sx * cv(maax)
            mixdn = jnp.tanh(matv(maa1[:], maa1_d[:] if quant else None,
                                  xxx))
            d = d_maa

            def maa_up(lo_c, lo_d):
                return jax.lax.dot_general(
                    maa2[lo_c:lo_c + c], mixdn[lo_d:lo_d + d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            cf = maa5[:].T.reshape(5, c, 1)  # order w, k, v, r, g
            xw = xl + sx * (cf[0] + maa_up(0 * c, 0 * d))
            xk = xl + sx * (cf[1] + maa_up(1 * c, 1 * d))
            xv = xl + sx * (cf[2] + maa_up(2 * c, 2 * d))
            xr = xl + sx * (cf[3] + maa_up(3 * c, 3 * d))
            xg = xl + sx * (cf[4] + maa_up(4 * c, 4 * d))

            w_dn = jnp.tanh(matv(dw1[:], dw1_d[:] if quant else None, xw))
            w_l = matv(dw2[:], dw2_d[:] if quant else None, w_dn)
            wd_s[:] = jnp.exp(-jnp.exp(w_l + cv(tdecay)))

            def proj(q, xin):
                return mv_big(
                    rkvg[q], rkvg_d[q] if quant else None, xin
                )

            r_s[:] = proj(0, xr)
            k_s[:] = proj(1, xk)
            v_s[:] = proj(2, xv)
            gg = proj(3, xg)
            g_s[:] = gg * jax.nn.sigmoid(gg)  # silu

        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                return ref[pl.dslice(rows_lo, h4 * s)].reshape(h4, s, 1)

            r3, k3, v3, w3 = tile(r_s), tile(k_s), tile(v_s), tile(wd_s)
            tf3 = tf[pl.dslice(t * h4, h4)]                # [h4, s, 1]

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            st = heads_in[pl.dslice(t * h4, h4)]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * w3 + k3 * v_row
            heads_out[pl.dslice(t * h4, h4)] = st

            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            yn = y_col.reshape(h4 * s, 1)

            lw = lnxw[pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[pl.dslice(rows_lo, h4 * s)]
            gt = g_s[pl.dslice(rows_lo, h4 * s)]
            xo_s[pl.dslice(rows_lo, h4 * s)] = (yn * lw + lb) * gt

        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[pl.dslice(t * c_o, c_o)]
            dd = (out_d[pl.dslice(t * c_o, c_o)]
                  if quant else None)
            part_out[pl.dslice(t * c_o, c_o)] = mv_big(w, dd, xo_s[:])

    return kernel, 1 + nh + no


def _make_ffn_kernel_v6(c, c_loc, f_loc, quant, nf, w4, mix45=False):
    """Gated FFN on one chip: [shift | fr (gate rows, c_loc) | nf fk //
    nf fv | done]. Emits (fv partial [C, 1], rg [c_loc, 1]).

    Serves v6 AND v4/v5 — the only difference is the token-shift mix:
    v6 interpolates toward prev (xl + (prev-xl)*maa, rwkv_graph.inc
    time_maa path) while v4/v5 interpolate toward xl (xl*mix +
    prev*(1-mix), rwkv_graph.inc:84-117); mix45 selects the latter."""
    f4 = f_loc // nf
    P_FR = 1
    P_FK0 = 2
    P_FV0 = P_FK0 + 1
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, ffn_in,
             fr_w, fr_d, fk_w, fk_d, fv_w, fv_d,
             ln2w, ln2b, fxk, fxr,
             part_out, rg_out, ffn_out,
             xk2_s, xr2_s, h_s, acc_s) = refs
        else:
            (x_ref, ffn_in,
             fr_w, fk_w, fv_w,
             ln2w, ln2b, fxk, fxr,
             part_out, rg_out, ffn_out,
             xk2_s, xr2_s, h_s, acc_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            return ref[:].T

        @pl.when(p == 0)
        def _shift():
            x = x_ref[:]
            xl2 = ln(x, cv(ln2w), cv(ln2b), 1e-5)
            prev2 = ffn_in[:]
            ffn_out[:] = xl2
            if mix45:
                cfk, cfr = cv(fxk), cv(fxr)
                xk2_s[:] = xl2 * cfk + (prev2 - prev2 * cfk)
                xr2_s[:] = xl2 * cfr + (prev2 - prev2 * cfr)
            else:
                sx2 = prev2 - xl2
                xk2_s[:] = xl2 + sx2 * cv(fxk)
                xr2_s[:] = xl2 + sx2 * cv(fxr)
            acc_s[:] = jnp.zeros_like(acc_s)

        @pl.when(p == P_FR)
        def _fr():
            rg_out[:] = jax.nn.sigmoid(
                mv_big(fr_w[:], fr_d[:] if quant else None, xr2_s[:])
            )

        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0], fk_d[0][0].T if quant else None, xk2_s[:]
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            h_s[pl.dslice(t * f4, f4)] = hk

        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = h_s[pl.dslice(t * f4, f4)]
            acc_s[:] += mv_big(
                fv_w[0][0], fv_d[0].T if quant else None, hk
            )

        @pl.when(p == P_FK0 + nf)
        def _finish():
            part_out[:] = acc_s[:]

    return kernel, P_FK0 + nf + 1


def _att_layer_call_v6(lyr, x, att_xx, heads, cfg, tp, quant, interpret,
                       w4):
    c = cfg.n_embed
    h_loc = cfg.head_count // tp
    s = cfg.head_size
    c_loc = c // tp
    d_maa = lyr["maa1"].shape[-2] // 5
    d_dec = lyr["dw1"].shape[-2]
    nh = 1
    while (h_loc // nh) * s * 128 * 4 > 1024 * 1024 or h_loc % nh:
        nh += 1
        if nh > h_loc:
            nh = h_loc
            break
    no = 1

    kernel, n_phase = _make_att_kernel_v6(
        c, c_loc, h_loc, s, d_maa, d_dec, quant, nh, no, w4
    )

    mat_names = ["rkvg", "maa1", "dw1", "dw2", "out"]
    mat_args, mat_specs = [], []
    for name in mat_names:
        w = lyr[name]
        mat_args.append(w)
        mat_specs.append(_whole(w.shape))
        if quant:
            dd = lyr[name + "_d"]
            mat_args.append(dd)
            mat_specs.append(_whole(dd.shape))
    mat_args.append(lyr["maa2"])
    mat_specs.append(_whole(lyr["maa2"].shape))

    vec_names = ["ln1.weight", "ln1.bias", "att.time_maa_x",
                 "att.ln_x.weight", "att.ln_x.bias"]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = (
        [x, att_xx, heads]
        + mat_args + vec_args
        + [lyr["maa5"], lyr["tdecay"], lyr["tf"]]
    )
    in_specs = (
        [_whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s))]
        + mat_specs + vec_specs
        + [_whole(lyr["maa5"].shape), _whole(lyr["tdecay"].shape),
           _whole(lyr["tf"].shape)]
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((h_loc, s, s), jnp.float32),
    )
    out_specs = (_whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s)))
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c_loc, 1), jnp.float32) for _ in range(5)
        ] + [pltpu.VMEM((c_loc, 1), jnp.float32)],  # xo_s
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _ffn_layer_call_v6(lyr, x, ffn_xx, cfg, tp, quant, interpret, w4,
                       mix_keys=("ffn.time_maa_k", "ffn.time_maa_r"),
                       mix45=False):
    c = cfg.n_embed
    c_loc = c // tp
    nf = lyr["fk"].shape[0]
    f4 = lyr["fk"].shape[1]
    f_loc = nf * f4
    kernel, n_phase = _make_ffn_kernel_v6(c, c_loc, f_loc, quant, nf, w4,
                                          mix45=mix45)

    fk = lyr["fk"][None]
    fv = lyr["fv"][None]

    def fk_spec(shape, first_p):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda p: (0, jnp.clip(p - first_p, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    mat_args = [lyr["fr"]]
    mat_specs = [_whole(lyr["fr"].shape)]
    if quant:
        mat_args.append(lyr["fr_d"])
        mat_specs.append(_whole(lyr["fr_d"].shape))
    mat_args.append(fk)
    mat_specs.append(fk_spec(lyr["fk"].shape[1:], 2))
    if quant:
        mat_args.append(lyr["fk_d"][None])
        mat_specs.append(fk_spec((1, f4), 2))
    mat_args.append(fv)
    mat_specs.append(fk_spec(lyr["fv"].shape[1:], 3))
    if quant:
        fv_d = lyr["fv_d"][None]
        mat_args.append(fv_d)
        mat_specs.append(_whole(fv_d.shape))

    vec_names = ["ln2.weight", "ln2.bias", mix_keys[0], mix_keys[1]]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = [x, ffn_xx] + mat_args + vec_args
    in_specs = [_whole((c, 1)), _whole((c, 1))] + mat_specs + vec_specs
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),      # fv partial
        jax.ShapeDtypeStruct((c_loc, 1), jnp.float32),  # rg (local rows)
        jax.ShapeDtypeStruct((c, 1), jnp.float32),      # new ffn_xx
    )
    out_specs = (_whole((c, 1)), _whole((c_loc, 1)), _whole((c, 1)))
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),       # xk2_s
            pltpu.VMEM((c, 1), jnp.float32),       # xr2_s
            pltpu.VMEM((f_loc, 1), jnp.float32),   # h_s
            pltpu.VMEM((c, 1), jnp.float32),       # acc_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def tp_decode_step_v6(pack, state_t, x0, cfg, mesh, interpret=False):
    """One v6 decode step TP-sharded over mesh axis 'model' (see
    tp_decode_step). state_t: att_xx/ffn_xx [L, C, 1] replicated,
    heads [L, H, S_j, S_i] sharded on H."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = pack["tp"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))

    meta = ("quant", "w4", "d_maa", "d_dec", "f_dim", "tp", "nf")
    arrs = {k: v for k, v in pack.items() if k not in meta}

    specs_in = {
        "rkvg": P(None, None, "model", None),
        "maa1": P(None, None, None),
        "maa2": P(None, None, None),
        "dw1": P(None, None, None),
        "dw2": P(None, "model", None),
        "out": P(None, None, "model"),
        "fr": P(None, "model", None),
        "fk": P(None, None, "model", None),
        "fv": P(None, None, None, "model"),
        "rkvg_d": P(None, None, "model", None),
        "maa1_d": P(None, None, None),
        "dw1_d": P(None, None, None),
        "dw2_d": P(None, "model", None),
        "out_d": P(None, None, None),
        "fr_d": P(None, "model", None),
        "fk_d": P(None, None, None, "model"),
        "fv_d": P(None, None, None),
        "tdecay": P(None, None, "model"),
        "att.ln_x.weight": P(None, "model", None),
        "att.ln_x.bias": P(None, "model", None),
        "tf": P(None, "model", None, None),
        "maa5": P(None, None, None),
    }
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "att.time_maa_x", "ffn.time_maa_k", "ffn.time_maa_r"):
        specs_in[key] = P(None, None, None)
    arr_specs = {k: specs_in[k] for k in arrs}

    state_specs = {
        "att_xx": P(None, None, None),
        "ffn_xx": P(None, None, None),
        "heads": P(None, "model", None, None),
    }

    def local_step(arrs, state, x0):
        def body(x, inp):
            lyr, att_xx, ffn_xx, heads = inp
            att_p, new_axx, new_heads = _att_layer_call_v6(
                lyr, x, att_xx, heads, cfg, tp, quant, interpret, w4
            )
            x = x + jax.lax.psum(att_p, "model")
            ffn_p, rg_loc, new_fxx = _ffn_layer_call_v6(
                lyr, x, ffn_xx, cfg, tp, quant, interpret, w4
            )
            rg = jax.lax.all_gather(
                rg_loc[:, 0], "model", tiled=True
            )[:, None]
            x = x + rg * jax.lax.psum(ffn_p, "model")
            return x, (new_axx, new_fxx, new_heads)

        x, (axx, fxx, heads) = jax.lax.scan(
            body, x0,
            (arrs, state["att_xx"], state["ffn_xx"], state["heads"]),
        )
        return x, {"att_xx": axx, "ffn_xx": fxx, "heads": heads}

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(arr_specs, state_specs, P(None, None)),
        out_specs=(P(None, None), state_specs),
        check_vma=False,
    )
    return fn(arrs, state_t, x0.astype(jnp.float32))


# ---------------------------------------------------------------------------
# v4 TP kernels (Raven/World 7B family, B=1)
# ---------------------------------------------------------------------------
#
# The reference's flagship 7B benchmark model is RWKV-4 (README.md:65-76)
# — this is the multi-chip decode path for that class. v4 is the easiest
# architecture to shard: the wkv state is PER-CHANNEL scalar columns
# (aa/bb/pp, rwkv_graph.inc:119-161), so sharding rkv rows by channel
# block makes the whole attention inner loop chip-local; only the out
# projection (contraction-sharded) needs a psum. FFN is the gated v4/v5
# form (fr receptance rows sharded, rg all-gathered — same collective
# shape as v6).


def build_mega_pack_tp_v4(pack: dict, cfg, tp: int, mesh) -> dict:
    """Re-layout a build_mega_pack_v4 output for TP execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = cfg.n_embed
    L = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    assert c % tp == 0 and f_dim % tp == 0

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    def pk_repl_k(a):
        return _pack_nibbles_split_half(a) if w4 else a

    def pk_shard_k(a):
        if not w4:
            return a
        k = a.shape[-1]
        blk = a.reshape(*a.shape[:-1], tp, k // tp)
        return _pack_nibbles_split_half(blk).reshape(*a.shape[:-1], k // 2)

    out = {"quant": quant, "w4": w4, "f_dim": f_dim, "tp": tp}
    # rkv [L, 3C, C] -> [L, 3, C, C(/2)], rows sharded
    out["rkv"] = put(pk_repl_k(pack["rkv"].reshape(L, 3, c, c)),
                     (None, None, "model", None))
    # out [L, C, C(/2)] contraction sharded; fr [L, C, C] gate rows sharded
    out["out"] = put(pk_shard_k(pack["out"]), (None, None, "model"))
    out["fr"] = put(pk_repl_k(pack["fr"]), (None, "model", None))
    nf = 1
    f_loc = f_dim // tp
    while (f_loc // nf) * c > 4 * 1024 * 1024 or f_loc % nf:
        nf += 1
        if nf > f_loc:
            nf = f_loc
            break
    out["nf"] = nf
    f4 = f_dim // nf
    out["fk"] = put(pk_repl_k(pack["fk"].reshape(L, nf, f4, c)),
                    (None, None, "model", None))
    out["fv"] = put(
        pk_shard_k(jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)),
        (None, None, None, "model"),
    )
    if quant:
        out["rkv_d"] = put(pack["rkv_d"].reshape(L, 3, c, 1),
                           (None, None, "model", None))
        out["out_d"] = put(pack["out_d"], (None, None, None))  # full rows
        out["fr_d"] = put(pack["fr_d"], (None, "model", None))
        out["fk_d"] = put(
            jnp.swapaxes(pack["fk_d"].reshape(L, nf, f4, 1), 2, 3),
            (None, None, None, "model"),
        )
        out["fv_d"] = put(jnp.swapaxes(pack["fv_d"], 1, 2),
                          (None, None, None))
    # replicated row vectors (the token-shift mixes consume full-C x)
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias"):
        out[key] = put(jnp.swapaxes(pack[key], 1, 2), (None, None, None))
    out["amix"] = put(jnp.swapaxes(pack["amix"], 1, 2), (None, None, None))
    # fmix [L, 2C, 1] -> two [L, 1, C] rows (k, r) for the shared gated
    # FFN kernel's separate-ref interface
    fmix = jnp.swapaxes(pack["fmix"], 1, 2)
    out["fmix_k"] = put(fmix[:, :, :c], (None, None, None))
    out["fmix_r"] = put(fmix[:, :, c:], (None, None, None))
    # per-channel wkv bonus/decay rows: sharded with the channel block
    out["tf"] = put(jnp.swapaxes(pack["tf"], 1, 2), (None, None, "model"))
    out["td"] = put(jnp.swapaxes(pack["td"], 1, 2), (None, None, "model"))
    return out


def _make_att_kernel_v4(c, c_loc, quant, no, w4):
    """Single-layer v4 attention on one chip's channel shard.
    Grid (1 + no,): [shift + rkv + scalar wkv | no out tiles]. The wkv
    max-trick recurrence (rwkv_graph.inc:119-161) runs entirely on the
    local channel block."""
    c_o = c // no
    P_OUT0 = 1
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, att_in, aa_in, bb_in, pp_in,
             rkv, rkv_d, out_w, out_d,
             ln1w, ln1b, amix, tfr, tdr,
             part_out, att_out, aa_out, bb_out, pp_out,
             xo_s) = refs
        else:
            (x_ref, att_in, aa_in, bb_in, pp_in,
             rkv, out_w,
             ln1w, ln1b, amix, tfr, tdr,
             part_out, att_out, aa_out, bb_out, pp_out,
             xo_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            return ref[:].T

        @pl.when(p == 0)
        def _shift_wkv():
            x = x_ref[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            prev = att_in[:]
            att_out[:] = xl

            cf = amix[:].T.reshape(3, c, 1)  # order k, v, r
            xk = xl * cf[0] + (prev - prev * cf[0])
            xv = xl * cf[1] + (prev - prev * cf[1])
            xr = xl * cf[2] + (prev - prev * cf[2])

            def proj(q, xin):
                return mv_big(rkv[q], rkv_d[q] if quant else None, xin)

            r = jax.nn.sigmoid(proj(0, xr))
            k = proj(1, xk)
            v = proj(2, xv)

            # scalar-state wkv, local channels (rwkv_graph.inc:119-161)
            aa, bb, pp = aa_in[:], bb_in[:], pp_in[:]
            tf, td = cv(tfr), cv(tdr)
            ww = tf + k
            qq = jnp.maximum(pp, ww)
            e1 = jnp.exp(pp - qq)
            e2 = jnp.exp(ww - qq)
            wkv = (e1 * aa + e2 * v) / (e1 * bb + e2)
            ww2 = pp + td
            qq2 = jnp.maximum(ww2, k)
            e1b = jnp.exp(ww2 - qq2)
            e2b = jnp.exp(k - qq2)
            aa_out[:] = e1b * aa + e2b * v
            bb_out[:] = e1b * bb + e2b
            pp_out[:] = qq2

            xo_s[:] = r * wkv

        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[pl.dslice(t * c_o, c_o)]
            dd = out_d[pl.dslice(t * c_o, c_o)] if quant else None
            part_out[pl.dslice(t * c_o, c_o)] = mv_big(w, dd, xo_s[:])

    return kernel, 1 + no


def _att_layer_call_v4(lyr, x, att_xx, aa, bb, pp, cfg, tp, quant,
                       interpret, w4):
    c = cfg.n_embed
    c_loc = c // tp
    no = 1

    kernel, n_phase = _make_att_kernel_v4(c, c_loc, quant, no, w4)

    mat_names = ["rkv", "out"]
    mat_args, mat_specs = [], []
    for name in mat_names:
        w = lyr[name]
        mat_args.append(w)
        mat_specs.append(_whole(w.shape))
        if quant:
            dd = lyr[name + "_d"]
            mat_args.append(dd)
            mat_specs.append(_whole(dd.shape))

    vec_names = ["ln1.weight", "ln1.bias", "amix", "tf", "td"]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = [x, att_xx, aa, bb, pp] + mat_args + vec_args
    in_specs = (
        [_whole((c, 1)), _whole((c, 1)), _whole((c_loc, 1)),
         _whole((c_loc, 1)), _whole((c_loc, 1))]
        + mat_specs + vec_specs
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),       # partial out
        jax.ShapeDtypeStruct((c, 1), jnp.float32),       # new att_xx
        jax.ShapeDtypeStruct((c_loc, 1), jnp.float32),   # aa
        jax.ShapeDtypeStruct((c_loc, 1), jnp.float32),   # bb
        jax.ShapeDtypeStruct((c_loc, 1), jnp.float32),   # pp
    )
    out_specs = (
        _whole((c, 1)), _whole((c, 1)), _whole((c_loc, 1)),
        _whole((c_loc, 1)), _whole((c_loc, 1)),
    )
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((c_loc, 1), jnp.float32)],  # xo_s
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def tp_decode_step_v4(pack, state_t, x0, cfg, mesh, interpret=False):
    """One v4 decode step TP-sharded over mesh axis 'model'.

    state_t: att_xx/ffn_xx [L, C, 1] replicated; aa/bb/pp [L, C, 1]
    sharded on the channel dim (they live with the rkv row shard)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = pack["tp"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))

    meta = ("quant", "w4", "f_dim", "tp", "nf")
    arrs = {k: v for k, v in pack.items() if k not in meta}

    specs_in = {
        "rkv": P(None, None, "model", None),
        "out": P(None, None, "model"),
        "fr": P(None, "model", None),
        "fk": P(None, None, "model", None),
        "fv": P(None, None, None, "model"),
        "rkv_d": P(None, None, "model", None),
        "out_d": P(None, None, None),
        "fr_d": P(None, "model", None),
        "fk_d": P(None, None, None, "model"),
        "fv_d": P(None, None, None),
        "tf": P(None, None, "model"),
        "td": P(None, None, "model"),
    }
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "amix", "fmix_k", "fmix_r"):
        specs_in[key] = P(None, None, None)
    arr_specs = {k: specs_in[k] for k in arrs}

    state_specs = {
        "att_xx": P(None, None, None),
        "ffn_xx": P(None, None, None),
        "aa": P(None, "model", None),
        "bb": P(None, "model", None),
        "pp": P(None, "model", None),
    }

    def local_step(arrs, state, x0):
        def body(x, inp):
            lyr, att_xx, ffn_xx, aa, bb, pp = inp
            att_p, new_axx, naa, nbb, npp = _att_layer_call_v4(
                lyr, x, att_xx, aa, bb, pp, cfg, tp, quant, interpret, w4
            )
            x = x + jax.lax.psum(att_p, "model")
            ffn_p, rg_loc, new_fxx = _ffn_layer_call_v6(
                lyr, x, ffn_xx, cfg, tp, quant, interpret, w4,
                mix_keys=("fmix_k", "fmix_r"), mix45=True,
            )
            rg = jax.lax.all_gather(
                rg_loc[:, 0], "model", tiled=True
            )[:, None]
            x = x + rg * jax.lax.psum(ffn_p, "model")
            return x, (new_axx, new_fxx, naa, nbb, npp)

        x, (axx, fxx, aa, bb, pp) = jax.lax.scan(
            body, x0,
            (arrs, state["att_xx"], state["ffn_xx"],
             state["aa"], state["bb"], state["pp"]),
        )
        return x, {"att_xx": axx, "ffn_xx": fxx,
                   "aa": aa, "bb": bb, "pp": pp}

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(arr_specs, state_specs, P(None, None)),
        out_specs=(P(None, None), state_specs),
        check_vma=False,
    )
    return fn(arrs, state_t, x0.astype(jnp.float32))


# ---------------------------------------------------------------------------
# v5 TP kernels (World v5.1/5.2 family, B=1)
# ---------------------------------------------------------------------------
#
# Head-sharded like v7: rkv(g) rows, per-head decay/bonus (td/tf), ln_x
# channels and the wkv head state live with the head block; out is
# contraction-sharded + psum; FFN is the shared gated v4/v5 kernel.


def build_mega_pack_tp_v5(pack: dict, cfg, tp: int, mesh) -> dict:
    """Re-layout a build_mega_pack_v5 output for TP execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    c = cfg.n_embed
    h = cfg.head_count
    L = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    has_gate = pack["has_gate"]
    n_mix = 4 if has_gate else 3
    assert c % tp == 0 and h % tp == 0 and f_dim % tp == 0

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    def pk_repl_k(a):
        return _pack_nibbles_split_half(a) if w4 else a

    def pk_shard_k(a):
        if not w4:
            return a
        k = a.shape[-1]
        blk = a.reshape(*a.shape[:-1], tp, k // tp)
        return _pack_nibbles_split_half(blk).reshape(*a.shape[:-1], k // 2)

    out = {"quant": quant, "w4": w4, "f_dim": f_dim, "tp": tp,
           "has_gate": has_gate}
    # rkvg [L, n_mix*C, C] -> [L, n_mix, C, C(/2)], rows sharded
    out["rkvg"] = put(pk_repl_k(pack["rkvg"].reshape(L, n_mix, c, c)),
                      (None, None, "model", None))
    out["out"] = put(pk_shard_k(pack["out"]), (None, None, "model"))
    out["fr"] = put(pk_repl_k(pack["fr"]), (None, "model", None))
    nf = 1
    f_loc = f_dim // tp
    while (f_loc // nf) * c > 4 * 1024 * 1024 or f_loc % nf:
        nf += 1
        if nf > f_loc:
            nf = f_loc
            break
    out["nf"] = nf
    f4 = f_dim // nf
    out["fk"] = put(pk_repl_k(pack["fk"].reshape(L, nf, f4, c)),
                    (None, None, "model", None))
    out["fv"] = put(
        pk_shard_k(jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)),
        (None, None, None, "model"),
    )
    if quant:
        out["rkvg_d"] = put(pack["rkvg_d"].reshape(L, n_mix, c, 1),
                            (None, None, "model", None))
        out["out_d"] = put(pack["out_d"], (None, None, None))  # full rows
        out["fr_d"] = put(pack["fr_d"], (None, "model", None))
        out["fk_d"] = put(
            jnp.swapaxes(pack["fk_d"].reshape(L, nf, f4, 1), 2, 3),
            (None, None, None, "model"),
        )
        out["fv_d"] = put(jnp.swapaxes(pack["fv_d"], 1, 2),
                          (None, None, None))
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias"):
        out[key] = put(jnp.swapaxes(pack[key], 1, 2), (None, None, None))
    out["amix"] = put(jnp.swapaxes(pack["amix"], 1, 2), (None, None, None))
    fmix = jnp.swapaxes(pack["fmix"], 1, 2)
    out["fmix_k"] = put(fmix[:, :, :c], (None, None, None))
    out["fmix_r"] = put(fmix[:, :, c:], (None, None, None))
    # per-head decay/bonus + group-norm affine: sharded with the heads
    out["td"] = put(pack["td"], (None, "model", None, None))
    out["tf"] = put(pack["tf"], (None, "model", None, None))
    out["att.ln_x.weight"] = put(pack["att.ln_x.weight"],
                                 (None, "model", None))
    out["att.ln_x.bias"] = put(pack["att.ln_x.bias"],
                               (None, "model", None))
    return out


def _make_att_kernel_v5(c, c_loc, h_loc, s, quant, nh, no, w4, has_gate):
    """Single-layer v5 attention on one chip's head shard.
    Grid (1 + nh + no,): [shift + rkvg | nh wkv tiles | no out tiles]."""
    n_mix = 4 if has_gate else 3
    h4 = h_loc // nh
    c_o = c // no
    P_WKV0 = 1
    P_OUT0 = P_WKV0 + nh
    mm, qx, ln, matv, matv4 = _math_helpers(quant)
    mv_big = matv4 if w4 else matv

    def kernel(*refs):
        if quant:
            (x_ref, att_in, heads_in,
             rkvg, rkvg_d, out_w, out_d,
             ln1w, ln1b, lnxw, lnxb, amix, td, tf,
             part_out, att_out, heads_out,
             r_s, k_s, v_s, g_s, xo_s) = refs
        else:
            (x_ref, att_in, heads_in,
             rkvg, out_w,
             ln1w, ln1b, lnxw, lnxb, amix, td, tf,
             part_out, att_out, heads_out,
             r_s, k_s, v_s, g_s, xo_s) = refs

        p = pl.program_id(0)

        def cv(ref):
            return ref[:].T

        @pl.when(p == 0)
        def _shift_proj():
            x = x_ref[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            prev = att_in[:]
            att_out[:] = xl

            cf = amix[:].T.reshape(n_mix, c, 1)  # order k, v, r(, g)

            def mixi(ci):
                return xl * cf[ci] + (prev - prev * cf[ci])

            def proj(q, xin):
                return mv_big(rkvg[q], rkvg_d[q] if quant else None, xin)

            r_s[:] = proj(0, mixi(2))
            k_s[:] = proj(1, mixi(0))
            v_s[:] = proj(2, mixi(1))
            if has_gate:
                gg = proj(3, mixi(3))
                g_s[:] = gg * jax.nn.sigmoid(gg)  # silu

        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                return ref[pl.dslice(rows_lo, h4 * s)].reshape(h4, s, 1)

            r3, k3, v3 = tile(r_s), tile(k_s), tile(v_s)
            td3 = td[pl.dslice(t * h4, h4)]                # [h4, s, 1]
            tf3 = tf[pl.dslice(t * h4, h4)]

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            st = heads_in[pl.dslice(t * h4, h4)]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * td3 + k3 * v_row
            heads_out[pl.dslice(t * h4, h4)] = st

            # group norm per head over S_i, eps 1e-5 (v5)
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(1e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            yn = y_col.reshape(h4 * s, 1)

            lw = lnxw[pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[pl.dslice(rows_lo, h4 * s)]
            xo = yn * lw + lb
            if has_gate:
                xo = xo * g_s[pl.dslice(rows_lo, h4 * s)]
            xo_s[pl.dslice(rows_lo, h4 * s)] = xo

        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[pl.dslice(t * c_o, c_o)]
            dd = out_d[pl.dslice(t * c_o, c_o)] if quant else None
            part_out[pl.dslice(t * c_o, c_o)] = mv_big(w, dd, xo_s[:])

    return kernel, 1 + nh + no


def _att_layer_call_v5(lyr, x, att_xx, heads, cfg, tp, quant, interpret,
                       w4, has_gate):
    c = cfg.n_embed
    h_loc = cfg.head_count // tp
    s = cfg.head_size
    c_loc = c // tp
    nh = 1
    while (h_loc // nh) * s * 128 * 4 > 1024 * 1024 or h_loc % nh:
        nh += 1
        if nh > h_loc:
            nh = h_loc
            break
    no = 1

    kernel, n_phase = _make_att_kernel_v5(
        c, c_loc, h_loc, s, quant, nh, no, w4, has_gate
    )

    mat_names = ["rkvg", "out"]
    mat_args, mat_specs = [], []
    for name in mat_names:
        w = lyr[name]
        mat_args.append(w)
        mat_specs.append(_whole(w.shape))
        if quant:
            dd = lyr[name + "_d"]
            mat_args.append(dd)
            mat_specs.append(_whole(dd.shape))

    vec_names = ["ln1.weight", "ln1.bias", "att.ln_x.weight",
                 "att.ln_x.bias", "amix", "td", "tf"]
    vec_args = [lyr[k] for k in vec_names]
    vec_specs = [_whole(lyr[k].shape) for k in vec_names]

    args = [x, att_xx, heads] + mat_args + vec_args
    in_specs = (
        [_whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s))]
        + mat_specs + vec_specs
    )
    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((h_loc, s, s), jnp.float32),
    )
    out_specs = (_whole((c, 1)), _whole((c, 1)), _whole((h_loc, s, s)))
    return pl.pallas_call(
        kernel,
        grid=(n_phase,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c_loc, 1), jnp.float32) for _ in range(5)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def tp_decode_step_v5(pack, state_t, x0, cfg, mesh, interpret=False):
    """One v5.1/v5.2 decode step TP-sharded over mesh axis 'model'.

    state_t: att_xx/ffn_xx [L, C, 1] replicated, heads [L, H, S_j, S_i]
    sharded on H."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    tp = pack["tp"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    has_gate = pack["has_gate"]

    meta = ("quant", "w4", "f_dim", "tp", "nf", "has_gate")
    arrs = {k: v for k, v in pack.items() if k not in meta}

    specs_in = {
        "rkvg": P(None, None, "model", None),
        "out": P(None, None, "model"),
        "fr": P(None, "model", None),
        "fk": P(None, None, "model", None),
        "fv": P(None, None, None, "model"),
        "rkvg_d": P(None, None, "model", None),
        "out_d": P(None, None, None),
        "fr_d": P(None, "model", None),
        "fk_d": P(None, None, None, "model"),
        "fv_d": P(None, None, None),
        "td": P(None, "model", None, None),
        "tf": P(None, "model", None, None),
        "att.ln_x.weight": P(None, "model", None),
        "att.ln_x.bias": P(None, "model", None),
    }
    for key in ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
                "amix", "fmix_k", "fmix_r"):
        specs_in[key] = P(None, None, None)
    arr_specs = {k: specs_in[k] for k in arrs}

    state_specs = {
        "att_xx": P(None, None, None),
        "ffn_xx": P(None, None, None),
        "heads": P(None, "model", None, None),
    }

    def local_step(arrs, state, x0):
        def body(x, inp):
            lyr, att_xx, ffn_xx, heads = inp
            att_p, new_axx, new_heads = _att_layer_call_v5(
                lyr, x, att_xx, heads, cfg, tp, quant, interpret, w4,
                has_gate,
            )
            x = x + jax.lax.psum(att_p, "model")
            ffn_p, rg_loc, new_fxx = _ffn_layer_call_v6(
                lyr, x, ffn_xx, cfg, tp, quant, interpret, w4,
                mix_keys=("fmix_k", "fmix_r"), mix45=True,
            )
            rg = jax.lax.all_gather(
                rg_loc[:, 0], "model", tiled=True
            )[:, None]
            x = x + rg * jax.lax.psum(ffn_p, "model")
            return x, (new_axx, new_fxx, new_heads)

        x, (axx, fxx, heads) = jax.lax.scan(
            body, x0,
            (arrs, state["att_xx"], state["ffn_xx"], state["heads"]),
        )
        return x, {"att_xx": axx, "ffn_xx": fxx, "heads": heads}

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(arr_specs, state_specs, P(None, None)),
        out_specs=(P(None, None), state_specs),
        check_vma=False,
    )
    return fn(arrs, state_t, x0.astype(jnp.float32))
