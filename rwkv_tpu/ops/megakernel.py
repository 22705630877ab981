"""Whole-model Pallas decode kernel for RWKV v7 (T=1, B=1).

Replaces the ~10 XLA kernels per layer of the decode step (reference hot
loop: rwkv_eval.inc:198-202 — per layer: norms, token-shift mixes, r/k/v +
LoRA mul_mats, wkv7 recurrence, group norm, gate, output mul_mat, FFN) with
ONE pallas_call for all L layers:

- the grid is over LAYERS; each grid step's weight blocks are auto
  double-buffered by the Pallas pipeline, so layer i+1's weights stream
  HBM->VMEM while layer i computes — the step runs at the weight-stream
  rate instead of sum(per-op launch + activation round trips);
- activations live in VMEM scratch for the entire depth; per-layer
  recurrent state (token-shift vectors, wkv S x S heads) is blocked I/O.

Layout (the round-1 lesson, docs/STATUS.md): Mosaic cannot split the LANE
dim, and some relayouts compile but silently miscompute. Everything here is
carried TRANSPOSED — activations are [C, 1] columns (C on sublanes), heads
split C -> (H, S) on sublanes, and the wkv state is [H, S_j, S_i]
(key-dim j on sublanes). Every primitive this kernel relies on was
numerics-verified ON CHIP first (scripts/probe_megakernel2.py: split /
eye / wkv7 / matvec8 probes).

Weights are streamed in the probes' verified orientation W[N, K] (output
rows on sublanes): 'mega8' packs int8 codes with per-row scales and runs
s8 x s8 -> s32 on the MXU (the fastest measured matvec stream: ~405 GB/s
vs ~318 GB/s for int8->bf16 convert and ~493 GB/s for 2-byte bf16);
'megabf16' streams bf16.

wkv7 recurrence per head (reference rwkv_operators_wkv_v7.inc:61-101), in
the transposed state: S'[j,i] = S[j,i]*w[j] + k[j]*v[i] + (sum_j' a[j']
S[j',i]) * b[j]; out[i] = sum_j S'[j,i]*r[j].

Verification note (debugged on chip, scripts/probe_mega_bisect.py +
probe_slice_dot.py): native-vs-interpret runs agree EXACTLY (int8 dots are
integer-exact) except when an ulp-level reduction-order difference in a
layer norm (Mosaic vs XLA reduce order, ~1e-7) lands an activation exactly
on an int8/bf16 rounding boundary — then one quantization code flips and
the outputs step by ~1e-3, compounding through layers. This is inherent
w8a8/bf16 activation-quantization noise (the XLA w8a8 path has the same
sensitivity), not a layout miscompute: per-layer debugging showed every
operand (coeffs, mixed inputs, scratch carries) bit-matching, with the
discrete step appearing at the activation-quantized matvec, and the
isolated sliced-dot repro is exact for every (G, C) tried.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Parameter pack
# ---------------------------------------------------------------------------

_VEC_KEYS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
    "att.w0", "att.a0", "att.v0", "att.k_k", "att.k_a",
    "att.ln_x.weight", "att.ln_x.bias", "ffn.x_k",
)
_MAT_KEYS = ("rkv", "lora1", "lora2", "out", "fk", "fv")


def _np_dense(w) -> np.ndarray:
    """Weight leaf -> dense [out, in] numpy f32 (host-side, no device ops —
    a 1.5B f32 densification must not transit HBM)."""
    from rwkv_tpu.ops.parity import Weight

    if isinstance(w, Weight):
        if w.kind == "dense":
            return np.asarray(w.w, np.float32)
        arr = np.asarray(w.q, np.float32) * np.asarray(w.d, np.float32)[..., None]
        if w.m is not None:
            arr = arr + np.asarray(w.m, np.float32)[..., None]
        return arr.reshape(arr.shape[0], -1)
    return np.asarray(w, np.float32)


def _jnp_dense(w):
    """Device-side _np_dense: used when the param leaves already live on
    an accelerator (benchmark pytrees synthesized on chip — the ~36 MB/s
    remote-TPU tunnel makes a host round-trip of a 1.5B pytree take ~40
    minutes)."""
    from rwkv_tpu.ops.parity import Weight

    if isinstance(w, Weight):
        if w.kind == "dense":
            return jnp.asarray(w.w, jnp.float32)
        arr = w.q.astype(jnp.float32) * w.d.astype(jnp.float32)[..., None]
        if w.m is not None:
            arr = arr + w.m.astype(jnp.float32)[..., None]
        return arr.reshape(arr.shape[0], -1)
    return jnp.asarray(w, jnp.float32)


def _params_on_accel(params) -> bool:
    """True when the pytree's weight leaves live on a non-CPU device —
    pack building then stays in jnp ops on device."""
    w = params["blocks"][0].get("att.key.weight", params.get("head"))
    arr = getattr(w, "w", None)
    if arr is None:
        arr = getattr(w, "q", w)
    try:
        return (isinstance(arr, jax.Array)
                and next(iter(arr.devices())).platform != "cpu")
    except Exception:  # noqa: BLE001 — non-jax leaves are host arrays
        return False


_V7_RKV = ("att.receptance.weight", "att.key.weight", "att.value.weight")
_V7_L1 = ("att.w1", "att.a1", "att.g1", "att.v1")
_V7_L2 = ("att.w2", "att.a2", "att.g2", "att.v2")


def _quantize_rows(w, four: bool):
    """[L, N, K] f32 -> (int codes [L, N, K] int8, row scales [L, N, 1]).
    four=True: int4 codes in [-7, 7] (scale amax/7) — stored unpacked
    here; the retile functions pack nibble pairs along K."""
    qmax = 7.0 if four else 127.0
    if isinstance(w, jax.Array):  # device path (same formula in jnp)
        amax = jnp.max(jnp.abs(w), axis=-1, keepdims=True)
        d = amax / qmax
        inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
        q = jnp.clip(jnp.rint(w * inv), -qmax, qmax).astype(jnp.int8)
        return q, d.astype(jnp.float32)
    amax = np.abs(w).max(axis=-1, keepdims=True)
    d = amax / qmax
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-30), 0.0)
    q = np.clip(np.rint(w * inv), -qmax, qmax).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(d.astype(np.float32))


def _pack_nibbles_split_half(a):
    """Unpacked int4 codes [..., K] -> packed bytes [..., K/2] in the
    SPLIT-HALF BIASED-LO layout: byte s holds code[s] + 8 in the low
    nibble (values 1..15 for codes in [-7, 7]) and code[s + K/2] in the
    high nibble, so a matvec is two contiguous half-K dots whose unpack
    is TWO int8 AND masks (see _w4_acc). The round-3 two's-complement
    low nibble needed an int32 sign-fix chain (~8 VPU ops per element at
    4-byte width) that left the w4 kernels compute-bound at 312 GB/s
    effective (docs/STATUS.md round-3 table)."""
    kh = a.shape[-1] // 2
    lo = a[..., :kh].astype(jnp.int32) + 8
    hi = a[..., kh:].astype(jnp.int32)
    return (((hi & 0xF) << 4) | (lo & 0xF)).astype(jnp.int8)


# Timing-ablation knob for the w4 matvec ("" | "nomask" | "onedot").
# DELIBERATELY not an env var: the ablations produce mathematically wrong
# results, are read at trace time, and must never leak into a serving
# process — bench scripts opt in explicitly via set_w4_ablate().
_W4_ABLATE = [""]


def set_w4_ablate(mode: str) -> None:
    """Enable a w4-matvec timing ablation (bench scripts ONLY; results are
    numerically wrong). Call BEFORE tracing; cached jit fns keep the mode
    they were traced with."""
    if mode not in ("", "nomask", "onedot"):
        raise ValueError(f"unknown w4 ablation {mode!r}")
    if mode:
        import warnings

        warnings.warn(
            f"w4 ablation {mode!r} active: w4a8 outputs are WRONG "
            "(timing-only mode)", stacklevel=2)
    _W4_ABLATE[0] = mode


def _w4_acc(mm, w, x8_lo, x8_hi):
    """Packed split-half biased-lo matvec accumulate; returns 16x the
    true integer accumulation (callers fold the /16 into the f32 scale).

    Derivation: byte b = 16*hi + (lo + 8) in two's complement, so
      b & 0x0F == lo + 8       (unsigned low nibble)
      b & 0xF0 == 16*hi        (exact as int8: hi in [-8, 7])
    and  acc = hi.x_hi + lo.x_lo
             = (1/16)*[(b&0xF0).x_hi + 16*(b&0x0F).x_lo - 128*sum(x_lo)].
    Both masks legalize as int8 vector ops in Mosaic (int8 shifts and
    subs do NOT — scripts/probe_w4_unpack.py), so the unpack costs two
    1-byte-wide VPU ops per element instead of ~8 4-byte-wide ones."""
    if _W4_ABLATE[0] == "nomask":   # timing ablation: raw bytes, wrong math
        return mm(w, x8_hi) + 16 * mm(w, x8_lo)
    if _W4_ABLATE[0] == "onedot":   # timing ablation: single half-K dot
        return 17 * mm(w, x8_lo)
    lo_u = w & jnp.int8(15)
    hi16 = w & jnp.int8(-16)
    sx = jnp.sum(x8_lo.astype(jnp.int32), axis=0, keepdims=True)
    return mm(hi16, x8_hi) + 16 * mm(lo_u, x8_lo) - 128 * sx


_W4_INV16 = 1.0 / 16.0


def _attach_head(pack: dict, params: dict, cfg, quant: bool) -> None:
    """Pack the LM head (+ ln_out) for the in-kernel head phases: at
    169M the head is 50 of the 135 MB/token, and a separate XLA matvec
    per token leaves the kernel pipeline idle during its launch +
    un-overlapped stream. Scales live as a [1, V] ROW (a [V, 1] column
    would lane-pad 1 -> 128)."""
    c = cfg.n_embed
    hw = (_jnp_dense if _params_on_accel(params) else _np_dense)(
        params["head"])
    if quant:
        q, dd = _quantize_rows(hw[None], False)
        pack["head8"], pack["head_d"] = q[0], dd[0].T
    else:
        pack["headbf16"] = jnp.asarray(hw, jnp.bfloat16)
    lw, lb = params["ln_out"]
    pack["ln_out.weight"] = jnp.asarray(
        np.asarray(lw, np.float32).reshape(c, 1))
    pack["ln_out.bias"] = jnp.asarray(
        np.asarray(lb, np.float32).reshape(c, 1))


def build_mega_pack(params: dict, cfg, quant: bool = True,
                    w4: bool = False, head: bool = False) -> dict:
    """Build the megakernel's parameter pack from a LOADED parameter pytree
    (loader.load_params output: per-layer list of dicts with Weight leaves).

    Matrices are stored [L, N, K] (int8 with [L, N, 1] row scales if quant,
    else bf16); vectors as [L, C, 1] f32 columns. Stacking and quantization
    happen on host in numpy — the pack is the only thing that lands on
    device.

    w4=True (requires quant): the four BIG mats (rkv/out/fk/fv) carry
    per-row INT4 codes (values in [-7, 7], scale amax/7) — stored
    unpacked int8 here; retile_mega_pack packs nibble pairs along K in
    the split-half layout the tiled kernel consumes. LoRA mats stay
    int8 (bandwidth-negligible). Mirrors the reference's Q4 family
    being its best-latency formats (README.md:35-43)."""
    c = cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    blocks = [dict(b) for b in params["blocks"]]
    n_layer = len(blocks)
    # device mode: leaves on an accelerator stack/quantize in jnp there
    dev = _params_on_accel(params)
    dense = _jnp_dense if dev else _np_dense
    xp = jnp if dev else np
    # layer 0 has no v0/v1/v2 (selected away by the i==0 branch)
    if n_layer > 1:
        for key in ("att.v0", "att.v1", "att.v2"):
            if key not in blocks[0]:
                blocks[0][key] = xp.zeros_like(dense(blocks[1][key]))

    def stack(keys_or_key):
        if isinstance(keys_or_key, tuple):
            return xp.stack([
                xp.concatenate([dense(b[k]) for k in keys_or_key])
                for b in blocks
            ])
        return xp.stack([dense(b[keys_or_key]) for b in blocks])

    d_lora = dense(blocks[-1]["att.w1"]).shape[0]
    f_dim = dense(blocks[0]["ffn.key.weight"]).shape[0]

    mats = {
        "rkv": stack(_V7_RKV),
        "lora1": stack(_V7_L1),
        "lora2": stack(_V7_L2),
        "out": stack("att.output.weight"),
        "fk": stack("ffn.key.weight"),
        "fv": stack("ffn.value.weight"),
    }
    pack = {"quant": quant, "w4": bool(quant and w4),
            "d_lora": d_lora, "f_dim": f_dim}
    for name, w in mats.items():
        if quant:
            four = pack["w4"] and name not in ("lora1", "lora2")
            pack[name], pack[name + "_d"] = _quantize_rows(w, four)
        else:
            pack[name] = jnp.asarray(w, jnp.bfloat16)

    for key in _VEC_KEYS:
        pack[key] = jnp.asarray(stack(key).reshape(n_layer, c, 1))
    # six token-shift coefficients, stacked on sublanes: [L, 6C, 1]
    pack["coeff"] = jnp.asarray(stack("att.x_rwkvag").reshape(n_layer, 6 * c, 1))
    pack["r_k"] = jnp.asarray(stack("att.r_k").reshape(n_layer, h, s, 1))

    if head:
        _attach_head(pack, params, cfg, quant)
    return pack


def head_tile_plan(pack: dict, cfg):
    """(nt, v_t) the in-kernel head would use, or None when the pack has
    no head or the interleave schedule cannot place every tile on a
    distinct layer phase (nt > n_layer)."""
    key = "head8" if pack["quant"] else "headbf16"
    if key not in pack:
        return None
    v = pack[key].shape[0]
    c = cfg.n_embed
    wb = 1 if pack["quant"] else 2
    nt = 1
    while (v // nt) * c * wb > 8 * 1024 * 1024 or v % nt:
        nt += 1
        if nt > v:
            nt = v
            break
    if nt > cfg.n_layer:
        return None
    return nt, v // nt


def rowify_mega_pack(pack: dict) -> dict:
    """Convert a build_mega_pack (v7) output's per-layer VECTORS and
    quant row scales from [L, N, 1] columns to [L, 1, N] rows.

    An [N, 1] f32 column window is a per-element scatter DMA (one
    4-byte word per 512-byte VMEM line); with ~16 such operands per
    layer the fetch dominates the whole 169M decode step
    (scripts/probe_layer_cost.py: the fetch-only ablation costs the
    same 27 us/layer as the full kernel). Row streams are contiguous.
    v7_decode_megakernel detects the layout by shape."""
    out = dict(pack)
    for key in _VEC_KEYS:
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    out["coeff"] = jnp.swapaxes(pack["coeff"], 1, 2)
    L, h, s_, _ = pack["r_k"].shape
    out["r_k"] = pack["r_k"].reshape(L, 1, h * s_)
    if pack["quant"]:
        for name in _MAT_KEYS:
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    if pack.get("w4"):
        # big mats: unpacked int4 codes [L, N, K] -> split-half packed
        # bytes [L, N, K/2] for the whole-layer kernel's matv4 (same
        # layout the tiled kernels consume via retile_mega_pack)
        for name in ("rkv", "out", "fk", "fv"):
            out[name] = _pack_nibbles_split_half(pack[name])
    if "ln_out.weight" in pack:
        out["ln_out.weight"] = pack["ln_out.weight"].T
        out["ln_out.bias"] = pack["ln_out.bias"].T
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _emit_head_phases(i, n_layer, head_nt, v_t, quant, rows, ln, qx,
                      head_w, head_d, lnow, lnob, x_s, logits_out,
                      head_s):
    """Shared in-kernel LM-head phases for the whole-layer decode
    kernels (v4-v7).

    Head tiles are FETCHED interleaved with the layer phases (the block
    specs map layer phase i to head tile i*nt//L, so the head stream
    rides the DMA idle time of the layer section) and each freshly
    resident tile is staged into head_s; one extra grid phase after the
    layers runs ALL the head dots against the final activation."""
    if head_nt > 1:
        # stage tiles 0..nt-2; the LAST tile stays resident in its
        # double-buffered window through the final phase, so it needs
        # no staging copy (saves one tile of VMEM)
        @pl.when(i < n_layer)
        def _stage_head_tile():
            tile = jnp.minimum(i * head_nt // n_layer, head_nt - 1)
            prev = jnp.minimum(
                (i - 1) * head_nt // n_layer, head_nt - 1
            )

            @pl.when(((i == 0) | (tile != prev))
                     & (tile < head_nt - 1))
            def _():
                head_s[pl.dslice(tile * v_t, v_t)] = head_w[0]

    @pl.when(i == n_layer)
    def _head_dots():
        # Logits are emitted as [1, v_t] ROWS (row 0 of each tile's
        # 8-sublane block): a [v_t, 1] column output would lane-pad
        # 1 -> 128 and write 128x the data back to HBM (32MB/token at
        # 65k vocab — measured to cost more than the head read itself).
        lw = lnow[:].T if rows else lnow[:]
        lb = lnob[:].T if rows else lnob[:]
        xo = ln(x_s[:], lw, lb, 1e-5)
        if quant:
            x8, dx = qx(xo)
            xrow = x8.T
        else:
            xrow = xo.T
        for t in range(head_nt):
            if t < head_nt - 1:
                wt = head_s[t * v_t:(t + 1) * v_t]
            else:
                wt = head_w[0]  # still resident in the window
            if quant:
                acc = jax.lax.dot_general(
                    xrow, wt,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                tile_logits = (
                    acc.astype(jnp.float32) * dx
                    * head_d[0:1, t * v_t:(t + 1) * v_t]
                )
            else:
                tile_logits = jax.lax.dot_general(
                    xrow.astype(jnp.float32),
                    wt.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            logits_out[0:1, t * v_t:(t + 1) * v_t] = tile_logits


def _make_kernel(c, h, s, d_lora, f_dim, n_layer, quant, debug=False,
                 head_nt=0, v_t=0, rows=False, srows=False, flat=False,
                 w4=False):
    # flat=True: HEAD-PAIR wkv state [H/2, S_j, 2*S_i] — lane half p
    # holds head 2hh+p, so the lane dim is exactly 128 at S=64 where
    # the [H, S_j, S_i] layout pads S_i 64->128 and streams 2x the
    # state bytes (~6% of the B=1 HBM stream at 169M). Layout moves
    # are stride-2 slices of the UNTILED head dim + lane-half masks —
    # pure VPU (an earlier [S_j, H*S_i] design needed f32-HIGHEST
    # permutation matmuls that cost more than the padding saved).
    assert not flat or h % 2 == 0, "head-pair state needs even H"
    def mm(w, x):
        """W [N, K] @ x [K, 1] -> [N, 1] f32. quant: W int8 with row scales
        folded by the caller; else bf16 weights."""
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    def qx(x):
        """Per-matvec activation quantization (w8a8 semantics)."""
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

    assert not (debug and head_nt), "debug and head phases are exclusive"

    def kernel(*refs):
        dbg_out = None
        if debug:
            # outputs precede scratch: (..., heads_out, dbg_out, x_s, vf_s)
            *rest, dbg_out, x_s_, vf_s_ = refs
            refs = tuple(rest) + (x_s_, vf_s_)
        head_w = head_d = lnow = lnob = logits_out = head_s = None
        if head_nt:
            # head inputs trail the other inputs; logits trail the
            # outputs; the head staging buffer is the LAST scratch
            refs = list(refs)
            head_s = refs.pop()
            x_s_, vf_s_ = refs[-2], refs[-1]
            logits_out = refs[-3]
            del refs[-3:]
            # head inputs sit right before the 4 outputs
            n_hin = 4 if quant else 3
            hin = refs[-4 - n_hin:-4]
            if quant:
                head_w, head_d, lnow, lnob = hin
            else:
                head_w, lnow, lnob = hin
            del refs[-4 - n_hin:-4]
            refs = tuple(refs) + (x_s_, vf_s_)
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, rkv_d, lora1, lora1_d, lora2, lora2_d,
             out_w, out_d, fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, lora1, lora2, out_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        def vec(ref):
            """Per-layer vector window -> [N, 1] column. rows=True
            streams vectors/scales as [1, N] ROWS: an [N, 1] column
            window is a per-element scatter DMA (one 4-byte word per
            VMEM line), measured to dominate the whole layer step at
            169M (scripts/probe_layer_cost.py: fetch-only == full).
            The transpose is exact natively (probe_row_layout.py pA)."""
            return ref[0].T if rows else ref[0]

        def matv(w_ref, d_ref, row_lo, row_hi, xcol):
            w = w_ref[0][row_lo:row_hi]
            if quant:
                x8, dx = qx(xcol)
                acc = mm(w, x8)
                dd = (d_ref[0][:, row_lo:row_hi].T if rows
                      else d_ref[0][row_lo:row_hi])
                return acc.astype(jnp.float32) * dx * dd
            # bf16 weights upcast in-register: Mosaic's single-pass
            # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
            # accumulates exactly like the XLA per-op path and the
            # extra MXU passes are free in a bandwidth-bound decode.
            return jax.lax.dot_general(
                w.astype(jnp.float32), xcol,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def matv4(w_ref, d_ref, row_lo, row_hi, xcol):
            """w4 big-mat matvec: the window holds [rows, K/2] split-half
            biased-lo packed int4 pairs (_pack_nibbles_split_half); two
            contiguous half-K s8 dots + two int8 AND masks (_w4_acc), the
            x16/-8 corrections folded into the f32 scale. Streams half
            the weight bytes of the w8a8 window — the same layout the
            tiled kernels serve 1.5B/7B w4a8 with."""
            w = w_ref[0][row_lo:row_hi]
            kh = w.shape[1]
            x8, dx = qx(xcol)
            acc16 = _w4_acc(mm, w, x8[:kh], x8[kh:])
            dd = (d_ref[0][:, row_lo:row_hi].T if rows
                  else d_ref[0][row_lo:row_hi])
            return acc16.astype(jnp.float32) * (
                dx * jnp.float32(_W4_INV16)) * dd

        mv_big = matv4 if w4 else matv

        def _layer_step():
            x = x_s[:]

            # ---- attention ------------------------------------------------
            xl = ln(x, vec(ln1w), vec(ln1b), 1e-5)
            # srows: token-shift state streams as [1, C] rows too (a
            # [C, 1] column block is a per-element scatter DMA; the
            # col<->row transposes are exact natively — probe pA and
            # the col->row store probe)
            sx = (att_in[0].T if srows else att_in[0]) - xl
            if srows:
                att_out[0] = xl.T
            else:
                att_out[0] = xl

            cf = vec(coeff).reshape(6, c, 1)
            # order in att.x_rwkvag: r, w, k, v, a, g (converter concat order)
            xr = xl + sx * cf[0]
            xw = xl + sx * cf[1]
            xk = xl + sx * cf[2]
            xv = xl + sx * cf[3]
            xa = xl + sx * cf[4]
            xg = xl + sx * cf[5]

            r = mv_big(rkv, rkv_d if quant else None, 0 * c, 1 * c, xr)
            k = mv_big(rkv, rkv_d if quant else None, 1 * c, 2 * c, xk)
            v = mv_big(rkv, rkv_d if quant else None, 2 * c, 3 * c, xv)

            d = d_lora
            w_dn = jnp.tanh(matv(lora1, lora1_d if quant else None, 0 * d, 1 * d, xw))
            a_dn = matv(lora1, lora1_d if quant else None, 1 * d, 2 * d, xa)
            g_dn = jax.nn.sigmoid(matv(lora1, lora1_d if quant else None, 2 * d, 3 * d, xg))
            v_dn = matv(lora1, lora1_d if quant else None, 3 * d, 4 * d, xv)

            w_l = matv(lora2, lora2_d if quant else None, 0 * c, 1 * c, w_dn)
            a_l = matv(lora2, lora2_d if quant else None, 1 * c, 2 * c, a_dn)
            g = matv(lora2, lora2_d if quant else None, 2 * c, 3 * c, g_dn)
            vmix_l = matv(lora2, lora2_d if quant else None, 3 * c, 4 * c, v_dn)

            w_dec = jnp.exp(
                jax.nn.sigmoid(w_l + vec(w0)) * jnp.float32(-0.606531)
            )
            a_gate = jax.nn.sigmoid(a_l + vec(a0))

            kk = (k * vec(kkw)).reshape(h, s, 1)
            nrm = jnp.sqrt(jnp.sum(kk * kk, axis=1, keepdims=True))
            kk = kk / jnp.maximum(nrm, jnp.float32(1e-12))

            ka = k * vec(kaw)
            k = k + (a_gate * ka - ka)

            # value residual (v_first mixing across layers)
            @pl.when(i == 0)
            def _():
                vf_s[:] = v

            vf = vf_s[:]
            v_mixed = v + (vf - v) * jax.nn.sigmoid(vmix_l + vec(v0))
            v_pre = v
            v = jnp.where(i == 0, v, v_mixed)

            # ---- wkv7 step ------------------------------------------------
            def col3(vec):
                return vec.reshape(h, s, 1)

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]

            r3, w3, k3, v3 = col3(r), col3(w_dec), col3(k), col3(v)
            a3 = -kk
            b3 = kk * col3(a_gate.reshape(c, 1))
            rk3 = vec(rk).reshape(h, s, 1) if rows else rk[0]
            dots = jnp.sum(k3 * r3 * rk3, axis=1, keepdims=True)  # [H, 1, 1]

            if flat:
                # HEAD-PAIR state [H/2, S_j, 2*S_i]: lane half p holds
                # head 2*hh+p, so the lane dim is exactly 128 at S=64 —
                # the [H, S_j, S_i] layout pads S_i 64->128 and streams
                # 2x the state bytes (the round-3 "last ~6%"). Every
                # layout move here is a stride-2 slice of the UNTILED
                # head dim plus a lane-half select — pure VPU, no
                # permutation matmuls, no lane-dim reshapes.
                lane_m = jax.lax.broadcasted_iota(
                    jnp.int32, (1, 1, 2 * s), 2)
                lane2 = lane_m < s
                # per-half row<->col selection masks (m == i / m == i+s);
                # 64-lane slices and (2, s) lane reshapes both relayout,
                # masks + reduces stay pure VPU
                i2 = jax.lax.broadcasted_iota(jnp.int32, (s, 2 * s), 0)
                m2 = jax.lax.broadcasted_iota(jnp.int32, (s, 2 * s), 1)
                eye_l = (m2 == i2).astype(jnp.float32)[None]
                eye_r = (m2 == i2 + s).astype(jnp.float32)[None]

                def halves_of(op3):
                    # [h, s, 1] -> two [h/2, s, 1]: reshape the UNTILED
                    # head dim and index it (a stride-2 slice lowers to
                    # a >2-D gather Mosaic rejects natively)
                    hp = op3.reshape(h // 2, 2, s, 1)
                    return hp[:, 0], hp[:, 1]

                def pair_j(op3):
                    # [h, s_j, 1] -> [h/2, s_j, 2s]: head 2hh+p on half p
                    ev, od = halves_of(op3)
                    return jnp.where(lane2, ev, od)

                # v as [h/2, 1, 2s] rows: v3 pair columns -> per-half rows
                v_col_e, v_col_o = halves_of(v3)      # [h/2, s, 1] each
                v_row2 = jnp.sum(
                    v_col_e * eye_l + v_col_o * eye_r,
                    axis=1, keepdims=True,
                )                                     # [h/2, 1, 2s]
                st = heads_in[0]                     # [h/2, s_j, 2s]
                a2 = pair_j(a3)
                sa2 = jnp.sum(st * a2, axis=1, keepdims=True)
                st = (st * pair_j(w3) + pair_j(k3) * v_row2
                      + pair_j(b3) * sa2)
                out2 = jnp.sum(st * pair_j(r3), axis=1, keepdims=True)
                heads_out[0] = st

                # group norm per head = stats over each 64-lane HALF
                inv_s = jnp.float32(1.0 / s)
                msk = lane2.astype(jnp.float32)
                mu_l = jnp.sum(out2 * msk, axis=2, keepdims=True) * inv_s
                mu_r = jnp.sum(out2 * (1.0 - msk), axis=2,
                               keepdims=True) * inv_s
                mu = jnp.where(lane2, mu_l, mu_r)
                yc = out2 - mu
                var_l = jnp.sum(yc * yc * msk, axis=2,
                                keepdims=True) * inv_s
                var_r = jnp.sum(yc * yc * (1.0 - msk), axis=2,
                                keepdims=True) * inv_s
                var = jnp.where(lane2, var_l, var_r)
                y_row2 = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
                # back to [h, s, 1] columns: per-half row->col masked
                # reduces, then re-interleave pairs on the untiled dim
                y_l = jnp.sum(y_row2 * eye_l, axis=2,
                              keepdims=True)          # [h/2, s, 1]
                y_r = jnp.sum(y_row2 * eye_r, axis=2, keepdims=True)
                y_col = jnp.stack([y_l, y_r], axis=1).reshape(h, s, 1)
                xo = y_col.reshape(c, 1) * vec(lnxw) + vec(lnxb)
                bonus = (v3 * dots).reshape(c, 1)
                xo = (xo + bonus) * g
            else:
                st = heads_in[0]
                sa_row = jnp.sum(st * a3, axis=1, keepdims=True)   # [H, 1, S_i]
                v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)   # col -> row
                st = st * w3 + k3 * v_row + b3 * sa_row
                out_row = jnp.sum(st * r3, axis=1, keepdims=True)  # [H, 1, S_i]
                heads_out[0] = st

                # group norm per head over S (lanes of out_row), eps 64e-5
                mu = jnp.mean(out_row, axis=2, keepdims=True)
                yc = out_row - mu
                var = jnp.mean(yc * yc, axis=2, keepdims=True)
                y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
                y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)    # row -> col
                xo = y_col.reshape(c, 1) * vec(lnxw) + vec(lnxb)

                bonus = (v3 * dots).reshape(c, 1)
                xo = (xo + bonus) * g

            att_proj = mv_big(out_w, out_d if quant else None, 0, c, xo)
            if debug:
                dbg_out[0] = jnp.concatenate([
                    cf[0], cf[1], cf[2], cf[3], cf[4], cf[5], xk, xa,
                ], axis=0)
            x = x + att_proj

            # ---- FFN ------------------------------------------------------
            xl2 = ln(x, vec(ln2w), vec(ln2b), 1e-5)
            sx2 = (ffn_in[0].T if srows else ffn_in[0]) - xl2
            if srows:
                ffn_out[0] = xl2.T
            else:
                ffn_out[0] = xl2
            xk2 = xl2 + sx2 * vec(xkw)
            fk = mv_big(fk_w, fk_d if quant else None, 0, f_dim, xk2)
            fk = jnp.square(jnp.maximum(fk, 0.0))
            ffn_proj = mv_big(fv_w, fv_d if quant else None, 0, c, fk)
            x = x + ffn_proj

            x_s[:] = x
            y_out[:] = x

        if head_nt:
            pl.when(i < n_layer)(_layer_step)
            _emit_head_phases(
                i, n_layer, head_nt, v_t, quant, rows, ln, qx,
                head_w, head_d, lnow, lnob, x_s, logits_out, head_s,
            )
        else:
            _layer_step()

    return kernel


# pl/pltpu imported lazily so CPU-only environments importing the module
# don't pay for them until a kernel is built.
from jax.experimental import pallas as pl            # noqa: E402
from jax.experimental.pallas import tpu as pltpu     # noqa: E402


def v7_decode_megakernel(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
    debug: bool = False,
):
    """Run all layers of one v7 decode step (B=1).

    pack: build_mega_pack output. state_t: transposed per-layer state —
    att_xx [L, C, 1], ffn_xx [L, C, 1], heads [L, H, S_j, S_i]. x0: [C, 1]
    f32 (embedding + ln0 already applied). Returns (x [C, 1], new state_t).

    When the pack carries the LM head (build_mega_pack(head=True)), the
    grid extends past the layers with head row-tile phases that stream
    ln_out + the head inside the SAME pallas_call and the return becomes
    (x, new state_t, logits [V, 1]) — at 169M the head is 50 of the
    135 MB/token, and streaming it through the kernel pipeline removes
    the separate XLA matvec launch + its un-overlapped weight read.
    """
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_lora, f_dim = pack["d_lora"], pack["f_dim"]
    quant = pack["quant"]
    # rowify_mega_pack stores vectors [L, 1, N]; legacy packs [L, N, 1]
    rows = pack["ln1.weight"].shape[1] == 1

    head_key = "head8" if quant else "headbf16"
    has_head = head_key in pack
    head_nt = v_t = 0
    if has_head:
        plan = head_tile_plan(pack, cfg)
        assert plan is not None, (
            "in-kernel head needs nt <= n_layer to interleave tile "
            "fetches with the layer phases — check head_tile_plan() "
            "before calling"
        )
        head_nt, v_t = plan

    srows = state_t["att_xx"].shape[1] == 1  # [L, 1, C] row state
    # head-pair state [L, H/2, S_j, 2*S_i] (exact 128 lanes at S=64)
    flat = state_t["heads"].shape[1] == h // 2
    hshape = (h // 2, s, 2 * s) if flat else (h, s, s)
    # w4: big mats arrive nibble-packed [L, N, K/2] (rowify_mega_pack);
    # detected from the pack so per-op callers need no extra plumbing
    w4 = bool(pack.get("w4")) and pack["rkv"].shape[-1] == c // 2
    kernel = _make_kernel(c, h, s, d_lora, f_dim, n_layer, quant,
                          debug=debug, head_nt=head_nt, v_t=v_t,
                          rows=rows, srows=srows, flat=flat, w4=w4)

    def blocked(shape):
        if has_head:
            # head phases run the grid index past the layers — clamp so
            # the resident layer blocks are not refetched (same-index
            # revisits are free) and never index out of bounds.
            return pl.BlockSpec(
                (1,) + shape,
                lambda i: (jnp.minimum(i, n_layer - 1),)
                + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_interleaved(shape):
        # tile i*nt//L is resident at layer phase i (fetch rides the
        # layer section's idle DMA); the final phase keeps the last tile
        return pl.BlockSpec(
            shape,
            lambda i: (jnp.minimum(i * head_nt // n_layer, head_nt - 1),)
            + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    mat_args, mat_specs = [], []
    for name in _MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            d = pack[name + "_d"]
            mat_args.append(d)
            mat_specs.append(blocked(d.shape[1:]))

    vec_args = [pack[k] for k in _VEC_KEYS]
    vec_specs = [blocked(pack[k].shape[1:]) for k in _VEC_KEYS]

    head_args, head_specs = [], []
    if has_head:
        head_args.append(pack[head_key].reshape(head_nt, v_t, c))
        head_specs.append(head_interleaved((1, v_t, c)))
        if quant:
            head_args.append(pack["head_d"])      # [1, V] row
            head_specs.append(whole((1, head_nt * v_t)))
        head_args += [pack["ln_out.weight"], pack["ln_out.bias"]]
        head_specs += [whole(pack["ln_out.weight"].shape),
                       whole(pack["ln_out.bias"].shape)]

    sshape = (1, c) if srows else (c, 1)
    args = (
        [x0.astype(jnp.float32),
         state_t["att_xx"], state_t["ffn_xx"], state_t["heads"]]
        + mat_args + vec_args
        + [pack["coeff"], pack["r_k"]]
        + head_args
    )
    in_specs = (
        [whole((c, 1)), blocked(sshape), blocked(sshape),
         blocked(hshape)]
        + mat_specs + vec_specs
        + [blocked(pack["coeff"].shape[1:]), blocked(pack["r_k"].shape[1:])]
        + head_specs
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + hshape, jnp.float32),
    )
    out_specs = (
        whole((c, 1)), blocked(sshape), blocked(sshape),
        blocked(hshape),
    )
    if debug:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((n_layer, 8 * c, 1), jnp.float32),
        )
        out_specs = out_specs + (blocked((8 * c, 1)),)
    if has_head:
        # [8, V] — logits live in row 0 (8 sublanes is the Pallas
        # minimum); see the kernel's head-phase note on why a [V, 1]
        # column (128x lane padding) is ruinous.
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((8, head_nt * v_t), jnp.float32),
        )
        out_specs = out_specs + (whole((8, head_nt * v_t)),)

    *outs, = pl.pallas_call(
        kernel,
        grid=(n_layer + (1 if has_head else 0),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
        ] + ([pltpu.VMEM((max(head_nt - 1, 1) * v_t, c),
                         jnp.int8 if quant else jnp.bfloat16)]
             if has_head else []),
        # dimension_semantics: the layer grid has CARRIES (x/v_first scratch,
        # sequential state) — it must be declared "arbitrary", not parallel,
        # or the pipeline may reorder/overlap iterations and silently corrupt
        # the carried activations (observed natively at some (L, C) combos).
        # vmem_limit: per-layer weights + double buffering exceed the 16MB
        # default scoped budget; the chip has 128MB (probe_megakernel2 vmem).
        # The head staging buffer adds (nt-1)/nt of the head on top —
        # the 169M w8a8 head config lands 20KB over the 100MB request.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(104 if has_head else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    y, att_xx, ffn_xx, heads = outs[:4]
    state = {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}
    if debug:
        state["dbg"] = outs[4]
    if has_head:
        return y, state, outs[-1][0]  # logits [V]
    return y, state


# ---------------------------------------------------------------------------
# Batched kernel (B > 1): batch on LANES everywhere
# ---------------------------------------------------------------------------
#
# Activations are [C, B] columns (C on sublanes, batch on lanes), so every
# projection becomes W[N, K] @ X[K, B]: the weight stream — the measured
# bottleneck, ~650 GB/s with whole-matrix blocks (scripts/
# probe_mega_batched.py) — is paid ONCE per layer regardless of B, which
# makes batching nearly free.
#
# The wkv state moves to [H, S_i, S_j, B] (slab=(h, s_i), sublane=s_j,
# lane=b). In this orientation every j-indexed operand (r, w, k, a, b —
# [h, s_j, B] from a plain sublane split of the [C, B] column) broadcasts
# for FREE over the s_i slab dim via [:, None, :, :]; only v (i-indexed)
# needs the [:, :, None, :] unpack. Both, plus the axis-2 reductions
# (sa, out), were verified BIT-EXACT natively with integer data
# (probe_mega_batched.py bwkv/bmm) — mandatory here, because bad Mosaic
# relayouts compile and silently miscompute (see module header).


def _make_kernel_batched(c, h, s, d_lora, f_dim, n_layer, quant, batch):
    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    def qx(x):
        """Per-COLUMN activation quantization (w8a8 semantics, one scale
        per batch lane)."""
        amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)        # [1, B]
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
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, rkv_d, lora1, lora1_d, lora2, lora2_d,
             out_w, out_d, fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, y_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, lora1, lora2, out_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, y_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        x = x_s[:]                                              # [C, B]

        def matv(w_ref, d_ref, row_lo, row_hi, xcols):
            w = w_ref[0][row_lo:row_hi]
            if quant:
                x8, dx = qx(xcols)
                acc = mm(w, x8)
                return acc.astype(jnp.float32) * dx * d_ref[0][row_lo:row_hi]
            # bf16 weights upcast in-register: Mosaic's single-pass
            # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
            # accumulates exactly like the XLA per-op path and the
            # extra MXU passes are free in a bandwidth-bound decode.
            return jax.lax.dot_general(
                w.astype(jnp.float32), xcols,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        # ---- attention ------------------------------------------------
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

        r = matv(rkv, rkv_d if quant else None, 0 * c, 1 * c, xr)
        k = matv(rkv, rkv_d if quant else None, 1 * c, 2 * c, xk)
        v = matv(rkv, rkv_d if quant else None, 2 * c, 3 * c, xv)

        d = d_lora
        w_dn = jnp.tanh(matv(lora1, lora1_d if quant else None, 0 * d, 1 * d, xw))
        a_dn = matv(lora1, lora1_d if quant else None, 1 * d, 2 * d, xa)
        g_dn = jax.nn.sigmoid(matv(lora1, lora1_d if quant else None, 2 * d, 3 * d, xg))
        v_dn = matv(lora1, lora1_d if quant else None, 3 * d, 4 * d, xv)

        w_l = matv(lora2, lora2_d if quant else None, 0 * c, 1 * c, w_dn)
        a_l = matv(lora2, lora2_d if quant else None, 1 * c, 2 * c, a_dn)
        g = matv(lora2, lora2_d if quant else None, 2 * c, 3 * c, g_dn)
        vmix_l = matv(lora2, lora2_d if quant else None, 3 * c, 4 * c, v_dn)

        w_dec = jnp.exp(
            jax.nn.sigmoid(w_l + w0[0]) * jnp.float32(-0.606531)
        )
        a_gate = jax.nn.sigmoid(a_l + a0[0])

        kk = (k * kkw[0]).reshape(h, s, batch)
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

        # ---- wkv7 step, state [H, S_i, S_j, B] ------------------------
        def rows(vec):                                   # [C, B] -> [h, s, B]
            return vec.reshape(h, s, batch)

        r3, w3, k3, v3 = rows(r), rows(w_dec), rows(k), rows(v)
        a3 = -kk
        b3 = kk * rows(a_gate)

        # j-indexed operands broadcast over the s_i slab dim for free;
        # v (i-indexed) takes the verified unpack.
        r4 = r3[:, None, :, :]
        w4 = w3[:, None, :, :]
        k4 = k3[:, None, :, :]
        a4 = a3[:, None, :, :]
        b4 = b3[:, None, :, :]
        v4 = v3[:, :, None, :]

        st = heads_in[0]                                 # [h, s_i, s_j, B]
        sa = jnp.sum(st * a4, axis=2, keepdims=True)     # [h, s_i, 1, B]
        st = st * w4 + k4 * v4 + b4 * sa
        y3 = jnp.sum(st * r4, axis=2)                    # [h, s_i, B]
        heads_out[0] = st

        # The slab-dim reduce leaves y3 in a sublane-replicated layout
        # that Mosaic cannot relayout into the packed form the group-norm
        # stats need ("Invalid relayout: non-singleton dim replicated in
        # destination") — but a ref STORE accepts it. Materialize through
        # scratch to force the canonical packed layout.
        y_s[:] = y3.reshape(c, batch)
        y3 = y_s[:].reshape(h, s, batch)

        # group norm per head over s_i (sublanes of y3), eps 64e-5
        mu = jnp.mean(y3, axis=1, keepdims=True)
        yc = y3 - mu
        var = jnp.mean(yc * yc, axis=1, keepdims=True)
        y3 = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
        xo = y3.reshape(c, batch) * lnxw[0] + lnxb[0]

        dots = jnp.sum(k3 * r3 * rk[0], axis=1, keepdims=True)   # [h, 1, B]
        bonus = (v3 * dots).reshape(c, batch)
        xo = (xo + bonus) * g

        att_proj = matv(out_w, out_d if quant else None, 0, c, xo)
        x = x + att_proj

        # ---- FFN ------------------------------------------------------
        xl2 = ln(x, ln2w[0], ln2b[0], 1e-5)
        sx2 = ffn_in[0] - xl2
        ffn_out[0] = xl2
        xk2 = xl2 + sx2 * xkw[0]
        fk = matv(fk_w, fk_d if quant else None, 0, f_dim, xk2)
        fk = jnp.square(jnp.maximum(fk, 0.0))
        ffn_proj = matv(fv_w, fv_d if quant else None, 0, c, fk)
        x = x + ffn_proj

        x_s[:] = x
        y_out[:] = x

    return kernel


def v7_decode_megakernel_batched(
    pack: dict, state4: dict, x0, cfg, interpret: bool = False,
):
    """Run all layers of one v7 decode step for a BATCH (batch on lanes).

    pack: build_mega_pack output (same pack as B=1 — weights are
    batch-independent). state4: batched transposed state — att_xx
    [L, C, B], ffn_xx [L, C, B], heads [L, H, S_i, S_j, B] (serving (i, j)
    orientation, batch moved to lanes). x0: [C, B] f32 (embedding + ln0
    applied). Returns (x [C, B], new state4)."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_lora, f_dim = pack["d_lora"], pack["f_dim"]
    quant = pack["quant"]
    batch = x0.shape[1]

    kernel = _make_kernel_batched(
        c, h, s, d_lora, f_dim, n_layer, quant, batch
    )

    def blocked(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    mat_args, mat_specs = [], []
    for name in _MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            d = pack[name + "_d"]
            mat_args.append(d)
            mat_specs.append(blocked(d.shape[1:]))

    vec_args = [pack[k] for k in _VEC_KEYS]
    vec_specs = [blocked((c, 1)) for _ in _VEC_KEYS]

    args = (
        [x0.astype(jnp.float32),
         state4["att_xx"], state4["ffn_xx"], state4["heads"]]
        + mat_args + vec_args
        + [pack["coeff"], pack["r_k"]]
    )
    in_specs = (
        [whole((c, batch)), blocked((c, batch)), blocked((c, batch)),
         blocked((h, s, s, batch))]
        + mat_specs + vec_specs
        + [blocked((6 * c, 1)), blocked((h, s, 1))]
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, h, s, s, batch), jnp.float32),
    )
    out_specs = (
        whole((c, batch)), blocked((c, batch)), blocked((c, batch)),
        blocked((h, s, s, batch)),
    )

    y, att_xx, ffn_xx, heads = pl.pallas_call(
        kernel,
        grid=(n_layer,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, batch), jnp.float32),
            pltpu.VMEM((c, batch), jnp.float32),
            pltpu.VMEM((c, batch), jnp.float32),
        ],
        # layer grid has sequential carries — must stay "arbitrary" (see
        # the B=1 kernel's note); VMEM budget raised for the state blocks
        # (4 double-buffered [h, s, s, B] blocks) + per-layer weights.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return y, {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}



# ---------------------------------------------------------------------------
# LANE-PACKED batched kernel (2 <= B < 128): state [H, S_j, S_i*B]
# ---------------------------------------------------------------------------
#
# The plain batched kernel's state blocks put BATCH alone on lanes, so
# any B < 128 pads to 128 and streams 128/B x the useful state bytes —
# the reason mid-B decode fell back to the per-op path. This variant
# packs (S_i, B) onto lanes: zero padding whenever S_i*B >= 128 (B >= 2
# at head size 64). Every layout move is expressed as a dot with a
# constant 0/1 selection matrix (built from iota in-kernel) or a
# sublane split/reduce — no lane-dim value reshapes, which Mosaic may
# relayout incorrectly (module header):
#   E[b, m]  = 1 iff m % B == b   ("broadcast a [*, B] over s_i")
#   K[i, m]  = 1 iff m // B == i  ("select lane group i")
#   j-operands r/w/k/a/b: [c, B] -mm E-> [c, S_i*B] -> split (h, s_j, .)
#   v (i-indexed):  D = v mm E;  v_p = sum_i' D[h, i', m] * K[i', m]
#   group-norm stats over s_i per (h, b): y mm E^T / s, broadcast back
#   unpack to [C, B]: (xo_p broadcast over s_i) * K  mm  E^T
# The selection dots run at HIGHEST precision — they are permutations,
# a single bf16 MXU pass would round the f32 values they carry.


def _make_kernel_batched_packed(c, h, s, d_lora, f_dim, n_layer, quant,
                                batch):
    sib = s * batch

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    def mmf(a, b, exact=False):
        """Selection/permutation dot. The 0/1 matrix is exact in any
        precision; DEFAULT (one bf16 MXU pass) rounds the carried f32
        values to bf16 — acceptable for the wkv operands (the per-op
        bf16 path rounds identically, and HIGHEST costs ~6 passes,
        measured to collapse the kernel past B~8 since the dot FLOPs
        scale as B^2*s). Stats that feed rsqrt use exact=True."""
        return jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.HIGHEST if exact
                       else jax.lax.Precision.DEFAULT),
        )

    def qx(x):
        """Per-COLUMN activation quantization (one scale per lane)."""
        amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)        # [1, B]
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
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, rkv_d, lora1, lora1_d, lora2, lora2_d,
             out_w, out_d, fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk, lnxw_p, lnxb_p,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, yp_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, lora1, lora2, out_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk, lnxw_p, lnxb_p,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, yp_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        x = x_s[:]                                              # [C, B]

        def vec(ref):
            """[1, N] row window -> [N, 1] column (rowified pack)."""
            return ref[0].T

        def matv(w_ref, d_ref, row_lo, row_hi, xcols):
            w = w_ref[0][row_lo:row_hi]
            if quant:
                x8, dx = qx(xcols)
                acc = mm(w, x8)
                dd = d_ref[0][:, row_lo:row_hi].T
                return acc.astype(jnp.float32) * dx * dd
            return jax.lax.dot_general(
                w.astype(jnp.float32), xcols,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        # constant selection matrices (iota — no operand streams)
        m_lane = jax.lax.broadcasted_iota(jnp.int32, (batch, sib), 1)
        b_row = jax.lax.broadcasted_iota(jnp.int32, (batch, sib), 0)
        E = ((m_lane % batch) == b_row).astype(jnp.float32)       # [B, sib]
        mK = jax.lax.broadcasted_iota(jnp.int32, (s, sib), 1)
        iK = jax.lax.broadcasted_iota(jnp.int32, (s, sib), 0)
        K = ((mK // batch) == iK).astype(jnp.float32)             # [s, sib]

        # ---- attention ------------------------------------------------
        xl = ln(x, vec(ln1w), vec(ln1b), 1e-5)
        sx = att_in[0] - xl
        att_out[0] = xl

        cf = vec(coeff).reshape(6, c, 1)
        xr = xl + sx * cf[0]
        xw = xl + sx * cf[1]
        xk = xl + sx * cf[2]
        xv = xl + sx * cf[3]
        xa = xl + sx * cf[4]
        xg = xl + sx * cf[5]

        r = matv(rkv, rkv_d if quant else None, 0 * c, 1 * c, xr)
        k = matv(rkv, rkv_d if quant else None, 1 * c, 2 * c, xk)
        v = matv(rkv, rkv_d if quant else None, 2 * c, 3 * c, xv)

        d = d_lora
        w_dn = jnp.tanh(matv(lora1, lora1_d if quant else None,
                             0 * d, 1 * d, xw))
        a_dn = matv(lora1, lora1_d if quant else None, 1 * d, 2 * d, xa)
        g_dn = jax.nn.sigmoid(matv(lora1, lora1_d if quant else None,
                                   2 * d, 3 * d, xg))
        v_dn = matv(lora1, lora1_d if quant else None, 3 * d, 4 * d, xv)

        w_l = matv(lora2, lora2_d if quant else None, 0 * c, 1 * c, w_dn)
        a_l = matv(lora2, lora2_d if quant else None, 1 * c, 2 * c, a_dn)
        g = matv(lora2, lora2_d if quant else None, 2 * c, 3 * c, g_dn)
        vmix_l = matv(lora2, lora2_d if quant else None, 3 * c, 4 * c, v_dn)

        w_dec = jnp.exp(
            jax.nn.sigmoid(w_l + vec(w0)) * jnp.float32(-0.606531)
        )
        a_gate = jax.nn.sigmoid(a_l + vec(a0))

        kk = (k * vec(kkw)).reshape(h, s, batch)
        nrm = jnp.sqrt(jnp.sum(kk * kk, axis=1, keepdims=True))
        kk = (kk / jnp.maximum(nrm, jnp.float32(1e-12))).reshape(c, batch)

        ka = k * vec(kaw)
        k = k + (a_gate * ka - ka)

        @pl.when(i == 0)
        def _():
            vf_s[:] = v

        vf = vf_s[:]
        v_mixed = v + (vf - v) * jax.nn.sigmoid(vmix_l + vec(v0))
        v = jnp.where(i == 0, v, v_mixed)

        # ---- wkv7, packed state [h, s_j, s_i*B] ------------------------
        # j-indexed operands broadcast over s_i in ONE fused selection
        # dot: [5c, B] @ E -> [5c, sib]
        jstack = jnp.concatenate(
            [r, w_dec, k, -kk, kk * a_gate], axis=0
        )                                                   # [5c, B]
        jb = mmf(jstack, E).reshape(5, h, s, sib)
        r_b, w_b, k_b, a_b, b_b = (jb[0], jb[1], jb[2], jb[3], jb[4])

        # v (i-indexed): broadcast over b, then select lane group i
        Dv = mmf(v, E).reshape(h, s, sib)                   # v[(h,i'), b]
        v_b = jnp.sum(Dv * K[None], axis=1, keepdims=True)  # [h, 1, sib]

        st = heads_in[0]                                    # [h, s_j, sib]
        sa = jnp.sum(st * a_b, axis=1, keepdims=True)
        st = st * w_b + k_b * v_b + b_b * sa
        y3 = jnp.sum(st * r_b, axis=1, keepdims=True)       # [h, 1, sib]
        heads_out[0] = st

        # materialize through scratch: the slab-reduce layout cannot be
        # relayouted directly into the 2D stats shape (see the plain
        # batched kernel's y_s note)
        yp_s[:] = y3.reshape(h, sib)
        y2 = yp_s[:]                                        # [h, sib]

        # group norm over s_i per (h, b): stats via selection dots
        inv_s = jnp.float32(1.0 / s)
        mu = mmf(y2, E.T, exact=True) * inv_s               # [h, B]
        mu_b = mmf(mu, E, exact=True)                       # [h, sib]
        yc = y2 - mu_b
        var = mmf(yc * yc, E.T, exact=True) * inv_s
        var_b = mmf(var, E, exact=True)
        yn = yc * jax.lax.rsqrt(var_b + jnp.float32(64e-5))
        xo_p = yn * lnxw_p[0] + lnxb_p[0]                   # [h, sib]

        rk3 = vec(rk).reshape(h, s, 1)
        dots = jnp.sum(k_b * r_b * rk3, axis=1, keepdims=True)  # [h,1,sib]
        xo_p = xo_p + (v_b * dots)[:, 0]

        # unpack [h, sib] -> [C, B] (select lane group, reduce with E^T)
        tmp = (xo_p[:, None, :] * K[None]).reshape(c, sib)
        xo = mmf(tmp, E.T)                                  # [C, B]
        xo = xo * g

        att_proj = matv(out_w, out_d if quant else None, 0, c, xo)
        x = x + att_proj

        # ---- FFN ------------------------------------------------------
        xl2 = ln(x, vec(ln2w), vec(ln2b), 1e-5)
        sx2 = ffn_in[0] - xl2
        ffn_out[0] = xl2
        xk2 = xl2 + sx2 * vec(xkw)
        fk = matv(fk_w, fk_d if quant else None, 0, f_dim, xk2)
        fk = jnp.square(jnp.maximum(fk, 0.0))
        ffn_proj = matv(fv_w, fv_d if quant else None, 0, c, fk)
        x = x + ffn_proj

        x_s[:] = x
        y_out[:] = x

    return kernel


def v7_decode_megakernel_batched_packed(
    pack: dict, state_p: dict, x0, cfg, interpret: bool = False,
):
    """Lane-packed batched v7 decode step (2 <= B < 128).

    pack: ROWIFIED build_mega_pack output (rowify_mega_pack). state_p:
    att_xx/ffn_xx [L, C, B], heads [L, H, S_j, S_i*B] (lane-packed; see
    pack_batched_state). x0: [C, B] f32. Returns (x [C, B], state_p)."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_lora, f_dim = pack["d_lora"], pack["f_dim"]
    quant = pack["quant"]
    batch = x0.shape[1]
    sib = s * batch
    assert pack["ln1.weight"].shape[1] == 1, "needs a rowified pack"

    kernel = _make_kernel_batched_packed(
        c, h, s, d_lora, f_dim, n_layer, quant, batch
    )

    def blocked(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    mat_args, mat_specs = [], []
    for name in _MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            dq = pack[name + "_d"]
            mat_args.append(dq)
            mat_specs.append(blocked(dq.shape[1:]))

    vec_args = [pack[k] for k in _VEC_KEYS]
    vec_specs = [blocked(pack[k].shape[1:]) for k in _VEC_KEYS]

    # ln_x affine in the packed lane layout (XLA-side broadcast; tiny)
    lnxw_p = jnp.broadcast_to(
        pack["att.ln_x.weight"].reshape(n_layer, h, s, 1),
        (n_layer, h, s, batch),
    ).reshape(n_layer, h, sib)
    lnxb_p = jnp.broadcast_to(
        pack["att.ln_x.bias"].reshape(n_layer, h, s, 1),
        (n_layer, h, s, batch),
    ).reshape(n_layer, h, sib)

    args = (
        [x0.astype(jnp.float32),
         state_p["att_xx"], state_p["ffn_xx"], state_p["heads"]]
        + mat_args + vec_args
        + [pack["coeff"], pack["r_k"], lnxw_p, lnxb_p]
    )
    in_specs = (
        [whole((c, batch)), blocked((c, batch)), blocked((c, batch)),
         blocked((h, s, sib))]
        + mat_specs + vec_specs
        + [blocked(pack["coeff"].shape[1:]), blocked(pack["r_k"].shape[1:]),
           blocked((h, sib)), blocked((h, sib))]
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, h, s, sib), jnp.float32),
    )
    out_specs = (
        whole((c, batch)), blocked((c, batch)), blocked((c, batch)),
        blocked((h, s, sib)),
    )

    y, att_xx, ffn_xx, heads = pl.pallas_call(
        kernel,
        grid=(n_layer,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, batch), jnp.float32),
            pltpu.VMEM((c, batch), jnp.float32),
            pltpu.VMEM((h, sib), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return y, {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}


def pack_batched_state(heads, h, s):
    """Serving heads [B, L, H, S_i, S_j] -> lane-packed [L, H, S_j,
    S_i*B] (the packed batched kernel's layout)."""
    b = heads.shape[0]
    L = heads.shape[1]
    # [B, L, H, S_i, S_j] -> [L, H, S_j, S_i, B] -> merge (S_i, B)
    t = jnp.transpose(heads, (1, 2, 4, 3, 0))
    return t.reshape(L, h, s, s * b)


def unpack_batched_state(heads_p, b, h, s):
    """Inverse of pack_batched_state."""
    L = heads_p.shape[0]
    t = heads_p.reshape(L, h, s, s, b)
    return jnp.transpose(t, (4, 0, 1, 3, 2))


# ---------------------------------------------------------------------------
# Phase-tiled kernel: bounded-VMEM streaming for big layers / big batches
# ---------------------------------------------------------------------------
#
# Two VMEM walls motivate this variant:
#   1. At 1.5B (C=2048, F=8192) one layer's int8 weights are ~51MB — the
#      whole-layer grid cannot double-buffer them.
#   2. For B>1 the [H, S_i, S_j, B] state blocks pad the LANE dim B->128,
#      so a whole-layer state block costs H*S*S*128*4 bytes REGARDLESS of
#      B (~25MB at 169M x 4 buffers = OOM — observed natively).
# The grid becomes (layer, phase); big matrices stream in phase-sized
# blocks and the wkv state streams in HEAD-TILE blocks, so peak VMEM is
# the largest phase, not the layer:
#
#   p0                matvecs: r/k/v (rkv resident) + loras + kk/k-update
#                     + v_first mix -> scratch columns
#   p1 .. p_nh        wkv + group-norm + bonus + gate for head tile t
#                     (state block [h/nh, s, s(, B)])
#   p_nh+1            att out-projection + ln2 + ffn token-shift
#   p_nh+2 ..         fk tile -> relu^2 -> hidden slice   ([F/nf, C])
#   p_nh+3 ..         acc += fv tile @ hidden slice       ([C, F/nf])
#   last              finalize layer (x += ffn acc)
#
# The weight stream still runs at the whole-block rate (~650 GB/s measured
# for 512-row..whole-matrix blocks, scripts/probe_mega_batched.py); only
# grid bookkeeping changes. Head ops reuse the two verified layouts:
# B=1 -> [H, S_j, S_i] (eye-trick, _make_kernel), B>1 -> [H, S_i, S_j, B]
# (batched section above), incl. the scratch materialization after the
# slab reduce.


def choose_tiling(cfg, quant: bool, batch: int, f_dim: int = None,
                  n_proj: int = 3, packed: bool = False,
                  v6_budget: tuple = (1, 2)) -> tuple:
    """(nh, nf, nr, no) so that each phase's double-buffered blocks stay
    small: head-tile state block <= ~8MB batched / ~2MB at B=1 (lane dim
    pads to 128 for B>1), fk/fv tile <= ~4.5MB, rkv/out row tiles <= ~8MB
    (nr counts tiles over the whole fused input-projection block — always
    a multiple of n_proj so tiles never straddle a projection boundary;
    n_proj=3 for v7's r/k/v, 4 for v6's r/k/v/g).

    w4 windows keep w8a8's ROW counts (same tile shapes, half the bytes
    per window after nibble packing): measured on chip, halving the
    phase count instead ("byte-sized" 2x-row windows) loses 3x at 7B —
    so the tiling is format-independent and takes no w4 flag."""
    h, s, c = cfg.head_count, cfg.head_size, cfg.n_embed
    f = f_dim if f_dim is not None else 4 * c
    # Tile budgets shrink at 7B-class widths: the fixed VMEM costs
    # (activation scratch columns, state windows) grow linearly with C,
    # so the weight windows must take a smaller share to keep the total
    # under the chip's 128MB. <=1.5B keeps the configuration its numbers
    # were measured at.
    wide = c >= 3072
    mm_budget = (9 * 1024 * 1024 // 4) if wide else (9 * 1024 * 1024 // 2)
    if n_proj == 4 and c >= 2048:
        # 4-projection layers (v6/v5.2) keep more concurrent weight
        # windows resident than v7 (rkvg + out + fr + fk/fv, plus v6's
        # decay/maa chain); at C=2048 and C=4096 the default windows
        # overflow the 128MB VMEM by 4-6MB on chip (v5e) — shrink the
        # window budget (`v6_budget` num/den, an explicit argument so
        # pack shapes are deterministic for a given config — on-chip
        # probes pass a different ratio; the halving costs 7B v6
        # ~170 GB/s of stream with the column data plane, and is nearly
        # free on the row plane: 11.76 vs 11.83 ms/tok).
        num, den = v6_budget
        mm_budget = mm_budget * num // den
    if packed and batch > 1 and c >= 2048:
        # the packed-batch scratch columns ([C, B] f32, lane-padded)
        # plus a fused [3C, C] rkv window overflow VMEM by ~1.5MB at
        # 1.5B B=8 on chip — row-tile the projections instead.
        mm_budget //= 2
    lane = max(128, batch)                   # lane dim pads B -> 128 min
    if batch == 1:
        per_head = s * 128 * 4               # [s_j, s_i->128] f32
        budget = (512 if wide else 1024) * 1024
    elif packed:
        per_head = s * s * batch * 4         # [s_j, s_i*B] f32, no pad
        # 6MB (not 8): at 1.5B B=16 the 8MB whole-head window put the
        # kernel 5.2MB over the 120MB scoped-vmem cap on chip; 6MB
        # keeps nh=1 through B=8 (the measured configs) and splits the
        # head tiles from B=16 up.
        budget = 6 * 1024 * 1024
    else:
        per_head = s * s * lane * 4          # [s_i, s_j, B] f32
        budget = 8 * 1024 * 1024
    nh = 1
    while (h // nh) * per_head > budget or h % nh:
        nh += 1
        if nh > h:
            nh = h
            break
    # weight ELEMENTS per window match w8a8 (w4 windows then hold half
    # the bytes). The round-4 "w4 windows keep w8's byte size" variant
    # (whb=1: 2x rows per window, half the phases) measured 2% faster
    # at 1.5B but 3x SLOWER at 7B (35.5 vs 11.5 ms/tok — the doubled-row
    # windows starve the wide row-tiled pipeline); element-parity wins
    # at both sizes (1.5B 2.234 ms, 7B 11.51 ms on chip).
    whb = 2 if quant else 4
    # Row-plane kernels store [1, tile_rows] f32 rows at tile_rows-strided
    # offsets; Mosaic requires lane-dim store offsets to be multiples of
    # 128, so tile row counts must be too (when the dim allows it). At
    # C=5120 (14B) the budget-only rule picked 320-row tiles and the
    # kernel failed to lower.
    nf = 1
    while ((f * c * whb) // (2 * nf) > mm_budget or f % nf
           or (f % 128 == 0 and (f // nf) % 128)):
        nf += 1
    m = 1
    while (((c // m) * c * whb) // 2 > mm_budget or c % m
           or (c % 128 == 0 and (c // m) % 128)):
        m += 1
    return nh, nf, n_proj * m, m


# Vectors the tiled kernel stores as [L, 1, N] ROWS: an [N, 1] column
# block pads its lane dim 1 -> 128 in VMEM (a [2048, 1] window costs 1MB
# x2 buffers for 8KB of data; at 1.5B the padding alone OOMs the 128MB
# scoped VMEM).  Rows cost N*4 bytes and are transposed to columns
# in-kernel — verified exact natively (scripts/probe_row_layout.py pA/pB).
# ln_x.weight/bias and r_k are EXCLUDED: the wkv phase slices them
# per head tile with a grid-dependent offset, which needs a ref-level
# pl.dslice (lax.dynamic_slice on a transposed VALUE has no Mosaic
# lowering — probe pD), so they stay columns.
_TILED_ROW_VECS = tuple(
    k for k in _VEC_KEYS if k not in ("att.ln_x.weight", "att.ln_x.bias")
)


def retile_mega_pack(pack: dict, cfg, nh: int = 1, nf: int = 1,
                     nr: int = 3, no: int = 1) -> dict:
    """Re-tile a build_mega_pack output for the phase-tiled kernel:
    fk [L, F, C] -> [L, nf, F/nf, C], fv [L, C, F] -> [L, nf, C, F/nf],
    rkv [L, 3C, C] -> [L, nr, 3C/nr, C], out [L, C, C] -> [L, no, C/no, C]
    (device-side; fv needs one transpose); vectors and quant row scales
    move to [L, 1, N] row layout (see _TILED_ROW_VECS note), with the
    rkv/out scales tiled alongside their weights ([L, nt, 1, rows] —
    tile-local row slicing needs a tile-indexed window, not a dynamic
    slice of a transposed value). Adds 'nh'/'nf'/'nr'/'no' meta."""
    c = cfg.n_embed
    f_dim = pack["f_dim"]
    assert f_dim % nf == 0, (f_dim, nf)
    assert nr % 3 == 0 and c % (nr // 3) == 0, (c, nr)
    assert c % no == 0, (c, no)
    f4 = f_dim // nf
    c_r = 3 * c // nr
    c_o = c // no
    out = dict(pack)
    out["nh"], out["nf"] = nh, nf
    out["nr"], out["no"] = nr, no
    L = pack["fk"].shape[0]
    out["fk"] = pack["fk"].reshape(L, nf, f4, -1)
    out["fv"] = jnp.swapaxes(pack["fv"].reshape(L, -1, nf, f4), 1, 2)
    out["rkv"] = pack["rkv"].reshape(L, nr, c_r, c)
    out["out"] = pack["out"].reshape(L, no, c_o, c)
    if pack["quant"]:
        out["fk_d"] = jnp.swapaxes(
            pack["fk_d"].reshape(L, nf, f4, 1), 2, 3
        )  # [L, nf, 1, f4]
        # fv_d scales rows of the OUTPUT (C) — identical for every tile.
        for name in ("lora1", "lora2", "fv"):
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
        out["rkv_d"] = jnp.swapaxes(
            pack["rkv_d"].reshape(L, nr, c_r, 1), 2, 3
        )  # [L, nr, 1, c_r]
        out["out_d"] = jnp.swapaxes(
            pack["out_d"].reshape(L, no, c_o, 1), 2, 3
        )  # [L, no, 1, c_o]
    for key in _TILED_ROW_VECS:
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    out["coeff"] = jnp.swapaxes(pack["coeff"], 1, 2)
    if pack.get("w4"):
        # split-half nibble packing along K: byte s of a row holds
        # code[s] (low nibble) and code[s + K/2] (high nibble), so the
        # kernel's two half-K dots consume contiguous activation slices
        # (no strided sublane gathers).
        for name in ("rkv", "out", "fk", "fv"):
            out[name] = _pack_nibbles_split_half(out[name])
    return out


def _make_kernel_tiled(c, h, s, d_lora, f_dim, n_layer, quant, batch,
                       nh, nf, nr, no, w4=False, packed=False):
    h4 = h // nh
    f4 = f_dim // nf
    m = nr // 3                  # rkv tiles per projection
    c_r = c // m                 # rows per rkv tile
    c_o = c // no                # rows per out tile
    # With m == 1 the rkv projections run FUSED inside phase 0 (the
    # whole [3C, C] window early-prefetches across the entire previous
    # layer — maximum DMA slack, the configuration every <=1.5B model
    # was validated and measured at). m > 1 switches to per-tile rkv
    # phases whose windows fit VMEM at 7B-class widths.
    fused = (m == 1)
    # phase layout (see v7_decode_megakernel_tiled docstring):
    P_WKV0 = 1 if fused else (1 + nr + 1)
    P_POST = P_WKV0 - 1          # unused when fused
    P_OUT0 = P_WKV0 + nh
    P_FSH = P_OUT0 + no
    P_FK0 = P_FSH + 1
    P_FV0 = P_FK0 + 1
    n_phase = P_FK0 + nf + 1

    # FULL-ROW B=1 data plane (same rewrite as _make_kernel_tiled_v6,
    # measured 2.06x at 7B v6): [1, N] activations/scratches (a [N, 1]
    # f32 scratch lane-pads 1 -> 128 — ~40MB of VMEM at C=4096),
    # lane-contracting matvecs, row scales consumed as stored. The
    # batched/packed variants keep the column plane (their lane dim is
    # the batch).
    rowp = (batch == 1) and not packed
    red_ax = 1 if rowp else 0

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    def qx(x):
        amax = jnp.max(jnp.abs(x), axis=red_ax, keepdims=True)
        dx = amax / 127.0
        inv = jnp.where(dx > 0.0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(x * inv), -127.0, 127.0).astype(jnp.int8)
        return x8, dx

    def ln(v, w, b, eps):
        mu = jnp.mean(v, axis=red_ax, keepdims=True)
        vc = v - mu
        var = jnp.mean(vc * vc, axis=red_ax, keepdims=True)
        return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + b

    def kernel(*refs):
        lnxw_p = lnxb_p = yp_s = None
        if packed:
            # packed-lane ln_x affine windows trail the other INPUTS,
            # and the packed group-norm scratch is the LAST scratch
            # (pallas ref order: inputs, outputs, scratch)
            refs = list(refs)
            yp_s = refs.pop()
            n_tail = 4 + 18 + (1 if batch > 1 else 0)  # outs + scratch
            lnxb_p = refs[-n_tail - 1]
            lnxw_p = refs[-n_tail - 2]
            del refs[-n_tail - 2:-n_tail]
            refs = tuple(refs)
        # y_s exists only in the batched variant (slab-reduce group-norm
        # materialization) — B=1 skips the allocation entirely.
        y_s = None
        if batch > 1:
            *refs_, y_s = refs
            refs = tuple(refs_)
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, rkv_d, lora1, lora1_d, lora2, lora2_d,
             out_w, out_d, fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, xo_s, xk2_s, acc_s, h_s,
             r_s, k_s, v_s, wd_s, ag_s, kk_s, g_s,
             xr_s, xk_in_s, xv_in_s, vm_s, ap_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkv, lora1, lora2, out_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, w0, a0, v0, kkw, kaw, lnxw, lnxb, xkw,
             coeff, rk,
             y_out, att_out, ffn_out, heads_out,
             x_s, vf_s, xo_s, xk2_s, acc_s, h_s,
             r_s, k_s, v_s, wd_s, ag_s, kk_s, g_s,
             xr_s, xk_in_s, xv_in_s, vm_s, ap_s) = refs

        i = pl.program_id(0)
        p = pl.program_id(1)

        def cv(ref):
            """Row-stored vector block [1, N]: column for the column
            plane (exact natively — probe pA), as-is for the row
            plane."""
            return ref[0] if rowp else ref[0].T

        def slc(w_ref, d_ref, lo, hi):
            w = w_ref[0][lo:hi]
            if not quant:
                return w, None
            if rowp:
                # row scale [1, n]; the sublane-sliced transpose keeps
                # the (possibly lane-misaligned) LoRA slices legal
                return w, d_ref[0].T[lo:hi].T
            return w, d_ref[0].T[lo:hi]

        def mmr(x8row, w):
            """[1, K] x [N, K] -> [1, N] (row plane)."""
            return jax.lax.dot_general(
                x8row, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )

        def matv(w, d, xv):
            """w [N, K]; row plane: xv [1, K] -> [1, N], d [1, N];
            column plane: xv [K, B] -> [N, B], d [N, 1]."""
            if quant:
                x8, dx = qx(xv)
                acc = mmr(x8, w) if rowp else mm(w, x8)
                return acc.astype(jnp.float32) * dx * d
            # bf16 weights upcast in-register: Mosaic's single-pass
            # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
            # accumulates exactly like the XLA per-op path and the
            # extra MXU passes are free in a bandwidth-bound decode.
            if rowp:
                return jax.lax.dot_general(
                    xv, w.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return jax.lax.dot_general(
                w.astype(jnp.float32), xv,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def matv4(w, d, xv):
            """w [N, K/2] split-half biased-lo packed int4 pairs (see
            _pack_nibbles_split_half / _w4_acc); d/x layouts as matv."""
            kh = w.shape[1]
            x8, dx = qx(xv)
            if rowp:
                lo8 = x8[:, :kh]
                hi8 = x8[:, kh:]
                lo_u = w & jnp.int8(15)
                hi16 = w & jnp.int8(-16)
                sx8 = jnp.sum(lo8.astype(jnp.int32))
                acc16 = (mmr(hi8, hi16) + 16 * mmr(lo8, lo_u)
                         - 128 * sx8)
            else:
                acc16 = _w4_acc(mm, w, x8[:kh], x8[kh:])
            return acc16.astype(jnp.float32) * (
                dx * jnp.float32(_W4_INV16)) * d

        mv_big = matv4 if w4 else matv

        def sload(ref, lo, n):
            return ref[:, pl.dslice(lo, n)] if rowp \
                else ref[pl.dslice(lo, n)]

        def sstore(ref, lo, n, val):
            if rowp:
                ref[:, pl.dslice(lo, n)] = val
            else:
                ref[pl.dslice(lo, n)] = val

        def _post_body():
            k = k_s[:]
            v = v_s[:]
            a_gate = ag_s[:]

            if rowp:
                # per-head L2 norm needs the (h, s) split: one small
                # [1, C] <-> [C, 1] transpose pair round-trips it
                kkv = (k * cv(kkw)).T.reshape(h, s, 1)
                nrm = jnp.sqrt(jnp.sum(kkv * kkv, axis=1, keepdims=True))
                kkv = kkv / jnp.maximum(nrm, jnp.float32(1e-12))
                kk_s[:] = kkv.reshape(c, 1).T
            else:
                kkv = (k * cv(kkw)).reshape(h, s, batch)
                nrm = jnp.sqrt(jnp.sum(kkv * kkv, axis=1, keepdims=True))
                kkv = kkv / jnp.maximum(nrm, jnp.float32(1e-12))
                kk_s[:] = kkv.reshape(c, batch)

            ka = k * cv(kaw)
            k_s[:] = k + (a_gate * ka - ka)

            @pl.when(i == 0)
            def _():
                vf_s[:] = v

            vf = vf_s[:]
            v_mixed = v + (vf - v) * jax.nn.sigmoid(vm_s[:] + cv(v0))
            v_s[:] = jnp.where(i == 0, v, v_mixed)

        # ---- phase 0: token shift + LoRA chain (projection inputs to
        #      scratch; the r/k/v matvecs stream in the next nr phases) --
        @pl.when(p == 0)
        def _shift_loras():
            @pl.when(i == 0)
            def _():
                x_s[:] = x0_ref[:].T if rowp else x0_ref[:]

            x = x_s[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            sx = att_in[0] - xl
            att_out[0] = xl

            if rowp:
                cfr = coeff[0]                       # [1, 6c] row
                cf = [cfr[:, q * c:(q + 1) * c] for q in range(6)]
            else:
                cf = coeff[0].T.reshape(6, c, 1)
            xr_s[:] = xl + sx * cf[0]
            xw = xl + sx * cf[1]
            xk_in_s[:] = xl + sx * cf[2]
            xv = xl + sx * cf[3]
            xv_in_s[:] = xv
            xa = xl + sx * cf[4]
            xg = xl + sx * cf[5]

            d = d_lora
            l1 = lora1_d if quant else None
            l2 = lora2_d if quant else None
            w_dn = jnp.tanh(matv(*slc(lora1, l1, 0 * d, 1 * d), xw))
            a_dn = matv(*slc(lora1, l1, 1 * d, 2 * d), xa)
            g_dn = jax.nn.sigmoid(matv(*slc(lora1, l1, 2 * d, 3 * d), xg))
            v_dn = matv(*slc(lora1, l1, 3 * d, 4 * d), xv)

            w_l = matv(*slc(lora2, l2, 0 * c, 1 * c), w_dn)
            a_l = matv(*slc(lora2, l2, 1 * c, 2 * c), a_dn)
            g_s[:] = matv(*slc(lora2, l2, 2 * c, 3 * c), g_dn)
            vm_s[:] = matv(*slc(lora2, l2, 3 * c, 4 * c), v_dn)

            wd_s[:] = jnp.exp(
                jax.nn.sigmoid(w_l + cv(w0)) * jnp.float32(-0.606531)
            )
            ag_s[:] = jax.nn.sigmoid(a_l + cv(a0))

            if fused:
                def dsc(q):
                    if not quant:
                        return None
                    return rkv_d[0, q] if rowp else rkv_d[0, q].T

                r_s[:] = mv_big(rkv[0, 0], dsc(0), xr_s[:])
                k_s[:] = mv_big(rkv[0, 1], dsc(1), xk_in_s[:])
                v_s[:] = mv_big(rkv[0, 2], dsc(2), xv_in_s[:])
                _post_body()

        if not fused:
            # ---- phases 1..nr: rkv row tiles --------------------------
            @pl.when((p >= 1) & (p < 1 + nr))
            def _rkv_tile():
                t = p - 1
                q = t // m          # projection: 0=r, 1=k, 2=v
                sft = (t % m) * c_r
                w = rkv[0, 0]                               # [c_r, C]
                d = ((rkv_d[0, 0] if rowp else rkv_d[0, 0].T)
                     if quant else None)
                xin = jnp.where(
                    q == 0, xr_s[:],
                    jnp.where(q == 1, xk_in_s[:], xv_in_s[:]),
                )
                acc = mv_big(w, d, xin)

                @pl.when(q == 0)
                def _():
                    sstore(r_s, sft, c_r, acc)

                @pl.when(q == 1)
                def _():
                    sstore(k_s, sft, c_r, acc)

                @pl.when(q == 2)
                def _():
                    sstore(v_s, sft, c_r, acc)

            # ---- phase P_POST: k-transform + value residual -----------
            @pl.when(p == P_POST)
            def _post():
                _post_body()

        # ---- phases P_WKV0..: wkv + group norm + bonus + gate ---------
        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                if rowp:
                    # row scratch slice -> per-head columns (the only
                    # row->column move left; [1, h4*s] is small)
                    return sload(ref, rows_lo, h4 * s).T.reshape(
                        h4, s, 1)
                return ref[pl.dslice(rows_lo, h4 * s)].reshape(
                    h4, s, batch)

            r3 = tile(r_s)
            k3 = tile(k_s)
            v3 = tile(v_s)
            w3 = tile(wd_s)
            a3 = -tile(kk_s)
            b3 = tile(kk_s) * tile(ag_s)

            if batch == 1:
                # verified B=1 layout: state [h4, S_j, S_i], eye trick
                i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
                j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
                eye = (i_ == j_).astype(jnp.float32)[None]
                st = heads_in[0, 0]
                sa_row = jnp.sum(st * a3, axis=1, keepdims=True)
                v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
                st = st * w3 + k3 * v_row + b3 * sa_row
                out_row = jnp.sum(st * r3, axis=1, keepdims=True)
                heads_out[0, 0] = st
                mu = jnp.mean(out_row, axis=2, keepdims=True)
                yc = out_row - mu
                var = jnp.mean(yc * yc, axis=2, keepdims=True)
                y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
                y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
                yn = y_col.reshape(h4 * s, 1)
            elif packed:
                # lane-PACKED state [h4, S_j, S_i*B] — zero lane padding
                # for B >= 2; every layout move is a 0/1 selection dot
                # (see the whole-layer packed kernel's notes; direct
                # lane reshapes fail to lower, probe_lane_pack.py)
                sib = s * batch
                m_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, sib), 1)
                b_row = jax.lax.broadcasted_iota(
                    jnp.int32, (batch, sib), 0)
                E = ((m_lane % batch) == b_row).astype(jnp.float32)
                mk_ = jax.lax.broadcasted_iota(jnp.int32, (s, sib), 1)
                ik_ = jax.lax.broadcasted_iota(jnp.int32, (s, sib), 0)
                Ksel = ((mk_ // batch) == ik_).astype(jnp.float32)

                def mmf(aM, bM, exact=False):
                    return jax.lax.dot_general(
                        aM, bM,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST if exact
                                   else jax.lax.Precision.DEFAULT),
                    )

                jstack = jnp.concatenate([
                    r3.reshape(h4 * s, batch), w3.reshape(h4 * s, batch),
                    k3.reshape(h4 * s, batch), a3.reshape(h4 * s, batch),
                    b3.reshape(h4 * s, batch),
                ], axis=0)
                jb = mmf(jstack, E).reshape(5, h4, s, sib)
                r_b, w_b, k_b, a_b, b_b = (jb[0], jb[1], jb[2], jb[3],
                                           jb[4])
                Dv = mmf(v3.reshape(h4 * s, batch), E).reshape(h4, s, sib)
                v_b = jnp.sum(Dv * Ksel[None], axis=1, keepdims=True)

                st = heads_in[0, 0]                  # [h4, s_j, sib]
                sa = jnp.sum(st * a_b, axis=1, keepdims=True)
                st = st * w_b + k_b * v_b + b_b * sa
                y3p = jnp.sum(st * r_b, axis=1, keepdims=True)
                heads_out[0, 0] = st
                yp_s[pl.dslice(t * h4, h4)] = y3p.reshape(h4, sib)
                y2 = yp_s[pl.dslice(t * h4, h4)]
                inv_s = jnp.float32(1.0 / s)
                mu = mmf(y2, E.T, exact=True) * inv_s
                mu_b = mmf(mu, E, exact=True)
                yc = y2 - mu_b
                var = mmf(yc * yc, E.T, exact=True) * inv_s
                var_b = mmf(var, E, exact=True)
                ynp = yc * jax.lax.rsqrt(var_b + jnp.float32(64e-5))
                xo_p = ynp * lnxw_p[0, 0] + lnxb_p[0, 0]     # [h4, sib]

                rkt = rk[0, pl.dslice(t * h4, h4)]           # [h4, s, 1]
                dots = jnp.sum(k_b * r_b * rkt, axis=1, keepdims=True)
                xo_p = xo_p + (v_b * dots)[:, 0]

                tmp = (xo_p[:, None, :] * Ksel[None]).reshape(h4 * s, sib)
                xo_col = mmf(tmp, E.T)                       # [h4*s, B]
                gt = g_s[pl.dslice(rows_lo, h4 * s)]
                xo_s[pl.dslice(rows_lo, h4 * s)] = xo_col * gt
                return
            else:
                # verified batched layout: state [h4, S_i, S_j, B]
                r4 = r3[:, None, :, :]
                w4 = w3[:, None, :, :]
                k4 = k3[:, None, :, :]
                a4 = a3[:, None, :, :]
                b4 = b3[:, None, :, :]
                v4 = v3[:, :, None, :]
                st = heads_in[0, 0]
                sa = jnp.sum(st * a4, axis=2, keepdims=True)
                st = st * w4 + k4 * v4 + b4 * sa
                y3 = jnp.sum(st * r4, axis=2)
                heads_out[0, 0] = st
                # materialize through scratch (slab-reduce layout cannot
                # feed the group-norm stats directly — see batched kernel)
                y_s[pl.dslice(rows_lo, h4 * s)] = y3.reshape(h4 * s, batch)
                y3 = y_s[pl.dslice(rows_lo, h4 * s)].reshape(h4, s, batch)
                mu = jnp.mean(y3, axis=1, keepdims=True)
                yc = y3 - mu
                var = jnp.mean(yc * yc, axis=1, keepdims=True)
                y3 = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
                yn = y3.reshape(h4 * s, batch)

            lw = lnxw[0, pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[0, pl.dslice(rows_lo, h4 * s)]
            xo = yn * lw + lb

            rkt = rk[0, pl.dslice(t * h4, h4)]
            dots = jnp.sum(k3 * r3 * rkt, axis=1, keepdims=True)
            if rowp:
                bonus = (v3 * dots).reshape(h4 * s, 1)
                gt = sload(g_s, rows_lo, h4 * s).T
                sstore(xo_s, rows_lo, h4 * s, ((xo + bonus) * gt).T)
            else:
                bonus = (v3 * dots).reshape(h4 * s, batch)
                gt = g_s[pl.dslice(rows_lo, h4 * s)]
                xo_s[pl.dslice(rows_lo, h4 * s)] = (xo + bonus) * gt

        # ---- phases P_OUT0..: att out-projection row tiles ------------
        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[0, 0]                                 # [c_o, C]
            d = (out_d[0, 0] if rowp else out_d[0, 0].T) \
                if quant else None
            sstore(ap_s, t * c_o, c_o, mv_big(w, d, xo_s[:]))

        # ---- phase P_FSH: residual + FFN token shift ------------------
        @pl.when(p == P_FSH)
        def _ffn_shift():
            x = x_s[:] + ap_s[:]
            xl2 = ln(x, cv(ln2w), cv(ln2b), 1e-5)
            sx2 = ffn_in[0] - xl2
            ffn_out[0] = xl2
            xk2_s[:] = xl2 + sx2 * cv(xkw)
            x_s[:] = x
            acc_s[:] = jnp.zeros_like(acc_s)

        # ---- phases P_FK0..: fk tiles -> hidden slices ----------------
        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0],
                (fk_d[0][0] if rowp else fk_d[0][0].T)
                if quant else None,
                xk2_s[:],
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            sstore(h_s, t * f4, f4, hk)

        # ---- phases P_FV0..: fv tiles consume hidden slices -----------
        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = sload(h_s, t * f4, f4)
            acc_s[:] = acc_s[:] + mv_big(
                fv_w[0][0],
                (fv_d[0] if rowp else fv_d[0].T) if quant else None,
                hk,
            )

        # ---- finalize layer (same grid step as the last fv tile) ------
        @pl.when(p == n_phase - 1)
        def _finish():
            x = x_s[:] + acc_s[:]
            x_s[:] = x
            y_out[:] = x

    phases = {"P_WKV0": P_WKV0, "P_OUT0": P_OUT0, "P_FSH": P_FSH,
              "P_FK0": P_FK0, "P_FV0": P_FV0}
    return kernel, n_phase, phases


def v7_decode_megakernel_tiled(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
    packed: bool = False,
):
    """Phase-tiled whole-model decode step (any batch; bounded VMEM).

    pack: retile_mega_pack(build_mega_pack(...), nh=?, nf=?) output.
    State layout matches the head-op variant, with an extra head-tile dim:
      batch==1 -> heads [L, nh, H/nh, S_j, S_i];
      batch>1  -> heads [L, nh, H/nh, S_i, S_j, B];
      packed   -> heads [L, nh, H/nh, S_j, S_i*B] (lane-packed: zero
                  lane padding for 2 <= B < 128 — the mid-B big-model
                  serving path; layout moves are 0/1-selection dots).
    att_xx/ffn_xx: [L, C, B]. x0: [C, B] f32. Returns (x, new state)."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_lora, f_dim = pack["d_lora"], pack["f_dim"]
    quant = pack["quant"]
    w4 = bool(pack.get("w4"))
    nh, nf = pack["nh"], pack["nf"]
    nr, no = pack["nr"], pack["no"]
    h4 = h // nh
    batch = x0.shape[1]
    # row-plane B=1 state layout (see _make_kernel_tiled's rowp note)
    rowp = (batch == 1) and not packed

    # phase layout: [shift+loras | (nr rkv tiles | post, non-fused only)
    # | nh wkv tiles | no out tiles | ffn-shift | nf fk tiles // nf fv
    # tiles | finish]. The kernel factory is the single source of truth
    # for the P_* constants — the BlockSpec index maps below MUST use
    # the same layout the kernel consumes tiles in.
    assert not (packed and batch == 1), "packed needs B >= 2"
    kernel, n_phase, ph = _make_kernel_tiled(
        c, h, s, d_lora, f_dim, n_layer, quant, batch, nh, nf, nr, no,
        w4=w4, packed=packed,
    )
    P_WKV0, P_OUT0 = ph["P_WKV0"], ph["P_OUT0"]
    P_FK0, P_FV0 = ph["P_FK0"], ph["P_FV0"]

    def per_layer(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i, p: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def per_layer_early(shape, last_phase):
        """Per-layer block whose NEXT-layer fetch starts right after its
        last consuming phase instead of at the layer boundary: once
        p > last_phase the index map points at layer i+1, so the (big)
        window's DMA overlaps all remaining phases of layer i rather
        than the single phase before its use.  With double buffering the
        layer-i block stays resident while i+1 streams in."""
        def imap(i, p):
            return (
                jnp.minimum(i + (p > last_phase), n_layer - 1),
            ) + (0,) * len(shape)

        return pl.BlockSpec((1,) + shape, imap, memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i, p: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_spec(shape):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (
                (i, jnp.clip(p - P_WKV0, 0, nh - 1)) + (0,) * len(shape)
            ),
            memory_space=pltpu.VMEM,
        )

    def fk_spec(shape):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (i, jnp.clip(p - P_FK0, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def fv_spec(shape):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (i, jnp.clip(p - P_FV0, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tiled_rows_spec(shape, first_p, nt):
        """Row-tiled weight/scale window over [L, nt, ...]: tile t is
        consumed at phase first_p + t; after the last tile the map points
        at the NEXT layer's tile 0 (early prefetch across the remaining
        phases of this layer)."""
        def imap(i, p):
            done = p > first_p + nt - 1
            t = jnp.where(done, 0, jnp.clip(p - first_p, 0, nt - 1))
            return (
                jnp.minimum(i + done, n_layer - 1), t,
            ) + (0,) * len(shape)

        return pl.BlockSpec((1, 1) + shape, imap, memory_space=pltpu.VMEM)

    # With m == 1 ("fused") the kernel reads all three rkv projections
    # inside phase 0, so its window must hold the WHOLE [3, C, C] block
    # (early-prefetched across the entire next layer); with m > 1 each
    # phase sees a single [1, c_r, C] tile.
    fused = (nr == 3)
    if fused:
        rkv_spec = per_layer_early(pack["rkv"].shape[1:], 0)
        rkv_d_spec = (
            per_layer_early(pack["rkv_d"].shape[1:], 0) if quant else None
        )
    else:
        rkv_spec = tiled_rows_spec(pack["rkv"].shape[2:], 1, nr)
        rkv_d_spec = (
            tiled_rows_spec(pack["rkv_d"].shape[2:], 1, nr)
            if quant else None
        )

    mat_args, mat_specs = [], []
    # rkv/out stream as row tiles across their consuming phases; loras
    # are consumed only in phase 0 — all prefetch the next layer's block
    # as soon as their last consumer phase retires.
    for name, spec in (
        ("rkv", rkv_spec),
        ("lora1", per_layer_early(pack["lora1"].shape[1:], 0)),
        ("lora2", per_layer_early(pack["lora2"].shape[1:], 0)),
        ("out", tiled_rows_spec(pack["out"].shape[2:], P_OUT0, no)),
    ):
        mat_args.append(pack[name])
        mat_specs.append(spec)
        if quant:
            d = pack[name + "_d"]
            if name == "rkv":
                mat_specs.append(rkv_d_spec)
            elif name == "out":
                mat_specs.append(
                    tiled_rows_spec(d.shape[2:], P_OUT0, no)
                )
            else:
                mat_specs.append(per_layer_early(d.shape[1:], 0))
            mat_args.append(d)
    mat_args.append(pack["fk"])
    mat_specs.append(fk_spec(pack["fk"].shape[2:]))
    if quant:
        mat_args.append(pack["fk_d"])
        mat_specs.append(fk_spec(pack["fk_d"].shape[2:]))
    mat_args.append(pack["fv"])
    mat_specs.append(fv_spec(pack["fv"].shape[2:]))
    if quant:
        mat_args.append(pack["fv_d"])
        mat_specs.append(per_layer(pack["fv_d"].shape[1:]))

    # row-stored vectors are [L, 1, C]; ln_x.weight/bias stay [L, C, 1]
    # columns (head-tile dslice) — see _TILED_ROW_VECS.
    vec_args = [pack[k] for k in _VEC_KEYS]
    vec_specs = [per_layer(pack[k].shape[1:]) for k in _VEC_KEYS]

    if batch == 1:
        head_shape = (h4, s, s)
    elif packed:
        head_shape = (h4, s, s * batch)
    else:
        head_shape = (h4, s, s, batch)

    packed_args, packed_specs = [], []
    if packed:
        # ln_x affine in the packed lane layout, per head tile (the
        # column form's per-channel values live on SUBLANES, but packed
        # lanes are (i, b) — XLA-side broadcast, tiny)
        sib = s * batch
        lnxw_pk = jnp.broadcast_to(
            pack["att.ln_x.weight"].reshape(n_layer, nh, h4, s, 1),
            (n_layer, nh, h4, s, batch),
        ).reshape(n_layer, nh, h4, sib)
        lnxb_pk = jnp.broadcast_to(
            pack["att.ln_x.bias"].reshape(n_layer, nh, h4, s, 1),
            (n_layer, nh, h4, s, batch),
        ).reshape(n_layer, nh, h4, sib)
        packed_args = [lnxw_pk, lnxb_pk]
        packed_specs = [head_spec((h4, sib)), head_spec((h4, sib))]

    att_xx_in = state_t["att_xx"]
    ffn_xx_in = state_t["ffn_xx"]
    if rowp:
        att_xx_in = jnp.swapaxes(att_xx_in, 1, 2)   # [L, 1, C] rows
        ffn_xx_in = jnp.swapaxes(ffn_xx_in, 1, 2)
    sr = (1, c) if rowp else (c, batch)
    args = (
        [x0.astype(jnp.float32),
         att_xx_in, ffn_xx_in, state_t["heads"]]
        + mat_args + vec_args
        + [pack["coeff"], pack["r_k"]]
        + packed_args
    )
    in_specs = (
        [whole((c, batch)), per_layer(sr), per_layer(sr),
         head_spec(head_shape)]
        + mat_specs + vec_specs
        + [per_layer((1, 6 * c)), per_layer((h, s, 1))]
        + packed_specs
    )

    out_shapes = (
        jax.ShapeDtypeStruct(sr if rowp else (c, batch), jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sr, jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sr, jnp.float32),
        jax.ShapeDtypeStruct((n_layer, nh) + head_shape, jnp.float32),
    )
    out_specs = (
        whole(sr if rowp else (c, batch)), per_layer(sr), per_layer(sr),
        head_spec(head_shape),
    )

    y, att_xx, ffn_xx, heads = pl.pallas_call(
        kernel,
        grid=(n_layer, n_phase),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            # rowp: [1, N] rows (a [N, 1] f32 scratch lane-pads 1->128)
            pltpu.VMEM(sr, jnp.float32),              # x_s
            pltpu.VMEM(sr, jnp.float32),              # vf_s
            pltpu.VMEM(sr, jnp.float32),              # xo_s
            pltpu.VMEM(sr, jnp.float32),              # xk2_s
            pltpu.VMEM(sr, jnp.float32),              # acc_s
            pltpu.VMEM((1, f_dim) if rowp else (f_dim, batch),
                       jnp.float32),                  # h_s
            pltpu.VMEM(sr, jnp.float32),              # r_s
            pltpu.VMEM(sr, jnp.float32),              # k_s
            pltpu.VMEM(sr, jnp.float32),              # v_s
            pltpu.VMEM(sr, jnp.float32),              # wd_s
            pltpu.VMEM(sr, jnp.float32),              # ag_s
            pltpu.VMEM(sr, jnp.float32),              # kk_s
            pltpu.VMEM(sr, jnp.float32),              # g_s
            pltpu.VMEM(sr, jnp.float32),              # xr_s
            pltpu.VMEM(sr, jnp.float32),              # xk_in_s
            pltpu.VMEM(sr, jnp.float32),              # xv_in_s
            pltpu.VMEM(sr, jnp.float32),              # vm_s
            pltpu.VMEM(sr, jnp.float32),              # ap_s
        ] + ([pltpu.VMEM((c, batch), jnp.float32)]    # y_s, batched only
             if batch > 1 else [])
          + ([pltpu.VMEM((h, s * batch), jnp.float32)]  # yp_s, packed
             if packed else []),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # NOTE: the pipeline GROWS its buffering toward this limit
            # (raising it raises usage), and the limit is reserved in
            # full against the chip's 128M — keep it fixed and shrink
            # tile budgets (choose_tiling) when a config does not fit.
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if rowp:
        return y.T, {"att_xx": jnp.swapaxes(att_xx, 1, 2),
                     "ffn_xx": jnp.swapaxes(ffn_xx, 1, 2),
                     "heads": heads}
    return y, {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}


# ---------------------------------------------------------------------------
# RWKV v6 whole-model decode kernel (B=1)
# ---------------------------------------------------------------------------
#
# Same architecture as the v7 kernel (grid over layers, [C, 1] column
# activations, transposed [H, S_j, S_i] state, per-matvec w8a8 activation
# quantization), with the v6 layer math (reference rwkv_graph.inc:294-385 +
# 513-531): five-way LoRA token-shift mix (time_maa_w1/w2), dynamic decay
# LoRA (time_decay_w1/w2), silu gate, time_faaaa bonus INSIDE the wkv
# output (out uses the OLD state), and an FFN with a sigmoid receptance
# gate.  wkv6 per head: out[i] = sum_j r[j]*(tf[j]*k[j]*v[i] + S[j,i]);
# S'[j,i] = S[j,i]*w[j] + k[j]*v[i].

# maa2 is NOT in the quantized-mat list: its up-projections are K=d_maa
# (~32) dots feeding the exp(-exp(.)) decay, where int8 (or even bf16)
# rounding drifts far from the per-op path (which computes this einsum at
# f32-HIGHEST) and compounds across layers — it stays f32 in every
# precision (it is ~5*C*d_maa*4 bytes, bandwidth-negligible).
_V6_MAT_KEYS = ("rkvg", "maa1", "dw1", "dw2", "out", "fk", "fv", "fr")
_V6_VEC_KEYS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
    "att.ln_x.weight", "att.ln_x.bias", "att.time_maa_x",
    "ffn.time_maa_k", "ffn.time_maa_r",
)
_V6_RKVG = ("att.receptance.weight", "att.key.weight", "att.value.weight",
            "att.gate.weight")


def build_mega_pack_v6(params: dict, cfg, quant: bool = True,
                       w4: bool = False, head: bool = False) -> dict:
    """v6 analogue of build_mega_pack: stack per-layer weights into
    [L, N, K] int8+row-scale (or bf16) mats and [L, ., 1] f32 columns.
    w4: int4 codes for the big mats (rkvg/out/fr/fk/fv); the LoRA mats
    (maa1/dw1/dw2) stay int8 and maa2 stays f32."""
    c = cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    blocks = [dict(b) for b in params["blocks"]]
    n_layer = len(blocks)

    def stack(keys_or_key):
        if isinstance(keys_or_key, tuple):
            return np.stack([
                np.concatenate([_np_dense(b[k]) for k in keys_or_key])
                for b in blocks
            ])
        return np.stack([_np_dense(b[keys_or_key]) for b in blocks])

    d_maa = _np_dense(blocks[0]["att.time_maa_w1"]).shape[0] // 5
    d_dec = _np_dense(blocks[0]["att.time_decay_w1"]).shape[0]
    f_dim = _np_dense(blocks[0]["ffn.key.weight"]).shape[0]

    # time_maa_w2 is [5, C, D]; rows s*C..(s+1)*C of the packed [5C, D]
    # mat are split s's up-projection (matches the kernel's row slicing).
    maa2 = np.stack([
        np.asarray(b["att.time_maa_w2"], np.float32).reshape(5 * c, d_maa)
        for b in blocks
    ])

    mats = {
        "rkvg": stack(_V6_RKVG),
        "maa1": stack("att.time_maa_w1"),
        "dw1": stack("att.time_decay_w1"),
        "dw2": stack("att.time_decay_w2"),
        "out": stack("att.output.weight"),
        "fk": stack("ffn.key.weight"),
        "fv": stack("ffn.value.weight"),
        "fr": stack("ffn.receptance.weight"),
    }
    pack = {"quant": quant, "w4": bool(quant and w4),
            "d_maa": d_maa, "d_dec": d_dec, "f_dim": f_dim}
    pack["maa2"] = jnp.asarray(maa2, jnp.float32)  # see _V6_MAT_KEYS note
    for name, w in mats.items():
        if quant:
            four = pack["w4"] and name not in ("maa1", "dw1", "dw2")
            pack[name], pack[name + "_d"] = _quantize_rows(w, four)
        else:
            pack[name] = jnp.asarray(w, jnp.bfloat16)

    for key in _V6_VEC_KEYS:
        pack[key] = jnp.asarray(stack(key).reshape(n_layer, c, 1))
    # five attention token-shift coefficients, order w, k, v, r, g
    maa5 = np.stack([
        np.concatenate([
            np.asarray(b["att.time_maa_" + n], np.float32)
            for n in ("w", "k", "v", "r", "g")
        ])
        for b in blocks
    ])
    pack["maa5"] = jnp.asarray(maa5.reshape(n_layer, 5 * c, 1))
    td = np.stack([
        np.asarray(b["att.time_decay"], np.float32).reshape(-1)
        for b in blocks
    ])
    pack["tdecay"] = jnp.asarray(td.reshape(n_layer, c, 1))
    tf = np.stack([
        np.asarray(b["att.time_faaaa"], np.float32) for b in blocks
    ])
    pack["tf"] = jnp.asarray(tf.reshape(n_layer, h, s, 1))
    if head:
        _attach_head(pack, params, cfg, quant)
    return pack


def rowify_mega_pack_v6(pack: dict) -> dict:
    """v6 analogue of rowify_mega_pack: vectors + quant scales move to
    [L, 1, N] rows (column windows are scatter DMAs; see
    rowify_mega_pack). maa2 keeps its f32 mat layout."""
    out = dict(pack)
    for key in _V6_VEC_KEYS + ("maa5", "tdecay"):
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    L, h, s_, _ = pack["tf"].shape
    out["tf"] = pack["tf"].reshape(L, 1, h * s_)
    if pack["quant"]:
        for name in _V6_MAT_KEYS:
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    if "ln_out.weight" in pack:
        out["ln_out.weight"] = pack["ln_out.weight"].T
        out["ln_out.bias"] = pack["ln_out.bias"].T
    return out


def rowify_mega_pack_v5(pack: dict) -> dict:
    """v5 analogue of rowify_mega_pack (see above)."""
    out = dict(pack)
    for key in _V5_VEC_KEYS + ("amix", "fmix"):
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    L, h, s_, _ = pack["td"].shape
    out["td"] = pack["td"].reshape(L, 1, h * s_)
    out["tf"] = pack["tf"].reshape(L, 1, h * s_)
    if pack["quant"]:
        for name in _V5_MAT_KEYS:
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    if "ln_out.weight" in pack:
        out["ln_out.weight"] = pack["ln_out.weight"].T
        out["ln_out.bias"] = pack["ln_out.bias"].T
    return out


def rowify_mega_pack_v4(pack: dict) -> dict:
    """v4 analogue of rowify_mega_pack (see above)."""
    out = dict(pack)
    for key in _V4_VEC_KEYS + ("amix", "fmix", "tf", "td"):
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    if pack["quant"]:
        for name in _V4_MAT_KEYS:
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    if "ln_out.weight" in pack:
        out["ln_out.weight"] = pack["ln_out.weight"].T
        out["ln_out.bias"] = pack["ln_out.bias"].T
    return out


def _make_kernel_v6(c, h, s, d_maa, d_dec, f_dim, n_layer, quant,
                    debug=False, rows=False, head_nt=0, v_t=0,
                    srows=False):
    assert not (debug and head_nt), "debug and head phases are exclusive"
    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
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

    def kernel(*refs):
        dbg_out = None
        if debug:
            *rest, dbg_out, x_s_ = refs
            refs = tuple(rest) + (x_s_,)
        head_w = head_d = lnow = lnob = logits_out = head_s = None
        if head_nt:
            # head inputs trail the inputs; logits trail the outputs;
            # the staging buffer is the LAST scratch (see the v7 kernel)
            refs = list(refs)
            head_s = refs.pop()
            x_s_ = refs[-1]
            logits_out = refs[-2]
            del refs[-2:]
            n_hin = 4 if quant else 3
            hin = refs[-4 - n_hin:-4]
            if quant:
                head_w, head_d, lnow, lnob = hin
            else:
                head_w, lnow, lnob = hin
            del refs[-4 - n_hin:-4]
            refs = tuple(refs) + (x_s_,)
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, rkvg_d, maa1, maa1_d,
             dw1, dw1_d, dw2, dw2_d,
             out_w, out_d, fk_w, fk_d, fv_w, fv_d, fr_w, fr_d,
             maa2,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb, maax, fxk, fxr,
             maa5, tdecay, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, maa1, dw1, dw2, out_w, fk_w, fv_w, fr_w,
             maa2,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb, maax, fxk, fxr,
             maa5, tdecay, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        def _layer_step():
            x = x_s[:]

            def vec(ref):
                # rows=True: [1, N] row windows (see the v7 kernel's note)
                return ref[0].T if rows else ref[0]

            def matv(w_ref, d_ref, lo, hi, xcol):
                w = w_ref[0][lo:hi]
                if quant:
                    x8, dx = qx(xcol)
                    acc = mm(w, x8)
                    dd = (d_ref[0][:, lo:hi].T if rows
                          else d_ref[0][lo:hi])
                    return acc.astype(jnp.float32) * dx * dd
                # bf16 weights upcast in-register: Mosaic's single-pass
                # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
                # accumulates exactly like the XLA per-op path and the
                # extra MXU passes are free in a bandwidth-bound decode.
                return jax.lax.dot_general(
                    w.astype(jnp.float32), xcol,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            # ---- attention ------------------------------------------------
            xl = ln(x, vec(ln1w), vec(ln1b), 1e-5)
            # srows: token-shift state streams as [1, C] rows too (a
            # [C, 1] column block is a per-element scatter DMA; the
            # col<->row transposes are exact natively — probe pA and
            # the col->row store probe)
            sx = (att_in[0].T if srows else att_in[0]) - xl
            if srows:
                att_out[0] = xl.T
            else:
                att_out[0] = xl

            xxx = xl + sx * vec(maax)
            mixdn = jnp.tanh(
                matv(maa1, maa1_d if quant else None, 0, 5 * d_maa, xxx)
            )
            d = d_maa

            def maa_up(lo_c, lo_d):
                # always-f32 up-projection (see _V6_MAT_KEYS note).
                # precision=HIGHEST is load-bearing: Mosaic's default f32
                # matmul is a single bf16 MXU pass natively, which re-opens
                # the exact drift this f32 path exists to close (measured
                # 0.155 rel at L=4 native vs 2.9e-7 interpret).
                return jax.lax.dot_general(
                    maa2[0][lo_c:lo_c + c], mixdn[lo_d:lo_d + d],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            m_w = maa_up(0 * c, 0 * d)
            m_k = maa_up(1 * c, 1 * d)
            m_v = maa_up(2 * c, 2 * d)
            m_r = maa_up(3 * c, 3 * d)
            m_g = maa_up(4 * c, 4 * d)

            cf = vec(maa5).reshape(5, c, 1)  # order w, k, v, r, g
            xw = xl + sx * (cf[0] + m_w)
            xk = xl + sx * (cf[1] + m_k)
            xv = xl + sx * (cf[2] + m_v)
            xr = xl + sx * (cf[3] + m_r)
            xg = xl + sx * (cf[4] + m_g)

            rd = rkvg_d if quant else None
            r = matv(rkvg, rd, 0 * c, 1 * c, xr)
            k = matv(rkvg, rd, 1 * c, 2 * c, xk)
            v = matv(rkvg, rd, 2 * c, 3 * c, xv)
            gg = matv(rkvg, rd, 3 * c, 4 * c, xg)
            g = gg * jax.nn.sigmoid(gg)  # silu

            w_dn = jnp.tanh(matv(dw1, dw1_d if quant else None, 0, d_dec, xw))
            w_l = matv(dw2, dw2_d if quant else None, 0, c, w_dn) + vec(tdecay)
            w_dec = jnp.exp(-jnp.exp(w_l))

            # ---- wkv6 step (transposed state [H, S_j, S_i]) ---------------
            def col3(vec):
                return vec.reshape(h, s, 1)

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]

            r3, k3, v3, w3 = col3(r), col3(k), col3(v), col3(w_dec)
            tf3 = vec(tf).reshape(h, s, 1) if rows else tf[0]      # [H, S, 1]
            st = heads_in[0]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)       # col -> row
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)    # [H, 1, 1]
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * w3 + k3 * v_row
            heads_out[0] = st

            # group norm per head over S_i (lanes of out_row), eps 64e-5
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)    # row -> col
            xo = y_col.reshape(c, 1) * vec(lnxw) + vec(lnxb)
            xo = xo * g

            if debug:
                pad = jnp.zeros((c - 5 * d_maa, 1), jnp.float32)
                dbg_out[0] = jnp.concatenate([
                    xl, jnp.concatenate([mixdn, pad], axis=0), m_w, xw,
                    r, w_dec, g, xo,
                ], axis=0)

            x = x + matv(out_w, out_d if quant else None, 0, c, xo)

            # ---- FFN (relu^2 key + sigmoid receptance gate) ---------------
            xl2 = ln(x, vec(ln2w), vec(ln2b), 1e-5)
            sx2 = (ffn_in[0].T if srows else ffn_in[0]) - xl2
            if srows:
                ffn_out[0] = xl2.T
            else:
                ffn_out[0] = xl2
            xk2 = xl2 + sx2 * vec(fxk)
            xr2 = xl2 + sx2 * vec(fxr)
            rg = jax.nn.sigmoid(matv(fr_w, fr_d if quant else None, 0, c, xr2))
            hk = matv(fk_w, fk_d if quant else None, 0, f_dim, xk2)
            hk = jnp.square(jnp.maximum(hk, 0.0))
            x = x + rg * matv(fv_w, fv_d if quant else None, 0, c, hk)

            x_s[:] = x
            y_out[:] = x

        if head_nt:
            pl.when(i < n_layer)(_layer_step)
            _emit_head_phases(
                i, n_layer, head_nt, v_t, quant, rows, ln, qx,
                head_w, head_d, lnow, lnob, x_s, logits_out,
                head_s,
            )
        else:
            _layer_step()

    return kernel


def v6_decode_megakernel(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
    debug: bool = False,
):
    """Run all layers of one v6 decode step (B=1).

    pack: build_mega_pack_v6 output. state_t: transposed per-layer state —
    att_xx [L, C, 1], ffn_xx [L, C, 1], heads [L, H, S_j, S_i]. x0: [C, 1]
    f32 (embedding + ln0 applied). Returns (x [C, 1], new state_t)."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_maa, d_dec = pack["d_maa"], pack["d_dec"]
    f_dim = pack["f_dim"]
    quant = pack["quant"]

    rows = pack["ln1.weight"].shape[1] == 1  # rowify_mega_pack_v6
    head_key = "head8" if quant else "headbf16"
    has_head = head_key in pack
    head_nt = v_t = 0
    if has_head:
        plan = head_tile_plan(pack, cfg)
        assert plan is not None, (
            "in-kernel head needs nt <= n_layer — check head_tile_plan()"
        )
        head_nt, v_t = plan
    srows = state_t["att_xx"].shape[1] == 1  # [L, 1, C] row state
    kernel = _make_kernel_v6(c, h, s, d_maa, d_dec, f_dim, n_layer, quant,
                             debug=debug, rows=rows, head_nt=head_nt,
                             v_t=v_t, srows=srows)

    def blocked(shape):
        if has_head:
            # head phases run past the layers — clamp (see v7 wrapper)
            return pl.BlockSpec(
                (1,) + shape,
                lambda i: (jnp.minimum(i, n_layer - 1),)
                + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_interleaved(shape):
        return pl.BlockSpec(
            shape,
            lambda i: (jnp.minimum(i * head_nt // n_layer, head_nt - 1),)
            + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    mat_args, mat_specs = [], []
    for name in _V6_MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            dq = pack[name + "_d"]
            mat_args.append(dq)
            mat_specs.append(blocked(dq.shape[1:]))
    mat_args.append(pack["maa2"])  # always f32, no row scales
    mat_specs.append(blocked(pack["maa2"].shape[1:]))

    vec_args = [pack[k] for k in _V6_VEC_KEYS]
    vec_specs = [blocked(pack[k].shape[1:]) for k in _V6_VEC_KEYS]

    head_args, head_specs = [], []
    if has_head:
        head_args.append(pack[head_key].reshape(head_nt, v_t, c))
        head_specs.append(head_interleaved((1, v_t, c)))
        if quant:
            head_args.append(pack["head_d"])      # [1, V] row
            head_specs.append(whole((1, head_nt * v_t)))
        head_args += [pack["ln_out.weight"], pack["ln_out.bias"]]
        head_specs += [whole(pack["ln_out.weight"].shape),
                       whole(pack["ln_out.bias"].shape)]

    args = (
        [x0.astype(jnp.float32),
         state_t["att_xx"], state_t["ffn_xx"], state_t["heads"]]
        + mat_args + vec_args
        + [pack["maa5"], pack["tdecay"], pack["tf"]]
        + head_args
    )
    sshape = (1, c) if srows else (c, 1)
    in_specs = (
        [whole((c, 1)), blocked(sshape), blocked(sshape),
         blocked((h, s, s))]
        + mat_specs + vec_specs
        + [blocked(pack["maa5"].shape[1:]),
           blocked(pack["tdecay"].shape[1:]),
           blocked(pack["tf"].shape[1:])]
        + head_specs
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer, h, s, s), jnp.float32),
    )
    out_specs = (
        whole((c, 1)), blocked(sshape), blocked(sshape),
        blocked((h, s, s)),
    )
    if debug:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((n_layer, 8 * c, 1), jnp.float32),
        )
        out_specs = out_specs + (blocked((8 * c, 1)),)
    if has_head:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((8, head_nt * v_t), jnp.float32),
        )
        out_specs = out_specs + (whole((8, head_nt * v_t)),)

    *outs6, = pl.pallas_call(
        kernel,
        grid=(n_layer + (1 if has_head else 0),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),
        ] + ([pltpu.VMEM((max(head_nt - 1, 1) * v_t, c),
                         jnp.int8 if quant else jnp.bfloat16)]
             if has_head else []),
        # layer grid carries x_s sequentially — "arbitrary" is mandatory
        # (see the v7 kernel's note).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(104 if has_head else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    y, att_xx, ffn_xx, heads = outs6[:4]
    state = {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}
    if debug:
        state["dbg"] = outs6[4]
    if has_head:
        return y, state, outs6[-1][0]  # logits [V]
    return y, state


# ---------------------------------------------------------------------------
# RWKV v6 phase-tiled whole-model decode kernel (big models, B=1)
# ---------------------------------------------------------------------------
#
# v6 analogue of the v7 phase-tiled kernel: a (layer, phase) grid streams
# phase-sized weight blocks so 1.5B/7B-class v6 models (the Finch family
# sizes) fit scoped VMEM.  Differences from v7: FOUR fused input
# projections (r/k/v/g -> ng = 4*m row tiles), the five-way maa LoRA +
# decay LoRA chain in phase 0 (maa2 stays f32/HIGHEST — see the
# _V6_MAT_KEYS note), no post phase (v6 has no kk normalization or value
# residual; the silu gate is applied at projection-tile write time), and
# an extra row-tiled FFN receptance gate (fr) between the FFN shift and
# the fk tiles.  B=1 only: batched v6 decode stays on the per-op path.

# Vectors the v6 tiled kernel stores as [L, 1, N] rows (lane-padding rule
# — see _TILED_ROW_VECS).  ln_x w/b and time_faaaa stay columns: the wkv
# head-tile phases slice them at a grid-dependent offset.
_V6_TILED_ROW_VECS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
    "att.time_maa_x", "ffn.time_maa_k", "ffn.time_maa_r",
)


def retile_mega_pack_v6(pack: dict, cfg, nh: int = 1, nf: int = 1,
                        ng: int = 4, no: int = 1) -> dict:
    """Re-tile a build_mega_pack_v6 output for the v6 phase-tiled kernel
    (same contract as retile_mega_pack: row-tiled big mats with
    tile-indexed scales, row-stored vectors, 'nh'/'nf'/'ng'/'no' meta)."""
    c = cfg.n_embed
    f_dim = pack["f_dim"]
    assert f_dim % nf == 0, (f_dim, nf)
    assert ng % 4 == 0, ng
    m = ng // 4
    assert c % m == 0 and c % no == 0, (c, ng, no)
    f4 = f_dim // nf
    c_g = c // m
    c_o = c // no
    out = dict(pack)
    out["nh"], out["nf"] = nh, nf
    out["ng"], out["no"] = ng, no
    L = pack["rkvg"].shape[0]
    out["rkvg"] = pack["rkvg"].reshape(L, ng, c_g, c)
    out["out"] = pack["out"].reshape(L, no, c_o, c)
    out["fr"] = pack["fr"].reshape(L, no, c_o, c)
    out["fk"] = pack["fk"].reshape(L, nf, f4, c)
    out["fv"] = jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)
    if pack["quant"]:
        for name, nt in (("rkvg", ng), ("out", no), ("fr", no), ("fk", nf)):
            d = pack[name + "_d"]
            out[name + "_d"] = jnp.swapaxes(
                d.reshape(L, nt, d.shape[1] // nt, 1), 2, 3
            )  # [L, nt, 1, rows]
        # fv_d scales rows of the OUTPUT (C) — identical for every tile.
        for name in ("maa1", "dw1", "dw2", "fv"):
            out[name + "_d"] = jnp.swapaxes(pack[name + "_d"], 1, 2)
    for key in _V6_TILED_ROW_VECS:
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    out["maa5"] = jnp.swapaxes(pack["maa5"], 1, 2)
    out["tdecay"] = jnp.swapaxes(pack["tdecay"], 1, 2)
    # maa2 moves to [L, d_maa, 5C]: a [5C, d] f32 window pads its d=64
    # lanes to 128 — 20MB double-buffered at 7B, the allocation that
    # tipped the C=4096 kernel over the 128MB VMEM cap. Transposed, the
    # window is exactly 5C*d*4 bytes and the up-projection contracts on
    # sublanes instead.
    out["maa2"] = jnp.swapaxes(pack["maa2"], 1, 2)
    if pack.get("w4"):
        for name in ("rkvg", "out", "fr", "fk", "fv"):
            out[name] = _pack_nibbles_split_half(out[name])
    return out


def _make_kernel_tiled_v6(c, h, s, d_maa, d_dec, f_dim, n_layer, quant,
                          nh, nf, ng, no, w4=False):
    h4 = h // nh
    f4 = f_dim // nf
    m = ng // 4                  # rkvg tiles per projection
    c_g = c // m
    c_o = c // no
    fused = (m == 1)
    # phase layout: [shift+loras | (ng rkvg tiles) | nh wkv tiles |
    # no out tiles | ffn-shift | no fr tiles | nf fk tiles // nf fv
    # tiles | finish]
    P_WKV0 = 1 if fused else 1 + ng
    P_OUT0 = P_WKV0 + nh
    P_FSH = P_OUT0 + no
    P_FR0 = P_FSH + 1
    P_FK0 = P_FR0 + no
    P_FV0 = P_FK0 + 1
    n_phase = P_FK0 + nf + 1

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
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

    def kernel(*refs):
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, rkvg_d, maa1, maa1_d, dw1, dw1_d, dw2, dw2_d,
             out_w, out_d, fr_w, fr_d, fk_w, fk_d, fv_w, fv_d,
             maa2,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb, maax, fxk, fxr,
             maa5, tdecay, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s, xo_s, xk2_s, xr2_s, acc_s, h_s,
             r_s, k_s, v_s, g_s, wd_s, rg_s, ap_s,
             xr_in_s, xk_in_s, xv_in_s, xg_in_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, maa1, dw1, dw2, out_w, fr_w, fk_w, fv_w,
             maa2,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb, maax, fxk, fxr,
             maa5, tdecay, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s, xo_s, xk2_s, xr2_s, acc_s, h_s,
             r_s, k_s, v_s, g_s, wd_s, rg_s, ap_s,
             xr_in_s, xk_in_s, xv_in_s, xg_in_s) = refs

        i = pl.program_id(0)
        p = pl.program_id(1)

        # FULL-ROW data plane: activations, scratches and matvec
        # outputs are [1, N] rows end to end. A [N, 1] f32 scratch
        # lane-pads 1 -> 128 (2MB each at C=4096 - the 17 column
        # scratches cost ~42MB of VMEM and forced the halved weight
        # windows that held 7B v6 at 333 GB/s), and per-access
        # row<->column transposes measured ~12 ms/tok at nf=64. Row
        # matvecs contract both operands on the LANE dim (the
        # in-kernel LM head's verified form); the only remaining
        # columns are the per-head wkv tiles and the tiny maa mixdn.

        def mmr(x8row, w):
            """[1, K] x [N, K] -> [1, N]."""
            return jax.lax.dot_general(
                x8row, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )

        def matv(w, d_row, xrow):
            """w [N, K], d_row [1, N] row scales or None; xrow [1, K]."""
            if quant:
                x8, dx = qx(xrow)
                return mmr(x8, w).astype(jnp.float32) * dx * d_row
            return jax.lax.dot_general(
                xrow, w.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def matv4(w, d_row, xrow):
            """split-half biased-lo packed int4 (see _w4_acc), row form."""
            kh = w.shape[1]
            x8, dx = qx(xrow)
            lo8 = x8[:, :kh]
            hi8 = x8[:, kh:]
            lo_u = w & jnp.int8(15)
            hi16 = w & jnp.int8(-16)
            sx8 = jnp.sum(lo8.astype(jnp.int32))
            acc16 = mmr(hi8, hi16) + 16 * mmr(lo8, lo_u) - 128 * sx8
            return acc16.astype(jnp.float32) * (
                dx * jnp.float32(_W4_INV16)) * d_row

        mv_big = matv4 if w4 else matv

        def lnr(v, w_row, b_row, eps):
            mu = jnp.mean(v, axis=1, keepdims=True)
            vc = v - mu
            var = jnp.mean(vc * vc, axis=1, keepdims=True)
            return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w_row + b_row

        # ---- phase 0: token shift + maa/decay LoRA chains -------------
        @pl.when(p == 0)
        def _shift_loras():
            @pl.when(i == 0)
            def _():
                x_s[:] = x0_ref[:].T        # [C, 1] -> row, once/token

            x = x_s[:]                      # [1, c]
            xl = lnr(x, ln1w[0], ln1b[0], 1e-5)
            sx = att_in[0] - xl
            att_out[0] = xl

            xxx = xl + sx * maax[0]
            # mixdn as a [5d, 1] column: its per-projection slices are
            # sublane slices (d=32-aligned); a [1, 5d] row would need
            # misaligned lane slices
            mixdn = jnp.tanh(
                matv(maa1[0], maa1_d[0] if quant else None, xxx)
            ).T
            d = d_maa

            def maa_up(lo_c, lo_d):
                # always-f32 up-projection at HIGHEST precision (see the
                # _V6_MAT_KEYS note). maa2 is stored TRANSPOSED [d, 5C]
                # (retile_mega_pack_v6); contracting its dim 0 with the
                # mixdn column emits the [1, c] ROW directly.
                return jax.lax.dot_general(
                    mixdn[lo_d:lo_d + d], maa2[0][:, lo_c:lo_c + c],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            cf = maa5[0]                    # [1, 5c] row; order w,k,v,r,g
            xw = xl + sx * (cf[:, 0 * c:1 * c] + maa_up(0 * c, 0 * d))
            xk_in_s[:] = xl + sx * (cf[:, 1 * c:2 * c] + maa_up(1 * c, 1 * d))
            xv_in_s[:] = xl + sx * (cf[:, 2 * c:3 * c] + maa_up(2 * c, 2 * d))
            xr_in_s[:] = xl + sx * (cf[:, 3 * c:4 * c] + maa_up(3 * c, 3 * d))
            xg_in_s[:] = xl + sx * (cf[:, 4 * c:5 * c] + maa_up(4 * c, 4 * d))

            w_dn = jnp.tanh(matv(dw1[0], dw1_d[0] if quant else None, xw))
            w_l = matv(dw2[0], dw2_d[0] if quant else None, w_dn)
            wd_s[:] = jnp.exp(-jnp.exp(w_l + tdecay[0]))

            if fused:
                def proj(q, xin):
                    return mv_big(
                        rkvg[0, q], rkvg_d[0, q] if quant else None, xin
                    )

                r_s[:] = proj(0, xr_in_s[:])
                k_s[:] = proj(1, xk_in_s[:])
                v_s[:] = proj(2, xv_in_s[:])
                gg = proj(3, xg_in_s[:])
                g_s[:] = gg * jax.nn.sigmoid(gg)  # silu

        if not fused:
            # ---- phases 1..ng: rkvg row tiles -------------------------
            @pl.when((p >= 1) & (p < 1 + ng))
            def _rkvg_tile():
                t = p - 1
                q = t // m          # projection: 0=r, 1=k, 2=v, 3=g
                sft = (t % m) * c_g
                w = rkvg[0, 0]                              # [c_g, C]
                dd = rkvg_d[0, 0] if quant else None        # [1, c_g]
                xin = jnp.where(
                    q == 0, xr_in_s[:],
                    jnp.where(q == 1, xk_in_s[:],
                              jnp.where(q == 2, xv_in_s[:],
                                        xg_in_s[:])),
                )
                acc = mv_big(w, dd, xin)

                @pl.when(q == 0)
                def _():
                    r_s[:, pl.dslice(sft, c_g)] = acc

                @pl.when(q == 1)
                def _():
                    k_s[:, pl.dslice(sft, c_g)] = acc

                @pl.when(q == 2)
                def _():
                    v_s[:, pl.dslice(sft, c_g)] = acc

                @pl.when(q == 3)
                def _():
                    g_s[:, pl.dslice(sft, c_g)] = acc * jax.nn.sigmoid(acc)

        # ---- phases P_WKV0..: wkv6 + group norm + gate per head tile --
        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                # row scratch slice -> per-head [h4, s, 1] columns (the
                # only row->column move left; [1, h4*s] is small)
                return ref[:, pl.dslice(rows_lo, h4 * s)].T.reshape(
                    h4, s, 1)

            r3, k3, v3, w3 = tile(r_s), tile(k_s), tile(v_s), tile(wd_s)
            tf3 = tf[0, pl.dslice(t * h4, h4)]             # [h4, s, 1]

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            st = heads_in[0, 0]                            # [h4, S_j, S_i]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * w3 + k3 * v_row
            heads_out[0, 0] = st

            # group norm per head over S_i (lanes), eps 64e-5
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(64e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            yn = y_col.reshape(h4 * s, 1)

            lw = lnxw[0, pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[0, pl.dslice(rows_lo, h4 * s)]
            gt = g_s[:, pl.dslice(rows_lo, h4 * s)].T
            xo_s[:, pl.dslice(rows_lo, h4 * s)] = ((yn * lw + lb) * gt).T

        # ---- phases P_OUT0..: att out-projection row tiles ------------
        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[0, 0]                                 # [c_o, C]
            d = out_d[0, 0] if quant else None
            ap_s[:, pl.dslice(t * c_o, c_o)] = mv_big(w, d, xo_s[:])

        # ---- phase P_FSH: residual + FFN token shift ------------------
        @pl.when(p == P_FSH)
        def _ffn_shift():
            x = x_s[:] + ap_s[:]
            xl2 = lnr(x, ln2w[0], ln2b[0], 1e-5)
            sx2 = ffn_in[0] - xl2
            ffn_out[0] = xl2
            xk2_s[:] = xl2 + sx2 * fxk[0]
            xr2_s[:] = xl2 + sx2 * fxr[0]
            x_s[:] = x
            acc_s[:] = jnp.zeros_like(acc_s)

        # ---- phases P_FR0..: FFN receptance-gate row tiles ------------
        @pl.when((p >= P_FR0) & (p < P_FR0 + no))
        def _fr_tile():
            t = p - P_FR0
            w = fr_w[0, 0]                                  # [c_o, C]
            d = fr_d[0, 0] if quant else None
            rg_s[:, pl.dslice(t * c_o, c_o)] = jax.nn.sigmoid(
                mv_big(w, d, xr2_s[:])
            )

        # ---- phases P_FK0..: fk tiles -> hidden slices ----------------
        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0], fk_d[0][0] if quant else None, xk2_s[:]
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            h_s[:, pl.dslice(t * f4, f4)] = hk

        # ---- phases P_FV0..: fv tiles consume hidden slices -----------
        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = h_s[:, pl.dslice(t * f4, f4)]
            acc_s[:] = acc_s[:] + mv_big(
                fv_w[0][0], fv_d[0] if quant else None, hk
            )

        # ---- finalize layer (same grid step as the last fv tile) ------
        @pl.when(p == n_phase - 1)
        def _finish():
            x = x_s[:] + rg_s[:] * acc_s[:]
            x_s[:] = x
            y_out[:] = x

    phases = {"P_WKV0": P_WKV0, "P_OUT0": P_OUT0, "P_FSH": P_FSH,
              "P_FR0": P_FR0, "P_FK0": P_FK0, "P_FV0": P_FV0}
    return kernel, n_phase, phases


def v6_decode_megakernel_tiled(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
):
    """Phase-tiled whole-model v6 decode step (B=1; bounded VMEM).

    pack: retile_mega_pack_v6(build_mega_pack_v6(...)) output. State:
    att_xx/ffn_xx [L, C, 1], heads [L, nh, H/nh, S_j, S_i]. x0: [C, 1]
    f32. Returns (x [C, 1], new state). Internally the kernel runs a
    FULL-ROW data plane (token-shift state and scratches as [1, C]
    rows - see _make_kernel_tiled_v6); the [L, C, 1] external contract
    is converted at this boundary."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    d_maa, d_dec = pack["d_maa"], pack["d_dec"]
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    nh, nf = pack["nh"], pack["nf"]
    ng, no = pack["ng"], pack["no"]
    h4 = h // nh
    assert x0.shape[1] == 1, "v6 tiled kernel is B=1 only"
    m = ng // 4
    fused = (m == 1)

    # the kernel factory is the single source of truth for the phase
    # layout — specs below must use ITS constants
    kernel, n_phase, ph = _make_kernel_tiled_v6(
        c, h, s, d_maa, d_dec, f_dim, n_layer, quant, nh, nf, ng, no,
        w4=bool(pack.get("w4")),
    )
    P_WKV0, P_OUT0 = ph["P_WKV0"], ph["P_OUT0"]
    P_FR0, P_FK0, P_FV0 = ph["P_FR0"], ph["P_FK0"], ph["P_FV0"]

    def per_layer(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i, p: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def per_layer_early(shape, last_phase):
        """See v7_decode_megakernel_tiled.per_layer_early."""
        def imap(i, p):
            return (
                jnp.minimum(i + (p > last_phase), n_layer - 1),
            ) + (0,) * len(shape)

        return pl.BlockSpec((1,) + shape, imap, memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i, p: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_spec(shape):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (
                (i, jnp.clip(p - P_WKV0, 0, nh - 1)) + (0,) * len(shape)
            ),
            memory_space=pltpu.VMEM,
        )

    def ffn_spec(shape, first_p):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (i, jnp.clip(p - first_p, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tiled_rows_spec(shape, first_p, nt):
        """See v7_decode_megakernel_tiled.tiled_rows_spec."""
        def imap(i, p):
            done = p > first_p + nt - 1
            t = jnp.where(done, 0, jnp.clip(p - first_p, 0, nt - 1))
            return (
                jnp.minimum(i + done, n_layer - 1), t,
            ) + (0,) * len(shape)

        return pl.BlockSpec((1, 1) + shape, imap, memory_space=pltpu.VMEM)

    if fused:
        rkvg_spec = per_layer_early(pack["rkvg"].shape[1:], 0)
        rkvg_d_spec = (
            per_layer_early(pack["rkvg_d"].shape[1:], 0) if quant else None
        )
    else:
        rkvg_spec = tiled_rows_spec(pack["rkvg"].shape[2:], 1, ng)
        rkvg_d_spec = (
            tiled_rows_spec(pack["rkvg_d"].shape[2:], 1, ng)
            if quant else None
        )

    mat_specs_by_name = {
        "rkvg": (rkvg_spec, rkvg_d_spec),
        "maa1": None,   # per_layer_early(..., 0)
        "dw1": None,
        "dw2": None,
        "out": (
            tiled_rows_spec(pack["out"].shape[2:], P_OUT0, no),
            tiled_rows_spec(pack["out_d"].shape[2:], P_OUT0, no)
            if quant else None,
        ),
        "fr": (
            tiled_rows_spec(pack["fr"].shape[2:], P_FR0, no),
            tiled_rows_spec(pack["fr_d"].shape[2:], P_FR0, no)
            if quant else None,
        ),
    }

    mat_args, mat_specs = [], []
    for name in ("rkvg", "maa1", "dw1", "dw2", "out", "fr"):
        w = pack[name]
        mat_args.append(w)
        named = mat_specs_by_name[name]
        if named is None:
            mat_specs.append(per_layer_early(w.shape[1:], 0))
        else:
            mat_specs.append(named[0])
        if quant:
            d = pack[name + "_d"]
            mat_args.append(d)
            if named is None:
                mat_specs.append(per_layer_early(d.shape[1:], 0))
            else:
                mat_specs.append(named[1])
    mat_args.append(pack["fk"])
    mat_specs.append(ffn_spec(pack["fk"].shape[2:], P_FK0))
    if quant:
        mat_args.append(pack["fk_d"])
        mat_specs.append(ffn_spec(pack["fk_d"].shape[2:], P_FK0))
    mat_args.append(pack["fv"])
    mat_specs.append(ffn_spec(pack["fv"].shape[2:], P_FV0))
    if quant:
        mat_args.append(pack["fv_d"])
        mat_specs.append(per_layer(pack["fv_d"].shape[1:]))
    mat_args.append(pack["maa2"])  # always f32, no row scales
    mat_specs.append(per_layer_early(pack["maa2"].shape[1:], 0))

    vec_args = [pack[k] for k in _V6_VEC_KEYS]
    vec_specs = [per_layer(pack[k].shape[1:]) for k in _V6_VEC_KEYS]

    head_shape = (h4, s, s)
    args = (
        [x0.astype(jnp.float32),
         jnp.swapaxes(state_t["att_xx"], 1, 2),
         jnp.swapaxes(state_t["ffn_xx"], 1, 2),
         state_t["heads"]]
        + mat_args + vec_args
        + [pack["maa5"], pack["tdecay"], pack["tf"]]
    )
    in_specs = (
        [whole((c, 1)), per_layer((1, c)), per_layer((1, c)),
         head_spec(head_shape)]
        + mat_specs + vec_specs
        + [per_layer((1, 5 * c)), per_layer((1, c)), per_layer((h, s, 1))]
    )

    out_shapes = (
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, nh) + head_shape, jnp.float32),
    )
    out_specs = (
        whole((1, c)), per_layer((1, c)), per_layer((1, c)),
        head_spec(head_shape),
    )

    y, att_xx, ffn_xx, heads = pl.pallas_call(
        kernel,
        grid=(n_layer, n_phase),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            # [1, N] ROWS: a [N, 1] f32 scratch lane-pads 1 -> 128
            # (~2MB each at C=4096; 17 columns were ~42MB of VMEM)
            pltpu.VMEM((1, c), jnp.float32),      # x_s
            pltpu.VMEM((1, c), jnp.float32),      # xo_s
            pltpu.VMEM((1, c), jnp.float32),      # xk2_s
            pltpu.VMEM((1, c), jnp.float32),      # xr2_s
            pltpu.VMEM((1, c), jnp.float32),      # acc_s
            pltpu.VMEM((1, f_dim), jnp.float32),  # h_s
            pltpu.VMEM((1, c), jnp.float32),      # r_s
            pltpu.VMEM((1, c), jnp.float32),      # k_s
            pltpu.VMEM((1, c), jnp.float32),      # v_s
            pltpu.VMEM((1, c), jnp.float32),      # g_s
            pltpu.VMEM((1, c), jnp.float32),      # wd_s
            pltpu.VMEM((1, c), jnp.float32),      # rg_s
            pltpu.VMEM((1, c), jnp.float32),      # ap_s
            pltpu.VMEM((1, c), jnp.float32),      # xr_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xk_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xv_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xg_in_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # see the v7 tiled kernel's note on this limit
            # (RWKV_VMEM_MB: on-chip probing override)
            vmem_limit_bytes=int(__import__("os").environ.get(
                "RWKV_VMEM_MB", "120")) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return (y.T, {"att_xx": jnp.swapaxes(att_xx, 1, 2),
                  "ffn_xx": jnp.swapaxes(ffn_xx, 1, 2),
                  "heads": heads})


# ---------------------------------------------------------------------------
# RWKV v5 (5.1 / 5.2) whole-model decode kernel (B=1)
# ---------------------------------------------------------------------------
#
# v5 layer math (reference rwkv_graph.inc:199-292 + 484-511): STATIC
# per-head decay/bonus (time_decay/time_faaaa — no LoRAs), static 3-way
# token-shift mixes in the reference's op order x*c + (prev - prev*c),
# wkv identical to v6's recurrence with a constant w, group norm eps 1e-5,
# a silu gate on 5.2 only, and the v4/v5 FFN (relu^2 key with a sigmoid
# receptance gate).  5.1 stores per-head SCALAR decay/bonus — broadcast
# to [H, S] at pack time (the reference's ggml_repeat).

_V5_MAT_KEYS = ("rkvg", "out", "fk", "fv", "fr")
_V5_VEC_KEYS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
    "att.ln_x.weight", "att.ln_x.bias",
)


def build_mega_pack_v5(params: dict, cfg, quant: bool = True,
                       w4: bool = False, head: bool = False) -> dict:
    """v5 analogue of build_mega_pack. has_gate selects 5.2. w4: int4
    codes for all five big mats. head=True packs the LM head + ln_out
    for the in-kernel head phases (see build_mega_pack)."""
    c = cfg.n_embed
    h, s = cfg.head_count, cfg.head_size
    blocks = [dict(b) for b in params["blocks"]]
    n_layer = len(blocks)
    has_gate = "att.gate.weight" in blocks[0]

    def stack(keys_or_key):
        if isinstance(keys_or_key, tuple):
            return np.stack([
                np.concatenate([_np_dense(b[k]) for k in keys_or_key])
                for b in blocks
            ])
        return np.stack([_np_dense(b[keys_or_key]) for b in blocks])

    f_dim = _np_dense(blocks[0]["ffn.key.weight"]).shape[0]

    rkvg_keys = ("att.receptance.weight", "att.key.weight",
                 "att.value.weight")
    if has_gate:
        rkvg_keys = rkvg_keys + ("att.gate.weight",)
    mats = {
        "rkvg": stack(rkvg_keys),
        "out": stack("att.output.weight"),
        "fk": stack("ffn.key.weight"),
        "fv": stack("ffn.value.weight"),
        "fr": stack("ffn.receptance.weight"),
    }
    pack = {"quant": quant, "w4": bool(quant and w4),
            "f_dim": f_dim, "has_gate": has_gate}
    for name, w in mats.items():
        if quant:
            pack[name], pack[name + "_d"] = _quantize_rows(w, pack["w4"])
        else:
            pack[name] = jnp.asarray(w, jnp.bfloat16)

    for key in _V5_VEC_KEYS:
        pack[key] = jnp.asarray(stack(key).reshape(n_layer, c, 1))

    mix_names = ("k", "v", "r") + (("g",) if has_gate else ())
    amix = np.stack([
        np.concatenate([
            np.asarray(b["att.time_mix_" + n], np.float32)
            for n in mix_names
        ])
        for b in blocks
    ])
    pack["amix"] = jnp.asarray(
        amix.reshape(n_layer, len(mix_names) * c, 1)
    )
    fmix = np.stack([
        np.concatenate([
            np.asarray(b["ffn.time_mix_k"], np.float32),
            np.asarray(b["ffn.time_mix_r"], np.float32),
        ])
        for b in blocks
    ])
    pack["fmix"] = jnp.asarray(fmix.reshape(n_layer, 2 * c, 1))

    def head_mat(key):
        rows = []
        for b in blocks:
            a = np.asarray(b[key], np.float32)
            if a.ndim == 1:  # 5.1 per-head scalars -> broadcast over S
                a = np.broadcast_to(a[:, None], (h, s))
            rows.append(a.reshape(h, s))
        return jnp.asarray(np.stack(rows).reshape(n_layer, h, s, 1))

    pack["td"] = head_mat("att.time_decay")
    pack["tf"] = head_mat(
        "att.time_faaaa" if has_gate else "att.time_first"
    )
    if head:
        _attach_head(pack, params, cfg, quant)
    return pack


def _make_kernel_v5(c, h, s, f_dim, n_layer, quant, has_gate,
                    rows=False, head_nt=0, v_t=0, srows=False):
    n_mix = 4 if has_gate else 3

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
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

    def kernel(*refs):
        head_w = head_d = lnow = lnob = logits_out = head_s = None
        if head_nt:
            # head inputs trail the inputs; logits trail the outputs;
            # the staging buffer is the LAST scratch (see the v7 kernel)
            refs = list(refs)
            head_s = refs.pop()
            x_s_ = refs[-1]
            logits_out = refs[-2]
            del refs[-2:]
            n_hin = 4 if quant else 3
            hin = refs[-4 - n_hin:-4]
            if quant:
                head_w, head_d, lnow, lnob = hin
            else:
                head_w, lnow, lnob = hin
            del refs[-4 - n_hin:-4]
            refs = tuple(refs) + (x_s_,)
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, rkvg_d, out_w, out_d, fk_w, fk_d, fv_w, fv_d,
             fr_w, fr_d,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb,
             amix, fmix, td, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, out_w, fk_w, fv_w, fr_w,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb,
             amix, fmix, td, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        def _layer_step():
            x = x_s[:]

            def vec(ref):
                # rows=True: [1, N] row windows (see the v7 kernel's note)
                return ref[0].T if rows else ref[0]

            def matv(w_ref, d_ref, lo, hi, xcol):
                w = w_ref[0][lo:hi]
                if quant:
                    x8, dx = qx(xcol)
                    acc = mm(w, x8)
                    dd = (d_ref[0][:, lo:hi].T if rows
                          else d_ref[0][lo:hi])
                    return acc.astype(jnp.float32) * dx * dd
                # bf16 weights upcast in-register: Mosaic's single-pass
                # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
                # accumulates exactly like the XLA per-op path and the
                # extra MXU passes are free in a bandwidth-bound decode.
                return jax.lax.dot_general(
                    w.astype(jnp.float32), xcol,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            # ---- attention ------------------------------------------------
            xl = ln(x, vec(ln1w), vec(ln1b), 1e-5)
            prev = att_in[0].T if srows else att_in[0]
            if srows:
                att_out[0] = xl.T
            else:
                att_out[0] = xl

            cf = vec(amix).reshape(n_mix, c, 1)  # order k, v, r(, g)
            def mix(ci):
                return xl * cf[ci] + (prev - prev * cf[ci])

            xk, xv, xr = mix(0), mix(1), mix(2)

            rd = rkvg_d if quant else None
            r = matv(rkvg, rd, 0 * c, 1 * c, xr)
            k = matv(rkvg, rd, 1 * c, 2 * c, xk)
            v = matv(rkvg, rd, 2 * c, 3 * c, xv)
            if has_gate:
                gg = matv(rkvg, rd, 3 * c, 4 * c, mix(3))
                g = gg * jax.nn.sigmoid(gg)  # silu

            # ---- wkv (v6 recurrence, constant decay) ----------------------
            def col3(vec):
                return vec.reshape(h, s, 1)

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]

            r3, k3, v3 = col3(r), col3(k), col3(v)
            td3 = vec(td).reshape(h, s, 1) if rows else td[0]      # [H, S, 1]
            tf3 = vec(tf).reshape(h, s, 1) if rows else tf[0]
            st = heads_in[0]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * td3 + k3 * v_row
            heads_out[0] = st

            # group norm per head over S_i, eps 1e-5 (v5)
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(1e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            xo = y_col.reshape(c, 1) * vec(lnxw) + vec(lnxb)
            if has_gate:
                xo = xo * g

            x = x + matv(out_w, out_d if quant else None, 0, c, xo)

            # ---- FFN (v4/v5: relu^2 key + sigmoid receptance gate) --------
            xl2 = ln(x, vec(ln2w), vec(ln2b), 1e-5)
            prev2 = ffn_in[0].T if srows else ffn_in[0]
            if srows:
                ffn_out[0] = xl2.T
            else:
                ffn_out[0] = xl2
            fcf = vec(fmix).reshape(2, c, 1)
            xk2 = xl2 * fcf[0] + (prev2 - prev2 * fcf[0])
            xr2 = xl2 * fcf[1] + (prev2 - prev2 * fcf[1])
            rg = jax.nn.sigmoid(matv(fr_w, fr_d if quant else None, 0, c, xr2))
            hk = matv(fk_w, fk_d if quant else None, 0, f_dim, xk2)
            hk = jnp.square(jnp.maximum(hk, 0.0))
            x = x + rg * matv(fv_w, fv_d if quant else None, 0, c, hk)

            x_s[:] = x
            y_out[:] = x

        if head_nt:
            pl.when(i < n_layer)(_layer_step)
            _emit_head_phases(
                i, n_layer, head_nt, v_t, quant, rows, ln, qx,
                head_w, head_d, lnow, lnob, x_s, logits_out,
                head_s,
            )
        else:
            _layer_step()

    return kernel


def v5_decode_megakernel(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
):
    """Run all layers of one v5.1/v5.2 decode step (B=1).

    pack: build_mega_pack_v5 output. state_t as in the v6/v7 kernels:
    att_xx/ffn_xx [L, C, 1], heads [L, H, S_j, S_i]. x0: [C, 1] f32."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    has_gate = pack["has_gate"]

    rows = pack["ln1.weight"].shape[1] == 1  # rowify_mega_pack_v5
    head_key = "head8" if quant else "headbf16"
    has_head = head_key in pack
    head_nt = v_t = 0
    if has_head:
        plan = head_tile_plan(pack, cfg)
        assert plan is not None, (
            "in-kernel head needs nt <= n_layer — check head_tile_plan()"
        )
        head_nt, v_t = plan
    srows = state_t["att_xx"].shape[1] == 1  # [L, 1, C] row state
    kernel = _make_kernel_v5(c, h, s, f_dim, n_layer, quant, has_gate,
                             rows=rows, head_nt=head_nt, v_t=v_t,
                             srows=srows)

    def blocked(shape):
        if has_head:
            # head phases run past the layers — clamp (see v7 wrapper)
            return pl.BlockSpec(
                (1,) + shape,
                lambda i: (jnp.minimum(i, n_layer - 1),)
                + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_interleaved(shape):
        return pl.BlockSpec(
            shape,
            lambda i: (jnp.minimum(i * head_nt // n_layer, head_nt - 1),)
            + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    mat_args, mat_specs = [], []
    for name in _V5_MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            dq = pack[name + "_d"]
            mat_args.append(dq)
            mat_specs.append(blocked(dq.shape[1:]))

    vec_args = [pack[k] for k in _V5_VEC_KEYS]
    vec_specs = [blocked(pack[k].shape[1:]) for k in _V5_VEC_KEYS]

    head_args, head_specs = [], []
    if has_head:
        head_args.append(pack[head_key].reshape(head_nt, v_t, c))
        head_specs.append(head_interleaved((1, v_t, c)))
        if quant:
            head_args.append(pack["head_d"])      # [1, V] row
            head_specs.append(whole((1, head_nt * v_t)))
        head_args += [pack["ln_out.weight"], pack["ln_out.bias"]]
        head_specs += [whole(pack["ln_out.weight"].shape),
                       whole(pack["ln_out.bias"].shape)]

    args = (
        [x0.astype(jnp.float32),
         state_t["att_xx"], state_t["ffn_xx"], state_t["heads"]]
        + mat_args + vec_args
        + [pack["amix"], pack["fmix"], pack["td"], pack["tf"]]
        + head_args
    )
    sshape = (1, c) if srows else (c, 1)
    in_specs = (
        [whole((c, 1)), blocked(sshape), blocked(sshape),
         blocked((h, s, s))]
        + mat_specs + vec_specs
        + [blocked(pack["amix"].shape[1:]), blocked(pack["fmix"].shape[1:]),
           blocked(pack["td"].shape[1:]), blocked(pack["tf"].shape[1:])]
        + head_specs
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32),
        jax.ShapeDtypeStruct((n_layer, h, s, s), jnp.float32),
    )
    out_specs = (
        whole((c, 1)), blocked(sshape), blocked(sshape),
        blocked((h, s, s)),
    )
    if has_head:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((8, head_nt * v_t), jnp.float32),
        )
        out_specs = out_specs + (whole((8, head_nt * v_t)),)

    *outs5, = pl.pallas_call(
        kernel,
        grid=(n_layer + (1 if has_head else 0),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),
        ] + ([pltpu.VMEM((max(head_nt - 1, 1) * v_t, c),
                         jnp.int8 if quant else jnp.bfloat16)]
             if has_head else []),
        # layer grid carries x_s sequentially — "arbitrary" is mandatory
        # (see the v7 kernel's note).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(104 if has_head else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    y, att_xx, ffn_xx, heads = outs5[:4]
    state = {"att_xx": att_xx, "ffn_xx": ffn_xx, "heads": heads}
    if has_head:
        return y, state, outs5[-1][0]  # logits [V]
    return y, state


# ---------------------------------------------------------------------------
# RWKV v4 whole-model decode kernel (B=1)
# ---------------------------------------------------------------------------
#
# v4 layer math (reference rwkv_graph.inc:84-197 + 484-511): scalar-state
# attention — aa/bb/pp accumulator columns with the max-trick wkv
# (rwkv_graph.inc:119-161), sigmoid receptance multiplying the wkv output
# before the out projection, no group norm / gate; FFN as v5.

_V4_MAT_KEYS = ("rkv", "out", "fk", "fv", "fr")
_V4_VEC_KEYS = ("ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias")


def build_mega_pack_v4(params: dict, cfg, quant: bool = True,
                       w4: bool = False, head: bool = False) -> dict:
    """v4 analogue of build_mega_pack. w4: int4 codes for all five big
    mats (v4 has no small matmuls). head=True additionally packs the LM
    head + ln_out for the in-kernel head phases (see build_mega_pack)."""
    c = cfg.n_embed
    blocks = [dict(b) for b in params["blocks"]]
    n_layer = len(blocks)

    def stack(keys_or_key):
        if isinstance(keys_or_key, tuple):
            return np.stack([
                np.concatenate([_np_dense(b[k]) for k in keys_or_key])
                for b in blocks
            ])
        return np.stack([_np_dense(b[keys_or_key]) for b in blocks])

    f_dim = _np_dense(blocks[0]["ffn.key.weight"]).shape[0]

    mats = {
        "rkv": stack(("att.receptance.weight", "att.key.weight",
                      "att.value.weight")),
        "out": stack("att.output.weight"),
        "fk": stack("ffn.key.weight"),
        "fv": stack("ffn.value.weight"),
        "fr": stack("ffn.receptance.weight"),
    }
    pack = {"quant": quant, "w4": bool(quant and w4), "f_dim": f_dim}
    for name, w in mats.items():
        if quant:
            pack[name], pack[name + "_d"] = _quantize_rows(w, pack["w4"])
        else:
            pack[name] = jnp.asarray(w, jnp.bfloat16)

    for key in _V4_VEC_KEYS:
        pack[key] = jnp.asarray(stack(key).reshape(n_layer, c, 1))
    amix = np.stack([
        np.concatenate([
            np.asarray(b["att.time_mix_" + n], np.float32)
            for n in ("k", "v", "r")
        ])
        for b in blocks
    ])
    pack["amix"] = jnp.asarray(amix.reshape(n_layer, 3 * c, 1))
    fmix = np.stack([
        np.concatenate([
            np.asarray(b["ffn.time_mix_k"], np.float32),
            np.asarray(b["ffn.time_mix_r"], np.float32),
        ])
        for b in blocks
    ])
    pack["fmix"] = jnp.asarray(fmix.reshape(n_layer, 2 * c, 1))
    pack["tf"] = jnp.asarray(np.stack([
        np.asarray(b["att.time_first"], np.float32) for b in blocks
    ]).reshape(n_layer, c, 1))
    pack["td"] = jnp.asarray(np.stack([
        np.asarray(b["att.time_decay"], np.float32) for b in blocks
    ]).reshape(n_layer, c, 1))
    if head:
        _attach_head(pack, params, cfg, quant)
    return pack


def _make_kernel_v4(c, f_dim, n_layer, quant, rows=False,
                    head_nt=0, v_t=0, srows=False):
    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
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

    def kernel(*refs):
        head_w = head_d = lnow = lnob = logits_out = head_s = None
        if head_nt:
            # head inputs trail the inputs; logits trail the outputs;
            # the staging buffer is the LAST scratch (see the v7 kernel)
            refs = list(refs)
            head_s = refs.pop()
            x_s_ = refs[-1]
            logits_out = refs[-2]
            del refs[-2:]
            n_hin = 4 if quant else 3
            hin = refs[-6 - n_hin:-6]
            if quant:
                head_w, head_d, lnow, lnob = hin
            else:
                head_w, lnow, lnob = hin
            del refs[-6 - n_hin:-6]
            refs = tuple(refs) + (x_s_,)
        if quant:
            (x0_ref, att_in, ffn_in, aa_in, bb_in, pp_in,
             rkv, rkv_d, out_w, out_d, fk_w, fk_d, fv_w, fv_d, fr_w, fr_d,
             ln1w, ln1b, ln2w, ln2b,
             amix, fmix, tf, td,
             y_out, att_out, ffn_out, aa_out, bb_out, pp_out,
             x_s) = refs
        else:
            (x0_ref, att_in, ffn_in, aa_in, bb_in, pp_in,
             rkv, out_w, fk_w, fv_w, fr_w,
             ln1w, ln1b, ln2w, ln2b,
             amix, fmix, tf, td,
             y_out, att_out, ffn_out, aa_out, bb_out, pp_out,
             x_s) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            x_s[:] = x0_ref[:]

        def vec(ref):
            # rows=True: [1, N] row windows (column windows are scatter
            # DMAs that dominate the small-model step — see the v7
            # kernel's note / scripts/probe_layer_cost.py)
            return ref[0].T if rows else ref[0]

        def matv(w_ref, d_ref, lo, hi, xcol):
            w = w_ref[0][lo:hi]
            if quant:
                x8, dx = qx(xcol)
                acc = mm(w, x8)
                dd = (d_ref[0][:, lo:hi].T if rows
                      else d_ref[0][lo:hi])
                return acc.astype(jnp.float32) * dx * dd
            # bf16 weights upcast in-register: Mosaic's single-pass
            # bf16 matmul loses ~1.4e-3 rel (measured); f32 HIGHEST
            # accumulates exactly like the XLA per-op path and the
            # extra MXU passes are free in a bandwidth-bound decode.
            return jax.lax.dot_general(
                w.astype(jnp.float32), xcol,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def _layer_step():
            x = x_s[:]

            # ---- attention ------------------------------------------------
            xl = ln(x, vec(ln1w), vec(ln1b), 1e-5)
            prev = att_in[0].T if srows else att_in[0]
            if srows:
                att_out[0] = xl.T
            else:
                att_out[0] = xl

            cf = vec(amix).reshape(3, c, 1)  # order k, v, r
            xk = xl * cf[0] + (prev - prev * cf[0])
            xv = xl * cf[1] + (prev - prev * cf[1])
            xr = xl * cf[2] + (prev - prev * cf[2])

            rd = rkv_d if quant else None
            r = jax.nn.sigmoid(matv(rkv, rd, 0 * c, 1 * c, xr))
            k = matv(rkv, rd, 1 * c, 2 * c, xk)
            v = matv(rkv, rd, 2 * c, 3 * c, xv)

            # ---- wkv4 step (max-trick, rwkv_graph.inc:119-161) ------------
            if srows:
                aa, bb, pp = aa_in[0].T, bb_in[0].T, pp_in[0].T
            else:
                aa, bb, pp = aa_in[0], bb_in[0], pp_in[0]
            ww = vec(tf) + k
            qq = jnp.maximum(pp, ww)
            e1 = jnp.exp(pp - qq)
            e2 = jnp.exp(ww - qq)
            wkv = (e1 * aa + e2 * v) / (e1 * bb + e2)
            ww2 = pp + vec(td)
            qq2 = jnp.maximum(ww2, k)
            e1b = jnp.exp(ww2 - qq2)
            e2b = jnp.exp(k - qq2)
            if srows:
                aa_out[0] = (e1b * aa + e2b * v).T
                bb_out[0] = (e1b * bb + e2b).T
                pp_out[0] = qq2.T
            else:
                aa_out[0] = e1b * aa + e2b * v
                bb_out[0] = e1b * bb + e2b
                pp_out[0] = qq2

            x = x + matv(out_w, out_d if quant else None, 0, c, r * wkv)

            # ---- FFN (relu^2 key + sigmoid receptance gate) ---------------
            xl2 = ln(x, vec(ln2w), vec(ln2b), 1e-5)
            prev2 = ffn_in[0].T if srows else ffn_in[0]
            if srows:
                ffn_out[0] = xl2.T
            else:
                ffn_out[0] = xl2
            fcf = vec(fmix).reshape(2, c, 1)
            xk2 = xl2 * fcf[0] + (prev2 - prev2 * fcf[0])
            xr2 = xl2 * fcf[1] + (prev2 - prev2 * fcf[1])
            rg = jax.nn.sigmoid(matv(fr_w, fr_d if quant else None, 0, c, xr2))
            hk = matv(fk_w, fk_d if quant else None, 0, f_dim, xk2)
            hk = jnp.square(jnp.maximum(hk, 0.0))
            x = x + rg * matv(fv_w, fv_d if quant else None, 0, c, hk)

            x_s[:] = x
            y_out[:] = x

        if head_nt:
            pl.when(i < n_layer)(_layer_step)
            _emit_head_phases(
                i, n_layer, head_nt, v_t, quant, rows, ln, qx,
                head_w, head_d, lnow, lnob, x_s, logits_out,
                head_s,
            )
        else:
            _layer_step()

    return kernel


def v4_decode_megakernel(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
):
    """Run all layers of one v4 decode step (B=1).

    pack: build_mega_pack_v4 output. state_t: att_xx/ffn_xx/aa/bb/pp all
    [L, C, 1]. x0: [C, 1] f32. Returns (x [C, 1], new state_t)."""
    c = cfg.n_embed
    n_layer = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]

    rows = pack["ln1.weight"].shape[1] == 1  # rowify_mega_pack_v4
    srows = state_t["att_xx"].shape[1] == 1  # [L, 1, C] row state
    head_key = "head8" if quant else "headbf16"
    has_head = head_key in pack
    head_nt = v_t = 0
    if has_head:
        plan = head_tile_plan(pack, cfg)
        assert plan is not None, (
            "in-kernel head needs nt <= n_layer — check head_tile_plan()"
        )
        head_nt, v_t = plan
    kernel = _make_kernel_v4(c, f_dim, n_layer, quant, rows=rows,
                             head_nt=head_nt, v_t=v_t, srows=srows)

    def blocked(shape):
        if has_head:
            # head phases run past the layers — clamp (same-index
            # revisits are free; see the v7 wrapper)
            return pl.BlockSpec(
                (1,) + shape,
                lambda i: (jnp.minimum(i, n_layer - 1),)
                + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            (1,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_interleaved(shape):
        return pl.BlockSpec(
            shape,
            lambda i: (jnp.minimum(i * head_nt // n_layer, head_nt - 1),)
            + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM,
        )

    mat_args, mat_specs = [], []
    for name in _V4_MAT_KEYS:
        w = pack[name]
        mat_args.append(w)
        mat_specs.append(blocked(w.shape[1:]))
        if quant:
            dq = pack[name + "_d"]
            mat_args.append(dq)
            mat_specs.append(blocked(dq.shape[1:]))

    vec_args = [pack[k] for k in _V4_VEC_KEYS]
    vec_specs = [blocked(pack[k].shape[1:]) for k in _V4_VEC_KEYS]

    head_args, head_specs = [], []
    if has_head:
        head_args.append(pack[head_key].reshape(head_nt, v_t, c))
        head_specs.append(head_interleaved((1, v_t, c)))
        if quant:
            head_args.append(pack["head_d"])      # [1, V] row
            head_specs.append(whole((1, head_nt * v_t)))
        head_args += [pack["ln_out.weight"], pack["ln_out.bias"]]
        head_specs += [whole(pack["ln_out.weight"].shape),
                       whole(pack["ln_out.bias"].shape)]

    args = (
        [x0.astype(jnp.float32),
         state_t["att_xx"], state_t["ffn_xx"],
         state_t["aa"], state_t["bb"], state_t["pp"]]
        + mat_args + vec_args
        + [pack["amix"], pack["fmix"], pack["tf"], pack["td"]]
        + head_args
    )
    sshape = (1, c) if srows else (c, 1)
    in_specs = (
        [whole((c, 1))] + [blocked(sshape)] * 5
        + mat_specs + vec_specs
        + [blocked(pack["amix"].shape[1:]), blocked(pack["fmix"].shape[1:]),
           blocked(pack["tf"].shape[1:]), blocked(pack["td"].shape[1:])]
        + head_specs
    )

    out_shapes = (
        jax.ShapeDtypeStruct((c, 1), jnp.float32),
    ) + tuple(
        jax.ShapeDtypeStruct((n_layer,) + sshape, jnp.float32)
        for _ in range(5)
    )
    out_specs = (whole((c, 1)),) + tuple(blocked(sshape) for _ in range(5))
    if has_head:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((8, head_nt * v_t), jnp.float32),
        )
        out_specs = out_specs + (whole((8, head_nt * v_t)),)

    *outs4, = pl.pallas_call(
        kernel,
        grid=(n_layer + (1 if has_head else 0),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((c, 1), jnp.float32),
        ] + ([pltpu.VMEM((max(head_nt - 1, 1) * v_t, c),
                         jnp.int8 if quant else jnp.bfloat16)]
             if has_head else []),
        # layer grid carries x_s sequentially — "arbitrary" is mandatory
        # (see the v7 kernel's note).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(104 if has_head else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    y, att_xx, ffn_xx, aa, bb, pp = outs4[:6]
    state = {"att_xx": att_xx, "ffn_xx": ffn_xx,
             "aa": aa, "bb": bb, "pp": pp}
    if has_head:
        return y, state, outs4[-1][0]  # logits [V]
    return y, state


# ---------------------------------------------------------------------------
# RWKV v4 phase-tiled whole-model decode kernel (big models, B=1)
# ---------------------------------------------------------------------------
#
# The reference's OWN 7B headline benchmark is RWKV-4 World 7B
# (README.md:65-76, 75 ms/tok hipBLAS-offloaded) — this kernel serves
# that exact architecture class on one chip.  Same phase architecture as
# the v6/v7 tiled kernels; v4 is the simplest member: three row-tiled
# input projections, a SCALAR-state wkv (aa/bb/pp [C, 1] columns with
# the max-trick — no head tiles at all), row-tiled out/fr, and the
# shared fk/fv FFN pipeline.  B=1 only.

_V4_TILED_ROW_VECS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
)


def retile_mega_pack_v4(pack: dict, cfg, nf: int = 1, nr: int = 3,
                        no: int = 1) -> dict:
    """Re-tile a build_mega_pack_v4 output for the v4 phase-tiled kernel
    (row-tiled big mats with tile-indexed scales, row-stored vectors,
    'nf'/'nr'/'no' meta)."""
    c = cfg.n_embed
    f_dim = pack["f_dim"]
    assert f_dim % nf == 0, (f_dim, nf)
    assert nr % 3 == 0, nr
    m = nr // 3
    assert c % m == 0 and c % no == 0, (c, nr, no)
    f4 = f_dim // nf
    c_r = c // m
    c_o = c // no
    out = dict(pack)
    out["nf"], out["nr"], out["no"] = nf, nr, no
    L = pack["rkv"].shape[0]
    out["rkv"] = pack["rkv"].reshape(L, nr, c_r, c)
    out["out"] = pack["out"].reshape(L, no, c_o, c)
    out["fr"] = pack["fr"].reshape(L, no, c_o, c)
    out["fk"] = pack["fk"].reshape(L, nf, f4, c)
    out["fv"] = jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)
    if pack["quant"]:
        for name, nt in (("rkv", nr), ("out", no), ("fr", no), ("fk", nf)):
            d = pack[name + "_d"]
            out[name + "_d"] = jnp.swapaxes(
                d.reshape(L, nt, d.shape[1] // nt, 1), 2, 3
            )  # [L, nt, 1, rows]
        out["fv_d"] = jnp.swapaxes(pack["fv_d"], 1, 2)
    for key in _V4_TILED_ROW_VECS:
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    for key in ("amix", "fmix", "tf", "td"):
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    if pack.get("w4"):
        for name in ("rkv", "out", "fr", "fk", "fv"):
            out[name] = _pack_nibbles_split_half(out[name])
    return out


def _make_kernel_tiled_v4(c, f_dim, n_layer, quant, nf, nr, no,
                          w4=False):
    f4 = f_dim // nf
    m = nr // 3
    c_r = c // m
    c_o = c // no
    fused = (m == 1)
    # phase layout: [shift+mix (| nr rkv tiles | wkv) | no out tiles |
    # ffn-shift | no fr tiles | nf fk tiles // nf fv tiles | finish]
    P_WKV = 0 if fused else 1 + nr
    P_OUT0 = P_WKV + 1
    P_FSH = P_OUT0 + no
    P_FR0 = P_FSH + 1
    P_FK0 = P_FR0 + no
    P_FV0 = P_FK0 + 1
    n_phase = P_FK0 + nf + 1

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    # FULL-ROW data plane (same rewrite as _make_kernel_tiled_v6):
    # [1, N] activations/scratches, lane-contracting matvecs, row
    # scales as stored; v4's scalar-state wkv is pure elementwise so
    # it runs on rows unchanged.
    def qx(x):
        amax = jnp.max(jnp.abs(x))
        dx = amax / 127.0
        inv = jnp.where(dx > 0.0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(x * inv), -127.0, 127.0).astype(jnp.int8)
        return x8, dx

    def ln(v, w, b, eps):
        mu = jnp.mean(v, axis=1, keepdims=True)
        vc = v - mu
        var = jnp.mean(vc * vc, axis=1, keepdims=True)
        return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + b

    def kernel(*refs):
        if quant:
            (x0_ref, att_in, ffn_in, aa_in, bb_in, pp_in,
             rkv, rkv_d, out_w, out_d, fr_w, fr_d,
             fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, amix, fmix, tf, td,
             y_out, att_out, ffn_out, aa_out, bb_out, pp_out,
             x_s, xk_s, xv_s, xr_s, r_s, k_s, v_s, wr_s, ap_s,
             xk2_s, xr2_s, rg_s, acc_s, h_s) = refs
        else:
            (x0_ref, att_in, ffn_in, aa_in, bb_in, pp_in,
             rkv, out_w, fr_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, amix, fmix, tf, td,
             y_out, att_out, ffn_out, aa_out, bb_out, pp_out,
             x_s, xk_s, xv_s, xr_s, r_s, k_s, v_s, wr_s, ap_s,
             xk2_s, xr2_s, rg_s, acc_s, h_s) = refs

        i = pl.program_id(0)
        p = pl.program_id(1)

        def cv(ref):
            return ref[0]        # [1, N] row, used as stored

        def mmr(x8row, w):
            """[1, K] x [N, K] -> [1, N]."""
            return jax.lax.dot_general(
                x8row, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )

        def matv(w, d_row, xrow):
            if quant:
                x8, dx = qx(xrow)
                return mmr(x8, w).astype(jnp.float32) * dx * d_row
            # bf16 weights upcast in-register (see the v6 row kernel)
            return jax.lax.dot_general(
                xrow, w.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def matv4(w, d_row, xrow):
            """split-half biased-lo packed int4 (see _w4_acc), rows."""
            kh = w.shape[1]
            x8, dx = qx(xrow)
            lo8 = x8[:, :kh]
            hi8 = x8[:, kh:]
            lo_u = w & jnp.int8(15)
            hi16 = w & jnp.int8(-16)
            sx8 = jnp.sum(lo8.astype(jnp.int32))
            acc16 = mmr(hi8, hi16) + 16 * mmr(lo8, lo_u) - 128 * sx8
            return acc16.astype(jnp.float32) * (
                dx * jnp.float32(_W4_INV16)) * d_row

        mv_big = matv4 if w4 else matv

        def _wkv_body():
            """max-trick wkv4 (rwkv_graph.inc:119-161) on [C, 1] columns;
            consumes r_s/k_s/v_s, produces wr_s (= sigmoid(r)*wkv) and
            the aa/bb/pp state updates."""
            r = r_s[:]
            k = k_s[:]
            v = v_s[:]
            aa, bb, pp = aa_in[0], bb_in[0], pp_in[0]
            ww = cv(tf) + k
            qq = jnp.maximum(pp, ww)
            e1 = jnp.exp(pp - qq)
            e2 = jnp.exp(ww - qq)
            wkv = (e1 * aa + e2 * v) / (e1 * bb + e2)
            ww2 = pp + cv(td)
            qq2 = jnp.maximum(ww2, k)
            e1b = jnp.exp(ww2 - qq2)
            e2b = jnp.exp(k - qq2)
            aa_out[0] = e1b * aa + e2b * v
            bb_out[0] = e1b * bb + e2b
            pp_out[0] = qq2
            wr_s[:] = r * wkv

        # ---- phase 0: att token shift + mixes -------------------------
        @pl.when(p == 0)
        def _shift():
            @pl.when(i == 0)
            def _():
                x_s[:] = x0_ref[:].T

            x = x_s[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            prev = att_in[0]
            att_out[0] = xl

            cfr = amix[0]                    # [1, 3c] row; order k, v, r
            cf = [cfr[:, q * c:(q + 1) * c] for q in range(3)]
            xk_s[:] = xl * cf[0] + (prev - prev * cf[0])
            xv_s[:] = xl * cf[1] + (prev - prev * cf[1])
            xr_s[:] = xl * cf[2] + (prev - prev * cf[2])

            if fused:
                def proj(q, xin):
                    return mv_big(
                        rkv[0, q], rkv_d[0, q] if quant else None, xin
                    )

                r_s[:] = jax.nn.sigmoid(proj(0, xr_s[:]))
                k_s[:] = proj(1, xk_s[:])
                v_s[:] = proj(2, xv_s[:])
                _wkv_body()

        if not fused:
            # ---- phases 1..nr: rkv row tiles --------------------------
            @pl.when((p >= 1) & (p < 1 + nr))
            def _rkv_tile():
                t = p - 1
                q = t // m          # projection: 0=r, 1=k, 2=v
                sft = (t % m) * c_r
                w = rkv[0, 0]
                dd = rkv_d[0, 0] if quant else None
                xin = jnp.where(
                    q == 0, xr_s[:],
                    jnp.where(q == 1, xk_s[:], xv_s[:]),
                )
                acc = mv_big(w, dd, xin)

                @pl.when(q == 0)
                def _():
                    r_s[:, pl.dslice(sft, c_r)] = jax.nn.sigmoid(acc)

                @pl.when(q == 1)
                def _():
                    k_s[:, pl.dslice(sft, c_r)] = acc

                @pl.when(q == 2)
                def _():
                    v_s[:, pl.dslice(sft, c_r)] = acc

            # ---- phase P_WKV: scalar-state wkv ------------------------
            @pl.when(p == P_WKV)
            def _wkv():
                _wkv_body()

        # ---- phases P_OUT0..: att out-projection row tiles ------------
        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[0, 0]
            d = out_d[0, 0] if quant else None
            ap_s[:, pl.dslice(t * c_o, c_o)] = mv_big(w, d, wr_s[:])

        # ---- phase P_FSH: residual + FFN token shift ------------------
        @pl.when(p == P_FSH)
        def _ffn_shift():
            x = x_s[:] + ap_s[:]
            xl2 = ln(x, cv(ln2w), cv(ln2b), 1e-5)
            prev2 = ffn_in[0]
            ffn_out[0] = xl2
            fcr = fmix[0]                     # [1, 2c] row; order k, r
            fcf = [fcr[:, q * c:(q + 1) * c] for q in range(2)]
            xk2_s[:] = xl2 * fcf[0] + (prev2 - prev2 * fcf[0])
            xr2_s[:] = xl2 * fcf[1] + (prev2 - prev2 * fcf[1])
            x_s[:] = x
            acc_s[:] = jnp.zeros_like(acc_s)

        # ---- phases P_FR0..: FFN receptance-gate row tiles ------------
        @pl.when((p >= P_FR0) & (p < P_FR0 + no))
        def _fr_tile():
            t = p - P_FR0
            w = fr_w[0, 0]
            d = fr_d[0, 0] if quant else None
            rg_s[:, pl.dslice(t * c_o, c_o)] = jax.nn.sigmoid(
                mv_big(w, d, xr2_s[:])
            )

        # ---- phases P_FK0..: fk tiles -> hidden slices ----------------
        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0], fk_d[0][0] if quant else None, xk2_s[:]
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            h_s[:, pl.dslice(t * f4, f4)] = hk

        # ---- phases P_FV0..: fv tiles consume hidden slices -----------
        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = h_s[:, pl.dslice(t * f4, f4)]
            acc_s[:] = acc_s[:] + mv_big(
                fv_w[0][0], fv_d[0] if quant else None, hk
            )

        # ---- finalize layer -------------------------------------------
        @pl.when(p == n_phase - 1)
        def _finish():
            x = x_s[:] + rg_s[:] * acc_s[:]
            x_s[:] = x
            y_out[:] = x

    phases = {"P_WKV": P_WKV, "P_OUT0": P_OUT0, "P_FSH": P_FSH,
              "P_FR0": P_FR0, "P_FK0": P_FK0, "P_FV0": P_FV0}
    return kernel, n_phase, phases


def v4_decode_megakernel_tiled(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
):
    """Phase-tiled whole-model v4 decode step (B=1; bounded VMEM).

    pack: retile_mega_pack_v4(build_mega_pack_v4(...)) output. State:
    att_xx/ffn_xx/aa/bb/pp [L, C, 1]. x0: [C, 1] f32."""
    c = cfg.n_embed
    n_layer = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    nf = pack["nf"]
    nr, no = pack["nr"], pack["no"]
    assert x0.shape[1] == 1, "v4 tiled kernel is B=1 only"
    m = nr // 3
    fused = (m == 1)

    # phase constants come from the kernel factory (single source)
    kernel, n_phase, ph = _make_kernel_tiled_v4(
        c, f_dim, n_layer, quant, nf, nr, no, w4=bool(pack.get("w4")),
    )
    P_OUT0, P_FR0 = ph["P_OUT0"], ph["P_FR0"]
    P_FK0, P_FV0 = ph["P_FK0"], ph["P_FV0"]

    def per_layer(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i, p: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def per_layer_early(shape, last_phase):
        def imap(i, p):
            return (
                jnp.minimum(i + (p > last_phase), n_layer - 1),
            ) + (0,) * len(shape)

        return pl.BlockSpec((1,) + shape, imap, memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i, p: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def ffn_spec(shape, first_p):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (i, jnp.clip(p - first_p, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tiled_rows_spec(shape, first_p, nt):
        def imap(i, p):
            done = p > first_p + nt - 1
            t = jnp.where(done, 0, jnp.clip(p - first_p, 0, nt - 1))
            return (
                jnp.minimum(i + done, n_layer - 1), t,
            ) + (0,) * len(shape)

        return pl.BlockSpec((1, 1) + shape, imap, memory_space=pltpu.VMEM)

    if fused:
        rkv_spec = per_layer_early(pack["rkv"].shape[1:], 0)
        rkv_d_spec = (
            per_layer_early(pack["rkv_d"].shape[1:], 0) if quant else None
        )
    else:
        rkv_spec = tiled_rows_spec(pack["rkv"].shape[2:], 1, nr)
        rkv_d_spec = (
            tiled_rows_spec(pack["rkv_d"].shape[2:], 1, nr)
            if quant else None
        )

    mat_args, mat_specs = [], []
    for name, spec_pair in (
        ("rkv", (rkv_spec, rkv_d_spec)),
        ("out", (
            tiled_rows_spec(pack["out"].shape[2:], P_OUT0, no),
            tiled_rows_spec(pack["out_d"].shape[2:], P_OUT0, no)
            if quant else None,
        )),
        ("fr", (
            tiled_rows_spec(pack["fr"].shape[2:], P_FR0, no),
            tiled_rows_spec(pack["fr_d"].shape[2:], P_FR0, no)
            if quant else None,
        )),
    ):
        mat_args.append(pack[name])
        mat_specs.append(spec_pair[0])
        if quant:
            mat_args.append(pack[name + "_d"])
            mat_specs.append(spec_pair[1])
    mat_args.append(pack["fk"])
    mat_specs.append(ffn_spec(pack["fk"].shape[2:], P_FK0))
    if quant:
        mat_args.append(pack["fk_d"])
        mat_specs.append(ffn_spec(pack["fk_d"].shape[2:], P_FK0))
    mat_args.append(pack["fv"])
    mat_specs.append(ffn_spec(pack["fv"].shape[2:], P_FV0))
    if quant:
        mat_args.append(pack["fv_d"])
        mat_specs.append(per_layer(pack["fv_d"].shape[1:]))

    vec_args = [pack[k] for k in _V4_TILED_ROW_VECS]
    vec_specs = [per_layer(pack[k].shape[1:]) for k in _V4_TILED_ROW_VECS]

    def rowst(a):
        return jnp.swapaxes(a, 1, 2)     # [L, C, 1] -> [L, 1, C] rows

    args = (
        [x0.astype(jnp.float32),
         rowst(state_t["att_xx"]), rowst(state_t["ffn_xx"]),
         rowst(state_t["aa"]), rowst(state_t["bb"]),
         rowst(state_t["pp"])]
        + mat_args + vec_args
        + [pack["amix"], pack["fmix"], pack["tf"], pack["td"]]
    )
    in_specs = (
        [whole((c, 1))] + [per_layer((1, c))] * 5
        + mat_specs + vec_specs
        + [per_layer((1, 3 * c)), per_layer((1, 2 * c)),
           per_layer((1, c)), per_layer((1, c))]
    )

    out_shapes = (
        jax.ShapeDtypeStruct((1, c), jnp.float32),
    ) + tuple(
        jax.ShapeDtypeStruct((n_layer, 1, c), jnp.float32) for _ in range(5)
    )
    out_specs = (whole((1, c)),) + tuple(per_layer((1, c)) for _ in range(5))

    y, att_xx, ffn_xx, aa, bb, pp = pl.pallas_call(
        kernel,
        grid=(n_layer, n_phase),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            # [1, N] rows (a [N, 1] f32 scratch lane-pads 1 -> 128)
            pltpu.VMEM((1, c), jnp.float32),      # x_s
            pltpu.VMEM((1, c), jnp.float32),      # xk_s
            pltpu.VMEM((1, c), jnp.float32),      # xv_s
            pltpu.VMEM((1, c), jnp.float32),      # xr_s
            pltpu.VMEM((1, c), jnp.float32),      # r_s
            pltpu.VMEM((1, c), jnp.float32),      # k_s
            pltpu.VMEM((1, c), jnp.float32),      # v_s
            pltpu.VMEM((1, c), jnp.float32),      # wr_s
            pltpu.VMEM((1, c), jnp.float32),      # ap_s
            pltpu.VMEM((1, c), jnp.float32),      # xk2_s
            pltpu.VMEM((1, c), jnp.float32),      # xr2_s
            pltpu.VMEM((1, c), jnp.float32),      # rg_s
            pltpu.VMEM((1, c), jnp.float32),      # acc_s
            pltpu.VMEM((1, f_dim), jnp.float32),  # h_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return (y.T, {"att_xx": rowst(att_xx), "ffn_xx": rowst(ffn_xx),
                  "aa": rowst(aa), "bb": rowst(bb), "pp": rowst(pp)})


# ---------------------------------------------------------------------------
# RWKV v5 (5.1 / 5.2) phase-tiled whole-model decode kernel (big, B=1)
# ---------------------------------------------------------------------------
#
# Completes the phase-tiled family across all five architectures
# (v5 World 7B is a published model class).  Structure = the v6 tiled
# kernel minus the LoRA chains: static 3/4-way token-shift mixes in
# phase 0, ng = n_mix*m row-tiled input projections (gate only on 5.2,
# silu applied at tile write), wkv with STATIC per-head decay/bonus
# ([L, H, S, 1] columns sliced per head tile), group norm eps 1e-5, and
# the v4/v5 FFN pipeline (row-tiled fr gate + fk/fv).  B=1 only.

_V5_TILED_ROW_VECS = (
    "ln1.weight", "ln1.bias", "ln2.weight", "ln2.bias",
)


def retile_mega_pack_v5(pack: dict, cfg, nh: int = 1, nf: int = 1,
                        ng: int = None, no: int = 1) -> dict:
    """Re-tile a build_mega_pack_v5 output for the v5 phase-tiled
    kernel."""
    c = cfg.n_embed
    f_dim = pack["f_dim"]
    n_mix = 4 if pack["has_gate"] else 3
    if ng is None:
        ng = n_mix
    assert f_dim % nf == 0, (f_dim, nf)
    assert ng % n_mix == 0, (ng, n_mix)
    m = ng // n_mix
    assert c % m == 0 and c % no == 0, (c, ng, no)
    f4 = f_dim // nf
    c_g = c // m
    c_o = c // no
    out = dict(pack)
    out["nh"], out["nf"] = nh, nf
    out["ng"], out["no"] = ng, no
    L = pack["rkvg"].shape[0]
    out["rkvg"] = pack["rkvg"].reshape(L, ng, c_g, c)
    out["out"] = pack["out"].reshape(L, no, c_o, c)
    out["fr"] = pack["fr"].reshape(L, no, c_o, c)
    out["fk"] = pack["fk"].reshape(L, nf, f4, c)
    out["fv"] = jnp.swapaxes(pack["fv"].reshape(L, c, nf, f4), 1, 2)
    if pack["quant"]:
        for name, nt in (("rkvg", ng), ("out", no), ("fr", no), ("fk", nf)):
            d = pack[name + "_d"]
            out[name + "_d"] = jnp.swapaxes(
                d.reshape(L, nt, d.shape[1] // nt, 1), 2, 3
            )  # [L, nt, 1, rows]
        out["fv_d"] = jnp.swapaxes(pack["fv_d"], 1, 2)
    for key in _V5_TILED_ROW_VECS:
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    for key in ("amix", "fmix"):
        out[key] = jnp.swapaxes(pack[key], 1, 2)
    # ln_x w/b and td/tf stay columns (grid-dependent head-tile slices)
    if pack.get("w4"):
        for name in ("rkvg", "out", "fr", "fk", "fv"):
            out[name] = _pack_nibbles_split_half(out[name])
    return out


def _make_kernel_tiled_v5(c, h, s, f_dim, n_layer, quant, has_gate,
                          nh, nf, ng, no, w4=False):
    h4 = h // nh
    f4 = f_dim // nf
    n_mix = 4 if has_gate else 3
    m = ng // n_mix
    c_g = c // m
    c_o = c // no
    fused = (m == 1)
    P_WKV0 = 1 if fused else 1 + ng
    P_OUT0 = P_WKV0 + nh
    P_FSH = P_OUT0 + no
    P_FR0 = P_FSH + 1
    P_FK0 = P_FR0 + no
    P_FV0 = P_FK0 + 1
    n_phase = P_FK0 + nf + 1

    def mm(w, x):
        return jax.lax.dot_general(
            w, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )

    def qx(x):
        amax = jnp.max(jnp.abs(x))
        dx = amax / 127.0
        inv = jnp.where(dx > 0.0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
        x8 = jnp.clip(jnp.rint(x * inv), -127.0, 127.0).astype(jnp.int8)
        return x8, dx

    # FULL-ROW data plane (see _make_kernel_tiled_v6): [1, N]
    # activations/scratches, lane-contracting matvecs, row scales.
    def ln(v, w, b, eps):
        mu = jnp.mean(v, axis=1, keepdims=True)
        vc = v - mu
        var = jnp.mean(vc * vc, axis=1, keepdims=True)
        return vc * jax.lax.rsqrt(var + jnp.float32(eps)) * w + b

    def kernel(*refs):
        if quant:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, rkvg_d, out_w, out_d, fr_w, fr_d,
             fk_w, fk_d, fv_w, fv_d,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb,
             amix, fmix, td, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s, xo_s, xk2_s, xr2_s, acc_s, h_s,
             r_s, k_s, v_s, g_s, rg_s, ap_s,
             xr_in_s, xk_in_s, xv_in_s, xg_in_s) = refs
        else:
            (x0_ref, att_in, ffn_in, heads_in,
             rkvg, out_w, fr_w, fk_w, fv_w,
             ln1w, ln1b, ln2w, ln2b, lnxw, lnxb,
             amix, fmix, td, tf,
             y_out, att_out, ffn_out, heads_out,
             x_s, xo_s, xk2_s, xr2_s, acc_s, h_s,
             r_s, k_s, v_s, g_s, rg_s, ap_s,
             xr_in_s, xk_in_s, xv_in_s, xg_in_s) = refs

        i = pl.program_id(0)
        p = pl.program_id(1)

        def cv(ref):
            return ref[0]        # [1, N] row, used as stored

        def mmr(x8row, w):
            """[1, K] x [N, K] -> [1, N]."""
            return jax.lax.dot_general(
                x8row, w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if quant else jnp.float32,
            )

        def matv(w, d_row, xrow):
            if quant:
                x8, dx = qx(xrow)
                return mmr(x8, w).astype(jnp.float32) * dx * d_row
            # bf16 weights upcast in-register (see the v6 row kernel)
            return jax.lax.dot_general(
                xrow, w.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def matv4(w, d_row, xrow):
            """split-half biased-lo packed int4 (see _w4_acc), rows."""
            kh = w.shape[1]
            x8, dx = qx(xrow)
            lo8 = x8[:, :kh]
            hi8 = x8[:, kh:]
            lo_u = w & jnp.int8(15)
            hi16 = w & jnp.int8(-16)
            sx8 = jnp.sum(lo8.astype(jnp.int32))
            acc16 = mmr(hi8, hi16) + 16 * mmr(lo8, lo_u) - 128 * sx8
            return acc16.astype(jnp.float32) * (
                dx * jnp.float32(_W4_INV16)) * d_row

        mv_big = matv4 if w4 else matv

        # ---- phase 0: att token shift + mixes -------------------------
        @pl.when(p == 0)
        def _shift():
            @pl.when(i == 0)
            def _():
                x_s[:] = x0_ref[:].T

            x = x_s[:]
            xl = ln(x, cv(ln1w), cv(ln1b), 1e-5)
            prev = att_in[0]
            att_out[0] = xl

            cfr = amix[0]           # [1, n_mix*c] row; order k, v, r(, g)

            def mix(ci):
                cfi = cfr[:, ci * c:(ci + 1) * c]
                return xl * cfi + (prev - prev * cfi)

            xk_in_s[:] = mix(0)
            xv_in_s[:] = mix(1)
            xr_in_s[:] = mix(2)
            if has_gate:
                xg_in_s[:] = mix(3)

            if fused:
                def proj(q, xin):
                    return mv_big(
                        rkvg[0, q], rkvg_d[0, q] if quant else None, xin
                    )

                r_s[:] = proj(0, xr_in_s[:])
                k_s[:] = proj(1, xk_in_s[:])
                v_s[:] = proj(2, xv_in_s[:])
                if has_gate:
                    gg = proj(3, xg_in_s[:])
                    g_s[:] = gg * jax.nn.sigmoid(gg)  # silu

        if not fused:
            # ---- phases 1..ng: rkvg row tiles -------------------------
            @pl.when((p >= 1) & (p < 1 + ng))
            def _rkvg_tile():
                t = p - 1
                q = t // m          # projection: 0=r, 1=k, 2=v(, 3=g)
                sft = (t % m) * c_g
                w = rkvg[0, 0]
                dd = rkvg_d[0, 0] if quant else None
                xin = jnp.where(
                    q == 0, xr_in_s[:],
                    jnp.where(q == 1, xk_in_s[:],
                              jnp.where(q == 2, xv_in_s[:], xg_in_s[:])),
                )
                acc = mv_big(w, dd, xin)

                @pl.when(q == 0)
                def _():
                    r_s[:, pl.dslice(sft, c_g)] = acc

                @pl.when(q == 1)
                def _():
                    k_s[:, pl.dslice(sft, c_g)] = acc

                @pl.when(q == 2)
                def _():
                    v_s[:, pl.dslice(sft, c_g)] = acc

                if has_gate:
                    @pl.when(q == 3)
                    def _():
                        g_s[:, pl.dslice(sft, c_g)] = (
                            acc * jax.nn.sigmoid(acc)
                        )

        # ---- phases P_WKV0..: wkv + group norm (+ gate) per tile ------
        @pl.when((p >= P_WKV0) & (p < P_WKV0 + nh))
        def _wkv_tile():
            t = p - P_WKV0
            rows_lo = t * h4 * s

            def tile(ref):
                # row slice -> per-head columns (small transpose)
                return ref[:, pl.dslice(rows_lo, h4 * s)].T.reshape(
                    h4, s, 1)

            r3, k3, v3 = tile(r_s), tile(k_s), tile(v_s)
            td3 = td[0, pl.dslice(t * h4, h4)]              # [h4, s, 1]
            tf3 = tf[0, pl.dslice(t * h4, h4)]

            i_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
            j_ = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
            eye = (i_ == j_).astype(jnp.float32)[None]
            st = heads_in[0, 0]                             # [h4, S_j, S_i]
            v_row = jnp.sum(v3 * eye, axis=1, keepdims=True)
            dot = jnp.sum(r3 * tf3 * k3, axis=1, keepdims=True)
            out_row = jnp.sum(st * r3, axis=1, keepdims=True) + v_row * dot
            st = st * td3 + k3 * v_row
            heads_out[0, 0] = st

            # group norm per head over S_i (lanes), eps 1e-5 (v5)
            mu = jnp.mean(out_row, axis=2, keepdims=True)
            yc = out_row - mu
            var = jnp.mean(yc * yc, axis=2, keepdims=True)
            y_row = yc * jax.lax.rsqrt(var + jnp.float32(1e-5))
            y_col = jnp.sum(y_row * eye, axis=2, keepdims=True)
            yn = y_col.reshape(h4 * s, 1)

            lw = lnxw[0, pl.dslice(rows_lo, h4 * s)]
            lb = lnxb[0, pl.dslice(rows_lo, h4 * s)]
            xo = yn * lw + lb
            if has_gate:
                xo = xo * g_s[:, pl.dslice(rows_lo, h4 * s)].T
            xo_s[:, pl.dslice(rows_lo, h4 * s)] = xo.T

        # ---- phases P_OUT0..: att out-projection row tiles ------------
        @pl.when((p >= P_OUT0) & (p < P_OUT0 + no))
        def _out_tile():
            t = p - P_OUT0
            w = out_w[0, 0]
            d = out_d[0, 0] if quant else None
            ap_s[:, pl.dslice(t * c_o, c_o)] = mv_big(w, d, xo_s[:])

        # ---- phase P_FSH: residual + FFN token shift ------------------
        @pl.when(p == P_FSH)
        def _ffn_shift():
            x = x_s[:] + ap_s[:]
            xl2 = ln(x, cv(ln2w), cv(ln2b), 1e-5)
            prev2 = ffn_in[0]
            ffn_out[0] = xl2
            fcr = fmix[0]                     # [1, 2c] row; order k, r
            fk0 = fcr[:, 0:c]
            fr0 = fcr[:, c:2 * c]
            xk2_s[:] = xl2 * fk0 + (prev2 - prev2 * fk0)
            xr2_s[:] = xl2 * fr0 + (prev2 - prev2 * fr0)
            x_s[:] = x
            acc_s[:] = jnp.zeros_like(acc_s)

        # ---- phases P_FR0..: FFN receptance-gate row tiles ------------
        @pl.when((p >= P_FR0) & (p < P_FR0 + no))
        def _fr_tile():
            t = p - P_FR0
            w = fr_w[0, 0]
            d = fr_d[0, 0] if quant else None
            rg_s[:, pl.dslice(t * c_o, c_o)] = jax.nn.sigmoid(
                mv_big(w, d, xr2_s[:])
            )

        # ---- phases P_FK0..: fk tiles -> hidden slices ----------------
        @pl.when((p >= P_FK0) & (p < P_FK0 + nf))
        def _fk_tile():
            t = p - P_FK0
            hk = mv_big(
                fk_w[0][0], fk_d[0][0] if quant else None, xk2_s[:]
            )
            hk = jnp.square(jnp.maximum(hk, 0.0))
            h_s[:, pl.dslice(t * f4, f4)] = hk

        # ---- phases P_FV0..: fv tiles consume hidden slices -----------
        @pl.when((p >= P_FV0) & (p < P_FV0 + nf))
        def _fv_tile():
            t = p - P_FV0
            hk = h_s[:, pl.dslice(t * f4, f4)]
            acc_s[:] = acc_s[:] + mv_big(
                fv_w[0][0], fv_d[0] if quant else None, hk
            )

        # ---- finalize layer -------------------------------------------
        @pl.when(p == n_phase - 1)
        def _finish():
            x = x_s[:] + rg_s[:] * acc_s[:]
            x_s[:] = x
            y_out[:] = x

    phases = {"P_WKV0": P_WKV0, "P_OUT0": P_OUT0, "P_FSH": P_FSH,
              "P_FR0": P_FR0, "P_FK0": P_FK0, "P_FV0": P_FV0}
    return kernel, n_phase, phases


def v5_decode_megakernel_tiled(
    pack: dict, state_t: dict, x0, cfg, interpret: bool = False,
):
    """Phase-tiled whole-model v5.1/v5.2 decode step (B=1).

    pack: retile_mega_pack_v5(build_mega_pack_v5(...)) output. State:
    att_xx/ffn_xx [L, C, 1], heads [L, nh, H/nh, S_j, S_i]. x0: [C, 1]."""
    c, h, s = cfg.n_embed, cfg.head_count, cfg.head_size
    n_layer = cfg.n_layer
    f_dim = pack["f_dim"]
    quant = pack["quant"]
    has_gate = pack["has_gate"]
    nh, nf = pack["nh"], pack["nf"]
    ng, no = pack["ng"], pack["no"]
    h4 = h // nh
    assert x0.shape[1] == 1, "v5 tiled kernel is B=1 only"
    n_mix = 4 if has_gate else 3
    m = ng // n_mix
    fused = (m == 1)

    # phase constants come from the kernel factory (single source)
    kernel, n_phase, ph = _make_kernel_tiled_v5(
        c, h, s, f_dim, n_layer, quant, has_gate, nh, nf, ng, no,
        w4=bool(pack.get("w4")),
    )
    P_WKV0, P_OUT0 = ph["P_WKV0"], ph["P_OUT0"]
    P_FR0, P_FK0, P_FV0 = ph["P_FR0"], ph["P_FK0"], ph["P_FV0"]

    def per_layer(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda i, p: (i,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    def per_layer_early(shape, last_phase):
        def imap(i, p):
            return (
                jnp.minimum(i + (p > last_phase), n_layer - 1),
            ) + (0,) * len(shape)

        return pl.BlockSpec((1,) + shape, imap, memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda i, p: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def head_spec(shape):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (
                (i, jnp.clip(p - P_WKV0, 0, nh - 1)) + (0,) * len(shape)
            ),
            memory_space=pltpu.VMEM,
        )

    def ffn_spec(shape, first_p):
        return pl.BlockSpec(
            (1, 1) + shape,
            lambda i, p: (i, jnp.clip(p - first_p, 0, nf - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    def tiled_rows_spec(shape, first_p, nt):
        def imap(i, p):
            done = p > first_p + nt - 1
            t = jnp.where(done, 0, jnp.clip(p - first_p, 0, nt - 1))
            return (
                jnp.minimum(i + done, n_layer - 1), t,
            ) + (0,) * len(shape)

        return pl.BlockSpec((1, 1) + shape, imap, memory_space=pltpu.VMEM)

    if fused:
        rkvg_spec = per_layer_early(pack["rkvg"].shape[1:], 0)
        rkvg_d_spec = (
            per_layer_early(pack["rkvg_d"].shape[1:], 0) if quant else None
        )
    else:
        rkvg_spec = tiled_rows_spec(pack["rkvg"].shape[2:], 1, ng)
        rkvg_d_spec = (
            tiled_rows_spec(pack["rkvg_d"].shape[2:], 1, ng)
            if quant else None
        )

    mat_args, mat_specs = [], []
    for name, spec_pair in (
        ("rkvg", (rkvg_spec, rkvg_d_spec)),
        ("out", (
            tiled_rows_spec(pack["out"].shape[2:], P_OUT0, no),
            tiled_rows_spec(pack["out_d"].shape[2:], P_OUT0, no)
            if quant else None,
        )),
        ("fr", (
            tiled_rows_spec(pack["fr"].shape[2:], P_FR0, no),
            tiled_rows_spec(pack["fr_d"].shape[2:], P_FR0, no)
            if quant else None,
        )),
    ):
        mat_args.append(pack[name])
        mat_specs.append(spec_pair[0])
        if quant:
            mat_args.append(pack[name + "_d"])
            mat_specs.append(spec_pair[1])
    mat_args.append(pack["fk"])
    mat_specs.append(ffn_spec(pack["fk"].shape[2:], P_FK0))
    if quant:
        mat_args.append(pack["fk_d"])
        mat_specs.append(ffn_spec(pack["fk_d"].shape[2:], P_FK0))
    mat_args.append(pack["fv"])
    mat_specs.append(ffn_spec(pack["fv"].shape[2:], P_FV0))
    if quant:
        mat_args.append(pack["fv_d"])
        mat_specs.append(per_layer(pack["fv_d"].shape[1:]))

    vec_args = (
        [pack[k] for k in _V5_TILED_ROW_VECS]
        + [pack["att.ln_x.weight"], pack["att.ln_x.bias"]]
    )
    vec_specs = (
        [per_layer(pack[k].shape[1:]) for k in _V5_TILED_ROW_VECS]
        + [per_layer((c, 1)), per_layer((c, 1))]
    )

    head_shape = (h4, s, s)
    def rowst(a):
        return jnp.swapaxes(a, 1, 2)     # [L, C, 1] <-> [L, 1, C]

    args = (
        [x0.astype(jnp.float32),
         rowst(state_t["att_xx"]), rowst(state_t["ffn_xx"]),
         state_t["heads"]]
        + mat_args + vec_args
        + [pack["amix"], pack["fmix"], pack["td"], pack["tf"]]
    )
    in_specs = (
        [whole((c, 1)), per_layer((1, c)), per_layer((1, c)),
         head_spec(head_shape)]
        + mat_specs + vec_specs
        + [per_layer((1, n_mix * c)), per_layer((1, 2 * c)),
           per_layer((h, s, 1)), per_layer((h, s, 1))]
    )

    out_shapes = (
        jax.ShapeDtypeStruct((1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, 1, c), jnp.float32),
        jax.ShapeDtypeStruct((n_layer, nh) + head_shape, jnp.float32),
    )
    out_specs = (
        whole((1, c)), per_layer((1, c)), per_layer((1, c)),
        head_spec(head_shape),
    )

    y, att_xx, ffn_xx, heads = pl.pallas_call(
        kernel,
        grid=(n_layer, n_phase),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),      # x_s
            pltpu.VMEM((1, c), jnp.float32),      # xo_s
            pltpu.VMEM((1, c), jnp.float32),      # xk2_s
            pltpu.VMEM((1, c), jnp.float32),      # xr2_s
            pltpu.VMEM((1, c), jnp.float32),      # acc_s
            pltpu.VMEM((1, f_dim), jnp.float32),  # h_s
            pltpu.VMEM((1, c), jnp.float32),      # r_s
            pltpu.VMEM((1, c), jnp.float32),      # k_s
            pltpu.VMEM((1, c), jnp.float32),      # v_s
            pltpu.VMEM((1, c), jnp.float32),      # g_s
            pltpu.VMEM((1, c), jnp.float32),      # rg_s
            pltpu.VMEM((1, c), jnp.float32),      # ap_s
            pltpu.VMEM((1, c), jnp.float32),      # xr_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xk_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xv_in_s
            pltpu.VMEM((1, c), jnp.float32),      # xg_in_s
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return (y.T, {"att_xx": rowst(att_xx), "ffn_xx": rowst(ffn_xx),
                  "heads": heads})


# ---------------------------------------------------------------------------
# Mega-pack persistence (cold-start cache)
# ---------------------------------------------------------------------------
#
# Building a pack quantizes every big mat on the host (minutes at 7B).
# save/load round-trips the finished pack through one .npz so a serving
# process cold-starts from disk instead — the TPU analogue of the
# reference shipping pre-quantized .bin files (rwkv_quantize.inc:16).

_PACK_META_KEYS = ("quant", "w4", "d_lora", "d_maa", "d_dec", "f_dim",
                   "has_gate", "nh", "nf", "nr", "ng", "no")


def save_mega_pack(path: str, pack: dict) -> None:
    """Write a (built or retiled) mega pack to one .npz file."""
    arrays = {}
    meta = {}
    for k, v in pack.items():
        if k in _PACK_META_KEYS:
            meta[k] = v
        else:
            arrays["arr::" + k] = np.asarray(v)
    import json

    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_mega_pack(path: str) -> dict:
    """Load a pack written by save_mega_pack (arrays land on the default
    device as jnp arrays; meta values restored as python scalars)."""
    import json

    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        pack = dict(meta)
        for k in z.files:
            if k.startswith("arr::"):
                pack[k[len("arr::"):]] = jnp.asarray(z[k])
    return pack
