"""Pure-JAX forward graphs for RWKV v4 / v5.1 / v5.2 / v6 / v7.

The reference builds ggml cgraphs per architecture
(/root/reference/rwkv_graph.inc); here each architecture is a pure function
over (params, state, tokens) producing (logits, new state). Time recurrences
(the wkv kernels) are expressed with `jax.lax.scan`, so a single function
serves both the reference's "serial" (T=1) and "sequence" (T=n) modes and
compiles to static-shape XLA. The hot wkv scans have Pallas TPU kernel
equivalents in `rwkv_tpu.ops.kernels`; this module is the numerics reference.

Math parity notes are cited per function against the reference lines.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from rwkv_tpu.models.config import ModelConfig
from rwkv_tpu.ops.parity import Weight, group_norm, l2_normalize, layer_norm, mm

Params = dict[str, Any]
State = dict[str, jnp.ndarray]


def _token_shift(x_ln: jnp.ndarray, carry: jnp.ndarray):
    """Reference rwkv_carry_x (rwkv_graph.inc:56-82): x_prev is the previous
    token's (post-layernorm) activation, seeded by the carried state row; the
    new carry is the last token's activation."""
    x_prev = jnp.concatenate([carry[None, :], x_ln[:-1]], axis=0)
    return x_prev, x_ln[-1]


def _mix(x: jnp.ndarray, x_prev: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """v4/v5 time-mix: x*c + x_prev*(1-c), in the reference's op order
    (rwkv_graph.inc:93-109)."""
    return x * coeff + (x_prev - x_prev * coeff)


# ---------------------------------------------------------------------------
# wkv recurrences (lax.scan over time; state matrix S[h, i, j], i = value
# dim, j = key/receptance dim — the reference's state layout, see
# rwkv_operators_wkv_v7.inc:71-98 and ggml's wkv6 kernel)
# ---------------------------------------------------------------------------


def wkv4_scan(tf, td, k, v, aa, bb, pp):
    """RWKV v4 scalar-state wkv with the max-trick for numerical stability
    (rwkv_graph.inc:119-161). k, v: [T, C]; aa/bb/pp: [C]."""

    def step(carry, inp):
        aa, bb, pp = carry
        kt, vt = inp
        ww = tf + kt
        qq = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - qq)
        e2 = jnp.exp(ww - qq)
        a = e1 * aa + e2 * vt
        b = e1 * bb + e2
        ww2 = pp + td
        qq2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - qq2)
        e2b = jnp.exp(kt - qq2)
        return (e1b * aa + e2b * vt, e1b * bb + e2b, qq2), a / b

    (aa, bb, pp), wkv = jax.lax.scan(step, (aa, bb, pp), (k, v))
    return wkv, aa, bb, pp


def wkv4_scan_trace(tf, td, k, v, aa, bb, pp):
    """wkv4_scan that also emits aa/bb/pp AFTER every step (the
    speculative-commit primitive; cf. wkv7_scan_trace)."""

    def step(carry, inp):
        aa, bb, pp = carry
        kt, vt = inp
        ww = tf + kt
        qq = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - qq)
        e2 = jnp.exp(ww - qq)
        a = e1 * aa + e2 * vt
        b = e1 * bb + e2
        ww2 = pp + td
        qq2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - qq2)
        e2b = jnp.exp(kt - qq2)
        nxt = (e1b * aa + e2b * vt, e1b * bb + e2b, qq2)
        return nxt, (a / b,) + nxt

    _, (wkv, aa_all, bb_all, pp_all) = jax.lax.scan(
        step, (aa, bb, pp), (k, v)
    )
    return wkv, aa_all, bb_all, pp_all


def wkv6_scan(s, r, k, v, w, tf):
    """RWKV v5/v6 multi-head linear attention (ggml_rwkv_wkv6 semantics):
      out[h,i] = sum_j r[h,j] * (tf[h,j]*k[h,j]*v[h,i] + S[h,i,j])
      S'[h,i,j] = S[h,i,j]*w[h,j] + k[h,j]*v[h,i]
    r/k/v: [T,H,S]; w: [T,H,S] (v6) or [H,S] broadcast (v5); tf: [H,S]."""
    if w.ndim == 2:  # static per-head decay: broadcast over time (and batch)
        w = jnp.broadcast_to(w, r.shape)

    def step(s, inp):
        rt, kt, vt, wt = inp
        y = jnp.einsum("...hij,...hj->...hi", s, rt) + vt * jnp.sum(
            rt * tf * kt, axis=-1, keepdims=True
        )
        s = s * wt[..., None, :] + vt[..., :, None] * kt[..., None, :]
        return s, y

    s, y = jax.lax.scan(step, s, (r, k, v, w))
    return y, s


def wkv6_scan_trace(s, r, k, v, w, tf):
    """wkv6_scan that also emits the state AFTER every step (the
    speculative-commit primitive; cf. wkv7_scan_trace)."""
    if w.ndim == 2:
        w = jnp.broadcast_to(w, r.shape)

    def step(s, inp):
        rt, kt, vt, wt = inp
        y = jnp.einsum("...hij,...hj->...hi", s, rt) + vt * jnp.sum(
            rt * tf * kt, axis=-1, keepdims=True
        )
        s = s * wt[..., None, :] + vt[..., :, None] * kt[..., None, :]
        return s, (y, s)

    _, (y, s_all) = jax.lax.scan(step, s, (r, k, v, w))
    return y, s_all


def wkv7_scan(s, r, w, k, v, a, b):
    """RWKV v7 generalized delta rule (rwkv_operators_wkv_v7.inc:61-101):
      sa[h,i]   = sum_j a[h,j] * S[h,i,j]
      S'[h,i,j] = S[h,i,j]*w[h,j] + k[h,j]*v[h,i] + sa[h,i]*b[h,j]
      out[h,i]  = sum_j S'[h,i,j] * r[h,j]
    All of r/w/k/v/a/b: [T,H,S]."""

    def step(s, inp):
        rt, wt, kt, vt, at, bt = inp
        sa = jnp.einsum("...hij,...hj->...hi", s, at)
        s = s * wt[..., None, :] + vt[..., :, None] * kt[..., None, :] + sa[..., :, None] * bt[..., None, :]
        y = jnp.einsum("...hij,...hj->...hi", s, rt)
        return s, y

    s, y = jax.lax.scan(step, s, (r, w, k, v, a, b))
    return y, s


def wkv7_scan_trace(s, r, w, k, v, a, b):
    """wkv7_scan that also emits the state AFTER every step:
    returns (y [T, H, S], s_all [T, H, S, S]). s_all[-1] equals
    wkv7_scan's final state — the speculative-commit primitive (state
    after any accepted prefix is a single gather, no replay)."""

    def step(s, inp):
        rt, wt, kt, vt, at, bt = inp
        sa = jnp.einsum("...hij,...hj->...hi", s, at)
        s = (
            s * wt[..., None, :]
            + vt[..., :, None] * kt[..., None, :]
            + sa[..., :, None] * bt[..., None, :]
        )
        y = jnp.einsum("...hij,...hj->...hi", s, rt)
        return s, (y, s)

    _, (y, s_all) = jax.lax.scan(step, s, (r, w, k, v, a, b))
    return y, s_all


# ---------------------------------------------------------------------------
# Attention blocks
# ---------------------------------------------------------------------------


def att_v4(layer: Params, x: jnp.ndarray, att_xx, aa, bb, pp,
           trace=False, wkv_fn=None):
    """rwkv_att_v4 (rwkv_graph.inc:84-197). trace=True additionally
    returns (xl, aa_all, bb_all, pp_all) — per-position states.
    `wkv_fn` overrides the recurrence (e.g. the associative-scan
    parallel form for prefill, ops/chunked.py::wkv4_auto)."""
    xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
    x_prev, new_xx = _token_shift(xl, att_xx)

    xk = _mix(xl, x_prev, layer["att.time_mix_k"])
    xv = _mix(xl, x_prev, layer["att.time_mix_v"])
    xr = _mix(xl, x_prev, layer["att.time_mix_r"])

    r = jax.nn.sigmoid(mm(xr, layer["att.receptance.weight"]))
    k = mm(xk, layer["att.key.weight"])
    v = mm(xv, layer["att.value.weight"])

    if trace:
        wkv, aa_all, bb_all, pp_all = wkv4_scan_trace(
            layer["att.time_first"], layer["att.time_decay"], k, v,
            aa, bb, pp,
        )
        out = mm(r * wkv, layer["att.output.weight"])
        return (out, new_xx, aa_all[-1], bb_all[-1], pp_all[-1],
                (xl, aa_all, bb_all, pp_all))
    wkv, aa, bb, pp = (wkv_fn or wkv4_scan)(
        layer["att.time_first"], layer["att.time_decay"], k, v, aa, bb, pp
    )
    return mm(r * wkv, layer["att.output.weight"]), new_xx, aa, bb, pp


def att_v5(layer: Params, x, att_xx, heads, cfg: ModelConfig, wkv_fn=None,
           trace=False):
    """rwkv_att_v5 (rwkv_graph.inc:199-292); covers v5.1 and v5.2.
    `wkv_fn` overrides the wkv recurrence (e.g. the chunked matmul form for
    serving prefill, rwkv_tpu/ops/chunked.py); default is the exact scan.
    trace=True additionally returns (xl, heads_all)."""
    h, s = cfg.head_count, cfg.head_size
    lead = x.shape[:-1]  # (T,) or (T, B)
    xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
    x_prev, new_xx = _token_shift(xl, att_xx)

    xk = _mix(xl, x_prev, layer["att.time_mix_k"])
    xv = _mix(xl, x_prev, layer["att.time_mix_v"])
    xr = _mix(xl, x_prev, layer["att.time_mix_r"])

    r = mm(xr, layer["att.receptance.weight"]).reshape(*lead, h, s)
    k = mm(xk, layer["att.key.weight"]).reshape(*lead, h, s)
    v = mm(xv, layer["att.value.weight"]).reshape(*lead, h, s)

    if cfg.version_minor >= 2:
        g = jax.nn.silu(mm(_mix(xl, x_prev, layer["att.time_mix_g"]), layer["att.gate.weight"]))
        tf = layer["att.time_faaaa"]  # [H, S]
        td = layer["att.time_decay"]  # [H, S], already exp(-exp(.)) on disk
    else:
        g = None
        # v5.1 stores per-head scalars; broadcast over the head dim
        # (the reference ggml_repeat at rwkv_graph.inc:263-267).
        tf = jnp.broadcast_to(layer["att.time_first"][:, None], (h, s))
        td = jnp.broadcast_to(layer["att.time_decay"][:, None], (h, s))

    if trace:
        y, heads_all = wkv6_scan_trace(heads, r, k, v, td, tf)
        heads = heads_all[-1]
    else:
        y, heads = (wkv_fn or wkv6_scan)(heads, r, k, v, td, tf)
    xo = group_norm(
        y.reshape(*lead, cfg.n_embed),
        layer["att.ln_x.weight"],
        layer["att.ln_x.bias"],
        h,
        eps=1e-5,
    )
    if g is not None:
        xo = xo * g
    out = mm(xo, layer["att.output.weight"])
    if trace:
        return out, new_xx, heads, (xl, heads_all)
    return out, new_xx, heads


def att_v6(layer: Params, x, att_xx, heads, cfg: ModelConfig, wkv_fn=None,
           trace=False):
    """rwkv_att_v6 (rwkv_graph.inc:294-385): LoRA-style dynamic five-way
    token-shift mix and dynamic decay. `wkv_fn` as in att_v5.

    trace=True (single-sequence [T, C] x): additionally returns
    (xl, heads_all) — the per-position recurrent state."""
    h, s = cfg.head_count, cfg.head_size
    lead, c = x.shape[:-1], x.shape[-1]
    xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
    x_prev, new_xx = _token_shift(xl, att_xx)
    sx = x_prev - xl

    xxx = xl + sx * layer["att.time_maa_x"]
    mix = jnp.tanh(mm(xxx, layer["att.time_maa_w1"]))  # [..., 5*dim]
    mix = mix.reshape(*lead, 5, -1)
    # m[s_idx, ..., c] = sum_d mix[..., s_idx, d] * W2[s_idx, c, d]
    m = jnp.einsum(
        "...sd,scd->s...c", mix, layer["att.time_maa_w2"], precision=jax.lax.Precision.HIGHEST
    )
    mw, mk_, mv, mr, mg = m[0], m[1], m[2], m[3], m[4]

    xw = (mw + layer["att.time_maa_w"]) * sx + xl
    xk = (mk_ + layer["att.time_maa_k"]) * sx + xl
    xv = (mv + layer["att.time_maa_v"]) * sx + xl
    xr = (mr + layer["att.time_maa_r"]) * sx + xl
    xg = (mg + layer["att.time_maa_g"]) * sx + xl

    r = mm(xr, layer["att.receptance.weight"]).reshape(*lead, h, s)
    k = mm(xk, layer["att.key.weight"]).reshape(*lead, h, s)
    v = mm(xv, layer["att.value.weight"]).reshape(*lead, h, s)
    g = jax.nn.silu(mm(xg, layer["att.gate.weight"]))

    w = mm(jnp.tanh(mm(xw, layer["att.time_decay_w1"])), layer["att.time_decay_w2"])
    w = w + layer["att.time_decay"].reshape(-1)
    w = jnp.exp(-jnp.exp(w)).reshape(*lead, h, s)

    if trace:
        y, heads_all = wkv6_scan_trace(
            heads, r, k, v, w, layer["att.time_faaaa"]
        )
        heads = heads_all[-1]
    else:
        y, heads = (wkv_fn or wkv6_scan)(
            heads, r, k, v, w, layer["att.time_faaaa"]
        )
    xo = group_norm(
        y.reshape(*lead, c), layer["att.ln_x.weight"], layer["att.ln_x.bias"], h, eps=64e-5
    )
    xo = xo * g
    out = mm(xo, layer["att.output.weight"])
    if trace:
        return out, new_xx, heads, (xl, heads_all)
    return out, new_xx, heads


def att_v7(
    layer: Params,
    x,
    att_xx,
    heads,
    v_first: Optional[jnp.ndarray],
    cfg: ModelConfig,
    is_first=None,
    wkv_fn=None,
    trace=False,
):
    """rwkv_att_v7 (rwkv_graph.inc:387-482): six-way shift, low-rank
    w/a/g/v gates, l2-normalized kk, cross-layer value residual, and the
    r·k·r_k bonus term.

    `is_first`: None for the unrolled path (v_first=None marks layer 0);
    a traced boolean for the scan-over-layers serving path, where layer 0's
    missing v0/v1/v2 are zero-padded and selected away.

    trace=True (single-sequence [T, C] x): additionally returns
    (xl, heads_all) — the per-position recurrent state."""
    h, s = cfg.head_count, cfg.head_size
    lead, c = x.shape[:-1], x.shape[-1]
    xl = layer_norm(x, layer["ln1.weight"], layer["ln1.bias"])
    x_prev, new_xx = _token_shift(xl, att_xx)
    sx = x_prev - xl

    coeff = layer["att.x_rwkvag"].reshape(6, *([1] * len(lead)), c)
    xxx = xl[None] + sx[None] * coeff  # [6, ..., C]
    xr, xw, xk, xv, xa, xg = (xxx[i] for i in range(6))

    r = mm(xr, layer["att.receptance.weight"])
    g = mm(jax.nn.sigmoid(mm(xg, layer["att.g1"])), layer["att.g2"])
    a = jax.nn.sigmoid(mm(mm(xa, layer["att.a1"]), layer["att.a2"]) + layer["att.a0"])

    w = mm(jnp.tanh(mm(xw, layer["att.w1"])), layer["att.w2"]) + layer["att.w0"]
    w = jnp.exp(jax.nn.sigmoid(w) * jnp.float32(-0.606531))

    k = mm(xk, layer["att.key.weight"])
    kk = l2_normalize((k * layer["att.k_k"]).reshape(*lead, h, s))
    ka = k * layer["att.k_a"]
    k = k + (a * ka - ka)

    v = mm(xv, layer["att.value.weight"])
    if is_first is None:
        if v_first is None:
            v_first = v
        else:
            v = v + (v_first - v) * jax.nn.sigmoid(
                mm(mm(xv, layer["att.v1"]), layer["att.v2"]) + layer["att.v0"]
            )
    else:
        v_mix = v + (v_first - v) * jax.nn.sigmoid(
            mm(mm(xv, layer["att.v1"]), layer["att.v2"]) + layer["att.v0"]
        )
        v_first = jnp.where(is_first, v, v_first)
        v = jnp.where(is_first, v, v_mix)

    rh = r.reshape(*lead, h, s)
    wh = w.reshape(*lead, h, s)
    kh = k.reshape(*lead, h, s)
    vh = v.reshape(*lead, h, s)
    ah = a.reshape(*lead, h, s)

    if trace:
        y, heads_all = wkv7_scan_trace(heads, rh, wh, kh, vh, -kk, kk * ah)
        heads = heads_all[-1]
    else:
        y, heads = (wkv_fn or wkv7_scan)(heads, rh, wh, kh, vh, -kk, kk * ah)
    xo = group_norm(
        y.reshape(*lead, c), layer["att.ln_x.weight"], layer["att.ln_x.bias"], h, eps=64e-5
    )
    bonus = (vh * jnp.sum(kh * rh * layer["att.r_k"], axis=-1, keepdims=True)).reshape(*lead, c)
    xo = (xo + bonus) * g
    out = mm(xo, layer["att.output.weight"])
    if trace:
        return out, new_xx, heads, v_first, (xl, heads_all)
    return out, new_xx, heads, v_first


# ---------------------------------------------------------------------------
# FFN blocks
# ---------------------------------------------------------------------------


def ffn_v4_v5(layer: Params, x, ffn_xx):
    """rwkv_ffn_v4_v5 (rwkv_graph.inc:484-511): relu^2 key with sigmoid
    receptance gate."""
    xl = layer_norm(x, layer["ln2.weight"], layer["ln2.bias"])
    x_prev, new_xx = _token_shift(xl, ffn_xx)
    xk = _mix(xl, x_prev, layer["ffn.time_mix_k"])
    xr = _mix(xl, x_prev, layer["ffn.time_mix_r"])
    r = jax.nn.sigmoid(mm(xr, layer["ffn.receptance.weight"]))
    k = jnp.square(jax.nn.relu(mm(xk, layer["ffn.key.weight"])))
    return r * mm(k, layer["ffn.value.weight"]), new_xx


def ffn_v6(layer: Params, x, ffn_xx):
    """rwkv_ffn_v6 (rwkv_graph.inc:513-531)."""
    xl = layer_norm(x, layer["ln2.weight"], layer["ln2.bias"])
    x_prev, new_xx = _token_shift(xl, ffn_xx)
    sx = x_prev - xl
    xk = sx * layer["ffn.time_maa_k"] + xl
    xr = sx * layer["ffn.time_maa_r"] + xl
    r = jax.nn.sigmoid(mm(xr, layer["ffn.receptance.weight"]))
    k = jnp.square(jax.nn.relu(mm(xk, layer["ffn.key.weight"])))
    return r * mm(k, layer["ffn.value.weight"]), new_xx


def ffn_v7(layer: Params, x, ffn_xx):
    """rwkv_ffn_v7 (rwkv_graph.inc:533-543): no receptance gate."""
    xl = layer_norm(x, layer["ln2.weight"], layer["ln2.bias"])
    x_prev, new_xx = _token_shift(xl, ffn_xx)
    sx = x_prev - xl
    xk = sx * layer["ffn.x_k"] + xl
    k = jnp.square(jax.nn.relu(mm(xk, layer["ffn.key.weight"])))
    return mm(k, layer["ffn.value.weight"]), new_xx


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    state: State,
    tokens: jnp.ndarray,
    cfg: ModelConfig,
    compute_logits: bool = True,
):
    """One forward pass over `tokens` [T] with recurrent `state`.

    Equivalent to the reference's serial graph for T=1 and sequential graph
    for T>1 (rwkv_graph.inc:611-720, :744-866). Returns (logits [n_vocab] or
    None, new state). Logits are for the LAST token only, as in the
    reference; `compute_logits=False` reproduces rwkv_eval's NULL-logits
    graph truncation (rwkv_eval.inc:25-35).
    """
    emb = params["emb"][tokens]
    x = layer_norm(emb.astype(jnp.float32), *params["ln0"])

    major = cfg.version_major
    v_first = None
    new_att_xx, new_ffn_xx = [], []
    new_heads, new_aa, new_bb, new_pp = [], [], [], []

    for i, layer in enumerate(params["blocks"]):
        if major == 7:
            dx, att_xx, heads, v_first = att_v7(
                layer, x, state["att_xx"][i], state["heads"][i], v_first, cfg
            )
            x = x + dx
            dx, ffn_xx = ffn_v7(layer, x, state["ffn_xx"][i])
            x = x + dx
            new_heads.append(heads)
        elif major == 6:
            dx, att_xx, heads = att_v6(layer, x, state["att_xx"][i], state["heads"][i], cfg)
            x = x + dx
            dx, ffn_xx = ffn_v6(layer, x, state["ffn_xx"][i])
            x = x + dx
            new_heads.append(heads)
        elif major == 5:
            dx, att_xx, heads = att_v5(layer, x, state["att_xx"][i], state["heads"][i], cfg)
            x = x + dx
            dx, ffn_xx = ffn_v4_v5(layer, x, state["ffn_xx"][i])
            x = x + dx
            new_heads.append(heads)
        else:
            dx, att_xx, aa, bb, pp = att_v4(
                layer, x, state["att_xx"][i], state["aa"][i], state["bb"][i], state["pp"][i]
            )
            x = x + dx
            dx, ffn_xx = ffn_v4_v5(layer, x, state["ffn_xx"][i])
            x = x + dx
            new_aa.append(aa)
            new_bb.append(bb)
            new_pp.append(pp)
        new_att_xx.append(att_xx)
        new_ffn_xx.append(ffn_xx)

    new_state: State = {
        "att_xx": jnp.stack(new_att_xx),
        "ffn_xx": jnp.stack(new_ffn_xx),
    }
    if major >= 5:
        new_state["heads"] = jnp.stack(new_heads)
    else:
        new_state["aa"] = jnp.stack(new_aa)
        new_state["bb"] = jnp.stack(new_bb)
        new_state["pp"] = jnp.stack(new_pp)

    logits = None
    if compute_logits:
        xo = layer_norm(x[-1], *params["ln_out"])
        logits = mm(xo[None, :], params["head"])[0]
    return logits, new_state
