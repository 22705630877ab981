"""Chunked (matmul-form) wkv prefill.

The sequential wkv recurrence is O(T) tiny steps — fine for decode, but on
TPU prefill it leaves the MXU idle. Because the wkv5/6 state update is
elementwise-linear in the state, a chunk of T_c tokens can be processed
with dense matmuls (the chunked linear-attention / GLA formulation):

  within a chunk, with per-step decays w_t (elementwise over the key dim)
  and W_t = prod_{tau<=t} w_tau:

    out_t = (r_t * tf * k_t).sum * v_t                      (diagonal bonus)
          + S_0 @ (r_t o W_{t-1})                           (state read)
          + sum_{tau<t} [ (r_t o W_{t-1}/W_tau) . k_tau ] v_tau   (intra-chunk)

    S_next = S_0 o W_last + sum_tau (k_tau o W_last/W_tau) v_tau^T

  The intra-chunk term is a masked [T_c, T_c] attention matrix per head —
  pure MXU work. Decay products are handled in log space with chunk-local
  normalization so every exponent that reaches a matmul is <= 0 (the read
  factors) or clamped (the strictly-increasing local factors), keeping f32
  finite even for extreme decays.

wkv7's generalized delta rule couples the state into its own update
(S' = S o w + v k^T + (S a) b^T), so the plain linear-attention chunking
does not apply. Its chunked form here works on the DE-DECAYED state
T_t = S_t o (1/W_t): within a chunk the self-coupling reduces to a unit
lower-triangular linear system over the chunk's `sa_t = S_{t-1} a_t`
vectors, solved with one batched triangular solve per chunk; everything
else is masked [P, P] attention matmuls. wkv7's decay is bounded
(w = exp(-0.6065*sigmoid(.)) in [0.545, 1]), so the 1/W ratio factors are
at most e^{0.607 P} — comfortably finite in f32 for P <= 32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chunk_body(s0, r, k, v, lw, tf):
    """One chunk. Shapes: r/k/v/lw [P, B, H, S]; s0 [B, H, S, S] (i=value
    dim, j=key dim); tf [H, S]. Returns (out [P, B, H, S], s_next)."""
    lcum = jnp.cumsum(lw, axis=0)          # inclusive log-decay products
    lcum_ex = lcum - lw                    # exclusive (through t-1)
    last = lcum[-1]                        # [B, H, S]

    q_state = r * jnp.exp(lcum_ex)         # <= |r|; reads S_0
    kappa = k * jnp.exp(last - lcum)       # factors <= 1

    # Intra-chunk attention with EXACT per-pair decay ratios. For causal
    # pairs (tau < t) the exponent lcum_ex[t] - lcum[tau] <= 0, so exp() is
    # unconditionally finite — no normalization point needed. Materializes
    # [P, P, B, H, S]; chunk sizes stay small (16) to bound it.
    p = r.shape[0]
    ldiff = jnp.minimum(lcum_ex[:, None] - lcum[None, :], 0.0)
    att = jnp.sum(r[:, None] * k[None, :] * jnp.exp(ldiff), axis=-1)  # [P,P,B,H]
    att = jnp.moveaxis(att, (0, 1), (2, 3))  # -> [B, H, t, u]
    mask = jnp.tril(jnp.ones((p, p), bool), k=-1)
    att = jnp.where(mask, att, 0.0)

    diag = jnp.sum(r * tf * k, axis=-1, keepdims=True)  # [P, B, H, 1]

    out = (
        jnp.einsum("bhtu,ubhi->tbhi", att, v)
        + diag * v
        + jnp.einsum("bhij,tbhj->tbhi", s0, q_state)
    )
    s_next = s0 * jnp.exp(last)[..., None, :] + jnp.einsum(
        "ubhj,ubhi->bhij", kappa, v
    )
    return out, s_next


def wkv6_chunked(s0, r, k, v, w, tf, chunk_size: int = 16):
    """Chunked wkv5/6. Shapes as wkv6_scan but time-major batched:
    r/k/v [T, B, H, S]; w [T, B, H, S] or [H, S] (static, v5);
    tf [H, S]; s0 [B, H, S, S]. T must be a multiple of chunk_size
    (callers pad or fall back to the scan)."""
    t = r.shape[0]
    if w.ndim == 2:
        w = jnp.broadcast_to(w, r.shape)
    # Guard against log(0) for extreme decays: w is exp(-exp(x)) > 0
    # mathematically but may underflow; floor keeps log finite.
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-38)))

    n_chunks = t // chunk_size

    def body(s, inp):
        rc, kc, vc, lwc = inp
        out, s = _chunk_body(s, rc, kc, vc, lwc, tf)
        return s, out

    def split(x):
        return x.reshape(n_chunks, chunk_size, *x.shape[1:])

    s, outs = jax.lax.scan(body, s0, (split(r), split(k), split(v), split(lw)))
    return outs.reshape(t, *r.shape[1:]), s


def wkv6_auto(s, r, k, v, w, tf, chunk_size: int = 16):
    """Dispatch: chunked matmul form when T is a chunk multiple and > 1,
    sequential scan otherwise. Accepts rank-3 ([T, H, S], single sequence)
    or rank-4 ([T, B, H, S]) operands like wkv6_scan. On TPU the chunk
    machinery runs as ONE Pallas kernel per call with the chunk state in
    VMEM (wkv6_chunked_pallas) — the XLA chunk path materializes a
    [P, P, B, H, S] HBM intermediate per chunk."""
    import jax as _jax

    from rwkv_tpu.models.graph import wkv6_scan

    t = r.shape[0]
    if t == 1 or t % chunk_size != 0:
        return wkv6_scan(s, r, k, v, w, tf)

    squeeze = r.ndim == 3
    if squeeze:
        r, k, v = r[:, None], k[:, None], v[:, None]
        if w.ndim == 3:
            w = w[:, None]
        s = s[None]
    t_len, bsz, h, s_dim = r.shape
    bh = bsz * h
    # VMEM footprint: state carry/in/out + ~2x-buffered chunk operands +
    # the [BH, P, P, S] pair intermediate (the dominant term).
    vmem_est = 4 * (
        bh * s_dim * s_dim * 3
        + bh * chunk_size * s_dim * 12
        + 2 * bh * chunk_size * chunk_size * s_dim
    )
    if (
        _jax.default_backend() == "tpu"
        and s_dim % 8 == 0
        and vmem_est < 60 * 2**20
    ):
        if w.ndim == 2:
            w4 = jnp.broadcast_to(w, r.shape)
        else:
            w4 = w

        def fold(x):
            return x.reshape(t_len, bh, s_dim)

        tf_f = jnp.broadcast_to(tf[None], (bsz, h, s_dim)).reshape(
            bh, s_dim
        )
        y, s2 = wkv6_chunked_pallas(
            s.reshape(bh, s_dim, s_dim),
            fold(r), fold(k), fold(v), fold(w4), tf_f,
            chunk_size,
        )
        y = y.reshape(t_len, bsz, h, s_dim)
        s2 = s2.reshape(bsz, h, s_dim, s_dim)
    else:
        y, s2 = wkv6_chunked(s, r, k, v, w, tf, chunk_size)
    if squeeze:
        return y[:, 0], s2[0]
    return y, s2


# ---------------------------------------------------------------------------
# wkv7 (generalized delta rule)
# ---------------------------------------------------------------------------


def _chunk_body7(s0, r, w, k, v, a, b, lw):
    """One wkv7 chunk. Shapes: r/w/k/v/a/b/lw [P, B, H, S]; s0 [B, H, S, S]
    (i = value dim, j = key dim). Returns (out [P, B, H, S], s_next).

    Derivation (per head, de-decayed state T_t = S_t o 1/W_t, W_t the
    elementwise cumulative decay within the chunk):
      T_t = T_0 + sum_{tau<=t} (sa_tau btil_tau^T + v_tau ktil_tau^T)
      sa_t = T_{t-1} atil_t,   atil = a o W_{t-1},
      btil = b o (1/W), ktil = k o (1/W), rhat = r o W
      => (I - B_strict) sa = T_0 atil + K_strict v   (unit lower triangular)
      out_t = T_0 rhat_t + sum_{tau<=t} [sa_tau (btil_tau . rhat_t)
                                         + v_tau (ktil_tau . rhat_t)]
    """
    from jax.scipy.linalg import solve_triangular

    p = r.shape[0]
    lcum = jnp.cumsum(lw, axis=0)
    lcum_ex = lcum - lw

    atil = a * jnp.exp(lcum_ex)
    btil = b * jnp.exp(-lcum)
    ktil = k * jnp.exp(-lcum)
    rhat = r * jnp.exp(lcum)

    strict = jnp.tril(jnp.ones((p, p), bool), k=-1)
    incl = jnp.tril(jnp.ones((p, p), bool))

    bmat = jnp.where(strict, jnp.einsum("tbhj,ubhj->bhtu", atil, btil), 0.0)
    kmat = jnp.where(strict, jnp.einsum("tbhj,ubhj->bhtu", atil, ktil), 0.0)

    rhs = jnp.einsum("bhij,tbhj->tbhi", s0, atil) + jnp.einsum(
        "bhtu,ubhi->tbhi", kmat, v
    )
    # Solve (I - B) sa = rhs, batched over (B, H); unit lower triangular.
    eye = jnp.eye(p)
    sa = solve_triangular(
        eye - bmat,                      # [B, H, P, P]
        jnp.moveaxis(rhs, 0, 2),         # [B, H, P, S]
        lower=True,
        unit_diagonal=True,
    )
    sa = jnp.moveaxis(sa, 2, 0)          # [P, B, H, S]

    br = jnp.where(incl, jnp.einsum("tbhj,ubhj->bhtu", rhat, btil), 0.0)
    kr = jnp.where(incl, jnp.einsum("tbhj,ubhj->bhtu", rhat, ktil), 0.0)
    out = (
        jnp.einsum("bhij,tbhj->tbhi", s0, rhat)
        + jnp.einsum("bhtu,ubhi->tbhi", br, sa)
        + jnp.einsum("bhtu,ubhi->tbhi", kr, v)
    )

    t_last = (
        s0
        + jnp.einsum("ubhi,ubhj->bhij", sa, btil)
        + jnp.einsum("ubhi,ubhj->bhij", v, ktil)
    )
    s_next = t_last * jnp.exp(lcum[-1])[..., None, :]
    return out, s_next


def wkv7_chunked(s0, r, w, k, v, a, b, chunk_size: int = 16):
    """Chunked wkv7. Shapes as wkv7_scan but time-major batched:
    r/w/k/v/a/b [T, B, H, S]; s0 [B, H, S, S]. T must be a multiple of
    chunk_size."""
    t = r.shape[0]
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
    n_chunks = t // chunk_size

    def split(x):
        return x.reshape(n_chunks, chunk_size, *x.shape[1:])

    def body(s, inp):
        rc, wc, kc, vc, ac, bc, lwc = inp
        out, s = _chunk_body7(s, rc, wc, kc, vc, ac, bc, lwc)
        return s, out

    s, outs = jax.lax.scan(
        body, s0, (split(r), split(w), split(k), split(v), split(a), split(b), split(lw))
    )
    return outs.reshape(t, *r.shape[1:]), s


def wkv7_auto(s, r, w, k, v, a, b, chunk_size: int = 16):
    """Dispatch: chunked form when T is a chunk multiple and > 1, scan
    otherwise. Accepts rank-3 ([T, H, S]) or rank-4 ([T, B, H, S]).
    On TPU with B=1 the chunk machinery runs as ONE Pallas kernel per call
    (a T=256 prefill otherwise spends most of its time on ~10 tiny XLA ops
    per chunk per layer)."""
    import jax as _jax

    from rwkv_tpu.models.graph import wkv7_scan

    t = r.shape[0]
    if chunk_size == 16 and t >= 1024 and t % 32 == 0:
        # long-prefill heuristic: P=32 with the grouped kernel measured
        # 39.0% vs 35.5% MFU at 1.5B T=2048 on chip (fewer, larger
        # chunk operators; decay ratios stay finite for P <= 32 — see
        # module header)
        chunk_size = 32
    if t == 1 or t % chunk_size != 0:
        return wkv7_scan(s, r, w, k, v, a, b)

    squeeze = r.ndim == 3
    if squeeze:
        r, w, k, v, a, b = (x[:, None] for x in (r, w, k, v, a, b))
        s = s[None]
    t_len, bsz, h, s_dim = r.shape
    # VMEM footprint of the kernel: carry state + 4 scratches + ~2x-buffered
    # chunk operands, all with the (B*H) fold as the batch dim.
    bh = bsz * h
    vmem_est = 4 * (
        bh * s_dim * s_dim * 2          # state scratch + state in/out block
        + bh * chunk_size * s_dim * 13  # 5 operands x2 (dbl buf) + sa/rhs/out
        + bh * chunk_size * chunk_size
    )
    if (
        _jax.default_backend() == "tpu"
        and s_dim % 8 == 0
        and vmem_est < 60 * 2**20
    ):
        def fold(x):
            return x.reshape(t_len, bh, s_dim)

        y, s2 = wkv7_chunked_pallas(
            s.reshape(bh, s_dim, s_dim),
            fold(r), fold(w), fold(k), fold(v), fold(a), fold(b),
            chunk_size,
        )
        y = y.reshape(t_len, bsz, h, s_dim)
        s2 = s2.reshape(bsz, h, s_dim, s_dim)
    else:
        y, s2 = wkv7_chunked(s, r, w, k, v, a, b, chunk_size)
    if squeeze:
        return y[:, 0], s2[0]
    return y, s2


# ---------------------------------------------------------------------------
# Pallas wkv7 chunk kernel (B=1): all chunks of a layer in one kernel
# ---------------------------------------------------------------------------


def _wkv7_chunk_kernel(p, s_dim, h, n_chunks):
    """Kernel body factory. Grid (n_chunks,), sequential: ONE grid step per
    chunk processes ALL heads with batched dot_generals (batch dim H); the
    chunk carry lives in a per-head VMEM scratch. One-grid-step-per-(head,
    chunk) was measurably SLOWER than XLA — the TPU has one core, so a
    "parallel" head grid dim just serializes tiny ops.

    Per chunk, with the de-decayed factors precomputed outside
    (atil/btil/ktil/rhat [H, P, S]) and state Tmat [H, S_i, S_j]:
      bmat = strict(atil btil^T); kmat = strict(atil ktil^T)
      rhs  = atil . Tmat(j) + kmat v
      (I - bmat) sa = rhs        (unit lower triangular, forward subst.)
      out  = rhat . Tmat(j) + incl(rhat btil^T) sa + incl(rhat ktil^T) v
      Tmat += sa^T btil + v^T ktil;   state_out = Tmat o exp_last (over j)
    """
    import jax as _jax
    import jax.numpy as _jnp
    from jax.experimental import pallas as pl

    def bdot(x, y, cx, cy):
        # batched over H (dim 0 of both): contract x dim cx with y dim cy
        return _jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=_jnp.float32,
        )

    def kernel(atil_ref, btil_ref, ktil_ref, rhat_ref, v_ref, elast_ref,
               s0_ref, out_ref, snext_ref, t_s):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            t_s[:] = s0_ref[:]

        atil = atil_ref[0]   # block (1, H, P, S) -> [H, P, S]
        btil = btil_ref[0]
        ktil = ktil_ref[0]
        rhat = rhat_ref[0]
        v = v_ref[0]

        ti = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 0)
        ui = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 1)
        strict = (ui < ti).astype(_jnp.float32)[None]
        incl = (ui <= ti).astype(_jnp.float32)[None]

        tmat = t_s[:]                                  # [H, S_i, S_j]
        bmat = bdot(atil, btil, 2, 2) * strict         # [H, P, P]
        kmat = bdot(atil, ktil, 2, 2) * strict
        rhs = bdot(atil, tmat, 2, 2) + bdot(kmat, v, 2, 1)  # [H, P, S_i]

        # sa = (I - bmat)^{-1} rhs. bmat is STRICTLY lower triangular, so
        # it is nilpotent (B^p = 0) and the inverse is the finite Neumann
        # product (I+B)(I+B^2)(I+B^4)... — ceil(log2 p) squarings + as
        # many products, ALL batched [H, P, P] matmuls. The previous
        # p-step serial forward substitution (16 ref-sliced matvecs per
        # chunk x 128 chunks x L layers) dominated whole-model prefill:
        # 59% of 1.5B T=2048 wall time for ~1% of its FLOPs.
        eye = (ui == ti).astype(_jnp.float32)[None]
        inv = eye + bmat
        bpow = bmat
        levels = max((p - 1).bit_length() - 1, 0)
        for _lv in range(levels):
            bpow = bdot(bpow, bpow, 2, 1)
            inv = bdot(inv, eye + bpow, 2, 1)
        sa = bdot(inv, rhs, 2, 1)

        br = bdot(rhat, btil, 2, 2) * incl
        kr = bdot(rhat, ktil, 2, 2) * incl
        out = bdot(rhat, tmat, 2, 2) + bdot(br, sa, 2, 1) + bdot(kr, v, 2, 1)
        out_ref[0] = out

        tmat = tmat + bdot(sa, btil, 1, 1) + bdot(v, ktil, 1, 1)
        t_s[:] = tmat * elast_ref[0]                   # [H, 1, S_j] bcast

        @pl.when(c == n_chunks - 1)
        def _():
            snext_ref[:] = t_s[:]

    return kernel


def wkv7_chunked_pallas(s0, r, w, k, v, a, b, chunk_size: int = 16,
                        interpret: bool = False, ablate: str = "",
                        natural: bool = True):
    """Single-sequence chunked wkv7 as ONE pallas_call. Shapes: r/w/k/v/a/b
    [T, H, S]; s0 [H, S, S] (i=value, j=key). Same math as wkv7_chunked.

    The kernel runs the two-pass (grouped) form: CG chunks per grid
    step, all chunk-local operators computed batched over CG*H in VMEM
    — including the de-decay factors (a~, b~, k~, r^); only the
    zero-math [T, H, S] -> [NC, H, P, S] operand transposes and the
    log-decay cumsum stay outside. (Measured equal to XLA-side factor
    prep at 1.5B T=2048 — XLA fuses the factor math into the operand
    copies — but with 4 fewer HBM-resident intermediates; the
    --preponly ablation overstates prep because forcing the factors
    live defeats that fusion.)"""
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, h, s_dim = r.shape
    p = chunk_size
    nc = t // p

    # log-decay + in-chunk cumulative sum (2 cheap fused XLA passes);
    # everything derived from them moves into the kernel
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
    lcum = jnp.cumsum(lw.reshape(nc, p, h, s_dim), axis=1)

    if natural:
        # operands ship in the NATURAL token-major layout ([NC, P, H, S]
        # is a zero-copy reshape of [T, H, S]); the (P, H) swap happens
        # in VMEM inside the kernel. The XLA-side swapaxes alternative
        # materializes ~235 MB/layer of HBM copies — measured as ~60%
        # of the whole wkv block at 1.5B T=2048.
        def to_nhps(x):
            return x.reshape(nc, p, h, s_dim)
    else:
        def to_nhps(x):
            return jnp.swapaxes(x.reshape(nc, p, h, s_dim), 1, 2)

    ops = [to_nhps(x) for x in (a, b, k, r, v)]
    lcum_t = to_nhps(lcum.reshape(t, h, s_dim))
    lw_t = to_nhps(lw)

    # chunk GROUPS: cg chunks per grid step (pass-A operators batched
    # over cg*h, pass-B two dots per chunk) — a one-chunk-per-step
    # kernel costs ~9.5 us of serial dependency chain per chunk. cg is
    # bounded by scoped VMEM: 7 operand blocks + out + state (~9 blocks
    # live; "arbitrary" grid semantics — no double buffering) plus the
    # batched pass-A operators (verified against the compiler's
    # scoped-vmem report at P=32).
    cg = 1
    for cand in (8, 4, 2):
        if nc % cand:
            continue
        blk = cand * h * p * s_dim * 4
        pass_a = cand * h * 4 * (7 * p * p + 4 * p * s_dim
                                 + 4 * s_dim * s_dim)
        # x2: double-buffered inputs + the in-kernel elementwise temps
        # (de-decay factors) roughly double the analytic lower bound
        # (calibrated against the compiler's scoped-vmem report: P=32
        # cg=8 reports 104.8M vs the 98M estimate here)
        if 2 * (9 * blk + pass_a) <= 90 * 2**20:
            cg = cand
            break
    n_groups = nc // cg

    def opspec():
        blk = (cg, p, h, s_dim) if natural else (cg, h, p, s_dim)
        return pl.BlockSpec(
            blk, lambda cc: (cc, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = _wkv7_chunk_kernel_grouped(p, s_dim, h, n_groups, cg,
                                        ablate=ablate, natural=natural)
    out, s_next = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[opspec() for _ in range(7)]
        + [pl.BlockSpec((h, s_dim, s_dim), lambda cc: (0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((cg, h, p, s_dim), lambda cc: (cc, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, s_dim, s_dim), lambda cc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc, h, p, s_dim), jnp.float32),
            jax.ShapeDtypeStruct((h, s_dim, s_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, s_dim, s_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(
        *[x.astype(jnp.float32) for x in ops],
        lcum_t.astype(jnp.float32), lw_t.astype(jnp.float32),
        s0.astype(jnp.float32),
    )
    # [NC, H, P, S] -> [T, H, S]
    out = jnp.swapaxes(out, 1, 2).reshape(t, h, s_dim)
    return out, s_next


def _wkv7_chunk_kernel_grouped(p, s_dim, h, n_groups, cg, ablate: str = "",
                               natural: bool = False):
    """Grouped two-pass kernel body: each grid step loads CG chunks of
    RAW operands + the log-decay cumsum, derives the de-decay factors
    in VMEM, computes every chunk-local operator BATCHED over (CG*H)
    (pass A: bmat/kmat, Neumann inverse, and the affine state
    operators A/B/E/Y — see wkv7_chunked_twopass for the algebra),
    then runs the CG sequential state updates at TWO batched dots each
    (pass B). vs a one-chunk-per-step kernel this cuts grid steps
    CG-fold and shrinks the serial chain to 2 ops per chunk; vs an
    XLA two-pass it keeps every operator out of HBM."""
    import jax as _jax
    import jax.numpy as _jnp
    from jax.experimental import pallas as pl

    def bdot(x, y, cx, cy):
        return _jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=_jnp.float32,
        )

    def kernel(a_ref, b_ref, k_ref, r_ref, v_ref, lcum_ref, lw_ref,
               s0_ref, out_ref, snext_ref, t_s):
        gi = pl.program_id(0)

        @pl.when(gi == 0)
        def _():
            t_s[:] = s0_ref[:]

        if natural:
            def fold(ref):
                # block (cg, p, h, s) -> [cg*h, p, s]: the (p, h) swap
                # runs on VMEM-resident data (VPU shuffles) instead of
                # as an HBM relayout feeding the kernel
                x = ref[...]
                return _jnp.transpose(x, (0, 2, 1, 3)).reshape(
                    cg * h, p, s_dim)
        else:
            def fold(ref):
                return ref[...].reshape(cg * h, p, s_dim)

        lcum = fold(lcum_ref)
        lw = fold(lw_ref)
        e_neg = _jnp.exp(-lcum)
        e_pos = _jnp.exp(lcum)
        atil = fold(a_ref) * _jnp.exp(lcum - lw)
        btil = fold(b_ref) * e_neg
        ktil = fold(k_ref) * e_neg
        rhat = fold(r_ref) * e_pos
        v = fold(v_ref)
        elast = e_pos[:, p - 1 : p, :]               # [CGH, 1, S]

        ti = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 0)
        ui = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 1)
        strict = (ui < ti).astype(_jnp.float32)[None]
        incl = (ui <= ti).astype(_jnp.float32)[None]
        eyep = (ui == ti).astype(_jnp.float32)[None]
        si = _jax.lax.broadcasted_iota(_jnp.int32, (s_dim, s_dim), 0)
        sj = _jax.lax.broadcasted_iota(_jnp.int32, (s_dim, s_dim), 1)
        eyes = (si == sj).astype(_jnp.float32)[None]

        if ablate == "nopassa":
            # timing ablation (WRONG math): chunk-local operators are
            # constants — isolates pass B + factor prep
            z = _jnp.zeros((cg * h, p, s_dim), _jnp.float32)
            e_op, y_op = rhat, z
            a_op = _jnp.broadcast_to(eyes, (cg * h, s_dim, s_dim))
            b_op = _jnp.zeros((cg * h, s_dim, s_dim), _jnp.float32)
        elif ablate == "nofactors":
            # timing ablation (WRONG math): skip the de-decay exps
            atil2, btil2, ktil2, rhat2 = (fold(a_ref), fold(b_ref),
                                          fold(k_ref), fold(r_ref))
            e_op, y_op, a_op, b_op = _passa(
                atil2, btil2, ktil2, rhat2, v, elast)
        else:
            e_op, y_op, a_op, b_op = _passa(
                atil, btil, ktil, rhat, v, elast)

        def g4(x, c, rows):
            return x.reshape(cg, h, rows, x.shape[-1])[c]

        tmat = t_s[:]
        for c in range(cg):
            out_ref[c] = bdot(g4(e_op, c, p), tmat, 2, 2) \
                + g4(y_op, c, p)
            tmat = bdot(tmat, g4(a_op, c, s_dim), 2, 1) \
                + g4(b_op, c, s_dim)
        t_s[:] = tmat

        @pl.when(gi == n_groups - 1)
        def _():
            snext_ref[:] = t_s[:]

    def _passa(atil, btil, ktil, rhat, v, elast):
        ti = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 0)
        ui = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 1)
        strict = (ui < ti).astype(_jnp.float32)[None]
        incl = (ui <= ti).astype(_jnp.float32)[None]
        eyep = (ui == ti).astype(_jnp.float32)[None]
        si = _jax.lax.broadcasted_iota(_jnp.int32, (s_dim, s_dim), 0)
        sj = _jax.lax.broadcasted_iota(_jnp.int32, (s_dim, s_dim), 1)
        eyes = (si == sj).astype(_jnp.float32)[None]
        bmat = bdot(atil, btil, 2, 2) * strict       # [CGH, P, P]
        kmat = bdot(atil, ktil, 2, 2) * strict
        inv = eyep + bmat
        bpow = bmat
        for _lv in range(max((p - 1).bit_length() - 1, 0)):
            bpow = bdot(bpow, bpow, 2, 1)
            inv = bdot(inv, eyep + bpow, 2, 1)

        br = bdot(rhat, btil, 2, 2) * incl
        kr = bdot(rhat, ktil, 2, 2) * incl
        g_op = bdot(br, inv, 2, 1)
        e_op = rhat + bdot(g_op, atil, 2, 1)         # [CGH, P, S_j]
        y_op = bdot(bdot(g_op, kmat, 2, 1) + kr, v, 2, 1)
        f_op = bdot(inv, atil, 2, 1)
        m_op = bdot(f_op, btil, 1, 1)                # [CGH, S_j, S_j']
        s_loc = bdot(inv, bdot(kmat, v, 2, 1), 2, 1)
        r_op = bdot(s_loc, btil, 1, 1) + bdot(v, ktil, 1, 1)
        a_op = (eyes + m_op) * elast
        b_op = r_op * elast
        return e_op, y_op, a_op, b_op

    return kernel


def wkv7_chunked_twopass(s0, r, w, k, v, a, b, chunk_size: int = 16):
    """Chunked wkv7 in the delta-rule TWO-PASS form. Shapes as
    wkv7_chunked_pallas: r/w/k/v/a/b [T, H, S]; s0 [H, S_i, S_j].

    The sequential-grid Pallas kernel costs ~9.5 us per chunk step
    (a ~15-op dependency chain of tiny per-head dots), which at T=2048
    dominated whole-model prefill (scripts/probe_wkv7_prefill.py:
    1.22 ms/layer). The recurrence is AFFINE in the chunk state:

        tmat_{c+1} = tmat_c @ A_c + B_c
        out_c      = E_c (.) tmat_c + Y_c

    so pass 1 computes all chunk-local operators (bmat/kmat, the
    Neumann inverse, and A/B/E/Y) BATCHED over every chunk at once —
    large MXU-friendly dot_generals, fully parallel — and pass 2 is a
    lax.scan whose body is just TWO batched matmuls per chunk. Same
    math as the kernel, reassociated."""
    t, h, s_dim = r.shape
    p = chunk_size
    nc = t // p

    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-30)))
    lw_c = lw.reshape(nc, p, h, s_dim)
    lcum = jnp.cumsum(lw_c, axis=1)
    lcum_ex = lcum - lw_c

    def prep(x, scale):
        # [T, H, S] -> [NC, H, P, S]
        return jnp.swapaxes((x.reshape(nc, p, h, s_dim) * scale), 1, 2)

    atil = prep(a, jnp.exp(lcum_ex))
    btil = prep(b, jnp.exp(-lcum))
    ktil = prep(k, jnp.exp(-lcum))
    rhat = prep(r, jnp.exp(lcum))
    v_op = prep(v, 1.0)
    elast = jnp.exp(lcum[:, -1])                     # [NC, H, S_j]

    def cdot(x, y, cx, cy):
        return jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32,
        )

    ti = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    ui = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    strict = (ui < ti).astype(jnp.float32)
    incl = (ui <= ti).astype(jnp.float32)
    eyep = (ui == ti).astype(jnp.float32)

    bmat = cdot(atil, btil, 3, 3) * strict           # [NC, H, P, P]
    kmat = cdot(atil, ktil, 3, 3) * strict
    # (I - bmat)^{-1}: finite Neumann product (bmat strictly lower)
    inv = eyep + bmat
    bpow = bmat
    for _lv in range(max((p - 1).bit_length() - 1, 0)):
        bpow = cdot(bpow, bpow, 3, 2)
        inv = cdot(inv, eyep + bpow, 3, 2)

    br = cdot(rhat, btil, 3, 3) * incl
    kr = cdot(rhat, ktil, 3, 3) * incl
    g_op = cdot(br, inv, 3, 2)                       # [NC, H, P, P]
    e_op = rhat + cdot(g_op, atil, 3, 2)             # [NC, H, P, S_j]
    y_loc = cdot(cdot(g_op, kmat, 3, 2) + kr, v_op, 3, 2)  # [.., P, S_i]
    f_op = cdot(inv, atil, 3, 2)                     # [NC, H, P, S_j]
    m_op = cdot(f_op, btil, 2, 2)                    # [NC, H, S_j, S_j']
    s_loc = cdot(inv, cdot(kmat, v_op, 3, 2), 3, 2)  # [NC, H, P, S_i]
    r_op = cdot(s_loc, btil, 2, 2) + cdot(v_op, ktil, 2, 2)  # [S_i, S_j]
    eyes = jnp.eye(s_dim, dtype=jnp.float32)
    a_op = (eyes[None, None] + m_op) * elast[:, :, None, :]
    b_op = r_op * elast[:, :, None, :]

    def hdot(x, y, cx, cy):
        return jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    def step(tmat, inp):
        a_c, b_c, e_c, y_c = inp
        out = hdot(e_c, tmat, 2, 2) + y_c            # [H, P, S_i]
        tmat = hdot(tmat, a_c, 2, 1) + b_c           # [H, S_i, S_j]
        return tmat, out

    s_next, outs = jax.lax.scan(step, s0.astype(jnp.float32),
                                (a_op, b_op, e_op, y_loc))
    out = jnp.swapaxes(outs, 1, 2).reshape(t, h, s_dim)
    return out, s_next


# ---------------------------------------------------------------------------
# Pallas wkv6 chunk kernel (B=1): all chunks of a layer in one kernel
# ---------------------------------------------------------------------------


def _wkv6_chunk_kernel(p, s_dim, h, n_chunks):
    """Kernel body factory for wkv6 (grid (n_chunks,), sequential; chunk
    state resident in a VMEM scratch — same architecture as the wkv7
    kernel above, without the triangular solve).

    wkv6's decay is UNBOUNDED (w = exp(-exp(.)) can underflow to 0), so
    the intra-chunk attention cannot use the wkv7 kernel's factorized
    r-hat/k-tilde form (exp(-lcum) overflows f32). Instead the exact
    per-pair log-space ratios are materialized as an [H, P, P, S] VMEM
    intermediate (the thing the XLA chunk path materializes in HBM —
    rwkv_operators_wkv_v7.inc-era reference keeps no such analogue; cf.
    _chunk_body above) and reduced over S on the VPU: every exponent
    reaching exp() is clamped <= 0, so the kernel is finite for ANY
    decay. The state-read factor rq = r*exp(lcum_ex) and the state-write
    factor kap = k*exp(llast - lcum) are <= |r|, |k| by construction."""
    import jax as _jax
    import jax.numpy as _jnp
    from jax.experimental import pallas as pl

    def bdot(x, y, cx, cy):
        return _jax.lax.dot_general(
            x, y, (((cx,), (cy,)), ((0,), (0,))),
            preferred_element_type=_jnp.float32,
        )

    def kernel(r_ref, k_ref, v_ref, lcum_ref, lw_ref, tf_ref,
               s0_ref, out_ref, snext_ref, t_s):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            t_s[:] = s0_ref[:]

        def fold(ref):
            # natural block (1, P, H, S) -> [H, P, S]: the (P, H) swap
            # runs on VMEM-resident data
            return _jnp.transpose(ref[0], (1, 0, 2))

        r = fold(r_ref)
        k = fold(k_ref)
        v = fold(v_ref)
        lcum = fold(lcum_ref)
        lw = fold(lw_ref)
        lcex = lcum - lw
        llast = lcum[:, p - 1 : p, :]  # [H, 1, S]
        tf = tf_ref[:]                 # [H, 1, S]

        rq = r * _jnp.exp(lcex)
        kap = k * _jnp.exp(llast - lcum)
        elast = _jnp.exp(llast)

        ti = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 0)
        ui = _jax.lax.broadcasted_iota(_jnp.int32, (p, p), 1)
        strict = (ui < ti).astype(_jnp.float32)[None]

        # exact causal pair ratios: exponent <= 0 for tau < t, clamped
        # for the (masked-out) rest
        ldiff = _jnp.minimum(
            lcex[:, :, None, :] - lcum[:, None, :, :], 0.0
        )                                              # [H, P, P, S]
        pair = r[:, :, None, :] * k[:, None, :, :] * _jnp.exp(ldiff)
        att = _jnp.sum(pair, axis=-1) * strict         # [H, P, P]

        diag = _jnp.sum(r * tf * k, axis=-1, keepdims=True)  # [H, P, 1]

        tmat = t_s[:]                                  # [H, S_i, S_j]
        out = bdot(att, v, 2, 1) + diag * v + bdot(rq, tmat, 2, 2)
        out_ref[0] = out

        t_s[:] = tmat * elast + bdot(v, kap, 1, 1)

        @pl.when(c == n_chunks - 1)
        def _():
            snext_ref[:] = t_s[:]

    return kernel


def wkv6_chunked_pallas(s0, r, k, v, w, tf, chunk_size: int = 16,
                        interpret: bool = False):
    """Single-sequence chunked wkv5/6 as ONE pallas_call. Shapes: r/k/v/w
    [T, H, S] (w may be [H, S] — static v5 decay); tf [H, S]; s0
    [H, S_i, S_j]. Same math as wkv6_chunked with the per-chunk pipeline
    on-chip and NO [P, P, ..., S] HBM intermediate."""
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, h, s_dim = r.shape
    p = chunk_size
    nc = t // p

    if w.ndim == 2:
        w = jnp.broadcast_to(w, r.shape)
    lw = jnp.log(jnp.maximum(w, jnp.float32(1e-38)))
    lcum = jnp.cumsum(lw.reshape(nc, p, h, s_dim), axis=1)

    # operands ship in the NATURAL token-major layout (zero-copy
    # reshapes); the (P, H) swap and the lcum_ex/llast derivations run
    # in VMEM inside the kernel — the XLA-side swapaxes alternative
    # materializes ~5 HBM relayout copies per layer (the wkv7 kernel's
    # measured dominant cost before the same change).
    def nat(x):
        return x.reshape(nc, p, h, s_dim)

    r_op, k_op, v_op = nat(r), nat(k), nat(v)
    lcum_op = lcum
    lw_op = nat(lw)
    tf_op = tf[:, None, :]                          # [H, 1, S]

    def opspec():
        return pl.BlockSpec(
            (1, p, h, s_dim), lambda cc: (cc, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    kernel = _wkv6_chunk_kernel(p, s_dim, h, nc)
    out, s_next = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[opspec() for _ in range(5)]
        + [pl.BlockSpec((h, 1, s_dim), lambda cc: (0, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((h, s_dim, s_dim), lambda cc: (0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, h, p, s_dim), lambda cc: (cc, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, s_dim, s_dim), lambda cc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc, h, p, s_dim), jnp.float32),
            jax.ShapeDtypeStruct((h, s_dim, s_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, s_dim, s_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(
        r_op.astype(jnp.float32), k_op.astype(jnp.float32),
        v_op.astype(jnp.float32),
        lcum_op.astype(jnp.float32), lw_op.astype(jnp.float32),
        tf_op.astype(jnp.float32),
        s0.astype(jnp.float32),
    )
    out = jnp.swapaxes(out, 1, 2).reshape(t, h, s_dim)
    return out, s_next


# ---------------------------------------------------------------------------
# wkv4: parallel prefill via associative scan
# ---------------------------------------------------------------------------


def wkv4_parallel(tf, td, k, v, aa, bb, pp):
    """wkv4 with the time recurrence parallelized by associative scan
    (O(log T) depth instead of T sequential steps — the v4 analogue of
    the chunked matmul wkv for v5-v7).

    Same signature/semantics as graph.wkv4_scan (rwkv_graph.inc:119-161):
    k/v [T, C] (or [T, B, C]); tf/td [C]; aa/bb/pp the incoming scalar
    state. Math: the running numerator/denominator pair with max-trick
    normalizer is a monoid over (P, A, B, n):
      segment value = (A e^P, B e^P), decayed td per covered step;
      combine(s1, s2): shift s1 by n2*td, renormalize at max(P1', P2).
    The per-position output mixes the EXCLUSIVE prefix state with the
    (tf + k_t, v_t) bonus term exactly as the serial step does."""
    t = k.shape[0]
    lead_td = td
    lead_tf = tf

    # element monoid values: one token covers 1 step: P=k_t, A=v_t, B=1
    P0 = k
    A0 = v
    B0 = jnp.ones_like(k)
    n0 = jnp.ones_like(k)

    def combine(s1, s2):
        P1, A1, B1, n1 = s1
        P2, A2, B2, n2 = s2
        P1s = P1 + n2 * lead_td
        P = jnp.maximum(P1s, P2)
        e1 = jnp.exp(P1s - P)
        e2 = jnp.exp(P2 - P)
        return (P, e1 * A1 + e2 * A2, e1 * B1 + e2 * B2, n1 + n2)

    Pc, Ac, Bc, _ = jax.lax.associative_scan(combine, (P0, A0, B0, n0))

    # fold the incoming state in front: state covers "minus infinity"
    # history already decayed to position -1; before position t it decays
    # t more steps
    steps = jnp.arange(t, dtype=k.dtype).reshape((t,) + (1,) * (k.ndim - 1))
    pp_t = pp + steps * lead_td  # state normalizer before each position

    # exclusive prefix: position t consumes scan[t-1] AS IS — the serial
    # loop applies decay inside the NEXT state update, not between the
    # state and the output (rwkv_graph.inc:119-161 order)
    Pe = jnp.concatenate([jnp.full_like(Pc[:1], -1e38), Pc[:-1]])
    Ae = jnp.concatenate([jnp.zeros_like(Ac[:1]), Ac[:-1]])
    Be = jnp.concatenate([jnp.zeros_like(Bc[:1]), Bc[:-1]])

    # total prefix state at t = init-state (pp_t, aa, bb) ++ Pe
    Pm = jnp.maximum(pp_t, Pe)
    eS = jnp.exp(pp_t - Pm)
    eP = jnp.exp(Pe - Pm)
    At = eS * aa + eP * Ae
    Bt = eS * bb + eP * Be

    # output at t: combine with the (tf + k_t, v_t) bonus
    ww = lead_tf + k
    qq = jnp.maximum(Pm, ww)
    e1 = jnp.exp(Pm - qq)
    e2 = jnp.exp(ww - qq)
    wkv = (e1 * At + e2 * v) / (e1 * Bt + e2)

    # final state: full-T scan result combined with the decayed init
    # (after T serial steps the init has decayed T times)
    pp_T = pp + t * lead_td
    P_all = jnp.maximum(pp_T, Pc[-1])
    eS2 = jnp.exp(pp_T - P_all)
    eP2 = jnp.exp(Pc[-1] - P_all)
    aa_out = eS2 * aa + eP2 * Ac[-1]
    bb_out = eS2 * bb + eP2 * Bc[-1]
    return wkv, aa_out, bb_out, P_all


def wkv4_auto(tf, td, k, v, aa, bb, pp):
    """Dispatch: associative-scan form for T > 1, serial step otherwise."""
    from rwkv_tpu.models.graph import wkv4_scan

    if k.shape[0] == 1:
        return wkv4_scan(tf, td, k, v, aa, bb, pp)
    return wkv4_parallel(tf, td, k, v, aa, bb, pp)
