"""Chunked wkv prefill: the matmul formulation must match the sequential
scan, and serving prefill using it must match the parity engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import require_fixture


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32) * scale
    )


@pytest.mark.parametrize("t,chunk", [(16, 16), (32, 16), (64, 32)])
@pytest.mark.parametrize("static_w", [False, True])
def test_chunked_matches_scan(t, chunk, static_w):
    from rwkv_tpu.models.graph import wkv6_scan
    from rwkv_tpu.ops.chunked import wkv6_chunked

    b, h, s = 2, 3, 8
    r = _rand((t, b, h, s), 0, 0.5)
    k = _rand((t, b, h, s), 1, 0.5)
    v = _rand((t, b, h, s), 2, 0.5)
    tf = _rand((h, s), 3, 0.3)
    s0 = _rand((b, h, s, s), 4, 0.2)
    if static_w:
        w = jnp.exp(-jnp.exp(_rand((h, s), 5, 0.5)))
    else:
        w = jnp.exp(-jnp.exp(_rand((t, b, h, s), 5, 0.5)))

    y_ref, s_ref = wkv6_scan(s0, r, k, v, w, tf)
    y_chk, s_chk = wkv6_chunked(s0, r, k, v, w, tf, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=2e-4, atol=2e-5)


def test_chunked_extreme_decay_stable():
    """Very strong decay (w underflow territory) must not produce NaN/inf."""
    from rwkv_tpu.ops.chunked import wkv6_chunked

    t, b, h, s = 32, 1, 2, 4
    r = _rand((t, b, h, s), 0)
    k = _rand((t, b, h, s), 1)
    v = _rand((t, b, h, s), 2)
    tf = _rand((h, s), 3)
    s0 = _rand((b, h, s, s), 4)
    w = jnp.full((t, b, h, s), 1e-30, jnp.float32)  # near-total forgetting
    y, s_next = wkv6_chunked(s0, r, k, v, w, tf, chunk_size=16)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(s_next)).all()


def test_auto_dispatch_rank3():
    from rwkv_tpu.models.graph import wkv6_scan
    from rwkv_tpu.ops.chunked import wkv6_auto

    t, h, s = 32, 2, 8
    r = _rand((t, h, s), 0, 0.5)
    k = _rand((t, h, s), 1, 0.5)
    v = _rand((t, h, s), 2, 0.5)
    tf = _rand((h, s), 3, 0.3)
    w = jnp.exp(-jnp.exp(_rand((t, h, s), 5, 0.5)))
    s0 = _rand((h, s, s), 4, 0.2)
    y_ref, s_ref = wkv6_scan(s0, r, k, v, w, tf)
    y, s_out = wkv6_auto(s0, r, k, v, w, tf)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s_ref), rtol=2e-4, atol=2e-5)
    # Non-multiple T falls back to the scan exactly.
    y2, _ = wkv6_auto(s0, r[:30], k[:30], v[:30], w[:30], tf)
    y2_ref, _ = wkv6_scan(s0, r[:30], k[:30], v[:30], w[:30], tf)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y2_ref))


@pytest.mark.parametrize("t,chunk", [(16, 16), (32, 16), (64, 32)])
def test_wkv7_chunked_matches_scan(t, chunk):
    from rwkv_tpu.models.graph import wkv7_scan
    from rwkv_tpu.ops.chunked import wkv7_chunked
    from rwkv_tpu.ops.parity import l2_normalize

    b, h, s = 2, 3, 8
    r = _rand((t, b, h, s), 0, 0.5)
    k = _rand((t, b, h, s), 1, 0.5)
    v = _rand((t, b, h, s), 2, 0.5)
    # realistic v7 operands: bounded decay, a = -l2norm(kk), b = kk*gate
    import jax

    w = jnp.exp(jax.nn.sigmoid(_rand((t, b, h, s), 5)) * jnp.float32(-0.606531))
    kk = l2_normalize(_rand((t, b, h, s), 6))
    gate = jax.nn.sigmoid(_rand((t, b, h, s), 7))
    a = -kk
    bb = kk * gate
    s0 = _rand((b, h, s, s), 4, 0.2)

    y_ref, s_ref = wkv7_scan(s0, r, w, k, v, a, bb)
    y_chk, s_chk = wkv7_chunked(s0, r, w, k, v, a, bb, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref), rtol=3e-4, atol=3e-5)


def test_wkv7_auto_rank3_and_fallback():
    from rwkv_tpu.models.graph import wkv7_scan
    from rwkv_tpu.ops.chunked import wkv7_auto

    t, h, s = 32, 2, 8
    ops = [_rand((t, h, s), i, 0.4) for i in range(6)]
    r, w_raw, k, v, a, b = ops
    w = jnp.exp(-jnp.abs(w_raw) * 0.5)
    s0 = _rand((h, s, s), 9, 0.2)
    y_ref, s_ref = wkv7_scan(s0, r, w, k, v, a, b)
    y, s_out = wkv7_auto(s0, r, w, k, v, a, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(s_out), np.asarray(s_ref), rtol=3e-4, atol=3e-5)
    # non-multiple falls back exactly
    y2, _ = wkv7_auto(s0, r[:30], w[:30], k[:30], v[:30], a[:30], b[:30])
    y2_ref, _ = wkv7_scan(s0, r[:30], w[:30], k[:30], v[:30], a[:30], b[:30])
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y2_ref))


def test_wkv7_pallas_chunk_kernel_matches_chunked():
    """The single-pallas_call chunk pipeline (state resident in VMEM,
    interpret mode here; natively validated by scripts/bench_prefill_chunks
    --validate) equals the XLA chunked form."""
    import jax.numpy as jnp

    from rwkv_tpu.ops.chunked import wkv7_chunked, wkv7_chunked_pallas

    rs = np.random.RandomState(0)
    t, h, s_dim, p = 64, 4, 64, 16
    r, k, v = (rs.randn(t, h, s_dim).astype(np.float32) * 0.3 for _ in range(3))
    w = np.exp(-0.6065 / (1 + np.exp(-rs.randn(t, h, s_dim).astype(np.float32))))
    kk = rs.randn(t, h, s_dim).astype(np.float32)
    kk /= np.linalg.norm(kk, axis=-1, keepdims=True)
    ag = 1 / (1 + np.exp(-rs.randn(t, h, s_dim).astype(np.float32)))
    a, b = -kk, kk * ag
    s0 = rs.randn(h, s_dim, s_dim).astype(np.float32) * 0.3

    y_ref, s_ref = wkv7_chunked(
        jnp.asarray(s0)[None],
        *(jnp.asarray(x)[:, None] for x in (r, w, k, v, a, b)), chunk_size=p,
    )
    y_pl, s_pl = wkv7_chunked_pallas(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, w, k, v, a, b)),
        chunk_size=p, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_ref)[:, 0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_ref)[0], rtol=1e-5, atol=1e-5
    )


def test_wkv7_auto_batched_pallas_fold_matches_scan():
    """wkv7_auto with B>1 folds (B, H) into the kernel's head-batch dim;
    on CPU this exercises the fold/reshape plumbing via the XLA fallback,
    and the fold itself is checked against the kernel in interpret mode."""
    import jax.numpy as jnp

    from rwkv_tpu.ops.chunked import wkv7_chunked, wkv7_chunked_pallas

    rs = np.random.RandomState(1)
    t, bsz, h, s_dim, p = 32, 3, 2, 64, 16
    r, k, v = (
        rs.randn(t, bsz, h, s_dim).astype(np.float32) * 0.3 for _ in range(3)
    )
    w = np.exp(-0.6065 / (1 + np.exp(-rs.randn(t, bsz, h, s_dim).astype(np.float32))))
    kk = rs.randn(t, bsz, h, s_dim).astype(np.float32)
    kk /= np.linalg.norm(kk, axis=-1, keepdims=True)
    ag = 1 / (1 + np.exp(-rs.randn(t, bsz, h, s_dim).astype(np.float32)))
    a, b = -kk, kk * ag
    s0 = rs.randn(bsz, h, s_dim, s_dim).astype(np.float32) * 0.3

    y_ref, s_ref = wkv7_chunked(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, w, k, v, a, b)),
        chunk_size=p,
    )
    bh = bsz * h
    y_pl, s_pl = wkv7_chunked_pallas(
        jnp.asarray(s0).reshape(bh, s_dim, s_dim),
        *(jnp.asarray(x).reshape(t, bh, s_dim) for x in (r, w, k, v, a, b)),
        chunk_size=p, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl).reshape(t, bsz, h, s_dim), np.asarray(y_ref),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_pl).reshape(bsz, h, s_dim, s_dim), np.asarray(s_ref),
        rtol=1e-5, atol=1e-5,
    )


def test_wkv6_pallas_chunk_kernel_matches_chunked():
    """The wkv6 single-pallas_call chunk pipeline (exact log-space pair
    ratios in VMEM; natively validated by scripts/bench_prefill_chunks.py
    --v6) equals the XLA chunked form and the scan."""
    import jax.numpy as jnp

    from rwkv_tpu.models.graph import wkv6_scan
    from rwkv_tpu.ops.chunked import wkv6_chunked, wkv6_chunked_pallas

    rs = np.random.RandomState(1)
    t, h, s_dim, p = 64, 4, 64, 16
    r, k, v = (rs.randn(t, h, s_dim).astype(np.float32) * 0.3
               for _ in range(3))
    w = np.exp(-np.exp(rs.randn(t, h, s_dim).astype(np.float32)))
    tf = rs.randn(h, s_dim).astype(np.float32) * 0.2
    s0 = rs.randn(h, s_dim, s_dim).astype(np.float32) * 0.3

    y_ref, s_ref = wkv6_chunked(
        jnp.asarray(s0)[None],
        *(jnp.asarray(x)[:, None] for x in (r, k, v, w)),
        jnp.asarray(tf), chunk_size=p,
    )
    y_pl, s_pl = wkv6_chunked_pallas(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, k, v, w)),
        jnp.asarray(tf), chunk_size=p, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_ref)[:, 0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_ref)[0], rtol=1e-5, atol=1e-5
    )
    # and against the plain scan (independent derivation)
    y_sc, s_sc = wkv6_scan(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, k, v, w)),
        jnp.asarray(tf),
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_sc), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_sc), rtol=2e-4, atol=2e-4
    )


def test_wkv6_pallas_extreme_decay_stable():
    """Near-zero decays (w underflow territory) must stay finite in the
    kernel — every exponent reaching exp() is clamped <= 0."""
    import jax.numpy as jnp

    from rwkv_tpu.ops.chunked import wkv6_chunked, wkv6_chunked_pallas

    rs = np.random.RandomState(2)
    t, h, s_dim, p = 32, 2, 64, 16
    r, k, v = (rs.randn(t, h, s_dim).astype(np.float32) * 0.3
               for _ in range(3))
    # half the channels decay brutally (w ~ exp(-20)), half barely
    expo = np.where(rs.rand(t, h, s_dim) < 0.5, 20.0, 0.01)
    w = np.exp(-expo).astype(np.float32)
    tf = rs.randn(h, s_dim).astype(np.float32) * 0.2
    s0 = rs.randn(h, s_dim, s_dim).astype(np.float32) * 0.3

    y_pl, s_pl = wkv6_chunked_pallas(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, k, v, w)),
        jnp.asarray(tf), chunk_size=p, interpret=True,
    )
    assert np.isfinite(np.asarray(y_pl)).all()
    assert np.isfinite(np.asarray(s_pl)).all()
    y_ref, s_ref = wkv6_chunked(
        jnp.asarray(s0)[None],
        *(jnp.asarray(x)[:, None] for x in (r, k, v, w)),
        jnp.asarray(tf), chunk_size=p,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_ref)[:, 0], rtol=1e-5, atol=1e-5
    )


def test_wkv6_pallas_static_decay_v5():
    """Static [H, S] decay (the v5 form) broadcasts into the kernel."""
    import jax.numpy as jnp

    from rwkv_tpu.ops.chunked import wkv6_chunked, wkv6_chunked_pallas

    rs = np.random.RandomState(3)
    t, h, s_dim, p = 32, 2, 64, 16
    r, k, v = (rs.randn(t, h, s_dim).astype(np.float32) * 0.3
               for _ in range(3))
    w = np.exp(-np.exp(rs.randn(h, s_dim).astype(np.float32)))
    tf = rs.randn(h, s_dim).astype(np.float32) * 0.2
    s0 = rs.randn(h, s_dim, s_dim).astype(np.float32) * 0.3

    y_ref, s_ref = wkv6_chunked(
        jnp.asarray(s0)[None],
        *(jnp.asarray(x)[:, None] for x in (r, k, v)),
        jnp.asarray(w), jnp.asarray(tf), chunk_size=p,
    )
    y_pl, s_pl = wkv6_chunked_pallas(
        jnp.asarray(s0), *(jnp.asarray(x) for x in (r, k, v)),
        jnp.asarray(w), jnp.asarray(tf), chunk_size=p, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_ref)[:, 0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_pl), np.asarray(s_ref)[0], rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("t", [2, 7, 64])
def test_wkv4_parallel_matches_scan(t):
    """Associative-scan wkv4 == serial max-trick scan, including the
    v4 init state pp = -1e30 and a warm state."""
    import jax.numpy as jnp

    from rwkv_tpu.models.graph import wkv4_scan
    from rwkv_tpu.ops.chunked import wkv4_parallel

    rs = np.random.RandomState(4)
    c = 96
    tf = rs.randn(c).astype(np.float32) * 0.3
    td = (-np.exp(rs.randn(c))).astype(np.float32)
    k = rs.randn(t, c).astype(np.float32)
    v = rs.randn(t, c).astype(np.float32)

    for aa, bb, pp in (
        (np.zeros(c, np.float32), np.zeros(c, np.float32),
         np.full(c, -1e30, np.float32)),
        (rs.randn(c).astype(np.float32), np.abs(rs.randn(c)).astype(np.float32) + 1.0,
         rs.randn(c).astype(np.float32)),
    ):
        args = [jnp.asarray(x) for x in (tf, td, k, v, aa, bb, pp)]
        y_s, aa_s, bb_s, pp_s = wkv4_scan(*args)
        y_p, aa_p, bb_p, pp_p = wkv4_parallel(*args)
        np.testing.assert_allclose(
            np.asarray(y_p), np.asarray(y_s), rtol=1e-5, atol=1e-5
        )
        # states are equal up to the (P, A, B) normalization gauge —
        # compare the physical quantities A e^P / B e^P via a probe step
        probe_k = jnp.asarray(rs.randn(1, c).astype(np.float32))
        probe_v = jnp.asarray(rs.randn(1, c).astype(np.float32))
        o_s, *_ = wkv4_scan(args[0], args[1], probe_k, probe_v,
                            aa_s, bb_s, pp_s)
        o_p, *_ = wkv4_scan(args[0], args[1], probe_k, probe_v,
                            aa_p, bb_p, pp_p)
        np.testing.assert_allclose(
            np.asarray(o_p), np.asarray(o_s), rtol=1e-5, atol=1e-5
        )
