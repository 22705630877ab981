"""Speculative decoding: output must EXACTLY equal the target's greedy
stream regardless of draft quality; perfect drafts accept everything."""

import numpy as np
import pytest

from conftest import require_fixture


def _target():
    from rwkv_tpu.models.serve import ServingModel

    return ServingModel(
        str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin")), precision="f32"
    )


def _greedy_reference(model, prompt, n):
    logits, state = model.prefill(list(prompt))
    toks = []
    for _ in range(n):
        t = int(np.argmax(np.asarray(logits)))
        toks.append(t)
        out, state = model.decode(np.array([t], np.int32), state)
        logits = out[0]
    return toks


PROMPT = list(b'"in the town')


def test_speculative_exactness_weak_draft():
    """A draft that disagrees often must still yield the target's exact
    greedy tokens (mismatches replaced by the target's choice)."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import speculative_generate

    target = _target()
    # weak draft: a different tiny fixture arch entirely
    draft = ServingModel(
        str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin")), precision="f32"
    )
    n = 12
    want = _greedy_reference(target, PROMPT, n)
    got, stats = speculative_generate(target, draft, PROMPT, n, k=3)
    assert got.tolist() == want, (got.tolist(), want, stats)
    assert stats["rounds"] > 0


def test_speculative_perfect_draft_accepts_all():
    from rwkv_tpu.models.speculative import speculative_generate

    target = _target()
    n = 10
    want = _greedy_reference(target, PROMPT, n)
    got, stats = speculative_generate(target, target, PROMPT, n, k=4)
    assert got.tolist() == want
    assert stats["acceptance_rate"] == 1.0


def test_score_matches_serial_logits():
    """score()'s per-position logits equal serial decode logits."""
    target = _target()
    toks = PROMPT[:6]
    state = target.init_state(1)
    serial = []
    for t in toks:
        out, state = target.decode(np.array([t], np.int32), state)
        serial.append(np.asarray(out[0]))

    logits_seq, state_seq = target.score(
        np.asarray([toks], np.int32), target.init_state(1)
    )
    np.testing.assert_allclose(
        np.asarray(logits_seq[0]), np.stack(serial), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state_seq["heads"]), np.asarray(state["heads"]),
        rtol=2e-4, atol=2e-4,
    )


def test_score_trace_matches_score_and_decode_chain():
    """forward_stacked_trace: last-position state equals score()'s final
    state; a mid-position state equals the serial decode chain's."""
    target = _target()
    _, st0 = target.prefill(PROMPT)
    seq = [34, 105, 110, 32]

    logits_ref, new_state = target.score(np.array([seq], np.int32), st0)
    logits_tr, trace = target.score_trace(seq, st0)
    np.testing.assert_allclose(
        np.asarray(logits_tr), np.asarray(logits_ref)[0],
        rtol=1e-5, atol=1e-5,
    )
    for key in ("att_xx", "ffn_xx", "heads"):
        np.testing.assert_allclose(
            np.asarray(trace[key][:, -1]), np.asarray(new_state[key][0]),
            rtol=1e-5, atol=1e-5,
        )
    # mid-position: state after seq[:2] via serial decode
    st = st0
    for t in seq[:2]:
        _, st = target.decode(np.array([t], np.int32), st)
    for key in ("att_xx", "ffn_xx", "heads"):
        np.testing.assert_allclose(
            np.asarray(trace[key][:, 1]), np.asarray(st[key][0]),
            rtol=1e-5, atol=1e-5,
        )


def test_speculative_device_exactness_weak_draft():
    """The on-device while_loop round must emit the target's exact greedy
    stream with a disagreeing draft."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import speculative_generate_device

    target = _target()
    draft = ServingModel(
        str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin")), precision="f32"
    )
    n = 12
    want = _greedy_reference(target, PROMPT, n)
    got, stats = speculative_generate_device(target, draft, PROMPT, n, k=3)
    assert got.tolist() == want, (got.tolist(), want, stats)
    assert stats["rounds"] > 0


def test_speculative_device_perfect_draft_accepts_all():
    from rwkv_tpu.models.speculative import speculative_generate_device

    target = _target()
    n = 10
    want = _greedy_reference(target, PROMPT, n)
    got, stats = speculative_generate_device(target, target, PROMPT, n, k=4)
    assert got.tolist() == want, (got.tolist(), want, stats)
    assert stats["acceptance_rate"] == 1.0


def test_speculative_device_v6_target():
    """v6 target through the trace path: exact greedy equality on a
    synth Finch-style model with a smaller v6 draft."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import speculative_generate_device
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg_t = synth_config("6.0", n_layer=3, n_embed=256, n_vocab=512,
                         head_size=64)
    cfg_d = synth_config("6.0", n_layer=1, n_embed=128, n_vocab=512,
                         head_size=32)
    target = ServingModel((cfg_t, synth_params(cfg_t, seed=5)),
                          precision="f32")
    draft = ServingModel((cfg_d, synth_params(cfg_d, seed=6)),
                         precision="f32")

    prompt = [1, 2, 3, 4]
    n = 10
    want = _greedy_reference(target, prompt, n)
    got, stats = speculative_generate_device(target, draft, prompt, n, k=3)
    assert got.tolist() == want, (got.tolist(), want, stats)


def test_spec_accept_preserves_target_distribution():
    """The rejection-sampling primitive must make the first emitted
    token exactly target-distributed regardless of the draft: empirical
    distribution over 50k independent rounds vs p_t (TV < 0.02)."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models.speculative import _spec_accept

    V, k = 16, 1
    rs = np.random.RandomState(0)
    p_t = rs.dirichlet(np.ones(V), size=k + 1).astype(np.float32)
    p_d = rs.dirichlet(np.ones(V), size=k).astype(np.float32)
    p_t_j, p_d_j = jnp.asarray(p_t), jnp.asarray(p_d)

    def one(keyseed):
        kd, ka = jax.random.split(keyseed)
        d1 = jax.random.categorical(
            kd, jnp.log(p_d_j[0] + 1e-38)
        ).astype(jnp.int32)
        j, nxt = _spec_accept(p_t_j, p_d_j, d1[None], ka)
        return jnp.where(j > 0, d1, nxt)

    keys = jax.random.split(jax.random.PRNGKey(1), 50000)
    toks = np.asarray(jax.jit(jax.vmap(one))(keys))
    emp = np.bincount(toks, minlength=V) / len(toks)
    tv = 0.5 * np.abs(emp - p_t[0]).sum()
    assert tv < 0.02, tv


def test_speculative_sampling_device_runs_and_books():
    """End-to-end sampling round loop: valid tokens, coherent stats, and
    a perfect draft at sharp temperature accepts nearly everything."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import (
        speculative_sample_generate_device,
    )

    target = _target()
    n = 12
    toks, stats = speculative_sample_generate_device(
        target, target, PROMPT, n, k=3, temperature=0.05, seed=0
    )
    assert len(toks) == n
    assert all(0 <= t < 256 for t in toks.tolist())
    assert stats["acceptance_rate"] > 0.9, stats

    draft = ServingModel(
        str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin")), precision="f32"
    )
    toks2, stats2 = speculative_sample_generate_device(
        target, draft, PROMPT, n, k=3, temperature=0.9, seed=1
    )
    assert len(toks2) == n
    assert stats2["rounds"] >= 1


@pytest.mark.parametrize("version", ["4v0-660K", "5v2-730K"])
def test_speculative_device_v4_v5_targets(version):
    """v4/v5 targets through the trace path: exact greedy equality on
    the tiny fixtures."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.speculative import speculative_generate_device

    target = ServingModel(
        str(require_fixture(f"tiny-rwkv-{version}-FP32.bin")),
        precision="f32",
    )
    draft = ServingModel(
        str(require_fixture("tiny-rwkv-7v0-834K-FP32.bin")),
        precision="f32",
    )
    n = 10
    want = _greedy_reference(target, PROMPT, n)
    got, stats = speculative_generate_device(target, draft, PROMPT, n, k=3)
    assert got.tolist() == want, (version, got.tolist(), want, stats)
