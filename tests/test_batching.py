"""Continuous batching tests: slot writes, interleaved admission, and
equivalence between batched and single-stream generation."""

import numpy as np
import pytest

from conftest import require_fixture


@pytest.fixture(scope="module")
def srv():
    from rwkv_tpu.models.serve import ServingModel

    return ServingModel(str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin")), precision="f32")


def test_write_slot(srv):
    from rwkv_tpu.parallel.batching import write_slot

    pool = srv.init_state(4)
    _, seq_state = srv.prefill(list(b"hello"))
    pool2 = write_slot(pool, 2, seq_state)
    flat_pool = np.asarray(pool2["att_xx"])
    flat_seq = np.asarray(seq_state["att_xx"][0])
    np.testing.assert_array_equal(flat_pool[2], flat_seq)
    assert np.all(flat_pool[0] == 0)


def test_batched_equals_single_stream_greedy(srv):
    """Greedy generations produced under continuous batching must match
    independent single-stream greedy generations."""
    from rwkv_tpu.parallel.batching import ContinuousBatcher

    prompts = [list(b"Once upon"), list(b"The quick brown"), list(b"zzz")]
    n_new = 6

    # Single-stream references (host greedy loop).
    singles = []
    for p in prompts:
        logits, state = srv.prefill(p)
        toks = []
        for _ in range(n_new):
            t = int(np.argmax(np.asarray(logits)))
            toks.append(t)
            logits, state = srv.decode([t], srv_state_expand(srv, state))
            logits = logits[0]
        singles.append(toks)

    batcher = ContinuousBatcher(srv, max_batch=2)  # forces queueing/reuse
    rids = [
        batcher.submit(p, max_new_tokens=n_new, temperature=0.0) for p in prompts
    ]
    results = batcher.run()
    assert set(results.keys()) == set(rids)
    for rid, expected in zip(rids, singles):
        assert results[rid].generated == expected, (rid, results[rid].generated, expected)


def srv_state_expand(srv, state):
    # prefill returns batch-1 state already; decode expects batched state
    return state


def test_device_loop_matches_host_loop(srv):
    """The on-device multi-step loop (sampling + penalties + stop logic in
    one jitted scan) must produce exactly the host per-token path's tokens
    under greedy decoding with penalties active."""
    from rwkv_tpu.parallel.batching import ContinuousBatcher

    prompts = [list(b"Once upon"), list(b"The quick"), list(b"xy")]
    kwargs = dict(
        max_new_tokens=7, temperature=0.0,
        presence_penalty=0.4, frequency_penalty=0.25,
    )

    host = ContinuousBatcher(srv, max_batch=2, sync_every=3)
    rids_h = [host.submit(p, **kwargs) for p in prompts]
    res_h = host.run(on_device=False)

    dev = ContinuousBatcher(srv, max_batch=2, sync_every=3)
    rids_d = [dev.submit(p, **kwargs) for p in prompts]
    res_d = dev.run(on_device=True)

    for rh, rd in zip(rids_h, rids_d):
        assert res_d[rd].generated == res_h[rh].generated


def test_device_drain_multi_segment(srv):
    """A drain longer than DRAIN_ROUNDS_CAP * sync_every must span
    multiple fused-drain dispatches and still match the host path."""
    from rwkv_tpu.parallel.batching import ContinuousBatcher

    prompts = [list(b"ab"), list(b"xy")]
    n_new = 9  # sync_every=2, cap monkeypatched to 2 -> 3 segments
    kwargs = dict(max_new_tokens=n_new, temperature=0.0)

    host = ContinuousBatcher(srv, max_batch=2, sync_every=2)
    rids_h = [host.submit(p, **kwargs) for p in prompts]
    res_h = host.run(on_device=False)

    dev = ContinuousBatcher(srv, max_batch=2, sync_every=2)
    dev.DRAIN_ROUNDS_CAP = 2
    rids_d = [dev.submit(p, **kwargs) for p in prompts]
    res_d = dev.run(on_device=True)

    for rh, rd in zip(rids_h, rids_d):
        assert res_d[rd].generated == res_h[rh].generated
        assert len(res_d[rd].generated) == n_new


def test_device_sampler_matches_host_sampler():
    """device_sample must agree with sample_probs' filtering: with top_p
    masking most of the vocab, both must only ever emit nucleus tokens."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.utils.sampling import device_sample, softmax

    rng = np.random.default_rng(3)
    logits = rng.standard_normal((4, 64)).astype(np.float32) * 3
    probs = softmax(logits)
    top_p = 0.6
    # host nucleus per row
    nuclei = []
    for r in range(4):
        sp = np.sort(probs[r])[::-1]
        cut = sp[int(np.argmax(np.cumsum(sp) > top_p))]
        nuclei.append(set(np.nonzero(probs[r] >= cut)[0].tolist()))

    toks = device_sample(
        jnp.asarray(logits),
        jnp.full((4,), 0.9, jnp.float32),
        jnp.full((4,), top_p, jnp.float32),
        jax.random.PRNGKey(0),
        top_k=0,
    )
    for r, t in enumerate(np.asarray(toks)):
        assert int(t) in nuclei[r]


def test_device_sampler_topk_domain_matches_full():
    """The k-domain sampler path (top_k > 0: one lax.top_k + [B, k] work)
    must agree with the full-vocab path whenever the nucleus fits in k:
    same greedy tokens, same nucleus membership, and the same cutoff set."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.utils.sampling import device_sample, softmax

    rng = np.random.default_rng(7)
    logits = rng.standard_normal((5, 96)).astype(np.float32) * 4
    top_p = 0.75
    probs = softmax(logits)
    nuclei = []
    for r in range(5):
        sp = np.sort(probs[r])[::-1]
        cut = sp[int(np.argmax(np.cumsum(sp) > top_p))]
        nuclei.append(set(np.nonzero(probs[r] >= cut)[0].tolist()))
    assert all(len(n) <= 16 for n in nuclei), "test setup: nucleus must fit k"

    t = jnp.full((5,), 0.8, jnp.float32)
    p = jnp.full((5,), top_p, jnp.float32)
    for trial in range(8):
        key = jax.random.PRNGKey(trial)
        toks = np.asarray(device_sample(jnp.asarray(logits), t, p, key,
                                        top_k=16))
        for r, tok in enumerate(toks):
            assert int(tok) in nuclei[r]
    # greedy must match the full path exactly
    zt = jnp.zeros((5,), jnp.float32)
    g_k = np.asarray(device_sample(jnp.asarray(logits), zt, p,
                                   jax.random.PRNGKey(0), top_k=16))
    g_f = np.asarray(device_sample(jnp.asarray(logits), zt, p,
                                   jax.random.PRNGKey(0), top_k=0))
    np.testing.assert_array_equal(g_k, g_f)


def test_stop_tokens_and_slot_reuse(srv):
    from rwkv_tpu.parallel.batching import ContinuousBatcher

    batcher = ContinuousBatcher(srv, max_batch=2)
    # All byte tokens are possible outputs; use an impossible stop to run
    # full length, and every token as stop to finish in one step.
    rid_long = batcher.submit(list(b"ab"), max_new_tokens=3, temperature=0.0)
    rid_short = batcher.submit(
        list(b"cd"), max_new_tokens=10, temperature=0.0,
        stop_tokens=tuple(range(256)),
    )
    rid_third = batcher.submit(list(b"ef"), max_new_tokens=2, temperature=0.0)
    results = batcher.run()
    assert len(results[rid_long].generated) == 3
    assert len(results[rid_short].generated) == 1
    assert len(results[rid_third].generated) == 2
    assert batcher.n_active == 0


def test_device_loop_packed_megakernel_matches_host():
    """The batcher's on-device scan carries the lane-packed kernel state
    layout across steps (ServingModel.decode_loop_fns): greedy tokens must
    match the host per-token path, which packs/unpacks around every
    decode() call instead."""
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.batching import ContinuousBatcher

    cfg = synth_config("7.0", n_layer=2, n_embed=128, n_vocab=512,
                       head_size=64)
    params = synth_params(cfg, seed=11, lora_dim=32)
    srv = ServingModel((cfg, params), precision="w8a8", megakernel=True)
    srv.mega_min_batch = 2
    # this config must route the batcher through the packed kernel (the
    # fallback route has no pack arrays)
    _, _, _, arrs = srv.decode_loop_fns(2)
    assert arrs, "expected the lane-packed kernel route for B=2 v7 mega"

    prompts = [[3, 77, 200], [9, 4]]
    kwargs = dict(max_new_tokens=5, temperature=0.0)

    host = ContinuousBatcher(srv, max_batch=2, sync_every=2)
    rids_h = [host.submit(p, **kwargs) for p in prompts]
    res_h = host.run(on_device=False)

    dev = ContinuousBatcher(srv, max_batch=2, sync_every=2)
    rids_d = [dev.submit(p, **kwargs) for p in prompts]
    res_d = dev.run(on_device=True)

    for rh, rd in zip(rids_h, rids_d):
        assert res_d[rd].generated == res_h[rh].generated
