"""Pipeline-parallel tests on the virtual CPU mesh: microbatched staged
execution must reproduce single-device forward_stacked results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def four_devices():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    return jax.devices()[:4]


def _setup(precision="f32"):
    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.models.synth import synth_config, synth_params

    cfg = synth_config("7.0", n_layer=4, n_embed=128, n_vocab=256, head_size=32)
    params = synth_params(cfg, seed=3, lora_dim=32)
    return cfg, ServingModel((cfg, params), precision=precision)


@pytest.mark.parametrize("n_micro,t_len", [(4, 1), (2, 8)])
def test_pipeline_matches_single_device(four_devices, n_micro, t_len):
    from rwkv_tpu.models.serve import forward_stacked
    from rwkv_tpu.parallel.pipeline import (
        make_pp_mesh, pipeline_forward, shard_params_pp, shard_state_pp,
    )

    cfg, srv = _setup()
    batch = 8
    tokens = np.random.default_rng(0).integers(
        0, cfg.n_vocab, (t_len, batch)
    ).astype(np.int32)

    state_lb = jax.tree.map(
        lambda a: jnp.swapaxes(a, 0, 1), srv.init_state(batch)
    )
    logits_ref, state_ref = jax.jit(
        lambda p, s, t: forward_stacked(p, s, t, cfg, True)
    )(srv.params, state_lb, jnp.asarray(tokens))

    mesh = make_pp_mesh(4, devices=four_devices)
    params_pp = shard_params_pp(srv.params, cfg, mesh)
    state_pp = shard_state_pp(state_lb, mesh)
    logits_pp, state_out = pipeline_forward(
        params_pp, state_pp, jnp.asarray(tokens), cfg, mesh, n_micro=n_micro
    )

    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_out["heads"]), np.asarray(state_ref["heads"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state_out["att_xx"]), np.asarray(state_ref["att_xx"]),
        rtol=1e-5, atol=1e-5,
    )


def test_pipeline_v5_arch(four_devices):
    """PP also runs the v5.2 arch (no v_first payload used)."""
    from rwkv_tpu.models.serve import ServingModel, forward_stacked
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.pipeline import (
        make_pp_mesh, pipeline_forward, shard_params_pp, shard_state_pp,
    )

    cfg = synth_config("5.2", n_layer=4, n_embed=128, n_vocab=256, head_size=32)
    srv = ServingModel((cfg, synth_params(cfg, seed=4)), precision="f32")
    batch, t_len = 4, 4
    tokens = np.random.default_rng(1).integers(
        0, cfg.n_vocab, (t_len, batch)
    ).astype(np.int32)
    state_lb = jax.tree.map(
        lambda a: jnp.swapaxes(a, 0, 1), srv.init_state(batch)
    )
    logits_ref, _ = jax.jit(
        lambda p, s, t: forward_stacked(p, s, t, cfg, True)
    )(srv.params, state_lb, jnp.asarray(tokens))

    mesh = make_pp_mesh(4, devices=four_devices)
    logits_pp, _ = pipeline_forward(
        shard_params_pp(srv.params, cfg, mesh),
        shard_state_pp(state_lb, mesh),
        jnp.asarray(tokens), cfg, mesh, n_micro=2,
    )
    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_ref), rtol=1e-5, atol=1e-5
    )
