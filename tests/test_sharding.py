"""Multi-chip sharding tests on the 8-device virtual CPU mesh: tensor-
parallel execution must produce the same logits as single-device execution
(the TPU analogue of the reference's CPU-vs-GPU agreement test,
test_quantized_matmul_on_gpu.c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import require_fixture


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_tp_sharded_logits_match_unsharded(eight_devices):
    from rwkv_tpu.models.graph import forward
    from rwkv_tpu.models.state import init_state
    from rwkv_tpu.models.synth import synth_config, synth_params
    from rwkv_tpu.parallel.sharding import make_mesh, shard_params

    cfg = synth_config("7.0", n_layer=2, n_embed=256, n_vocab=512, head_size=32)
    params = synth_params(cfg, seed=0, lora_dim=32)
    tokens = jnp.asarray([1, 2, 3], jnp.int32)

    # Unsharded reference.
    logits_ref, state_ref = jax.jit(
        lambda p, s, t: forward(p, s, t, cfg, True)
    )(params, init_state(cfg), tokens)

    # TP over 4 devices, DP axis unused (size 2).
    mesh = make_mesh(2, 4, devices=eight_devices)
    sharded = shard_params(params, cfg, mesh)
    logits_tp, state_tp = jax.jit(
        lambda p, s, t: forward(p, s, t, cfg, True)
    )(sharded, init_state(cfg), tokens)

    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_tp["heads"]), np.asarray(state_ref["heads"]),
        rtol=1e-5, atol=1e-5,
    )


def test_dp_batched_decode_sharded(eight_devices):
    """Batch-sharded decode over the data axis: per-row results equal the
    unsharded batched decode."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rwkv_tpu.models.serve import ServingModel
    from rwkv_tpu.parallel.sharding import make_mesh

    path = str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    srv = ServingModel(path, precision="f32")
    mesh = make_mesh(8, 1, devices=eight_devices)

    batch = 8
    state = srv.init_state(batch)
    tokens = np.arange(batch, dtype=np.int32) + 60
    logits_ref, _ = srv.decode(tokens, state)

    state_sharded = jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        ),
        srv.init_state(batch),
    )
    logits_dp, new_state = srv.decode(tokens, state_sharded)
    np.testing.assert_allclose(
        np.asarray(logits_dp), np.asarray(logits_ref), rtol=1e-5, atol=1e-5
    )


def test_dryrun_multichip_entrypoint(eight_devices):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
