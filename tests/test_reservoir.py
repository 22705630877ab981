"""Reservoir computing tests (the reference's test_reservoir.py /
test_enhanced_reservoir.py capability checks, on the tiny fixtures)."""

import numpy as np
import pytest

from conftest import require_fixture


@pytest.fixture(scope="module")
def model():
    from rwkv_tpu.models.model import RWKVModel

    return RWKVModel(str(require_fixture("tiny-rwkv-5v2-730K-FP32.bin")))


def _task(n_seq=8, length=20, seed=0):
    """Simple learnable task: predict (last token byte)/255 from state."""
    rng = np.random.default_rng(seed)
    xs = [list(rng.integers(0, 256, size=length)) for _ in range(n_seq)]
    ys = np.array([[x[-1] / 255.0] for x in xs], dtype=np.float32)
    return xs, ys


def test_ridge_fit_predict_score(model):
    from rwkv_tpu.reservoir import ReservoirRWKV

    res = ReservoirRWKV(model, units=32, alpha=1e-4)
    xs, ys = _task()
    res.fit(xs, ys, warmup=2)
    assert res.is_trained
    pred = res.predict(xs[0])
    assert pred.shape == (len(xs[0]),)
    assert np.isfinite(pred).all()
    score = res.score(xs, ys)
    assert np.isfinite(score)
    # Activations surface.
    acts = res.run(xs[0])
    assert acts.shape == (len(xs[0]), 32)


def test_activations_match_state_slice(model):
    """The reservoir activation is defined as the first `units` elements of
    the flat state (reference reservoir.py:174-189) — check against a
    token-by-token eval."""
    from rwkv_tpu.reservoir import ReservoirRWKV

    res = ReservoirRWKV(model, units=16)
    tokens = [10, 20, 30]
    acts = res.run(tokens)

    state = model.init_state()
    expected = []
    for t in tokens:
        _, state = model.eval(t, state, compute_logits=False)
        expected.append(model.state_to_flat(state)[:16])
    np.testing.assert_allclose(acts, np.stack(expected), rtol=1e-5, atol=1e-6)


def test_enhanced_readouts(model):
    from rwkv_tpu.reservoir import EnhancedReservoirRWKV

    xs, ys = _task(n_seq=4, length=10)

    mlp = EnhancedReservoirRWKV(
        model, units=16, readout_type="mlp",
        readout_config={"hidden_layers": [32], "output_size": 1},
        noise_scaling=0.0,
    )
    mlp.fit(xs, ys)
    assert np.isfinite(mlp.predict(xs[0])).all()

    online = EnhancedReservoirRWKV(model, units=16, readout_type="online")
    online.fit(xs, ys)
    p1 = online.predict(xs[0])
    online.update_online(online.run(xs[0]), np.ones((len(xs[0]), 1)))
    assert np.isfinite(p1).all()

    hier = EnhancedReservoirRWKV(model, units=16, readout_type="hierarchical")
    hier.fit(xs, ys)
    preds = hier.predict(xs[0])
    assert isinstance(preds, dict) and len(preds) >= 1


def test_personas_and_transforms(model):
    from rwkv_tpu.reservoir import EnhancedReservoirRWKV
    from rwkv_tpu.reservoir.enhanced import PERSONA_PRESETS

    res = EnhancedReservoirRWKV(model, units=8, persona_type="creative")
    assert res.spectral_radius == PERSONA_PRESETS["creative"]["spectral_radius"]
    res.set_persona("conservative")
    assert res.spectral_radius == PERSONA_PRESETS["conservative"]["spectral_radius"]
    # Leaky integration produces different activations than raw.
    from rwkv_tpu.reservoir import ReservoirRWKV

    raw = ReservoirRWKV(model, units=8).run([1, 2, 3])
    transformed = res.run([1, 2, 3])
    assert not np.allclose(raw, transformed)


def test_online_learner_rls_converges():
    from rwkv_tpu.reservoir import OnlineLearner

    rng = np.random.default_rng(0)
    w_true = rng.standard_normal((4, 1))
    learner = OnlineLearner(4, 1, method="rls")
    for _ in range(200):
        x = rng.standard_normal((1, 4))
        learner.update(x, x @ w_true)
    x_test = rng.standard_normal((8, 4))
    np.testing.assert_allclose(learner.predict(x_test), x_test @ w_true, atol=1e-2)


def test_esn_chatbot(model):
    from rwkv_tpu.reservoir import ESNChatbot, create_chatbot_esn

    bot = create_chatbot_esn(model, personality="creative", seed=0)
    assert bot.get_personality() == "creative"
    bot.switch_personality("conservative")
    assert bot.config.spectral_radius == 0.7

    encode = lambda s: list(s.encode("utf-8"))
    decode = lambda toks: bytes(int(t) % 256 for t in toks).decode("latin-1")
    reply = bot.respond("Hello", encode, decode, max_tokens=8)
    assert isinstance(reply, str) and len(reply) > 0
    assert bot.conversation.turn_count == 1
    bot.reset_conversation()
    assert bot.conversation.turn_count == 0

    # Reservoir training surface.
    xs, ys = _task(n_seq=3, length=8)
    bot.train(xs, ys)
    assert np.isfinite(bot.predict(xs[0])).all()
