"""World tokenizer and sampling tests (reference:
rwkv_world_tokenizer.test.py behavior; sampling.py semantics)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def world():
    from rwkv_tpu.utils.world_tokenizer import WorldTokenizer

    return WorldTokenizer()


def test_world_roundtrip(world):
    cases = [
        "Hello, world!",
        "The quick brown fox jumps over the lazy dog",
        "Hello 你好 こんにちは привет",
        "x = f(y) ** 2 // 7\n\n\ttabs\tand newlines",
        "emoji: \U0001f600\U0001f680",
    ]
    for s in cases:
        toks = world.encode(s)
        assert world.decode(toks) == s, s
        assert all(isinstance(t, int) and 0 < t < 65536 for t in toks)


def test_world_greedy_longest_match(world):
    # Greedy longest-prefix: a full-word token must win over per-byte tokens.
    toks = world.encode("the")
    assert len(toks) == 1 or world.decode(toks) == "the"
    # Byte fallback: every single byte is encodable.
    raw = bytes(range(256))
    toks = world.encode_bytes(raw)
    assert world.decode_bytes(toks) == raw


def test_world_vocab_size(world):
    assert len(world.index_to_token) == 65529


def test_20b_tokenizer():
    pytest.importorskip("tokenizers")
    from rwkv_tpu.utils.tokenizer import get_tokenizer

    decode, encode = get_tokenizer("20B", None)
    s = "Hello, world! The quick brown fox."
    assert decode(encode(s)) == s


def test_auto_selection():
    from rwkv_tpu.utils.tokenizer import get_tokenizer

    with pytest.raises(ValueError):
        get_tokenizer("auto", 256)
    decode, encode = get_tokenizer("auto", 65536)
    assert decode(encode("abc")) == "abc"


def test_sampling_semantics():
    from rwkv_tpu.utils.sampling import apply_penalties, sample_logits, softmax

    logits = np.zeros(16, np.float32)
    logits[3] = 10.0
    # Greedy at temperature 0.
    assert sample_logits(logits, temperature=0.0) == 3
    # top_p=0 means "disabled" (reference quirk) — result is still valid.
    rng = np.random.default_rng(0)
    tok = sample_logits(logits, temperature=1.0, top_p=0.0, rng=rng)
    assert 0 <= tok < 16
    # Tight nucleus keeps only the dominant token.
    assert sample_logits(logits, temperature=1.0, top_p=0.1, rng=rng) == 3
    # Logit bias can force a different winner.
    assert (
        sample_logits(logits, temperature=0.0, logit_bias={5: 100.0}) == 5
    )
    # top_k=1 is greedy.
    assert sample_logits(logits, temperature=1.0, top_p=1.0, top_k=1, rng=rng) == 3
    # Penalties push down repeated tokens.
    pen = apply_penalties(logits, {3: 4}, presence_penalty=5.0, frequency_penalty=2.0)
    assert pen[3] == pytest.approx(10.0 - 5.0 - 8.0)
    p = softmax(logits)
    assert p.sum() == pytest.approx(1.0)
