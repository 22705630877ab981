"""Reservoir-computing examples: time-series prediction, sequence memory,
and classification with an RWKV reservoir (the capability demonstrated by
the reference's reservoir_example.py / advanced_reservoir_example.py).

Usage: python examples/reservoir_example.py /path/to/model.bin
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from rwkv_tpu.models.model import RWKVModel
from rwkv_tpu.reservoir import EnhancedReservoirRWKV, ReservoirRWKV


def time_series_prediction(model):
    """Predict the next value of a token-encoded sine wave."""
    print("\n== Time-series prediction ==")
    t = np.linspace(0, 8 * np.pi, 400)
    series = ((np.sin(t) + 1) / 2 * (model.n_vocab - 1)).astype(int)
    x_train, x_test = series[:300], series[300:]

    res = ReservoirRWKV(model, units=min(64, model.n_embed), alpha=1e-4)
    targets = (x_train[1:] / (model.n_vocab - 1)).astype(np.float32)
    res.fit(list(x_train[:-1]), targets.reshape(-1, 1))
    pred = res.predict(list(x_test[:-1]))
    err = np.mean((pred - x_test[1:] / (model.n_vocab - 1)) ** 2)
    print(f"test MSE: {err:.5f}")


def sequence_memory_task(model):
    """Recall the first token of a sequence after a delay."""
    print("\n== Memory task ==")
    rng = np.random.default_rng(0)
    seqs, targets = [], []
    for _ in range(32):
        first = int(rng.integers(0, 250))
        seq = [first] + list(rng.integers(0, 250, size=9))
        seqs.append(seq)
        targets.append([first / 250.0])
    res = ReservoirRWKV(model, units=min(64, model.n_embed), alpha=1e-3)
    res.fit(seqs[:24], np.asarray(targets[:24], np.float32))
    score = res.score(seqs[24:], np.asarray(targets[24:], np.float32))
    print(f"R^2 on held-out sequences: {score:.3f}")


def persona_comparison(model):
    print("\n== Persona dynamics ==")
    for persona in ("conservative", "balanced", "creative"):
        res = EnhancedReservoirRWKV(
            model, units=min(32, model.n_embed), persona_type=persona
        )
        acts = res.run(list(range(10)))
        print(f"{persona:13s} activation std: {acts.std():.4f}")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/tiny-rwkv-5v2-730K-FP32.bin"
    model = RWKVModel(path)
    print(f"model: vocab={model.n_vocab} embed={model.n_embed} layers={model.n_layer}")
    time_series_prediction(model)
    sequence_memory_task(model)
    persona_comparison(model)


if __name__ == "__main__":
    main()
