#!/usr/bin/env python3
"""Shape-debugging walkthrough for ReservoirRWKV (port of the reference's
debug_reservoir.py:14-144): prints every intermediate shape of the
run/fit/predict pipeline on a tiny model, as a sanity harness for anyone
extending the reservoir module.

Run:  python examples/debug_reservoir.py [model.bin]
"""

import glob
import os
import sys

# Optional platform override (e.g. RWKV_TPU_PLATFORM=cpu to avoid a slow
# remote-TPU init for these small demos).
if os.environ.get("RWKV_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RWKV_TPU_PLATFORM"])

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_tpu.reservoir.reservoir import ReservoirRWKV  # noqa: E402


def find_model():
    if len(sys.argv) > 1:
        return sys.argv[1]
    for path in sorted(glob.glob("/root/reference/tests/tiny-rwkv-*FP32.bin")):
        return path
    return None


def debug_shapes():
    model_path = find_model()
    if model_path is None:
        print("error: no tiny-rwkv FP32 model found; pass one explicitly")
        return False
    print(f"model: {model_path}")

    reservoir = ReservoirRWKV(model_path, units=32, alpha=1e-3)
    print(f"reservoir created: units={reservoir.units} "
          f"(n_embed={reservoir.n_embed}, n_layer={reservoir.n_layer}, "
          f"state_len={reservoir.rwkv_model.state_len})")

    test_sequence = [1, 2, 3]
    print(f"\ntest sequence: {test_sequence}")

    acts = reservoir.run(test_sequence)
    print(f"run() activations: shape {np.asarray(acts).shape} "
          f"(T={len(test_sequence)}, units={reservoir.units})")
    print(f"  first activation row: {np.asarray(acts)[0][:6]} ...")

    x_train = [[1, 2, 3, 4], [5, 6, 7, 8]]
    y_train = np.array([[0.25], [0.75]], np.float32)
    print(f"\nfit(): {len(x_train)} sequences -> targets {y_train.shape}")
    reservoir.fit(x_train, y_train)
    print(f"  readout weights: {reservoir._readout_weights.shape} "
          f"(units+bias -> outputs)")

    pred = reservoir.predict([1, 2, 3, 4, 5])
    print(f"\npredict(): shape {np.asarray(pred).shape} "
          f"(one prediction per time step)")
    print(f"  final prediction: {np.ravel(pred)[-1]:.4f}")

    score = reservoir.score(x_train, y_train)
    print(f"\nscore() R^2 on training data: {score:.4f}")

    print("\nstate handling (run() resets by default, like the reference):")
    a1 = reservoir.run([10, 20, 30])
    a2 = reservoir.run([10, 20, 30], reset_state=False)  # carried state
    a3 = reservoir.run([10, 20, 30])                      # fresh again
    print(f"  carry-over changes activations: {not np.allclose(a1, a2)}")
    print(f"  reset reproduces first run:     {np.allclose(a1, a3)}")
    return True


if __name__ == "__main__":
    sys.exit(0 if debug_shapes() else 1)
