#!/usr/bin/env python3
"""Advanced Enhanced-ReservoirRWKV features for chatbot personality modeling.

TPU-native port of the reference's advanced_reservoir_example.py:1-482 —
same demonstration sequence against the JAX engine (no shared library; the
model is the rwkv_tpu inference engine itself):

1. ESN parameter mappings to RWKV concepts
2. Multiple chatbot personas
3. Multi-layer (MLP) readout networks
4. Online learning for real-time adaptation
5. Hierarchical outputs at multiple time scales
6. Batch processing
7. Persona comparison

Run:  python examples/advanced_reservoir_example.py [model.bin]
(defaults to the reference tiny fixture if present)
"""

import os
import sys

# Optional platform override (e.g. RWKV_TPU_PLATFORM=cpu to avoid a slow
# remote-TPU init for these small demos).
if os.environ.get("RWKV_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RWKV_TPU_PLATFORM"])

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_tpu.reservoir.enhanced import (  # noqa: E402
    ESNParameterMapping,
    EnhancedReservoirRWKV,
    create_chatbot_reservoir,
)

DEFAULT_MODEL = "/root/reference/tests/tiny-rwkv-5v2-730K-FP32-to-Q8_0.bin"


def setup_environment():
    model = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MODEL
    if not os.path.exists(model):
        print(f"model not found: {model}")
        print("usage: python examples/advanced_reservoir_example.py model.bin")
        return None
    print(f"using model {model}")
    return model


def demonstrate_esn_parameter_mappings():
    print("\n" + "=" * 70)
    print("1. ESN PARAMETER MAPPINGS TO RWKV")
    print("=" * 70)
    for name, mapping in ESNParameterMapping.get_parameter_mappings().items():
        print(f"* {name}")
        print(f"   ReservoirPy: {mapping['reservoirpy_description']}")
        print(f"   RWKV equivalent: {mapping['rwkv_equivalent']}")
        print(f"   Persona effect: {mapping['chatbot_persona_effect']}")
        print(f"   Value range: {mapping['value_range']}")


def demonstrate_chatbot_personas(model_path):
    print("\n" + "=" * 70)
    print("2. CHATBOT PERSONALITY MODELING")
    print("=" * 70)
    reservoirs = {}
    for persona in ("conservative", "balanced", "creative"):
        print(f"\ncreating {persona} persona...")
        r = create_chatbot_reservoir(
            model_path, persona_type=persona, advanced_features=True, units=64
        )
        reservoirs[persona] = r
        print(f"   spectral_radius={r.spectral_radius:.2f} "
              f"leaking_rate={r.leaking_rate:.2f} "
              f"input_scaling={r.input_scaling:.2f} "
              f"noise_scaling={r.noise_scaling:.3f}")

    patterns = [
        [1, 15, 23, 45, 67],
        [89, 12, 156, 78, 90],
        [200, 34, 67, 123, 45],
    ]
    print("\nresponse patterns (activation variance = responsiveness):")
    for i, pattern in enumerate(patterns):
        print(f"  pattern {i + 1}: {pattern}")
        for persona, r in reservoirs.items():
            acts = r.run(pattern)
            print(f"    {persona:>12}: responsiveness = {np.var(acts):.4f}")
    return reservoirs


def demonstrate_multi_layer_readout(model_path):
    print("\n" + "=" * 70)
    print("3. MULTI-LAYER READOUT NETWORKS")
    print("=" * 70)
    r = EnhancedReservoirRWKV(
        model_path, units=64, persona_type="balanced", readout_type="mlp",
        readout_config={"output_size": 3, "hidden_layers": [128, 64, 32]},
    )
    rng = np.random.default_rng(0)
    sequences, targets = [], []
    for _ in range(20):
        seq = rng.integers(0, 256, rng.integers(10, 20)).tolist()
        sequences.append(seq)
        targets.append([
            (np.sum(seq) % 100) / 100.0,
            (len(seq) % 10) / 10.0,
            float(np.std(seq)) / 50.0,
        ])
    r.fit(sequences, np.asarray(targets, np.float32))
    pred = r.predict([1, 50, 100, 150, 200, 25, 75, 125, 175, 225])
    print(f"   prediction shape {pred.shape}; behavior vector {pred[-1]}")
    print(f"   - sentiment:  {pred[-1, 0]:.3f}")
    print(f"   - formality:  {pred[-1, 1]:.3f}")
    print(f"   - creativity: {pred[-1, 2]:.3f}")


def demonstrate_online_learning(model_path):
    print("\n" + "=" * 70)
    print("4. ONLINE LEARNING FOR REAL-TIME ADAPTATION")
    print("=" * 70)
    r = EnhancedReservoirRWKV(
        model_path, units=64, persona_type="balanced", readout_type="online",
        readout_config={"output_size": 1, "learning_rate": 0.05,
                        "forgetting_factor": 0.95},
    )
    r.fit([[1, 2, 3, 4, 5], [6, 7, 8, 9, 10], [11, 12, 13, 14, 15]],
          np.array([[0.2], [0.5], [0.8]], np.float32))
    test_seq = [20, 25, 30, 35, 40]

    def last_pred():
        return float(np.ravel(r.predict(test_seq))[-1])

    print(f"   initial prediction: {last_pred():.4f}")
    for i, (seq, target) in enumerate(
        [([20, 25, 30], 0.3), ([25, 30, 35], 0.4), ([30, 35, 40], 0.6)]
    ):
        r.update_online(np.array(seq), np.array([[target]], np.float32))
        print(f"   after adaptation {i + 1}: {last_pred():.4f} "
              f"(target {target})")


def demonstrate_hierarchical_outputs(model_path):
    print("\n" + "=" * 70)
    print("5. HIERARCHICAL OUTPUTS FOR MULTI-SCALE REASONING")
    print("=" * 70)
    configs = [
        {"output_size": 1, "time_scale": 1, "readout_type": "ridge",
         "readout_params": {"alpha": 1e-6}},
        {"output_size": 1, "time_scale": 5, "readout_type": "ridge",
         "readout_params": {"alpha": 1e-4}},
        {"output_size": 1, "time_scale": 10, "readout_type": "ridge",
         "readout_params": {"alpha": 1e-3}},
    ]
    r = EnhancedReservoirRWKV(
        model_path, units=64, persona_type="balanced",
        readout_type="hierarchical", hierarchical_configs=configs,
    )
    targets = {
        "readout_0_1": np.sin(np.linspace(0, 4 * np.pi, 50)).reshape(-1, 1),
        "readout_1_5": np.sin(np.linspace(0, np.pi, 10)).reshape(-1, 1),
        "readout_2_10": np.sin(np.linspace(0, np.pi / 2, 5)).reshape(-1, 1),
    }
    r.fit([list(range(1, 51))], None, hierarchical_targets=targets)
    preds = r.predict(list(range(51, 81)))
    print("   prediction scales:")
    for scale, pred in preds.items():
        print(f"   - {scale}: shape {pred.shape}")


def demonstrate_batch_processing(model_path):
    print("\n" + "=" * 70)
    print("6. EFFICIENT BATCH PROCESSING")
    print("=" * 70)
    import time

    r = EnhancedReservoirRWKV(
        model_path, units=64, persona_type="balanced", readout_type="ridge"
    )
    r.fit([[1, 2, 3, 4], [5, 6, 7, 8], [9, 10, 11, 12]],
          np.array([[0.1], [0.5], [0.9]], np.float32))
    batch = [
        [15, 30, 45, 60, 75], [20, 40, 60, 80],
        [25, 50, 75, 100, 125, 150], [10, 20, 30], [100, 200, 150, 175, 125],
    ]
    t0 = time.time()
    preds = r.batch_predict(batch)
    print(f"   batch of {len(batch)} in {time.time() - t0:.3f}s")
    for i, p in enumerate(preds):
        final = p[-1] if p.ndim == 1 else p[-1, 0]
        print(f"   - conversation {i + 1}: final prediction = {final:.4f}")


def demonstrate_persona_comparison(reservoirs):
    print("\n" + "=" * 70)
    print("7. PERSONA COMPARISON")
    print("=" * 70)
    probe = [10, 60, 110, 160, 210]
    print(f"   probe sequence: {probe}")
    for persona, r in reservoirs.items():
        acts = r.run(probe)
        print(f"   {persona:>12}: mean={np.mean(acts):+.4f} "
              f"std={np.std(acts):.4f} "
              f"range=[{acts.min():+.3f}, {acts.max():+.3f}]")


def main():
    model_path = setup_environment()
    if model_path is None:
        return 1
    demonstrate_esn_parameter_mappings()
    reservoirs = demonstrate_chatbot_personas(model_path)
    demonstrate_multi_layer_readout(model_path)
    demonstrate_online_learning(model_path)
    demonstrate_hierarchical_outputs(model_path)
    demonstrate_batch_processing(model_path)
    demonstrate_persona_comparison(reservoirs)
    print("\nall demonstrations completed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
