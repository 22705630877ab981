#!/usr/bin/env python3
"""ESN (Echo State Network) chatbot demo over the rwkv_tpu engine.

Port of the reference's cpp_esn_demo.py:1-388: personality presets,
reservoir runs, conversation features, a performance comparison between
the ESN surface (`rwkv_tpu.reservoir.esn`) and the ReservoirRWKV framework,
and a toy chatbot interaction loop. The reference drives a C++ libesn; here
both stacks run on the same JAX engine, so the "C++ vs Python" comparison
becomes "ESN chatbot surface vs reservoir framework".

Run:  python examples/esn_demo.py [model.bin]
"""

import os
import sys

# Optional platform override (e.g. RWKV_TPU_PLATFORM=cpu to avoid a slow
# remote-TPU init for these small demos).
if os.environ.get("RWKV_TPU_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RWKV_TPU_PLATFORM"])
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rwkv_tpu.models.model import RWKVModel                       # noqa: E402
from rwkv_tpu.reservoir.esn import (                               # noqa: E402
    PERSONALITY_PRESETS, ESNChatbot, create_chatbot_esn, esn_create_config,
)
from rwkv_tpu.reservoir.reservoir import ReservoirRWKV             # noqa: E402

DEFAULT_MODEL = "/root/reference/tests/tiny-rwkv-5v2-730K-FP32-to-Q8_0.bin"


def setup_environment():
    model = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_MODEL
    if not os.path.exists(model):
        print(f"model not found: {model}")
        return None
    return model


def demonstrate_esn(model_path):
    print("\n" + "=" * 60)
    print("ESN CHATBOT SURFACE DEMONSTRATION")
    print("=" * 60)
    model = RWKVModel(model_path)
    print(f"model loaded: {model_path}")

    for personality in ("conservative", "balanced", "creative"):
        print(f"\ntesting {personality} personality...")
        t0 = time.time()
        esn = ESNChatbot(model, esn_create_config(personality, units=48))
        print(f"  initialized in {time.time() - t0:.3f}s; "
              f"reservoir size {esn.config.units}; "
              f"preset {PERSONALITY_PRESETS[personality]}")

        test_tokens = [1, 5, 10, 15, 20, 25, 30]
        t0 = time.time()
        acts = esn.run_reservoir(test_tokens)
        print(f"  reservoir run ({len(test_tokens)} tokens) in "
              f"{time.time() - t0:.4f}s; shape {np.asarray(acts).shape}; "
              f"mean {np.mean(acts):.4f} std {np.std(acts):.4f}")

        esn.reset_conversation()
        print("  conversation state initialized")
        if personality != "creative":
            esn.switch_personality("creative")
            print(f"  switched personality -> {esn.get_personality()}")


def demonstrate_performance_comparison(model_path):
    print("\n" + "=" * 60)
    print("PERFORMANCE COMPARISON: ESN SURFACE vs RESERVOIR FRAMEWORK")
    print("=" * 60)
    model = RWKVModel(model_path)
    tokens = list(np.random.default_rng(0).integers(0, 256, 64))

    esn = ESNChatbot(model, esn_create_config("balanced", units=64))
    t0 = time.time()
    esn.run_reservoir(tokens)      # warm-up/compile
    t0 = time.time()
    esn.run_reservoir(tokens)
    t_esn = time.time() - t0

    res = ReservoirRWKV(model, units=64)
    res.run(tokens)
    t0 = time.time()
    res.run(tokens)
    t_res = time.time() - t0

    print(f"  ESN surface:        {t_esn * 1e3:8.1f} ms / 64 tokens")
    print(f"  ReservoirRWKV:      {t_res * 1e3:8.1f} ms / 64 tokens")
    print("  (same engine underneath; differences are bookkeeping only)")


def demonstrate_chatbot_interaction(model_path):
    print("\n" + "=" * 60)
    print("CHATBOT INTERACTION")
    print("=" * 60)
    model = RWKVModel(model_path)
    bot = create_chatbot_esn(model, personality="balanced")

    def encode(text):  # byte-level tiny models
        return list(text.encode())[:64]

    def decode(toks):
        return bytes(int(t) % 256 for t in toks).decode(errors="replace")

    for prompt in ("Hello!", "Tell me something."):
        reply = bot.respond(prompt, encode, decode, max_tokens=24)
        print(f"  user: {prompt}")
        print(f"  bot ({bot.get_personality()}): {reply!r}")
    bot.switch_personality("creative")
    reply = bot.respond("And now?", encode, decode, max_tokens=24)
    print(f"  bot ({bot.get_personality()}): {reply!r}")


def main():
    model_path = setup_environment()
    if model_path is None:
        return 1
    demonstrate_esn(model_path)
    demonstrate_performance_comparison(model_path)
    demonstrate_chatbot_interaction(model_path)
    print("\ndemo complete")
    return 0


if __name__ == "__main__":
    sys.exit(main())
