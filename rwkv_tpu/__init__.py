"""rwkv_tpu — a TPU-native RWKV inference framework.

Built on JAX/XLA/Pallas. Provides the full capability surface of the
rwkv.cpp reference library (RWKV v4/v5.1/v5.2/v6/v7 inference in
FP32/FP16/Q4_0/Q4_1/Q5_0/Q5_1/Q8_0, the `ggmf` model file format,
quantization, tokenizers, sampling, reservoir computing) re-designed
for TPU hardware: jitted functional step functions instead of a tensor
graph runtime, device-resident sharded state instead of caller-owned
buffers, and GSPMD/pjit sharding over device meshes instead of layer
offload.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `rwkv_tpu.io` usable without pulling in jax.
    if name == "RWKVModel":
        from rwkv_tpu.models.model import RWKVModel

        return RWKVModel
    if name == "ServingModel":
        from rwkv_tpu.models.serve import ServingModel

        return ServingModel
    if name == "ContinuousBatcher":
        from rwkv_tpu.parallel.batching import ContinuousBatcher

        return ContinuousBatcher
    if name == "ReservoirRWKV":
        from rwkv_tpu.reservoir import ReservoirRWKV

        return ReservoirRWKV
    if name == "ModelConfig":
        from rwkv_tpu.models.config import ModelConfig

        return ModelConfig
    if name == "get_tokenizer":
        from rwkv_tpu.utils.tokenizer import get_tokenizer

        return get_tokenizer
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
