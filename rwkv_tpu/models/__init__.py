from rwkv_tpu.models.config import ModelConfig  # noqa: F401
from rwkv_tpu.models.loader import load_params  # noqa: F401
