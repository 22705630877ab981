from rwkv_tpu.reservoir.reservoir import ReservoirRWKV  # noqa: F401
from rwkv_tpu.reservoir.enhanced import (  # noqa: F401
    EnhancedReservoirRWKV,
    HierarchicalOutput,
    MultiLayerReadout,
    OnlineLearner,
    create_chatbot_reservoir,
)
from rwkv_tpu.reservoir.esn import (  # noqa: F401
    ESNConfig,
    ESNChatbot,
    PERSONALITY_PRESETS,
    create_chatbot_esn,
)
