from rwkv_tpu.ops.parity import (  # noqa: F401
    Weight,
    mm,
    layer_norm,
    group_norm,
    l2_normalize,
)
