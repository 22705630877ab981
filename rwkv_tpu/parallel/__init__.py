from rwkv_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_params,
    shard_state,
)
