from fourierdiffusion_tpu.parallel.mesh import (
    auto_data_mesh,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "auto_data_mesh",
    "data_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
