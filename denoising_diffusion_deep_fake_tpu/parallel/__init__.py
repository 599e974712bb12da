from denoising_diffusion_deep_fake_tpu.parallel.distributed import (
    data_shard,
    global_batch_from_local,
    initialize,
    is_primary,
    local_batch_size,
    maybe_initialize_from_env,
    process_count,
    process_index,
)
from denoising_diffusion_deep_fake_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    shard_state,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_state",
    "initialize",
    "maybe_initialize_from_env",
    "is_primary",
    "process_count",
    "process_index",
    "local_batch_size",
    "data_shard",
    "global_batch_from_local",
]
