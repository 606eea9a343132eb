from countr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, get_mesh, is_main_process, replicated_sharding,
    shard_batch,
)
