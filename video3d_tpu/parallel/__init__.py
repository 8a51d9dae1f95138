from video3d_tpu.parallel.mesh import (
    create_mesh,
    param_shardings,
    batch_sharding,
    replicated,
    shard_params,
)
