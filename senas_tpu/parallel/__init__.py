from senas_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    place_state,
    shard_train_step,
)
