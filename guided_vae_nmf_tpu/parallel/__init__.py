from .sweep import (
    shard_file_list,
    sharded_mcem_m1,
    sharded_mcem_m2,
    sharded_mcem_fused,
    frame_sharded_mcem,
    grid_sharded_mcem,
)
from . import multihost
from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_to_multiple,
    maybe_mesh,
)
