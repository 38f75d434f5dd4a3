from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate,
    pad_to_multiple,
    maybe_mesh,
)
