from .mesh import (
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    shard_work_items,
    maybe_initialize_distributed,
    MeshAxes,
)
from .fmt_sp import sequence_parallel_linear_attention
