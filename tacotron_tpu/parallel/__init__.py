from tacotron_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from tacotron_tpu.parallel import multihost

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "multihost"]
