from multimodal_auv_tpu.parallel.distributed import (  # noqa: F401
    host_shard_indices,
    initialize_distributed,
)
from multimodal_auv_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    mc_sharding,
    posterior_sharding,
    replicated,
    shard_batch,
    shard_state,
)
