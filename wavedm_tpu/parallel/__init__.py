from wavedm_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    fsdp_param_shardings,
    shard_batch,
)
