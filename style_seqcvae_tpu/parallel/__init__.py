from style_seqcvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
