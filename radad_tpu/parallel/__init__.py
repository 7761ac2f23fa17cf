from radad_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, INDEX_AXIS, make_mesh, batch_sharding, index_sharding,
    replicated,
)
from radad_tpu.parallel.sharded_index import (  # noqa: F401
    ShardedIndex, ShardedRetrieval, sharded_retrieve,
)
from radad_tpu.parallel.train_step import make_parallel_train_step  # noqa: F401
from radad_tpu.parallel.tp import shard_encoder_params, encoder_param_specs  # noqa: F401
