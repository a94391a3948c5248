from mdgat_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, batch_sharding,
)
from mdgat_tpu.parallel.smap import (
    make_shard_map_train_step, make_shard_map_eval_step, make_eval_runtime,
)
from mdgat_tpu.parallel.multihost import (
    initialize_distributed, is_primary, process_batch_rows, globalize_batch,
)
