from .mesh import (make_data_mesh, stack_batches, shard_batch,
                   make_dp_train_step, make_shard_mesh,
                   make_sharded_forward, make_sharded_train_step)
from .shard_nag import shard_padded_nag
from .multihost import make_global_batch, launch_multihost_dryrun
