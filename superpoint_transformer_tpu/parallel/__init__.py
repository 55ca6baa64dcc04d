from .mesh import (make_data_mesh, stack_batches, shard_batch,
                   make_dp_train_step)
