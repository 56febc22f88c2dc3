from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, make_train_step, make_eval_step)
