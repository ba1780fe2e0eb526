from .mesh import (DATA_AXIS, batch_sharding, batch_spec, get_mesh,
                   replicated_sharding, replicated_spec, shard_batch)
from .train_step import (TrainState, create_train_state, make_optimizer,
                         make_train_step, make_val_step)

__all__ = [
    "DATA_AXIS", "batch_sharding", "batch_spec", "get_mesh",
    "replicated_sharding", "replicated_spec", "shard_batch",
    "TrainState", "create_train_state", "make_optimizer", "make_train_step",
    "make_val_step",
]
