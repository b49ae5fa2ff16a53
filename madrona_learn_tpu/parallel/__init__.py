from .mesh import (
    DATA_AXIS,
    POLICY_AXIS,
    make_mesh,
    training_manager_shardings,
    shard_training_manager,
)
