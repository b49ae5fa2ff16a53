from .mesh import (
    DATA_AXIS,
    POLICY_AXIS,
    MODEL_AXIS,
    make_mesh,
    training_manager_shardings,
    shard_params_for_tp,
    shard_training_manager,
)
from . import distributed
