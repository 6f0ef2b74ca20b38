"""Parallelism toolkit: mesh construction, DP/ZeRO-2 shardings, TP rules,
collective wrappers.

(Thin facade over core.mesh / core.tp so the parallelism surface has one
import point.)
"""

from imagdressing_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    all_gather,
    batch_sharding,
    make_mesh,
    pmean,
    psum,
    reduce_scatter,
    replicate,
    replicated,
    shard_batch,
    zero2_param_sharding,
)
from imagdressing_tpu.core.tp import unet_param_specs  # noqa: F401
from imagdressing_tpu.train.step import shard_train_step  # noqa: F401
