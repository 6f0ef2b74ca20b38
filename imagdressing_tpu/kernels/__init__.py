import contextlib
import os

from imagdressing_tpu.kernels import flash_attention  # noqa: F401


@contextlib.contextmanager
def pallas_disabled():
    """Trace-time switch to the XLA fallback paths (attention, groupnorm).

    The INFERENCE forwards (flash attention, fused GroupNorm) carry
    custom_partitioning SPMD rules (batch/head sharding), so multi-device
    pjit — the tensor-parallel serving path — keeps the Pallas kernels.
    The remaining consumer of this context is TP TRAINING
    (train.step.tp_train_step): the flash BACKWARD kernels have no
    partitioning rule, so that pjit path still traces with the
    partitionable XLA implementations. Data-parallel paths use shard_map
    and keep every kernel by construction: ZeRO-2 training
    (train.step.shard_train_step) and DP inference (pipelines.dressing).
    Set IMAGDRESSING_MULTICHIP_PALLAS=1 to opt out of the disable (e.g.
    to A/B a replicated-custom-call plan on real hardware).
    """
    if os.environ.get("IMAGDRESSING_MULTICHIP_PALLAS", "0") == "1":
        yield
        return
    old = os.environ.get("IMAGDRESSING_DISABLE_PALLAS")
    os.environ["IMAGDRESSING_DISABLE_PALLAS"] = "1"
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("IMAGDRESSING_DISABLE_PALLAS", None)
        else:
            os.environ["IMAGDRESSING_DISABLE_PALLAS"] = old
