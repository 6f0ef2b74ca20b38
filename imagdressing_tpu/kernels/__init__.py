import contextlib
import os

from imagdressing_tpu.kernels import flash_attention  # noqa: F401


@contextlib.contextmanager
def pallas_disabled():
    """Trace-time switch to the XLA fallback paths (attention, groupnorm).

    Pallas TPU kernels lower to opaque custom calls with no SPMD
    partitioning rule, so inside a MULTI-DEVICE jit (pjit with sharded
    operands — the TENSOR-PARALLEL serving/training paths, where the
    kernels' operands really are split across chips) the partitioner at
    best replicates them, at worst fails. The supported multi-device
    pattern is shard_map, and every pure-data-parallel path uses it and
    KEEPS the kernels: ZeRO-2 training (train.step.shard_train_step) and
    DP inference (pipelines.dressing — per-device program shard_mapped
    over the data axis). Only TP callers wrap their jitted calls in this
    context so the `_use_pallas()` gates pick the partitionable XLA
    implementations while tracing. Set IMAGDRESSING_MULTICHIP_PALLAS=1 to
    opt out (e.g. after verifying a replicated-custom-call plan is
    acceptable on real hardware).
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
