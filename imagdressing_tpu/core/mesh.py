"""Device mesh construction and sharding helpers — the TPU-native seat of the
reference's distributed backend.

The reference drives 10 GPUs through Accelerate -> DeepSpeed ZeRO-2 -> NCCL
(/root/reference/run.sh:2-4, zero_stage2_config.json:12-20). On TPU there is
no user-level communication backend: we declare a `jax.sharding.Mesh` over the
ICI fabric, annotate arrays with `NamedSharding`, and XLA emits the
all-reduce / reduce-scatter / all-gather collectives (with automatic
compute/communication overlap, replacing DeepSpeed `overlap_comm`).

Axes:
  data   — data parallelism (replaces the 10-way DDP) + optimizer-state
           sharding along it (ZeRO-2 equivalent)
  model  — optional tensor parallelism for attention/MLP weights (unused by
           default: SD1.5's 2x860M UNets fit on one chip)
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. data=-1 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array in `tree` with its batch dim sharded on `data`."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def zero2_axis(shape, n: int) -> Optional[int]:
    """The dimension a ZeRO-2 shard splits: the largest one divisible by the
    data-axis size `n`, or None (replicate). Shape-only, so gradients,
    optimizer moments, and parameter slices all agree on the same axis."""
    cand = [(d, s) for d, s in enumerate(shape) if s % n == 0 and s > 0]
    if not cand:
        return None
    return max(cand, key=lambda ds: ds[1])[0]


def zero2_param_sharding(mesh: Mesh, tree):
    """ZeRO-2-equivalent sharding spec tree for OPTIMIZER state: shard the
    largest dimension that divides the data-axis size; replicate the rest.

    DeepSpeed ZeRO-2 partitions optimizer state + gradients across ranks
    (zero_stage2_config.json:12-20). Under XLA we express the same thing as a
    sharding annotation on the optimizer-state pytree; the gradient
    reduce-scatter itself is explicit in train.step.shard_train_step.
    """
    n = mesh.shape[DATA_AXIS]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        axis = zero2_axis(x.shape, n)
        if axis is None:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[axis] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(spec_for, tree)


@contextlib.contextmanager
def maybe_mesh(mesh: Optional[Mesh]):
    if mesh is None:
        yield
    else:
        with mesh:
            yield


# ---------------------------------------------------------------------------
# Thin collective wrappers (used inside shard_map/pmap code paths and tests).
# The reference's NCCL collectives (SURVEY.md §2.3) map onto these.
# ---------------------------------------------------------------------------


def psum(x, axis: str = DATA_AXIS):
    return jax.lax.psum(x, axis_name=axis)


def pmean(x, axis: str = DATA_AXIS):
    return jax.lax.pmean(x, axis_name=axis)


def all_gather(x, axis: str = DATA_AXIS, *, tiled: bool = True):
    return jax.lax.all_gather(x, axis_name=axis, tiled=tiled)


def reduce_scatter(x, axis: str = DATA_AXIS):
    return jax.lax.psum_scatter(x, axis_name=axis, tiled=True)
