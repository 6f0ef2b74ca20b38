"""Tensor-parallel sharding rules for the UNet (optional `model` mesh axis).

The reference has no TP (SD1.5's 2x860M UNets fit on one chip — SURVEY.md
§2.3), but larger bases (SDXL-class) need it. TPU-native TP is purely
declarative: annotate the weight pytree with PartitionSpecs — attention and
MLP projections column-split on the way in, row-split on the way out — and
pjit/XLA inserts the all-gather/reduce-scatter pairs over ICI.

Usage:
    specs = unet_param_specs(params, mesh)
    params = jax.device_put(params, specs)
    out = jax.jit(fn, in_shardings=(specs, ...))(params, ...)

Known trade-off: the GEGLU up-projection stores h and gate fused in one
(D, 2*inner) kernel (diffusers layout, preserved for checkpoint
compatibility), so column-splitting it leaves `jnp.split(hg, 2)` crossing
shard boundaries and XLA reshards the 2*inner activation before the gate
multiply — correct, but one extra collective per FF vs a Megatron-style
per-shard interleave (which would require a TP-degree-dependent weight
relayout at conversion time). Attention projections (the other half of the
TP surface) split cleanly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagdressing_tpu.core.mesh import MODEL_AXIS


def _spec_for_path(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    strs = [n for n in names if isinstance(n, str)]
    if getattr(leaf, "ndim", 0) != 2:
        return P()  # convs / norms / biases replicated
    # column-parallel: Q/K/V and the FF up-projection split the OUTPUT dim
    if any(s in ("to_q", "to_k", "to_v") for s in strs) and "kernel" in strs:
        return P(None, MODEL_AXIS)
    if "ff" in strs and "proj" in strs and "kernel" in strs:
        return P(None, MODEL_AXIS)
    # row-parallel: output projections split the INPUT dim (psum on exit)
    if "to_out" in strs and "kernel" in strs:
        return P(MODEL_AXIS, None)
    if "ff" in strs and "out" in strs and "kernel" in strs:
        return P(MODEL_AXIS, None)
    return P()


def unet_param_specs(params: Dict[str, Any], mesh: Mesh):
    """NamedSharding tree for a UNet param tree under (data, model)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf)),
        params,
    )
