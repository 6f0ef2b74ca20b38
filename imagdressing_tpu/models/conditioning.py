"""Conditioning-as-data: the typed pytree that replaces the reference's
attention-processor monkey-patching.

The reference installs 10 different processor classes onto diffusers UNets by
name and smuggles garment features through a mutable cache dict
(/root/reference/adapter/attention_processor.py:34 write,
:596-612 read via `sa_hidden_states[self.name]`). Here every conditioning
signal is an explicit, jit-traceable input:

  * ref_kv    — per-self-attn-layer garment K/V, PRECOMPUTED once per image.
                The reference re-projects the cached hidden states inside
                every attention call of every sampling step (50 steps x 16
                layers x 2 matmuls); K/V are timestep-invariant so we hoist
                them out of the sampling scan entirely.
  * ip_kv     — per-cross-attn-layer IP-Adapter face-token K/V (reference
                IPAttnProcessor2_0.to_k_ip/to_v_ip, attention_processor.py:
                968-975), likewise timestep-invariant and precomputed.
  * ref_scale / ip_scale — per-batch-element scales, so the CFG-fused batch
                expresses the reference's cond-only injection as
                scale=[0, s] instead of two sequential UNet calls.
  * down_block_residuals / mid_block_residual — ControlNet outputs.

LoRA (LoraRefSAttnProcessor2_0 / LoRAIPAttnProcessor2_0, rank 128) is applied
by FOLDING the low-rank deltas into the base projection weights once at
pipeline-setup time (`fold_lora`): lora_scale is constant during sampling, so
the TPU runs zero extra FLOPs per step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Conditioning:
    """All per-call conditioning for the denoising UNet."""

    # {layer_name: (k_ref, v_ref)} with k/v (B, S_layer, C_layer)
    ref_kv: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None
    # scalar or (B,) — garment-attention scale ("image_scale" in the reference)
    ref_scale: Any = 1.0
    # {layer_name: (k_ip, v_ip)} with k/v (B, num_tokens, C_layer)
    ip_kv: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None
    ip_scale: Any = 1.0
    # ControlNet residuals: tuple of 12 tensors matching UNet skip activations
    down_block_residuals: Optional[Tuple[jnp.ndarray, ...]] = None
    mid_block_residual: Optional[jnp.ndarray] = None
    # {layer_name: (k_txt, v_txt)} — text cross-attn K/V, also
    # timestep-invariant: precomputing them removes 16 layers x 2 projections
    # from every step of the sampling scan.
    cross_kv: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None
    # Self-attention injection mode: "parallel" (RefSAttnProcessor2_0, the
    # shipped scheme: separate softmax, added with ref_scale) or "concat"
    # (SAttnProcessor2_0, attention_processor.py:155-161: garment tokens
    # concatenated into the K/V source — one joint softmax). pytree_node
    # False: it selects the traced graph.
    ref_mode: str = flax.struct.field(pytree_node=False, default="parallel")
    # {layer_name: (k_ref, v_ref)} on CROSS-attention layers
    # (RefCAttnProcessor2_0, attention_processor.py:630-743 — unused by the
    # shipped scripts but part of the adapter API surface).
    ref_cross_kv: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None


def none_conditioning() -> Conditioning:
    return Conditioning()


def fold_lora(
    attn_params: Dict[str, Any],
    lora_params: Dict[str, Any],
    lora_scale: float,
) -> Dict[str, Any]:
    """Fold LoRA deltas into attention projection weights.

    `lora_params` maps projection name ("to_q"|"to_k"|"to_v"|"to_out") to
    {"down": (in, rank), "up": (rank, out)}. Matches diffusers
    LoRALinearLayer semantics used by the reference processors
    (attention_processor.py:396-414): W' = W + scale * up(down(x)),
    with network_alpha=None (no rank rescale).
    """
    out = dict(attn_params)
    for name, lp in lora_params.items():
        base = dict(out[name])
        delta = lp["down"] @ lp["up"]  # (in, out)
        base["kernel"] = base["kernel"] + lora_scale * delta.astype(
            base["kernel"].dtype
        )
        out[name] = base
    return out
