"""Multi-head attention dispatch: Pallas flash kernel on TPU for long
sequences, XLA `jax.nn.dot_product_attention` elsewhere.

All model code calls these two entry points; the RefS hybrid attention of the
reference (/root/reference/adapter/attention_processor.py:513-627) becomes a
single `dual_kv_attention` call.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp

from imagdressing_tpu.kernels.flash_attention import (
    flash_attention,
    flash_attention_supported,
)


def _use_pallas() -> bool:
    if os.environ.get("IMAGDRESSING_DISABLE_PALLAS", "0") == "1":
        return False
    # Computation follows jax_default_device when set (tests pin it to CPU
    # while the axon TPU backend stays registered as the default platform).
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, c = x.shape
    return x.reshape(b, s, num_heads, c // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)


def _xla_sdpa(q, k, v):
    """(B,S,H,D) attention with fp32 softmax."""
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Plain MHA. q/k/v: (B, S, C_inner) already projected. Returns (B,Sq,C)."""
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    sq, skv = qh.shape[1], kh.shape[1]
    if _use_pallas() and flash_attention_supported(sq, skv):
        out = flash_attention(qh, kh, vh)
    else:
        out = _xla_sdpa(qh, kh, vh)
    return _merge_heads(out)


def dual_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    k_ref: jnp.ndarray,
    v_ref: jnp.ndarray,
    ref_scale,
    num_heads: int,
) -> jnp.ndarray:
    """Hybrid reference attention:

        out = SDPA(q,k,v) + ref_scale * SDPA(q,k_ref,v_ref)

    ref_scale may be a scalar or per-batch (B,) vector (the CFG-fused batch
    uses [0, image_scale] so the uncond half gets no garment injection,
    matching the reference's cond-only `sa_hidden_states` pass at
    IMAGDressing_v1_pipeline.py:499-518).
    """
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    krh, vrh = _split_heads(k_ref, num_heads), _split_heads(v_ref, num_heads)
    sq, skv = qh.shape[1], kh.shape[1]
    if (
        _use_pallas()
        and kh.shape[1] == krh.shape[1]
        and flash_attention_supported(sq, skv)
    ):
        out = flash_attention(qh, kh, vh, krh, vrh, ref_scale)
    else:
        scale = jnp.asarray(ref_scale, jnp.float32)
        scale = scale.reshape(-1, 1, 1, 1) if scale.ndim > 0 else scale
        out = _xla_sdpa(qh, kh, vh) + (
            scale * _xla_sdpa(qh, krh, vrh).astype(jnp.float32)
        ).astype(q.dtype)
    return _merge_heads(out)
