"""Perceiver Resampler family: cloth-token Resampler, FacePerceiverResampler
and the IP-Adapter-FaceID-Plus ProjPlus projector.

Behavioral spec from /root/reference/adapter/resampler.py:
  - PerceiverAttention (:34-78): latents attend over concat(x, latents);
    two-sided sqrt scaling `(q*s) @ (k*s)^T with s = dim_head**-0.25` for
    fp16 stability (:71-73) — reproduced exactly for parity.
  - Resampler (:170-236): learned query tokens, proj_in/out, depth x
    (attention + LN-MLP) with residuals, final LayerNorm. Shipped config:
    dim=768, depth=4, dim_head=64, heads=12, num_queries=16,
    embedding_dim=1280 (inference_IMAGdressing.py:55-64).
  - ProjPlusModel (:250-281): insightface 512-d id embedding -> MLP -> 4
    tokens -> LayerNorm -> FacePerceiverResampler over CLIP face-crop hidden
    states; optional shortcut `x + scale*out`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from imagdressing_tpu.core.config import ProjPlusConfig, ResamplerConfig
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]


def _init_perceiver_attention(rng, dim: int, dim_head: int, heads: int) -> Params:
    kq, kkv, ko = jax.random.split(rng, 3)
    inner = dim_head * heads
    return {
        "norm1": nn.param_init_norm(dim),
        "norm2": nn.param_init_norm(dim),
        "to_q": nn.param_init_linear(kq, dim, inner, bias=False),
        "to_kv": nn.param_init_linear(kkv, dim, inner * 2, bias=False),
        "to_out": nn.param_init_linear(ko, inner, dim, bias=False),
    }


def _init_ff(rng, dim: int, mult: int) -> Params:
    k1, k2 = jax.random.split(rng)
    inner = dim * mult
    return {
        "norm": nn.param_init_norm(dim),
        "fc1": nn.param_init_linear(k1, dim, inner, bias=False),
        "fc2": nn.param_init_linear(k2, inner, dim, bias=False),
    }


def init(rng, cfg: ResamplerConfig) -> Params:
    keys = iter(jax.random.split(rng, 2 * cfg.depth + 4))
    return {
        "latents": jax.random.normal(next(keys), (1, cfg.num_queries, cfg.dim))
        / cfg.dim**0.5,
        "proj_in": nn.param_init_linear(next(keys), cfg.embedding_dim, cfg.dim),
        "layers": [
            {
                "attn": _init_perceiver_attention(next(keys), cfg.dim,
                                                  cfg.dim_head, cfg.heads),
                "ff": _init_ff(next(keys), cfg.dim, cfg.ff_mult),
            }
            for _ in range(cfg.depth)
        ],
        "proj_out": nn.param_init_linear(next(keys), cfg.dim, cfg.output_dim),
        "norm_out": nn.param_init_norm(cfg.output_dim),
    }


def _perceiver_attention(
    p: Params, x: jnp.ndarray, latents: jnp.ndarray, dim_head: int, heads: int
) -> jnp.ndarray:
    """latents (B,n2,D) attend over concat(x (B,n1,D), latents)."""
    x = nn.layer_norm(p["norm1"], x)
    latents = nn.layer_norm(p["norm2"], latents)
    b, n2, _ = latents.shape

    q = nn.linear(p["to_q"], latents)
    kv_input = jnp.concatenate([x, latents], axis=1)
    kv = nn.linear(p["to_kv"], kv_input)
    k, v = jnp.split(kv, 2, axis=-1)

    def heads_first(t):
        return t.reshape(t.shape[0], t.shape[1], heads, dim_head).transpose(0, 2, 1, 3)

    qh, kh, vh = heads_first(q), heads_first(k), heads_first(v)
    # two-sided sqrt scaling, fp32 softmax (reference resampler.py:71-73)
    s = dim_head**-0.25
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * s, kh * s,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, n2, heads * dim_head)
    return nn.linear(p["to_out"], out)


def _ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = nn.layer_norm(p["norm"], x)
    h = nn.linear(p["fc1"], h)
    h = nn.gelu(h)
    return nn.linear(p["fc2"], h)


def apply(params: Params, cfg: ResamplerConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x: CLIP-vision penultimate hidden states (B, 257, embedding_dim)
    -> cloth prompt tokens (B, num_queries, output_dim)."""
    b = x.shape[0]
    latents = jnp.broadcast_to(
        params["latents"].astype(x.dtype), (b, cfg.num_queries, cfg.dim)
    )
    x = nn.linear(params["proj_in"], x)
    for layer in params["layers"]:
        latents = _perceiver_attention(
            layer["attn"], x, latents, cfg.dim_head, cfg.heads
        ) + latents
        latents = _ff(layer["ff"], latents) + latents
    latents = nn.linear(params["proj_out"], latents)
    return nn.layer_norm(params["norm_out"], latents)


# ---------------------------------------------------------------------------
# FacePerceiverResampler + ProjPlus (IP-Adapter-FaceID-Plus)
# ---------------------------------------------------------------------------


def init_face_resampler(rng, cfg: ProjPlusConfig) -> Params:
    dim = cfg.cross_attention_dim
    heads = dim // cfg.dim_head
    keys = iter(jax.random.split(rng, 2 * cfg.depth + 4))
    return {
        "proj_in": nn.param_init_linear(next(keys), cfg.clip_embeddings_dim, dim),
        "layers": [
            {
                "attn": _init_perceiver_attention(next(keys), dim, cfg.dim_head, heads),
                "ff": _init_ff(next(keys), dim, cfg.ff_mult),
            }
            for _ in range(cfg.depth)
        ],
        "proj_out": nn.param_init_linear(next(keys), dim, dim),
        "norm_out": nn.param_init_norm(dim),
    }


def apply_face_resampler(
    params: Params, cfg: ProjPlusConfig, latents: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """latents: externally-provided face tokens (B,4,dim); x: CLIP face-crop
    hidden states (B,257,1280)."""
    heads = cfg.cross_attention_dim // cfg.dim_head
    x = nn.linear(params["proj_in"], x)
    for layer in params["layers"]:
        latents = _perceiver_attention(
            layer["attn"], x, latents, cfg.dim_head, heads
        ) + latents
        latents = _ff(layer["ff"], latents) + latents
    latents = nn.linear(params["proj_out"], latents)
    return nn.layer_norm(params["norm_out"], latents)


def init_proj_plus(rng, cfg: ProjPlusConfig) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    idd = cfg.id_embeddings_dim
    return {
        "proj": {
            "fc1": nn.param_init_linear(k1, idd, idd * 2),
            "fc2": nn.param_init_linear(
                k2, idd * 2, cfg.cross_attention_dim * cfg.num_tokens
            ),
        },
        "norm": nn.param_init_norm(cfg.cross_attention_dim),
        "perceiver_resampler": init_face_resampler(k3, cfg),
    }


def apply_proj_plus(
    params: Params,
    cfg: ProjPlusConfig,
    id_embeds: jnp.ndarray,  # (B, 512) insightface normed embedding
    clip_embeds: jnp.ndarray,  # (B, 257, 1280) CLIP penultimate of face crop
    *,
    shortcut: bool = False,
    scale: float = 1.0,
) -> jnp.ndarray:
    """-> (B, num_tokens, cross_attention_dim) face tokens appended to the
    prompt embeddings (reference ..._ipa_controlnet.py:555-557)."""
    x = nn.linear(params["proj"]["fc1"], id_embeds)
    x = nn.gelu(x)
    x = nn.linear(params["proj"]["fc2"], x)
    x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
    x = nn.layer_norm(params["norm"], x)
    out = apply_face_resampler(params["perceiver_resampler"], cfg, x, clip_embeds)
    if shortcut:
        out = x + scale * out
    return out
