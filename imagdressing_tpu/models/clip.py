"""CLIP text and vision towers, functional JAX.

Text: ViT-L/14 text encoder (SD1.5 / Realistic_Vision text_encoder, loaded by
the reference at /root/reference/inference_IMAGdressing.py:45-46); output is
the final-LayerNorm hidden states consumed as prompt embeddings.

Vision: ViT-H/14 (h94/IP-Adapter models/image_encoder,
inference_IMAGdressing.py:48-49). The reference consumes
`output_hidden_states=True).hidden_states[-2]` — the PENULTIMATE layer
output, WITHOUT post_layernorm (IMAGDressing_v1_pipeline.py:409-415), as the
Resampler input. `apply_vision(..., penultimate=True)` reproduces exactly
that tensor.

Both towers are golden-tested against HuggingFace transformers' torch
implementations (tests/test_clip.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from imagdressing_tpu.core.config import CLIPTextConfig, CLIPVisionConfig
import imagdressing_tpu.ops.attention as attn_ops
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]


def _init_encoder_layer(rng, hidden: int, intermediate: int) -> Params:
    kq, kk, kv, ko, k1, k2 = jax.random.split(rng, 6)
    return {
        "layer_norm1": nn.param_init_norm(hidden),
        "self_attn": {
            "q_proj": nn.param_init_linear(kq, hidden, hidden),
            "k_proj": nn.param_init_linear(kk, hidden, hidden),
            "v_proj": nn.param_init_linear(kv, hidden, hidden),
            "out_proj": nn.param_init_linear(ko, hidden, hidden),
        },
        "layer_norm2": nn.param_init_norm(hidden),
        "mlp": {
            "fc1": nn.param_init_linear(k1, hidden, intermediate),
            "fc2": nn.param_init_linear(k2, intermediate, hidden),
        },
    }


def init_text(rng, cfg: CLIPTextConfig) -> Params:
    keys = iter(jax.random.split(rng, cfg.num_layers + 4))
    return {
        "token_embedding": {
            "embedding": jax.random.normal(
                next(keys), (cfg.vocab_size, cfg.hidden_size)) * 0.02
        },
        "position_embedding": {
            "embedding": jax.random.normal(
                next(keys), (cfg.max_position_embeddings, cfg.hidden_size)) * 0.02
        },
        "layers": [
            _init_encoder_layer(next(keys), cfg.hidden_size, cfg.intermediate_size)
            for _ in range(cfg.num_layers)
        ],
        "final_layer_norm": nn.param_init_norm(cfg.hidden_size),
    }


def init_vision(rng, cfg: CLIPVisionConfig) -> Params:
    keys = iter(jax.random.split(rng, cfg.num_layers + 6))
    return {
        "class_embedding": jax.random.normal(next(keys), (cfg.hidden_size,)) * 0.02,
        "patch_embedding": {
            "kernel": jax.random.normal(
                next(keys),
                (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size)) * 0.02
        },
        "position_embedding": {
            "embedding": jax.random.normal(
                next(keys), (cfg.seq_len, cfg.hidden_size)) * 0.02
        },
        "pre_layrnorm": nn.param_init_norm(cfg.hidden_size),  # sic — HF typo kept
        "layers": [
            _init_encoder_layer(next(keys), cfg.hidden_size, cfg.intermediate_size)
            for _ in range(cfg.num_layers)
        ],
        "post_layernorm": nn.param_init_norm(cfg.hidden_size),
        "visual_projection": {
            "kernel": jax.random.normal(
                next(keys), (cfg.hidden_size, cfg.projection_dim)) * 0.02
        },
    }


def _encoder_layer(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    act,
    eps: float,
    causal_mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    res = x
    h = nn.layer_norm(p["layer_norm1"], x, eps=eps)
    ap = p["self_attn"]
    q = nn.linear(ap["q_proj"], h)
    k = nn.linear(ap["k_proj"], h)
    v = nn.linear(ap["v_proj"], h)
    if causal_mask is not None:
        b, s, c = q.shape
        d = c // num_heads
        qh = q.reshape(b, s, num_heads, d)
        kh = k.reshape(b, s, num_heads, d)
        vh = v.reshape(b, s, num_heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / (d**0.5)
        logits = jnp.where(causal_mask, logits, jnp.float32(-1e9))
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, s, c)
    else:
        out = attn_ops.attention(q, k, v, num_heads)
    x = res + nn.linear(ap["out_proj"], out)

    res = x
    h = nn.layer_norm(p["layer_norm2"], x, eps=eps)
    h = nn.linear(p["mlp"]["fc1"], h)
    h = act(h)
    h = nn.linear(p["mlp"]["fc2"], h)
    return res + h


def apply_text(
    params: Params,
    cfg: CLIPTextConfig,
    input_ids: jnp.ndarray,  # (B, 77) int32
    *,
    clip_skip: int = 0,
) -> jnp.ndarray:
    """Returns last_hidden_state (B, 77, hidden) after final LN — what
    diffusers' encode_prompt feeds the UNet.

    clip_skip=k drops the LAST k encoder layers and still applies the final
    LayerNorm — diffusers' `hidden_states[-(clip_skip + 1)]` +
    `final_layer_norm` semantics (reference encode_prompt,
    IMAGDressing_v1_pipeline.py:185-201); anime checkpoints ship with
    clip_skip=2 conventions."""
    b, s = input_ids.shape
    x = params["token_embedding"]["embedding"][input_ids]
    x = x + params["position_embedding"]["embedding"][:s]
    mask = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    act = nn.quick_gelu if cfg.hidden_act == "quick_gelu" else nn.gelu
    layers = params["layers"]
    if clip_skip:
        layers = layers[: len(layers) - clip_skip]
    for lp in layers:
        x = _encoder_layer(lp, x, cfg.num_heads, act, cfg.layer_norm_eps, mask)
    return nn.layer_norm(params["final_layer_norm"], x, eps=cfg.layer_norm_eps)


def apply_vision(
    params: Params,
    cfg: CLIPVisionConfig,
    pixel_values: jnp.ndarray,  # (B, 224, 224, 3) CLIP-normalized, NHWC
    *,
    penultimate: bool = True,
) -> jnp.ndarray:
    """penultimate=True -> hidden_states[-2] (B, 257, hidden), the Resampler
    input; penultimate=False -> last_hidden_state (all layers, NO post-LN —
    HF applies post_layernorm only to the pooled CLS token)."""
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values,
        params["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(patches.dtype)[None, None],
        (b, 1, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + params["position_embedding"]["embedding"].astype(x.dtype)[None]
    x = nn.layer_norm(params["pre_layrnorm"], x, eps=cfg.layer_norm_eps)

    act = nn.quick_gelu if cfg.hidden_act == "quick_gelu" else nn.gelu
    n_layers = cfg.num_layers - 1 if penultimate else cfg.num_layers
    for lp in params["layers"][:n_layers]:
        x = _encoder_layer(lp, x, cfg.num_heads, act, cfg.layer_norm_eps, None)
    return x


def vision_pooled_embed(params: Params, cfg: CLIPVisionConfig,
                        last_hidden: jnp.ndarray) -> jnp.ndarray:
    """post_layernorm(CLS) @ visual_projection — CLIPVisionModelWithProjection
    .image_embeds (computed but unused by the reference pipelines)."""
    pooled = nn.layer_norm(
        params["post_layernorm"], last_hidden[:, 0], eps=cfg.layer_norm_eps
    )
    return pooled @ params["visual_projection"]["kernel"].astype(pooled.dtype)


# CLIP image preprocessing constants (CLIPImageProcessor defaults used by the
# reference via `CLIPImageProcessor()` at inference_IMAGdressing.py:173).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images_01: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """(B,H,W,3) in [0,1] -> resized + CLIP-normalized (B,size,size,3).

    Bicubic resize matching CLIPImageProcessor(resample=BICUBIC).
    """
    b = images_01.shape[0]
    x = jax.image.resize(images_01, (b, size, size, 3), method="bicubic")
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    return (x - mean) / std
