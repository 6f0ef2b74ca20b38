"""AutoencoderKL (SD1.5 / sd-vae-ft-mse), functional JAX, NHWC.

The reference loads `stabilityai/sd-vae-ft-mse` (fp16) at
/root/reference/inference_IMAGdressing.py:44 and uses:
  - encode(...).latent_dist.mean  * 0.18215 at inference
    (IMAGDressing_v1_pipeline.py:457-458)
  - encode(...).latent_dist.sample() * 0.18215 in training (train.py:521-527)
  - decode(latents / 0.18215) for output (IMAGDressing_v1_pipeline.py:544)

TPU notes: NHWC everywhere; the single-head mid-block attention runs as one
fused SDPA over (H/8*W/8) tokens; downsampling uses the asymmetric (0,1) pad
of diffusers' Downsample2D(padding=0) + manual F.pad.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from imagdressing_tpu.core.config import VAEConfig
from imagdressing_tpu.kernels.fused_gn_conv import gn_silu_conv3x3
import imagdressing_tpu.ops.attention as attn_ops
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]


def _init_resnet(rng, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "norm1": nn.param_init_norm(in_ch),
        "conv1": nn.param_init_conv(k1, 3, 3, in_ch, out_ch),
        "norm2": nn.param_init_norm(out_ch),
        "conv2": nn.param_init_conv(k2, 3, 3, out_ch, out_ch),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = nn.param_init_conv(k3, 1, 1, in_ch, out_ch)
    return p


def _init_attn(rng, ch):
    kq, kk, kv, ko = jax.random.split(rng, 4)
    return {
        "group_norm": nn.param_init_norm(ch),
        "to_q": nn.param_init_linear(kq, ch, ch),
        "to_k": nn.param_init_linear(kk, ch, ch),
        "to_v": nn.param_init_linear(kv, ch, ch),
        "to_out": nn.param_init_linear(ko, ch, ch),
    }


def init(rng, cfg: VAEConfig) -> Params:
    keys = iter(jax.random.split(rng, 128))
    chs = cfg.block_out_channels
    n = len(chs)

    enc: Params = {
        "conv_in": nn.param_init_conv(next(keys), 3, 3, cfg.in_channels, chs[0]),
        "down_blocks": [],
    }
    out_ch = chs[0]
    for i, ch in enumerate(chs):
        in_ch, out_ch = out_ch, ch
        block = {"resnets": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(
                _init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch)
            )
        if i != n - 1:
            block["downsamplers"] = [
                {"conv": nn.param_init_conv(next(keys), 3, 3, out_ch, out_ch)}
            ]
        enc["down_blocks"].append(block)
    enc["mid_block"] = {
        "resnets": [_init_resnet(next(keys), chs[-1], chs[-1]),
                    _init_resnet(next(keys), chs[-1], chs[-1])],
        "attentions": [_init_attn(next(keys), chs[-1])],
    }
    enc["conv_norm_out"] = nn.param_init_norm(chs[-1])
    enc["conv_out"] = nn.param_init_conv(
        next(keys), 3, 3, chs[-1], 2 * cfg.latent_channels
    )

    dec: Params = {
        "conv_in": nn.param_init_conv(next(keys), 3, 3, cfg.latent_channels, chs[-1]),
        "mid_block": {
            "resnets": [_init_resnet(next(keys), chs[-1], chs[-1]),
                        _init_resnet(next(keys), chs[-1], chs[-1])],
            "attentions": [_init_attn(next(keys), chs[-1])],
        },
        "up_blocks": [],
    }
    rev = list(reversed(chs))
    out_ch = rev[0]
    for i, ch in enumerate(rev):
        in_ch, out_ch = out_ch, ch
        block = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(
                _init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch)
            )
        if i != n - 1:
            block["upsamplers"] = [
                {"conv": nn.param_init_conv(next(keys), 3, 3, out_ch, out_ch)}
            ]
        dec["up_blocks"].append(block)
    dec["conv_norm_out"] = nn.param_init_norm(chs[0])
    dec["conv_out"] = nn.param_init_conv(next(keys), 3, 3, chs[0], cfg.out_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": nn.param_init_conv(
            next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels
        ),
        "post_quant_conv": nn.param_init_conv(
            next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels
        ),
    }


def _resnet(p, x, cfg: VAEConfig):
    # Fused gn+silu+conv3x3 Pallas pass where the activation fits VMEM (the
    # latent-resolution decoder/encoder levels); image-resolution levels
    # fall back to the GN kernel + XLA conv inside the wrapper.
    h = gn_silu_conv3x3(p["norm1"], p["conv1"], x,
                        num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = gn_silu_conv3x3(p["norm2"], p["conv2"], h,
                        num_groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    if "conv_shortcut" in p:
        x = nn.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _mid_attention(p, x, cfg: VAEConfig):
    """Single-head spatial attention at the bottleneck (diffusers Attention
    with heads=1 in the VAE mid block)."""
    b, h, w, c = x.shape
    hidden = nn.group_norm(p["group_norm"], x, num_groups=cfg.norm_num_groups,
                           eps=cfg.norm_eps)
    hidden = hidden.reshape(b, h * w, c)
    q = nn.linear(p["to_q"], hidden)
    k = nn.linear(p["to_k"], hidden)
    v = nn.linear(p["to_v"], hidden)
    out = attn_ops.attention(q, k, v, num_heads=1)
    out = nn.linear(p["to_out"], out).reshape(b, h, w, c)
    return x + out


def _mid_block(p, x, cfg: VAEConfig):
    x = _resnet(p["resnets"][0], x, cfg)
    x = _mid_attention(p["attentions"][0], x, cfg)
    return _resnet(p["resnets"][1], x, cfg)


def encode_moments(params: Params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """images (B,H,W,3) in [-1,1] -> moments (B,H/8,W/8,8) = [mean, logvar]."""
    p = params["encoder"]
    h = nn.conv2d(p["conv_in"], images, padding=1)
    for i, block in enumerate(p["down_blocks"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, cfg)
        if "downsamplers" in block:
            # diffusers Downsample2D(padding=0) + asymmetric (0,1,0,1) pad
            h = nn.conv2d(block["downsamplers"][0]["conv"], h, stride=2,
                          padding=((0, 1), (0, 1)))
    h = _mid_block(p["mid_block"], h, cfg)
    h = nn.group_norm(p["conv_norm_out"], h, num_groups=cfg.norm_num_groups,
                      eps=cfg.norm_eps)
    h = nn.silu(h)
    h = nn.conv2d(p["conv_out"], h, padding=1)
    return nn.conv2d(params["quant_conv"], h, padding=0)


def encode_mean(params: Params, cfg: VAEConfig, images: jnp.ndarray) -> jnp.ndarray:
    """latent_dist.mean — the inference path (pipeline.py:457)."""
    moments = encode_moments(params, cfg, images)
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean


def encode_sample(
    params: Params, cfg: VAEConfig, images: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """latent_dist.sample() — the training path (train.py:521-527)."""
    moments = encode_moments(params, cfg, images)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """latents (B,h,w,4) (already divided by scaling factor) -> images
    (B,8h,8w,3) in [-1,1]."""
    p = params["decoder"]
    z = nn.conv2d(params["post_quant_conv"], latents, padding=0)
    h = nn.conv2d(p["conv_in"], z, padding=1)
    h = _mid_block(p["mid_block"], h, cfg)
    for i, block in enumerate(p["up_blocks"]):
        for rp in block["resnets"]:
            h = _resnet(rp, h, cfg)
        if "upsamplers" in block:
            # fused subpixel conv == upsample_nearest_2x + conv3x3
            h = nn.upsample2x_conv(block["upsamplers"][0]["conv"], h)
    h = nn.group_norm(p["conv_norm_out"], h, num_groups=cfg.norm_num_groups,
                      eps=cfg.norm_eps)
    h = nn.silu(h)
    return nn.conv2d(p["conv_out"], h, padding=1)
