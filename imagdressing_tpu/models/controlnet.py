"""SD1.5 ControlNet (openpose / inpaint variants), functional JAX, NHWC.

The trunk (conv_in, time embedding, down blocks, mid block) is the SAME
architecture as the UNet encoder, so it reuses `unet.apply(...,
down_only=True)` on a ControlNet-shaped param tree — one definition, no
duplicated forward code (the reference loads
`lllyasviel/control_v11p_sd15_openpose` / `..._inpaint` diffusers models,
inference_IMAGdressing_controlnetpose.py:135-137).

Outputs: 12 down-block residuals + 1 mid residual, matching the UNet skip
list, scaled by `conditioning_scale` (pipelines thread them through
`Conditioning.down_block_residuals` / `.mid_block_residual`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from imagdressing_tpu.core.config import ControlNetConfig, UNetConfig
from imagdressing_tpu.models import unet as unet_lib
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]


def init(rng, cfg: ControlNetConfig) -> Params:
    ucfg = cfg.unet
    keys = iter(jax.random.split(rng, 64))
    trunk = unet_lib.init(next(keys), ucfg)
    # Keep only the encoder half of the UNet tree.
    params: Params = {
        "conv_in": trunk["conv_in"],
        "time_embedding": trunk["time_embedding"],
        "down_blocks": trunk["down_blocks"],
        "mid_block": trunk["mid_block"],
    }

    # conditioning embedding (diffusers ControlNetConditioningEmbedding)
    ch = cfg.conditioning_embedding_channels
    blocks = []
    for i in range(len(ch) - 1):
        blocks.append(nn.param_init_conv(next(keys), 3, 3, ch[i], ch[i]))
        blocks.append(nn.param_init_conv(next(keys), 3, 3, ch[i], ch[i + 1]))
    params["controlnet_cond_embedding"] = {
        "conv_in": nn.param_init_conv(next(keys), 3, 3,
                                      cfg.conditioning_channels, ch[0]),
        "blocks": blocks,
        # zero-init output conv (ControlNet paper)
        "conv_out": {
            "kernel": jnp.zeros((3, 3, ch[-1], ucfg.block_out_channels[0])),
            "bias": jnp.zeros((ucfg.block_out_channels[0],)),
        },
    }

    # zero 1x1 convs on every skip + mid
    n_skips = 1 + sum(
        ucfg.layers_per_block + (1 if i != len(ucfg.block_out_channels) - 1 else 0)
        for i in range(len(ucfg.block_out_channels))
    )
    skip_chs = _skip_channels(ucfg)
    assert len(skip_chs) == n_skips
    params["controlnet_down_blocks"] = [
        {"kernel": jnp.zeros((1, 1, c, c)), "bias": jnp.zeros((c,))}
        for c in skip_chs
    ]
    mid_ch = ucfg.block_out_channels[-1]
    params["controlnet_mid_block"] = {
        "kernel": jnp.zeros((1, 1, mid_ch, mid_ch)),
        "bias": jnp.zeros((mid_ch,)),
    }
    return params


def _skip_channels(ucfg: UNetConfig) -> List[int]:
    chs = [ucfg.block_out_channels[0]]
    for i, c in enumerate(ucfg.block_out_channels):
        chs.extend([c] * ucfg.layers_per_block)
        if i != len(ucfg.block_out_channels) - 1:
            chs.append(c)
    return chs


def precompute_cond_embedding(
    params: Params, cond_image: jnp.ndarray, dtype=None
) -> jnp.ndarray:
    """Timestep-invariant conditioning embedding — seven pixel-space convs
    on the full-res condition image. Pipelines hoist this OUT of the
    sampling scan (same discipline as the garment/IP/text K/V caches) and
    pass the result to `apply(cond_emb=...)`; recomputing it per step would
    pay the full-res convs on all 30-50 iterations."""
    x = cond_image if dtype is None else cond_image.astype(dtype)
    return _cond_embedding(params["controlnet_cond_embedding"], x)


def _cond_embedding(p: Params, cond_image: jnp.ndarray) -> jnp.ndarray:
    """cond_image (B,H,W,3) in [0,1] (pose render) or with -1 masked pixels
    (inpaint, reference make_inpaint_condition) -> (B,H/8,W/8,320)."""
    h = nn.conv2d(p["conv_in"], cond_image, padding=1)
    h = nn.silu(h)
    for i, bp in enumerate(p["blocks"]):
        stride = 2 if i % 2 == 1 else 1
        h = nn.conv2d(bp, h, stride=stride, padding=1)
        h = nn.silu(h)
    return nn.conv2d(p["conv_out"], h, padding=1)


def apply(
    params: Params,
    cfg: ControlNetConfig,
    sample: jnp.ndarray,  # (B,h,w,4) latents
    timesteps: jnp.ndarray,
    encoder_hidden_states: jnp.ndarray,  # (B,77,768) text embeds
    cond_image: jnp.ndarray = None,  # (B,H,W,3) pixel-space condition
    conditioning_scale: float = 1.0,
    cond_emb: jnp.ndarray = None,  # precompute_cond_embedding output
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """-> (down_block_residuals (12,), mid_block_residual).

    Pass `cond_emb` (precomputed once, outside the sampling scan) OR the
    raw `cond_image` (computed here — fine for single calls, wasteful
    inside a scan)."""
    ucfg = cfg.unet
    if cond_emb is None:
        cond_emb = _cond_embedding(params["controlnet_cond_embedding"],
                                   cond_image.astype(sample.dtype))

    # Trunk = UNet encoder with the conditioning embedding added to conv_in
    # output. unet.apply exposes this via `down_only` + additive hook below.
    skips, mid, _ = unet_lib.apply(
        params,
        ucfg,
        sample,
        timesteps,
        encoder_hidden_states,
        down_only=True,
        conv_in_extra=cond_emb,
    )

    down_res = tuple(
        nn.conv2d(zp, s, padding=0) * conditioning_scale
        for zp, s in zip(params["controlnet_down_blocks"], skips)
    )
    mid_res = nn.conv2d(params["controlnet_mid_block"], mid, padding=0)
    return down_res, mid_res * conditioning_scale
