"""Inverse converter: our param pytrees -> the reference's torch checkpoint
layout.

Closes the train->serve artifact loop in BOTH directions: a model trained on
this framework can be exported to the reference's monolithic `.pt` format —
`{"module": {ref_unet.*, unet.*, proj.*, adapter_modules.{idx}.*}}`, exactly
what DeepSpeed's consolidated save produces in the reference
(/root/reference/train.py:179-196) and what its inference scripts prefix-split
(/root/reference/inference_IMAGdressing.py:96-117) — so reference-stack users
can consume checkpoints trained here, and `convert_imagdressing_checkpoint`
round-trips them bit-exactly.

Everything is numpy-side; torch is only needed (and lazily imported) to
serialize a real `.pt` file in `save_checkpoint`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from imagdressing_tpu.core.config import ResamplerConfig, UNetConfig
from imagdressing_tpu.convert.torch_sd import adapter_module_index_map


def _np32(a) -> np.ndarray:
    """Device array / bf16 -> fp32 numpy (the reference stores fp32/fp16;
    torch_sd._np floats on load, so fp32 round-trips bit-exactly)."""
    return np.asarray(a, dtype=np.float32)


def _set_linear(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f"{prefix}.weight"] = _np32(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np32(p["bias"])


def _set_conv(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np32(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _np32(p["bias"])


def _set_norm(sd: Dict, prefix: str, p: Dict) -> None:
    sd[f"{prefix}.weight"] = _np32(p["scale"])
    sd[f"{prefix}.bias"] = _np32(p["bias"])


def _set_attention(sd: Dict, prefix: str, p: Dict) -> None:
    _set_linear(sd, f"{prefix}.to_q", p["to_q"])
    _set_linear(sd, f"{prefix}.to_k", p["to_k"])
    _set_linear(sd, f"{prefix}.to_v", p["to_v"])
    _set_linear(sd, f"{prefix}.to_out.0", p["to_out"])


def _set_transformer_block(sd: Dict, prefix: str, p: Dict) -> None:
    _set_norm(sd, f"{prefix}.norm1", p["norm1"])
    _set_attention(sd, f"{prefix}.attn1", p["attn1"])
    _set_norm(sd, f"{prefix}.norm2", p["norm2"])
    _set_attention(sd, f"{prefix}.attn2", p["attn2"])
    _set_norm(sd, f"{prefix}.norm3", p["norm3"])
    _set_linear(sd, f"{prefix}.ff.net.0.proj", p["ff"]["proj"])
    _set_linear(sd, f"{prefix}.ff.net.2", p["ff"]["out"])


def _set_transformer2d(sd: Dict, prefix: str, p: Dict) -> None:
    _set_norm(sd, f"{prefix}.norm", p["norm"])
    _set_linear(sd, f"{prefix}.proj_in", p["proj_in"])
    for i, blk in enumerate(p["transformer_blocks"]):
        _set_transformer_block(sd, f"{prefix}.transformer_blocks.{i}", blk)
    _set_linear(sd, f"{prefix}.proj_out", p["proj_out"])


def _set_resnet(sd: Dict, prefix: str, p: Dict) -> None:
    _set_norm(sd, f"{prefix}.norm1", p["norm1"])
    _set_conv(sd, f"{prefix}.conv1", p["conv1"])
    _set_norm(sd, f"{prefix}.norm2", p["norm2"])
    _set_conv(sd, f"{prefix}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        _set_linear(sd, f"{prefix}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _set_conv(sd, f"{prefix}.conv_shortcut", p["conv_shortcut"])


def export_unet(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """UNet param tree -> diffusers UNet2DConditionModel state-dict names
    (the exact inverse of torch_sd.convert_unet)."""
    sd: Dict[str, np.ndarray] = {}
    _set_conv(sd, "conv_in", params["conv_in"])
    _set_linear(sd, "time_embedding.linear_1",
                params["time_embedding"]["linear_1"])
    _set_linear(sd, "time_embedding.linear_2",
                params["time_embedding"]["linear_2"])
    for i, block in enumerate(params["down_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _set_resnet(sd, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            _set_transformer2d(sd, f"down_blocks.{i}.attentions.{j}", a)
        for j, d in enumerate(block.get("downsamplers", [])):
            _set_conv(sd, f"down_blocks.{i}.downsamplers.{j}.conv", d["conv"])
    for j, r in enumerate(params["mid_block"]["resnets"]):
        _set_resnet(sd, f"mid_block.resnets.{j}", r)
    for j, a in enumerate(params["mid_block"]["attentions"]):
        _set_transformer2d(sd, f"mid_block.attentions.{j}", a)
    for i, block in enumerate(params["up_blocks"]):
        for j, r in enumerate(block["resnets"]):
            _set_resnet(sd, f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(block["attentions"]):
            _set_transformer2d(sd, f"up_blocks.{i}.attentions.{j}", a)
        for j, u in enumerate(block.get("upsamplers", [])):
            _set_conv(sd, f"up_blocks.{i}.upsamplers.{j}.conv", u["conv"])
    _set_norm(sd, "conv_norm_out", params["conv_norm_out"])
    _set_conv(sd, "conv_out", params["conv_out"])
    return sd


def export_resampler(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Resampler param tree -> reference adapter/resampler.py:170-236 names
    (inverse of torch_sd.convert_resampler)."""
    sd: Dict[str, np.ndarray] = {"latents": _np32(params["latents"])}
    _set_linear(sd, "proj_in", params["proj_in"])
    for i, layer in enumerate(params["layers"]):
        attn, ff = layer["attn"], layer["ff"]
        _set_norm(sd, f"layers.{i}.0.norm1", attn["norm1"])
        _set_norm(sd, f"layers.{i}.0.norm2", attn["norm2"])
        _set_linear(sd, f"layers.{i}.0.to_q", attn["to_q"])
        _set_linear(sd, f"layers.{i}.0.to_kv", attn["to_kv"])
        _set_linear(sd, f"layers.{i}.0.to_out", attn["to_out"])
        _set_norm(sd, f"layers.{i}.1.0", ff["norm"])
        _set_linear(sd, f"layers.{i}.1.1", ff["fc1"])
        _set_linear(sd, f"layers.{i}.1.3", ff["fc2"])
    _set_linear(sd, "proj_out", params["proj_out"])
    _set_norm(sd, "norm_out", params["norm_out"])
    return sd


def export_imagdressing_module(
    params: Dict[str, Any],
    unet_cfg: Optional[UNetConfig] = None,
    resampler_cfg: Optional[ResamplerConfig] = None,  # noqa: ARG001 — parity
) -> Dict[str, np.ndarray]:
    """Trainable params {ref_unet, ref_adapters, resampler} (+ optional
    frozen `unet`) -> the flat `"module"` dict of the reference checkpoint.

    adapter_modules uses the interleaved attn1/attn2 index order of
    diffusers' attn_processors (adapter_module_index_map); odd (CAttn)
    indices are paramless and emit nothing, matching the reference ModuleList
    where those processors have no parameters.
    """
    unet_cfg = unet_cfg or UNetConfig()
    module: Dict[str, np.ndarray] = {}
    for k, v in export_unet(params["ref_unet"]).items():
        module[f"ref_unet.{k}"] = v
    if "unet" in params:
        for k, v in export_unet(params["unet"]).items():
            module[f"unet.{k}"] = v
    for k, v in export_resampler(params["resampler"]).items():
        module[f"proj.{k}"] = v
    adapters = params["ref_adapters"]
    for idx, name in adapter_module_index_map(unet_cfg):
        if name in adapters:
            module[f"adapter_modules.{idx}.to_k_ref.weight"] = _np32(
                adapters[name]["to_k_ref"]["kernel"]
            ).T
            module[f"adapter_modules.{idx}.to_v_ref.weight"] = _np32(
                adapters[name]["to_v_ref"]["kernel"]
            ).T
    return module


def save_checkpoint(path: str, module: Dict[str, np.ndarray]) -> None:
    """Serialize `{"module": ...}` as a torch `.pt` the reference stack loads
    directly (torch.load -> ["module"] -> prefix split)."""
    import torch

    torch.save(
        {"module": {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in module.items()}},
        path,
    )
