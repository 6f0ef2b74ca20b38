"""Torch/HF checkpoint -> JAX param-tree conversion.

Handles every artifact the reference stack loads:
  * diffusers UNet2DConditionModel / AutoencoderKL / ControlNetModel
  * transformers CLIPTextModel / CLIPVisionModelWithProjection
  * the monolithic IMAGDressing-v1_512.pt with top-level key "module" and
    prefixes ref_unet. / unet. / proj. / adapter_modules.
    (/root/reference/inference_IMAGdressing.py:96-117)
  * ip-adapter-faceid-plusv2_sd15.bin with "image_proj" / "ip_adapter" dicts
    (reference load_ip_adapter, ..._ipa_controlnet.py:88-101)

Weight-layout permutations happen exactly once here (torch OIHW conv ->
HWIO; torch Linear (out,in) -> (in,out)); run-time code never transposes.

Quirk parity: the reference builds `unet_dict` from the checkpoint but never
loads it into the main UNet (inference_IMAGdressing.py:115-117 — the main
UNet keeps base SD weights). `convert_imagdressing_checkpoint` reproduces
that by default (load_main_unet=False).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from imagdressing_tpu.core.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    ControlNetConfig,
    ProjPlusConfig,
    ResamplerConfig,
    UNetConfig,
)


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16/f16)
    return t.detach().to("cpu").float().numpy()


def _linear(sd: Dict, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"])
    p = {"kernel": np.transpose(w, (2, 3, 1, 0))}  # OIHW -> HWIO
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _conv1x1_as_linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """1x1 conv (or Linear in newer diffusers) -> linear kernel (in,out)."""
    w = _np(sd[f"{prefix}.weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    p = {"kernel": w.T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _norm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attention(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "to_q": _conv1x1_as_linear(sd, f"{prefix}.to_q"),
        "to_k": _conv1x1_as_linear(sd, f"{prefix}.to_k"),
        "to_v": _conv1x1_as_linear(sd, f"{prefix}.to_v"),
        "to_out": _conv1x1_as_linear(sd, f"{prefix}.to_out.0"),
    }


def _transformer_block(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn1": _attention(sd, f"{prefix}.attn1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "attn2": _attention(sd, f"{prefix}.attn2"),
        "norm3": _norm(sd, f"{prefix}.norm3"),
        "ff": {
            "proj": _linear(sd, f"{prefix}.ff.net.0.proj"),
            "out": _linear(sd, f"{prefix}.ff.net.2"),
        },
    }


def _transformer2d(sd: Dict, prefix: str, n_layers: int) -> Dict[str, Any]:
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv1x1_as_linear(sd, f"{prefix}.proj_in"),
        "transformer_blocks": [
            _transformer_block(sd, f"{prefix}.transformer_blocks.{i}")
            for i in range(n_layers)
        ],
        "proj_out": _conv1x1_as_linear(sd, f"{prefix}.proj_out"),
    }


def _resnet(sd: Dict, prefix: str, time_emb: bool = True) -> Dict[str, Any]:
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if time_emb and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _linear(sd, f"{prefix}.time_emb_proj")
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return p


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def convert_unet(sd: Dict, cfg: UNetConfig = UNetConfig()) -> Dict[str, Any]:
    n_blocks = len(cfg.block_out_channels)
    tl = cfg.transformer_layers_per_block
    params: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
        "up_blocks": [],
    }
    for i in range(n_blocks):
        block: Dict[str, Any] = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(_resnet(sd, f"down_blocks.{i}.resnets.{j}"))
            if cfg.down_block_has_attn[i]:
                block["attentions"].append(
                    _transformer2d(sd, f"down_blocks.{i}.attentions.{j}", tl)
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsamplers"] = [
                {"conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
            ]
        params["down_blocks"].append(block)

    params["mid_block"] = {
        "resnets": [
            _resnet(sd, "mid_block.resnets.0"),
            _resnet(sd, "mid_block.resnets.1"),
        ],
        "attentions": [_transformer2d(sd, "mid_block.attentions.0", tl)],
    }

    for i in range(n_blocks):
        block = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            block["resnets"].append(_resnet(sd, f"up_blocks.{i}.resnets.{j}"))
            if cfg.up_block_has_attn[i]:
                block["attentions"].append(
                    _transformer2d(sd, f"up_blocks.{i}.attentions.{j}", tl)
                )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsamplers"] = [
                {"conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
            ]
        params["up_blocks"].append(block)

    params["conv_norm_out"] = _norm(sd, "conv_norm_out")
    params["conv_out"] = _conv(sd, "conv_out")
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_attention(sd: Dict, prefix: str) -> Dict[str, Any]:
    # modern diffusers: to_q/to_k/to_v/to_out.0; legacy: query/key/value/proj_attn
    if f"{prefix}.to_q.weight" in sd:
        return {
            "group_norm": _norm(sd, f"{prefix}.group_norm"),
            "to_q": _conv1x1_as_linear(sd, f"{prefix}.to_q"),
            "to_k": _conv1x1_as_linear(sd, f"{prefix}.to_k"),
            "to_v": _conv1x1_as_linear(sd, f"{prefix}.to_v"),
            "to_out": _conv1x1_as_linear(sd, f"{prefix}.to_out.0"),
        }
    return {
        "group_norm": _norm(sd, f"{prefix}.group_norm"),
        "to_q": _conv1x1_as_linear(sd, f"{prefix}.query"),
        "to_k": _conv1x1_as_linear(sd, f"{prefix}.key"),
        "to_v": _conv1x1_as_linear(sd, f"{prefix}.value"),
        "to_out": _conv1x1_as_linear(sd, f"{prefix}.proj_attn"),
    }


def convert_vae(sd: Dict, cfg=None) -> Dict[str, Any]:
    from imagdressing_tpu.core.config import VAEConfig

    cfg = cfg or VAEConfig()
    n = len(cfg.block_out_channels)

    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "down_blocks": [],
        "mid_block": {
            "resnets": [
                _resnet(sd, "encoder.mid_block.resnets.0", time_emb=False),
                _resnet(sd, "encoder.mid_block.resnets.1", time_emb=False),
            ],
            "attentions": [_vae_attention(sd, "encoder.mid_block.attentions.0")],
        },
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for i in range(n):
        block = {
            "resnets": [
                _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", time_emb=False)
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsamplers"] = [
                {"conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
            ]
        enc["down_blocks"].append(block)

    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_block": {
            "resnets": [
                _resnet(sd, "decoder.mid_block.resnets.0", time_emb=False),
                _resnet(sd, "decoder.mid_block.resnets.1", time_emb=False),
            ],
            "attentions": [_vae_attention(sd, "decoder.mid_block.attentions.0")],
        },
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "up_blocks": [],
    }
    for i in range(n):
        block = {
            "resnets": [
                _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", time_emb=False)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            block["upsamplers"] = [
                {"conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
            ]
        dec["up_blocks"].append(block)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def _clip_layer(sd: Dict, prefix: str) -> Dict[str, Any]:
    return {
        "layer_norm1": _norm(sd, f"{prefix}.layer_norm1"),
        "self_attn": {
            "q_proj": _linear(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{prefix}.self_attn.out_proj"),
        },
        "layer_norm2": _norm(sd, f"{prefix}.layer_norm2"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": _linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_clip_text(sd: Dict, cfg: CLIPTextConfig = CLIPTextConfig()) -> Dict:
    pre = "text_model."
    return {
        "token_embedding": {
            "embedding": _np(sd[f"{pre}embeddings.token_embedding.weight"])
        },
        "position_embedding": {
            "embedding": _np(sd[f"{pre}embeddings.position_embedding.weight"])
        },
        "layers": [
            _clip_layer(sd, f"{pre}encoder.layers.{i}")
            for i in range(cfg.num_layers)
        ],
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
    }


def convert_clip_vision(sd: Dict, cfg: CLIPVisionConfig = CLIPVisionConfig()) -> Dict:
    pre = "vision_model."
    w = _np(sd[f"{pre}embeddings.patch_embedding.weight"])  # (O,3,14,14)
    params = {
        "class_embedding": _np(sd[f"{pre}embeddings.class_embedding"]),
        "patch_embedding": {"kernel": np.transpose(w, (2, 3, 1, 0))},
        "position_embedding": {
            "embedding": _np(sd[f"{pre}embeddings.position_embedding.weight"])
        },
        "pre_layrnorm": _norm(sd, f"{pre}pre_layrnorm"),
        "layers": [
            _clip_layer(sd, f"{pre}encoder.layers.{i}")
            for i in range(cfg.num_layers)
        ],
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
    }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = {"kernel": _np(sd["visual_projection.weight"]).T}
    return params


# ---------------------------------------------------------------------------
# ControlNet
# ---------------------------------------------------------------------------


def convert_controlnet(sd: Dict, cfg: ControlNetConfig = ControlNetConfig()) -> Dict:
    ucfg = cfg.unet
    trunk = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
    }
    tl = ucfg.transformer_layers_per_block
    for i in range(len(ucfg.block_out_channels)):
        block: Dict[str, Any] = {"resnets": [], "attentions": []}
        for j in range(ucfg.layers_per_block):
            block["resnets"].append(_resnet(sd, f"down_blocks.{i}.resnets.{j}"))
            if ucfg.down_block_has_attn[i]:
                block["attentions"].append(
                    _transformer2d(sd, f"down_blocks.{i}.attentions.{j}", tl)
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            block["downsamplers"] = [
                {"conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
            ]
        trunk["down_blocks"].append(block)
    trunk["mid_block"] = {
        "resnets": [
            _resnet(sd, "mid_block.resnets.0"),
            _resnet(sd, "mid_block.resnets.1"),
        ],
        "attentions": [_transformer2d(sd, "mid_block.attentions.0", tl)],
    }

    n_zero = 1 + sum(
        ucfg.layers_per_block
        + (1 if i != len(ucfg.block_out_channels) - 1 else 0)
        for i in range(len(ucfg.block_out_channels))
    )
    ce_blocks = []
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        ce_blocks.append(_conv(sd, f"controlnet_cond_embedding.blocks.{i}"))
        i += 1
    trunk["controlnet_cond_embedding"] = {
        "conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
        "blocks": ce_blocks,
        "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out"),
    }
    trunk["controlnet_down_blocks"] = [
        _conv(sd, f"controlnet_down_blocks.{i}") for i in range(n_zero)
    ]
    trunk["controlnet_mid_block"] = _conv(sd, "controlnet_mid_block")
    return trunk


# ---------------------------------------------------------------------------
# Resampler / ProjPlus / adapters
# ---------------------------------------------------------------------------


def convert_resampler(sd: Dict, cfg: ResamplerConfig = ResamplerConfig()) -> Dict:
    """Reference Resampler naming (adapter/resampler.py:170-236):
    latents, proj_in, proj_out, norm_out, layers.{i}.0 (PerceiverAttention),
    layers.{i}.1 (FeedForward Sequential [LN, Linear, GELU, Linear])."""
    return {
        "latents": _np(sd["latents"]),
        "proj_in": _linear(sd, "proj_in"),
        "layers": [
            {
                "attn": {
                    "norm1": _norm(sd, f"layers.{i}.0.norm1"),
                    "norm2": _norm(sd, f"layers.{i}.0.norm2"),
                    "to_q": _linear(sd, f"layers.{i}.0.to_q"),
                    "to_kv": _linear(sd, f"layers.{i}.0.to_kv"),
                    "to_out": _linear(sd, f"layers.{i}.0.to_out"),
                },
                "ff": {
                    "norm": _norm(sd, f"layers.{i}.1.0"),
                    "fc1": _linear(sd, f"layers.{i}.1.1"),
                    "fc2": _linear(sd, f"layers.{i}.1.3"),
                },
            }
            for i in range(cfg.depth)
        ],
        "proj_out": _linear(sd, "proj_out"),
        "norm_out": _norm(sd, "norm_out"),
    }


def convert_proj_plus(sd: Dict, cfg: ProjPlusConfig = ProjPlusConfig()) -> Dict:
    """ProjPlusModel naming (adapter/resampler.py:250-281): proj.0/proj.2,
    norm, perceiver_resampler.{proj_in,proj_out,norm_out,layers.{i}.{0,1}}."""
    pr = "perceiver_resampler"
    return {
        "proj": {
            "fc1": _linear(sd, "proj.0"),
            "fc2": _linear(sd, "proj.2"),
        },
        "norm": _norm(sd, "norm"),
        "perceiver_resampler": {
            "proj_in": _linear(sd, f"{pr}.proj_in"),
            "layers": [
                {
                    "attn": {
                        "norm1": _norm(sd, f"{pr}.layers.{i}.0.norm1"),
                        "norm2": _norm(sd, f"{pr}.layers.{i}.0.norm2"),
                        "to_q": _linear(sd, f"{pr}.layers.{i}.0.to_q"),
                        "to_kv": _linear(sd, f"{pr}.layers.{i}.0.to_kv"),
                        "to_out": _linear(sd, f"{pr}.layers.{i}.0.to_out"),
                    },
                    "ff": {
                        "norm": _norm(sd, f"{pr}.layers.{i}.1.0"),
                        "fc1": _linear(sd, f"{pr}.layers.{i}.1.1"),
                        "fc2": _linear(sd, f"{pr}.layers.{i}.1.3"),
                    },
                }
                for i in range(cfg.depth)
            ],
            "proj_out": _linear(sd, f"{pr}.proj_out"),
            "norm_out": _norm(sd, f"{pr}.norm_out"),
        },
    }


def adapter_module_index_map(cfg: UNetConfig = UNetConfig()) -> List[Tuple[int, str]]:
    """(index, layer_name) for the reference's `adapter_modules` ModuleList.

    diffusers attn_processors interleaves attn1/attn2 per transformer block
    in module-registration order: down_blocks -> up_blocks -> mid_block
    (ModuleList built at /root/reference/train.py:364 /
    inference_IMAGdressing.py:88). Even positions are RefS (attn1) procs with
    to_k_ref/to_v_ref weights; odd positions are paramless CAttn (attn2) —
    but both consume an index.
    """
    pairs = []
    idx = 0
    from imagdressing_tpu.models.unet import attn_layer_names

    a1 = attn_layer_names(cfg, "attn1")
    a2 = attn_layer_names(cfg, "attn2")
    for n1, n2 in zip(a1, a2):
        pairs.append((idx, n1))
        idx += 1
        pairs.append((idx, n2))
        idx += 1
    return pairs


def convert_imagdressing_checkpoint(
    module_sd: Dict,
    unet_cfg: UNetConfig = UNetConfig(),
    resampler_cfg: ResamplerConfig = ResamplerConfig(),
    *,
    load_main_unet: bool = False,
) -> Dict[str, Any]:
    """Split + convert the monolithic training checkpoint (the `"module"`
    sub-dict of IMAGDressing-v1_512.pt). Returns
    {ref_unet, resampler, ref_adapters[, unet]}.

    load_main_unet=False reproduces the shipped behavior: the reference
    builds `unet_dict` but never loads it (inference_IMAGdressing.py:115-117).
    """
    prefixed: Dict[str, Dict] = {"ref_unet": {}, "unet": {}, "proj": {},
                                 "adapter_modules": {}}
    for k, v in module_sd.items():
        for pre in prefixed:
            if k.startswith(pre + "."):
                prefixed[pre][k[len(pre) + 1:]] = v
                break

    out: Dict[str, Any] = {
        "ref_unet": convert_unet(prefixed["ref_unet"], unet_cfg),
        "resampler": convert_resampler(prefixed["proj"], resampler_cfg),
        "ref_adapters": {},
    }
    for idx, name in adapter_module_index_map(unet_cfg):
        kk = f"{idx}.to_k_ref.weight"
        if kk in prefixed["adapter_modules"]:
            out["ref_adapters"][name] = {
                "to_k_ref": {"kernel": _np(prefixed["adapter_modules"][kk]).T},
                "to_v_ref": {
                    "kernel": _np(
                        prefixed["adapter_modules"][f"{idx}.to_v_ref.weight"]
                    ).T
                },
            }
    if load_main_unet and prefixed["unet"]:
        out["unet"] = convert_unet(prefixed["unet"], unet_cfg)
    return out


def convert_ip_adapter_faceid(
    state_dict: Dict,
    unet_cfg: UNetConfig = UNetConfig(),
    projplus_cfg: ProjPlusConfig = ProjPlusConfig(),
) -> Dict[str, Any]:
    """ip-adapter-faceid-plusv2_sd15.bin -> {proj_plus, ip_adapters,
    lora_attn1, lora_attn2}.

    The bin has {"image_proj": ..., "ip_adapter": {"{idx}.to_k_ip.weight",
    "{idx}.to_{q,k,v,out}_lora.{down,up}.weight", ...}} where idx follows the
    interleaved attn_processors order (reference loads it with strict=False
    into the processor ModuleList, ..._ipa_controlnet.py:99-101). LoRA trees
    are returned per layer name for folding via conditioning.fold_lora.
    """
    ip_sd = state_dict["ip_adapter"]
    out: Dict[str, Any] = {
        "proj_plus": convert_proj_plus(state_dict["image_proj"], projplus_cfg),
        "ip_adapters": {},
        "lora_attn1": {},
        "lora_attn2": {},
    }
    for idx, name in adapter_module_index_map(unet_cfg):
        is_attn1 = ".attn1." in name
        if not is_attn1 and f"{idx}.to_k_ip.weight" in ip_sd:
            out["ip_adapters"][name] = {
                "to_k_ip": {"kernel": _np(ip_sd[f"{idx}.to_k_ip.weight"]).T},
                "to_v_ip": {"kernel": _np(ip_sd[f"{idx}.to_v_ip.weight"]).T},
            }
        lora = {}
        for proj in ("to_q", "to_k", "to_v", "to_out"):
            dk = f"{idx}.{proj}_lora.down.weight"
            uk = f"{idx}.{proj}_lora.up.weight"
            if dk in ip_sd:
                lora[proj] = {
                    "down": _np(ip_sd[dk]).T,  # (in, rank)
                    "up": _np(ip_sd[uk]).T,  # (rank, out)
                }
        if lora:
            out["lora_attn1" if is_attn1 else "lora_attn2"][name] = lora
    return out


def load_torch_file(path: str) -> Dict:
    """torch.load / safetensors load helper (CPU)."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        sd = {}
        with safe_open(path, framework="pt", device="cpu") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
        return sd
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
