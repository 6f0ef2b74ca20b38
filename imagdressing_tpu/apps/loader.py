"""Model-stack assembly from local checkpoint files.

Mirrors the reference's `prepare()` builders (inference_IMAGdressing.py:42-135
and friends) with one loader for all presets. Expects an SD1.5-style
checkpoint layout on local disk:

  base_dir/
    unet/diffusion_pytorch_model.(bin|safetensors)      # main + garment arch
    text_encoder/pytorch_model.(bin|safetensors)
    tokenizer/{vocab.json, merges.txt}
  vae_path: sd-vae-ft-mse diffusion_pytorch_model.*
  image_encoder_path: CLIP ViT-H pytorch_model.*
  model_ckpt: IMAGDressing-v1_512.pt  (monolithic, key "module")
  controlnet_path (optional), ip_ckpt (optional)
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import jax.numpy as jnp

from imagdressing_tpu.core.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    ControlNetConfig,
    ProjPlusConfig,
    ResamplerConfig,
    UNetConfig,
    VAEConfig,
)
from imagdressing_tpu.convert import torch_sd as cv
from imagdressing_tpu.models import unet as unet_lib
from imagdressing_tpu.models.conditioning import fold_lora
from imagdressing_tpu.pipelines.dressing import DressingModels


def _find_weights(path: str) -> str:
    for pat in ("*.safetensors", "*.bin", "*.pt", "*.pth"):
        hits = sorted(glob.glob(os.path.join(path, pat)))
        if hits:
            return hits[0]
    if os.path.isfile(path):
        return path
    raise FileNotFoundError(f"no weight file under {path}")


def load_dressing_models(
    *,
    base_dir: str,
    vae_path: str,
    image_encoder_path: str,
    model_ckpt: Optional[str] = None,
    controlnet_path: Optional[str] = None,
    ip_ckpt: Optional[str] = None,
    lora_scale: float = 0.0,
    dtype=jnp.bfloat16,
    unet_cfg: Optional[UNetConfig] = None,
    vae_cfg: Optional[VAEConfig] = None,
    text_cfg: Optional[CLIPTextConfig] = None,
    vision_cfg: Optional[CLIPVisionConfig] = None,
    resampler_cfg: Optional[ResamplerConfig] = None,
    projplus_cfg: Optional[ProjPlusConfig] = None,
) -> DressingModels:
    """Configs default to the SD1.5 stack the reference ships; pass overrides
    for other bases (SD2-class dims, test-scale models, ...)."""
    unet_cfg = unet_cfg or UNetConfig()
    vae_cfg = vae_cfg or VAEConfig()
    text_cfg = text_cfg or CLIPTextConfig()
    vision_cfg = vision_cfg or CLIPVisionConfig()
    resampler_cfg = resampler_cfg or ResamplerConfig()
    projplus_cfg = projplus_cfg or ProjPlusConfig()

    unet_sd = cv.load_torch_file(_find_weights(os.path.join(base_dir, "unet")))
    text_sd = cv.load_torch_file(
        _find_weights(os.path.join(base_dir, "text_encoder"))
    )
    vae_sd = cv.load_torch_file(_find_weights(vae_path))
    vision_sd = cv.load_torch_file(_find_weights(image_encoder_path))

    unet_params = cv.convert_unet(unet_sd, unet_cfg)
    if model_ckpt:
        module_sd = cv.load_torch_file(model_ckpt)["module"]
        split = cv.convert_imagdressing_checkpoint(
            module_sd, unet_cfg, resampler_cfg
        )
        ref_unet = split["ref_unet"]
        ref_adapters = split["ref_adapters"]
        resampler_params = split["resampler"]
    else:
        # training-from-scratch init: garment UNet = a copy of the base,
        # adapters from the base to_k/to_v (reference train.py:339-359,367),
        # Resampler randomly initialized (train.py:325-336)
        from imagdressing_tpu.models import resampler as resampler_lib

        ref_unet = jax.tree.map(jnp.array, unet_params)
        ref_adapters = unet_lib.init_ref_adapters_from_unet(
            unet_params, unet_cfg
        )
        resampler_params = resampler_lib.init(
            jax.random.PRNGKey(0), resampler_cfg
        )

    params = {
        "unet": unet_params,
        "ref_unet": ref_unet,
        "ref_adapters": ref_adapters,
        "resampler": resampler_params,
        "vae": cv.convert_vae(vae_sd, vae_cfg),
        "text": cv.convert_clip_text(text_sd, text_cfg),
        "vision": cv.convert_clip_vision(vision_sd, vision_cfg),
    }

    cn_cfg = None
    if controlnet_path:
        cn_cfg = ControlNetConfig(unet=unet_cfg)
        params["controlnet"] = cv.convert_controlnet(
            cv.load_torch_file(_find_weights(controlnet_path)), cn_cfg
        )

    pp_cfg = None
    if ip_ckpt:
        pp_cfg = projplus_cfg
        ipa = cv.convert_ip_adapter_faceid(
            cv.load_torch_file(ip_ckpt), unet_cfg, projplus_cfg
        )
        params["proj_plus"] = ipa["proj_plus"]
        params["ip_adapters"] = ipa["ip_adapters"]
        if lora_scale > 0:
            # Fold the faceid LoRA deltas into the frozen projections once
            # (reference applies them per-call via LoraRefS/LoRAIP procs).
            params["unet"] = _fold_unet_lora(
                params["unet"], ipa["lora_attn1"], ipa["lora_attn2"],
                lora_scale, unet_cfg,
            )

    models = DressingModels(
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
        vision_cfg=vision_cfg, resampler_cfg=resampler_cfg, params=params,
        controlnet_cfg=cn_cfg, projplus_cfg=pp_cfg,
    )
    if dtype is not None:
        models = models.cast(dtype)
    return models


def restore_trained_params(ckpt_dir: str):
    """Latest orbax checkpoint dir -> the trainable param pytree
    {ref_unet, ref_adapters, resampler} (raw numpy, host memory).

    This is the serve-side half of the train->serve loop: training writes
    TrainState via train.checkpoint.CheckpointManager; inference needs only
    `.params` (the reference reads the analogous DeepSpeed artifact at
    inference_IMAGdressing.py:96-117)."""
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no orbax checkpoint under {ckpt_dir}")
    restored = mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
    )
    mgr.close()
    state = restored["state"]
    params = state["params"] if isinstance(state, dict) else state.params
    missing = {"ref_unet", "ref_adapters", "resampler"} - set(params)
    if missing:
        raise KeyError(
            f"checkpoint at {ckpt_dir} lacks trainable subtrees {missing}"
        )
    return params


def merge_trained_checkpoint(
    models: DressingModels, ckpt_dir: str
) -> DressingModels:
    """Overlay a trained orbax checkpoint's {ref_unet, ref_adapters,
    resampler} onto a loaded model stack, cast to the stack's compute dtype.
    The frozen graphs (main UNet, VAE, encoders) keep their base weights —
    exactly the reference's trainable/frozen split (train.py:371-378)."""
    import dataclasses

    trained = restore_trained_params(ckpt_dir)
    compute = models.params["unet"]["conv_in"]["kernel"].dtype

    def cast(a):
        a = jnp.asarray(a)
        return a.astype(compute) if jnp.issubdtype(a.dtype, jnp.floating) else a

    new_params = dict(models.params)
    for k in ("ref_unet", "ref_adapters", "resampler"):
        new_params[k] = jax.tree.map(cast, trained[k])
    return dataclasses.replace(models, params=new_params)


def _fold_unet_lora(unet_params, lora_attn1, lora_attn2, scale, cfg):
    params = jax.tree.map(lambda x: x, unet_params)  # shallow-ish copy

    def tblock(name):
        parts = name.split(".")
        if parts[0] == "mid_block":
            return params["mid_block"]["attentions"][0]["transformer_blocks"][0]
        return params[parts[0]][int(parts[1])]["attentions"][int(parts[3])][
            "transformer_blocks"
        ][0]

    for name, lora in lora_attn1.items():
        blk = tblock(name)
        blk["attn1"] = fold_lora(blk["attn1"], lora, scale)
    for name, lora in lora_attn2.items():
        blk = tblock(name)
        blk["attn2"] = fold_lora(blk["attn2"], lora, scale)
    return params
