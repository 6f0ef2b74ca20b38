"""Typed configuration tree for the whole framework.

The reference scatters hyperparameters across seven argparse CLIs and inline
constants (see /root/reference/inference_IMAGdressing.py:42-135 vs the
near-identical /root/reference/app.py:52-148). Here every model / pipeline /
train knob lives in one frozen dataclass tree so all entry points share a
single source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD1.5-class UNet2DConditionModel architecture.

    Defaults reproduce `SG161222/Realistic_Vision_V4.0_noVAE` / SD1.5
    (reference loads it at /root/reference/inference_IMAGdressing.py:51).
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Which down blocks carry transformer (cross-attn) layers. SD1.5: first 3.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    cross_attention_dim: int = 768
    attention_num_heads: int = 8  # diffusers `attention_head_dim=8` == 8 heads
    transformer_layers_per_block: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    freq_shift: int = 0
    flip_sin_to_cos: bool = True

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL (`stabilityai/sd-vae-ft-mse`) architecture."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP ViT-L/14 text tower (SD1.5 text encoder)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-H/14 vision tower (the IP-Adapter image encoder,
    `h94/IP-Adapter models/image_encoder`; hidden 1280, 32 layers)."""

    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    projection_dim: int = 1024

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1  # 257


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    """Perceiver resampler producing cloth prompt tokens.

    Shipped config: /root/reference/inference_IMAGdressing.py:55-64
    (dim=768, depth=4, dim_head=64, heads=12, num_queries=16,
    embedding_dim=1280, output_dim=768, ff_mult=4).
    """

    dim: int = 768
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 768
    ff_mult: int = 4


@dataclasses.dataclass(frozen=True)
class ProjPlusConfig:
    """IP-Adapter-FaceID-Plus projector (reference adapter/resampler.py:250-281)."""

    cross_attention_dim: int = 768
    id_embeddings_dim: int = 512
    clip_embeddings_dim: int = 1280
    num_tokens: int = 4
    depth: int = 4
    dim_head: int = 64
    ff_mult: int = 4


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """SD1.5 ControlNet (pose / inpaint variants share the architecture;
    the inpaint variant takes 4-channel conditioning is FALSE — both take
    3-channel images; inpaint marks masked pixels with -1, see
    /root/reference/inference_IMAGdressing_controlnetinpainting.py:48-59)."""

    conditioning_channels: int = 3
    conditioning_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDIM schedule hyperparameters.

    Inference config: /root/reference/inference_IMAGdressing.py:119-127.
    Training config adds zero-SNR rescale + trailing spacing
    (/root/reference/train.py:403-407).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    timestep_spacing: str = "leading"
    rescale_betas_zero_snr: bool = False
    prediction_type: str = "epsilon"


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Mixed-precision policy: bf16 compute on the MXU, fp32 for norms and
    softmax accumulation. The reference uses fp16 + DeepSpeed dynamic loss
    scaling (zero_stage2_config.json:2-9); bf16 on TPU needs no scaling."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        import jax

        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if hasattr(a, "astype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


FP32 = DTypePolicy(jnp.float32, jnp.float32, jnp.float32)
BF16 = DTypePolicy(jnp.float32, jnp.bfloat16, jnp.float32)
FULL_BF16 = DTypePolicy(jnp.bfloat16, jnp.bfloat16, jnp.float32)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """One preset == one reference entry script (SURVEY.md L3)."""

    name: str = "basic"
    height: int = 640
    width: int = 512
    num_inference_steps: int = 50
    guidance_scale: float = 7.5
    image_scale: float = 1.0  # ref-attn scale
    ipa_scale: float = 0.0
    lora_scale: float = 0.0
    controlnet_conditioning_scale: float = 1.0
    # Per-step ControlNet windowing: residuals apply only on steps i with
    # start <= i/N and (i+1)/N <= end (diffusers controlnet_keep schedule,
    # reference ..._controlnet.py:384-401,518-525). Defaults are a no-op —
    # every shipped reference script runs the defaults.
    control_guidance_start: float = 0.0
    control_guidance_end: float = 1.0
    # DDIM stochasticity (diffusers eta; variance-injecting DDIM->DDPM
    # interpolation, reference IMAGDressing_v1_pipeline.py:102-113). 0 =
    # deterministic (every shipped script). Ignored by dpm2m/unipc (the
    # multistep ODE solvers take no eta, matching diffusers'
    # prepare_extra_step_kwargs accepts-eta gate).
    eta: float = 0.0
    # Drop the last k CLIP text-encoder layers, keep the final LayerNorm
    # (diffusers clip_skip; reference encode_prompt
    # IMAGDressing_v1_pipeline.py:185-201). Architecture-static: changing it
    # recompiles, like every diffusers pipeline reload.
    clip_skip: int = 0
    use_controlnet: bool = False
    use_ipa: bool = False
    use_inpaint: bool = False
    strength: float = 1.0  # inpaint strength
    seed: int = 42
    # "ddim" (reference repo behavior), "unipc" (the paper's sampler), or
    # "dpm2m" (DPM-Solver++(2M)) — the multistep solvers reach comparable
    # quality at ~half the steps. Inpaint always runs DDIM (per-step mask
    # recomposition).
    sampler: str = "ddim"


# Presets mirroring the seven reference scripts (SURVEY.md §2.1, configs A-E).
PRESETS = {
    # inference_IMAGdressing.py:176-189
    "basic": PipelineConfig(name="basic"),
    # inference_IMAGdressing_cartoon_style.py — checkpoint swap only
    "cartoon": PipelineConfig(name="cartoon"),
    # inference_IMAGdressing_controlnetpose.py
    "pose": PipelineConfig(name="pose", use_controlnet=True),
    # inference_IMAGdressing_ipa_controlnetpose.py:218-237
    "ipa_pose": PipelineConfig(
        name="ipa_pose",
        use_controlnet=True,
        use_ipa=True,
        guidance_scale=7.0,
        image_scale=0.9,
        ipa_scale=0.9,
        lora_scale=0.2,
    ),
    # inference_IMAGdressing_controlnetinpainting.py:213-229
    "inpaint": PipelineConfig(
        name="inpaint",
        use_controlnet=True,
        use_inpaint=True,
        height=512,
        width=512,
        guidance_scale=5.0,
        strength=0.99,
    ),
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference run.sh:4-19 + train.py defaults)."""

    learning_rate: float = 5e-5
    weight_decay: float = 1e-2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0  # zero_stage2_config.json:23
    warmup_steps: int = 2000
    train_batch_size: int = 5  # per device
    gradient_accumulation_steps: int = 1
    noise_offset: float = 0.05  # train.py:92,530-535
    snr_gamma: Optional[float] = None  # min-SNR weighting (train.py:575-598)
    num_train_steps: int = 200_000
    checkpointing_steps: int = 2000
    resolution_h: int = 640
    resolution_w: int = 512
    # CFG dropout probabilities (IGPair.py:61-69)
    drop_image_prob: float = 0.05
    drop_text_prob: float = 0.05
    drop_both_prob: float = 0.05
    seed: int = 42
    # UNet activation rematerialization inside the loss: "full" (block
    # remat, minimum memory), "dots" / "names" / "heavy" (selective — see
    # models.unet.resolve_remat_policy), "none" (no remat; needs the
    # activation memory but skips all recompute). v5e 512x640 bf16
    # measurements (bench_train.py): b1 none 0.1695 s/step (28.9% MFU),
    # b4 names 0.4663 s/step (44.3% MFU), b1 full 0.1935 s/step (23.8%).
    # "full" stays the default because it fits every batch size; pass
    # "names" (or "none" at small batch) when HBM allows.
    remat_policy: str = "full"
    # parallelism
    data_axis: str = "data"
    shard_optimizer_states: bool = True  # ZeRO-2 equivalent
