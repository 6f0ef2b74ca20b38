"""The virtual-dressing pipeline: one implementation, five presets.

Replaces the reference's four near-duplicate pipeline classes
(/root/reference/dressing_sd/pipelines/, 2,516 LoC of copy-paste variants) +
seven entry scripts with a single jitted program parameterized by a
`PipelineConfig` preset:

  basic    — garment-only dressing        (inference_IMAGdressing.py)
  cartoon  — same graph, anime checkpoint (inference_IMAGdressing_cartoon_style.py)
  pose     — + openpose ControlNet        (inference_IMAGdressing_controlnetpose.py)
  ipa_pose — + IP-Adapter-FaceID-Plus     (inference_IMAGdressing_ipa_controlnetpose.py)
  inpaint  — + inpaint ControlNet + mask  (inference_IMAGdressing_controlnetinpainting.py)

TPU-first structure (vs the reference's per-step Python loop):
  1. everything below `generate()` is ONE jit: text/vision encoders, VAE
     encode, garment UNet capture, K/V precompute, the 50-step `lax.scan`,
     VAE decode.
  2. the garment UNet runs batch-1 (the reference runs it batch-2 and throws
     away the uncond half's cache — IMAGDressing_v1_pipeline.py:465-479).
  3. CFG is one batch-2 UNet call per step with per-sample ref/ip scales
     ([0, s] ⇒ cond-only injection), not two sequential calls.
  4. garment and IP K/V are hoisted out of the scan (timestep-invariant).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import (
    CLIPTextConfig,
    CLIPVisionConfig,
    ControlNetConfig,
    PipelineConfig,
    ProjPlusConfig,
    ResamplerConfig,
    SchedulerConfig,
    UNetConfig,
    VAEConfig,
)
from imagdressing_tpu.models import clip, controlnet as controlnet_lib
from imagdressing_tpu.models import resampler as resampler_lib
from imagdressing_tpu.models import unet as unet_lib
from imagdressing_tpu.models import vae as vae_lib
from imagdressing_tpu.models.conditioning import Conditioning
from imagdressing_tpu.samplers import ddim


@dataclasses.dataclass
class DressingModels:
    """Every model graph + params needed by any preset."""

    unet_cfg: UNetConfig
    vae_cfg: VAEConfig
    text_cfg: CLIPTextConfig
    vision_cfg: CLIPVisionConfig
    resampler_cfg: ResamplerConfig
    params: Dict[str, Any]
    controlnet_cfg: Optional[ControlNetConfig] = None
    projplus_cfg: Optional[ProjPlusConfig] = None

    @classmethod
    def init_random(cls, rng, *, small: bool = False, with_controlnet: bool = False,
                    with_ipa: bool = False, nano: bool = False,
                    pico: bool = False) -> "DressingModels":
        """Random-weight stack; `small=True` builds a tiny config for tests.

        `nano=True` shrinks further (3-block UNet, 1 layer/block, 1-layer
        encoders) for the multi-chip dryrun, where XLA-CPU compile time on a
        1-core driver host is the budget (VERDICT r3 weak #1) — the sharding
        paths are identical, only the program is smaller. `pico=True` is the
        smallest legal stack (2-block UNet, 3-level VAE => 4x downscale) for
        the dryrun's budget-gated tensor-parallel tail stages (r4 next #1).
        """
        if pico:
            unet_cfg = UNetConfig(
                block_out_channels=(16, 32),
                # attn in block 0 + mid (TP model-axis coverage); block 1
                # keeps the no-attn down/up code path exercised
                down_block_has_attn=(True, False),
                layers_per_block=1,
                cross_attention_dim=32,
                attention_num_heads=4,
                norm_num_groups=8,
            )
            vae_cfg = VAEConfig(
                block_out_channels=(16, 16, 16), layers_per_block=1,
                norm_num_groups=8,
            )
            text_cfg = CLIPTextConfig(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_layers=1, num_heads=4,
            )
            vision_cfg = CLIPVisionConfig(
                hidden_size=48, intermediate_size=96, num_layers=1,
                num_heads=4, image_size=56, patch_size=14, projection_dim=32,
            )
            resampler_cfg = ResamplerConfig(
                dim=32, depth=1, dim_head=8, heads=4, num_queries=8,
                embedding_dim=48, output_dim=32,
            )
            projplus_cfg = ProjPlusConfig(
                cross_attention_dim=32, id_embeddings_dim=16,
                clip_embeddings_dim=48, num_tokens=4, depth=1, dim_head=8,
            )
        elif nano:
            unet_cfg = UNetConfig(
                block_out_channels=(16, 32, 32),
                down_block_has_attn=(True, True, False),
                layers_per_block=1,
                cross_attention_dim=32,
                attention_num_heads=4,
                norm_num_groups=8,
            )
            vae_cfg = VAEConfig(
                block_out_channels=(16, 16, 16, 16), layers_per_block=1,
                norm_num_groups=8,
            )
            text_cfg = CLIPTextConfig(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_layers=1, num_heads=4,
            )
            vision_cfg = CLIPVisionConfig(
                hidden_size=48, intermediate_size=96, num_layers=1,
                num_heads=4, image_size=56, patch_size=14, projection_dim=32,
            )
            resampler_cfg = ResamplerConfig(
                dim=32, depth=1, dim_head=8, heads=4, num_queries=8,
                embedding_dim=48, output_dim=32,
            )
            projplus_cfg = ProjPlusConfig(
                cross_attention_dim=32, id_embeddings_dim=16,
                clip_embeddings_dim=48, num_tokens=4, depth=1, dim_head=8,
            )
        elif small:
            unet_cfg = UNetConfig(
                block_out_channels=(16, 32, 64, 64),
                cross_attention_dim=32,
                attention_num_heads=4,
                norm_num_groups=8,
            )
            vae_cfg = VAEConfig(block_out_channels=(16, 16, 32, 32), norm_num_groups=8)
            text_cfg = CLIPTextConfig(
                vocab_size=256, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4,
            )
            vision_cfg = CLIPVisionConfig(
                hidden_size=48, intermediate_size=96, num_layers=3,
                num_heads=4, image_size=56, patch_size=14, projection_dim=32,
            )
            resampler_cfg = ResamplerConfig(
                dim=32, depth=1, dim_head=8, heads=4, num_queries=8,
                embedding_dim=48, output_dim=32,
            )
            projplus_cfg = ProjPlusConfig(
                cross_attention_dim=32, id_embeddings_dim=16,
                clip_embeddings_dim=48, num_tokens=4, depth=1, dim_head=8,
            )
        else:
            unet_cfg, vae_cfg = UNetConfig(), VAEConfig()
            text_cfg, vision_cfg = CLIPTextConfig(), CLIPVisionConfig()
            resampler_cfg, projplus_cfg = ResamplerConfig(), ProjPlusConfig()

        ks = jax.random.split(rng, 10)
        unet_params = unet_lib.init(ks[0], unet_cfg)
        params = {
            "unet": unet_params,
            "ref_unet": unet_lib.init(ks[1], unet_cfg),
            "ref_adapters": unet_lib.init_ref_adapters_from_unet(unet_params, unet_cfg),
            "resampler": resampler_lib.init(ks[2], resampler_cfg),
            "vae": vae_lib.init(ks[3], vae_cfg),
            "text": clip.init_text(ks[4], text_cfg),
            "vision": clip.init_vision(ks[5], vision_cfg),
        }
        cn_cfg = None
        if with_controlnet:
            # conditioning embedding must downscale image->latent: one
            # stride-2 conv per channel-pair, so (len-1) == log2(vae factor)
            if pico:
                cn_cfg = ControlNetConfig(
                    conditioning_embedding_channels=(16, 32, 96),
                    unet=unet_cfg,
                )
            else:
                cn_cfg = ControlNetConfig(unet=unet_cfg)
            params["controlnet"] = controlnet_lib.init(ks[6], cn_cfg)
        pp_cfg = None
        if with_ipa:
            pp_cfg = projplus_cfg
            params["ip_adapters"] = unet_lib.init_ip_adapters(ks[7], unet_cfg)
            params["proj_plus"] = resampler_lib.init_proj_plus(ks[8], projplus_cfg)
        return cls(
            unet_cfg=unet_cfg, vae_cfg=vae_cfg, text_cfg=text_cfg,
            vision_cfg=vision_cfg, resampler_cfg=resampler_cfg, params=params,
            controlnet_cfg=cn_cfg, projplus_cfg=pp_cfg,
        )

    def cast(self, dtype) -> "DressingModels":
        """Cast all floating-point params (bf16 for production inference)."""
        new_params = jax.tree.map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            self.params,
        )
        return dataclasses.replace(self, params=new_params)


class DressingPipeline:
    """Callable dressing pipeline for one preset.

    The public argument names mirror the reference pipelines' signatures
    (prompt/negative_prompt/ref_image/width/height/num_inference_steps/
    guidance_scale/image_scale) so reference users find the same surface.

    Pass `mesh` (a (data, model) `jax.sharding.Mesh`, see core.mesh) to shard
    generation across chips: params are replicated, every input's batch dim is
    sharded over the `data` axis, and XLA partitions the whole program — the
    TPU equivalent of the reference's serial folder loops
    (inference_IMAGdressing_ipa_controlnetpose_folder.py:196-253) running one
    garment per chip. Batches that don't divide the data-axis size are padded
    with their last row and sliced back after decode.
    """

    def __init__(
        self,
        models: DressingModels,
        preset: PipelineConfig,
        sched_cfg: SchedulerConfig = SchedulerConfig(),
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        if preset.sampler not in ("ddim", "dpm2m", "unipc"):
            raise ValueError(
                f"unknown sampler {preset.sampler!r}; expected ddim/dpm2m/unipc"
            )
        self.preset = preset
        self.schedule = ddim.make_schedule(sched_cfg)
        self.mesh = mesh
        self._tensor_parallel = False
        jit_kwargs: Dict[str, Any] = {}
        if mesh is not None:
            from imagdressing_tpu.core import mesh as mesh_lib

            repl = mesh_lib.replicated(mesh)
            bsh = mesh_lib.batch_sharding(mesh)
            self._data_size = mesh.shape[mesh_lib.DATA_AXIS]
            self._tensor_parallel = mesh.shape[mesh_lib.MODEL_AXIS] > 1
            if self._tensor_parallel:
                # tensor-parallel serving: both UNet roles column/row-split
                # over the model axis (core/tp.py rules), everything else
                # replicated; XLA inserts the all-gathers over ICI.
                from imagdressing_tpu.core import tp

                param_shardings = {
                    k: (tp.unet_param_specs(v, mesh)
                        if k in ("unet", "ref_unet")
                        else jax.tree.map(lambda _: repl, v))
                    for k, v in models.params.items()
                }
            else:
                param_shardings = repl  # prefix pytree: one sharding for all
            models = dataclasses.replace(
                models, params=jax.device_put(models.params, param_shardings)
            )
            # prefix pytrees: one sharding per argument covers every leaf
            jit_kwargs.update(
                in_shardings=(param_shardings, bsh, repl), out_shardings=bsh
            )
        else:
            self._data_size = 1
        self.models = models
        gen = functools.partial(
            _generate,
            unet_cfg=models.unet_cfg,
            vae_cfg=models.vae_cfg,
            text_cfg=models.text_cfg,
            vision_cfg=models.vision_cfg,
            resampler_cfg=models.resampler_cfg,
            controlnet_cfg=models.controlnet_cfg,
            projplus_cfg=models.projplus_cfg,
            preset=preset,
            schedule=self.schedule,
        )

        # positional static args: pjit rejects kwargs when in_shardings is set
        def gen_one_device(params, inputs, scalars, num_inference_steps,
                           output_uint8, eta):
            out = gen(params, inputs, scalars,
                      num_inference_steps=num_inference_steps, eta=eta)
            if output_uint8:
                # serving transport: 4x smaller host transfer, same rounding
                # a PNG/JPEG encoder would apply anyway
                out = jnp.round(out * 255.0).astype(jnp.uint8)
            return out

        if mesh is not None and not self._tensor_parallel:
            # Pure data parallelism: _generate has no cross-device math
            # anywhere (params replicated, batch split), so run the
            # PER-DEVICE program inside shard_map — the single-chip jit,
            # Pallas flash/GroupNorm kernels included — instead of letting
            # the pjit partitioner see the opaque custom calls (which have
            # no SPMD rule and would silently fall back to the XLA paths;
            # kernels/__init__.py). Same pattern as train.shard_train_step.
            # This is what makes the single-chip bench latency compose with
            # N chips at fleet scale.
            from jax.sharding import PartitionSpec as P

            from imagdressing_tpu.core import mesh as mesh_lib

            def gen_pos(params, inputs, scalars, num_inference_steps,
                        output_uint8, eta):
                def per_device(params, inputs, scalars):
                    if eta:
                        # decorrelate the per-step DDIM variance noise across
                        # the data shards (one host key, per-device stream)
                        scalars = dict(
                            scalars,
                            eta_key=jax.random.fold_in(
                                scalars["eta_key"],
                                jax.lax.axis_index(mesh_lib.DATA_AXIS),
                            ),
                        )
                    return gen_one_device(
                        params, inputs, scalars,
                        num_inference_steps=num_inference_steps,
                        output_uint8=output_uint8, eta=eta,
                    )

                return jax.shard_map(
                    per_device,
                    mesh=mesh,
                    in_specs=(P(), P(mesh_lib.DATA_AXIS), P()),
                    out_specs=P(mesh_lib.DATA_AXIS),
                    check_vma=False,
                )(params, inputs, scalars)
        else:
            gen_pos = gen_one_device

        self._jitted = jax.jit(gen_pos, static_argnums=(3, 4, 5), **jit_kwargs)

    def __call__(
        self,
        *,
        prompt_ids: np.ndarray,  # (B, 77) int32
        negative_prompt_ids: np.ndarray,  # (B, 77)
        ref_image: np.ndarray,  # (B, H, W, 3) garment in [-1, 1]
        ref_clip_image: np.ndarray,  # (B, 224, 224, 3) CLIP-normalized
        latents: Optional[np.ndarray] = None,  # (B, H/8, W/8, 4) init noise
        seed: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        image_scale: Optional[float] = None,
        controlnet_scale: Optional[float] = None,
        control_guidance_start: Optional[float] = None,  # step-window lo
        control_guidance_end: Optional[float] = None,  # step-window hi
        eta: Optional[float] = None,  # DDIM variance (0 = deterministic)
        pose_image: Optional[np.ndarray] = None,  # (B, H, W, 3) in [0,1]
        faceid_embeds: Optional[np.ndarray] = None,  # (B, 512)
        face_clip_image: Optional[np.ndarray] = None,  # (B,224,224,3)
        person_image: Optional[np.ndarray] = None,  # (B,H,W,3) in [-1,1] inpaint
        mask_image: Optional[np.ndarray] = None,  # (B,H,W,1) {0,1} inpaint
        output_uint8: bool = False,
    ) -> np.ndarray:
        """Returns generated images (B, H, W, 3) in [0, 1] float32, or uint8
        [0, 255] with `output_uint8=True` (smaller host transfer)."""
        p = self.preset
        steps = num_inference_steps or p.num_inference_steps
        b_user = ref_image.shape[0]
        pad = (-b_user) % self._data_size
        if pad:
            def _pad(x):
                if x is None:
                    return None
                x = np.asarray(x)
                return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])

            prompt_ids = _pad(prompt_ids)
            negative_prompt_ids = _pad(negative_prompt_ids)
            ref_image = _pad(ref_image)
            ref_clip_image = _pad(ref_clip_image)
            latents = _pad(latents)
            pose_image = _pad(pose_image)
            faceid_embeds = _pad(faceid_embeds)
            face_clip_image = _pad(face_clip_image)
            person_image = _pad(person_image)
            mask_image = _pad(mask_image)
        b, h, w = ref_image.shape[0], p.height, p.width
        if latents is None:
            # VAE downscale factor: one stride-2 conv per level transition
            # (8 for SD's 4-level VAE, smaller for test/dryrun stacks)
            f = 2 ** (len(self.models.vae_cfg.block_out_channels) - 1)
            key = jax.random.PRNGKey(p.seed if seed is None else seed)
            latents = jax.random.normal(
                key, (b, h // f, w // f, 4), jnp.float32
            )
        eta_val = float(p.eta if eta is None else eta)
        scalars = {
            "guidance_scale": jnp.float32(
                p.guidance_scale if guidance_scale is None else guidance_scale
            ),
            "image_scale": jnp.float32(
                p.image_scale if image_scale is None else image_scale
            ),
            "ipa_scale": jnp.float32(p.ipa_scale),
            "controlnet_scale": jnp.float32(
                p.controlnet_conditioning_scale
                if controlnet_scale is None else controlnet_scale
            ),
            # per-step ControlNet window bounds: traced data, so sweeping
            # the window reuses the compiled program
            "cn_start": jnp.float32(
                p.control_guidance_start
                if control_guidance_start is None else control_guidance_start
            ),
            "cn_end": jnp.float32(
                p.control_guidance_end
                if control_guidance_end is None else control_guidance_end
            ),
            # per-step DDIM variance noise stream; dead code when eta == 0
            "eta_key": jax.random.fold_in(
                jax.random.PRNGKey(p.seed if seed is None else seed), 0x657461
            ),
        }
        inputs = {
            "prompt_ids": jnp.asarray(prompt_ids, jnp.int32),
            "negative_prompt_ids": jnp.asarray(negative_prompt_ids, jnp.int32),
            "ref_image": jnp.asarray(ref_image),
            "ref_clip_image": jnp.asarray(ref_clip_image),
            "latents": jnp.asarray(latents),
            "pose_image": None if pose_image is None else jnp.asarray(pose_image),
            "faceid_embeds": None if faceid_embeds is None else jnp.asarray(faceid_embeds),
            "face_clip_image": None if face_clip_image is None else jnp.asarray(face_clip_image),
            "person_image": None if person_image is None else jnp.asarray(person_image),
            "mask_image": None if mask_image is None else jnp.asarray(mask_image),
        }
        # Tensor-parallel pjit traces WITH the Pallas kernels: the attention
        # and GroupNorm forwards carry custom_partitioning rules (batch/head
        # sharding — exactly what the Megatron-style specs in core/tp.py
        # produce), so GSPMD runs the per-shard kernel instead of
        # replicating an opaque custom call. Set IMAGDRESSING_DISABLE_PALLAS=1
        # to fall back to the plain-XLA trace. The pure-DP mesh path runs
        # shard_map and keeps the kernels by construction.
        out = self._jitted(
            self.models.params, inputs, scalars, steps, output_uint8, eta_val
        )
        return np.asarray(out)[:b_user]


def _duplicate(x: jnp.ndarray) -> jnp.ndarray:
    """[uncond; cond] CFG batch from a cond-only tensor."""
    return jnp.concatenate([x, x], axis=0)


def _generate(
    params: Dict[str, Any],
    inputs: Dict[str, Any],
    scalars: Dict[str, jnp.ndarray],
    *,
    num_inference_steps: int,
    eta: float = 0.0,
    unet_cfg: UNetConfig,
    vae_cfg: VAEConfig,
    text_cfg: CLIPTextConfig,
    vision_cfg: CLIPVisionConfig,
    resampler_cfg: ResamplerConfig,
    controlnet_cfg: Optional[ControlNetConfig],
    projplus_cfg: Optional[ProjPlusConfig],
    preset: PipelineConfig,
    schedule: ddim.DDIMSchedule,
):
    b = inputs["latents"].shape[0]
    compute_dtype = params["unet"]["conv_in"]["kernel"].dtype
    sf = vae_cfg.scaling_factor

    # ---- 1. text encoding: [uncond, cond] halves --------------------------
    text_ids = jnp.concatenate(
        [inputs["negative_prompt_ids"], inputs["prompt_ids"]], axis=0
    )
    text_embeds = clip.apply_text(
        params["text"], text_cfg, text_ids, clip_skip=preset.clip_skip
    )
    text_embeds = text_embeds.astype(compute_dtype)  # (2B, 77, 768)

    # ---- 2. garment tokens: CLIP-vision penultimate -> Resampler ----------
    # Reference also resamples a zeroed image for the garment-UNet's uncond
    # context (IMAGDressing_v1_pipeline.py:409-415) — but only the COND half
    # of the cache is consumed (:478), so we skip the null branch entirely.
    clip_hidden = clip.apply_vision(
        params["vision"], vision_cfg,
        inputs["ref_clip_image"].astype(compute_dtype), penultimate=True,
    )
    cloth_tokens = resampler_lib.apply(params["resampler"], resampler_cfg, clip_hidden)

    # ---- 3. garment latents + capture run (batch-1, t=0) ------------------
    ref_latents = vae_lib.encode_mean(
        params["vae"], vae_cfg, inputs["ref_image"].astype(compute_dtype)
    ) * sf
    _, captured = unet_lib.apply(
        params["ref_unet"], unet_cfg, ref_latents,
        jnp.zeros((b,), jnp.int32), cloth_tokens, capture=True,
    )

    # ---- 4. hoisted K/V precompute ----------------------------------------
    ref_kv = unet_lib.precompute_ref_kv(params["ref_adapters"], captured)
    ref_kv = jax.tree.map(_duplicate, ref_kv)  # CFG batch
    ref_scale = jnp.concatenate(
        [jnp.zeros((b,)), jnp.broadcast_to(scalars["image_scale"], (b,))]
    )

    ip_kv = None
    ip_scale = 0.0
    if preset.use_ipa:
        face_hidden = clip.apply_vision(
            params["vision"], vision_cfg,
            inputs["face_clip_image"].astype(compute_dtype), penultimate=True,
        )
        face_tokens = resampler_lib.apply_proj_plus(
            params["proj_plus"], projplus_cfg,
            inputs["faceid_embeds"].astype(compute_dtype), face_hidden,
            shortcut=True, scale=1.0,
        )
        # uncond half: zeroed id embedding + zeroed clip image (reference
        # get_image_embeds with torch.zeros_like, ipa pipeline :366-377)
        null_hidden = clip.apply_vision(
            params["vision"], vision_cfg,
            jnp.zeros_like(inputs["face_clip_image"]).astype(compute_dtype),
            penultimate=True,
        )
        null_tokens = resampler_lib.apply_proj_plus(
            params["proj_plus"], projplus_cfg,
            jnp.zeros_like(inputs["faceid_embeds"]).astype(compute_dtype),
            null_hidden, shortcut=True, scale=1.0,
        )
        ip_tokens = jnp.concatenate([null_tokens, face_tokens], axis=0)
        ip_kv = unet_lib.precompute_ip_kv(params["ip_adapters"], ip_tokens, unet_cfg)
        ip_scale = jnp.broadcast_to(scalars["ipa_scale"], (2 * b,))

    # text K/V are constant across steps — hoist them out of the scan too
    cross_kv = unet_lib.precompute_cross_kv(params["unet"], unet_cfg, text_embeds)
    cond = Conditioning(
        ref_kv=ref_kv, ref_scale=ref_scale, ip_kv=ip_kv, ip_scale=ip_scale,
        cross_kv=cross_kv,
    )

    # ---- 5. inpaint init ---------------------------------------------------
    ts_full = ddim.timesteps(schedule, num_inference_steps)
    noise = inputs["latents"].astype(jnp.float32)
    t_start = 0
    if preset.use_inpaint:
        t_start = max(
            num_inference_steps - int(num_inference_steps * preset.strength), 0
        )
        ts_used = ts_full[t_start:]
        image_latents = vae_lib.encode_mean(
            params["vae"], vae_cfg, inputs["person_image"].astype(compute_dtype)
        ) * sf
        image_latents = image_latents.astype(jnp.float32)
        is_strength_max = preset.strength >= 1.0
        if is_strength_max:
            latents = noise * schedule.init_noise_sigma
        else:
            latents = ddim.add_noise(
                schedule, image_latents, noise, jnp.asarray(ts_used[0])
            )
        lh, lw = latents.shape[1:3]
        mask_latent = jax.image.resize(
            inputs["mask_image"].astype(jnp.float32), (b, lh, lw, 1), "nearest"
        )
    else:
        ts_used = ts_full
        latents = noise * schedule.init_noise_sigma
        image_latents = None
        mask_latent = None

    # ---- 6. per-step eps with fused CFG ------------------------------------
    guidance = scalars["guidance_scale"]

    # ControlNet's conditioning embedding is timestep-invariant (seven
    # pixel-space convs on the full-res condition) — hoist it out of the
    # scan like every other timestep-invariant conditioning
    cn_cond_emb = None
    cn_keep = None
    ts_used_arr = jnp.asarray(ts_used)
    if preset.use_controlnet:
        cn_cond_emb = controlnet_lib.precompute_cond_embedding(
            params["controlnet"], _duplicate(inputs["pose_image"]),
            dtype=compute_dtype,
        )
        # diffusers controlnet_keep windowing (reference
        # ..._controlnet.py:518-525): step i keeps its residuals iff
        # start <= i/N and (i+1)/N <= end. Bounds are traced scalars, so
        # sweeping the window costs no recompile.
        n_used = len(ts_used)
        fr_lo = jnp.arange(n_used, dtype=jnp.float32) / n_used
        fr_hi = jnp.arange(1, n_used + 1, dtype=jnp.float32) / n_used
        cn_keep = 1.0 - jnp.logical_or(
            fr_lo < scalars["cn_start"], fr_hi > scalars["cn_end"]
        ).astype(jnp.float32)

    def eps_fn(lat, t):
        lat_in = _duplicate(lat).astype(compute_dtype)
        tt = jnp.broadcast_to(t, (2 * b,))
        step_cond = cond
        if preset.use_controlnet:
            # recover the step index from t (ts_used is descending-unique);
            # works inside every sampler's scan without index plumbing
            step_idx = jnp.argmax(ts_used_arr == t)
            down_res, mid_res = controlnet_lib.apply(
                params["controlnet"], controlnet_cfg, lat_in, tt,
                text_embeds,
                conditioning_scale=scalars["controlnet_scale"]
                * cn_keep[step_idx],
                cond_emb=cn_cond_emb,
            )
            step_cond = dataclasses.replace(
                cond, down_block_residuals=down_res, mid_block_residual=mid_res
            )
        eps = unet_lib.apply(
            params["unet"], unet_cfg, lat_in, tt, text_embeds, step_cond
        ).astype(jnp.float32)
        eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
        return eps_uncond + guidance * (eps_text - eps_uncond)

    # ---- 7. the scan --------------------------------------------------------
    # Inpaint recomposition is a sampler-agnostic post-step hook: re-noise the
    # known region to the NEXT timestep and paste it back (reference
    # ..._controlnet_inpainting.py:487-500 uses timesteps[i+1]).
    post_fn = None
    if preset.use_inpaint:

        def post_fn(lat, t_next, is_last):
            init_proper = jnp.where(
                is_last,
                image_latents,
                ddim.add_noise(schedule, image_latents, noise, t_next),
            )
            return (1.0 - mask_latent) * init_proper + mask_latent * lat

    if preset.sampler in ("dpm2m", "unipc"):
        from imagdressing_tpu.samplers import dpm, unipc

        loop = unipc.sample_loop if preset.sampler == "unipc" else dpm.sample_loop
        latents = loop(
            schedule, eps_fn, latents.astype(jnp.float32), num_inference_steps,
            t_start=t_start, post_fn=post_fn,
        )
        images = vae_lib.decode(
            params["vae"], vae_cfg, (latents / sf).astype(compute_dtype)
        )
        return jnp.clip(images.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    ts_arr = ts_used_arr
    ts_next = jnp.concatenate([ts_arr[1:], jnp.zeros((1,), ts_arr.dtype)])

    def body(carry, t_pair):
        lat, key = carry
        t, t_next, is_last = t_pair
        eps = eps_fn(lat, t)
        if eta:
            # fresh per-step variance noise (diffusers randn_tensor per
            # scheduler.step call); `eta` is trace-static so the eta=0
            # program carries no RNG ops
            key, sub = jax.random.split(key)
            step_noise = jax.random.normal(sub, lat.shape, jnp.float32)
        else:
            step_noise = None
        lat = ddim.step(
            schedule, eps, t, lat, num_inference_steps,
            eta=eta, noise=step_noise,
        )
        if post_fn is not None:
            lat = post_fn(lat, t_next, is_last)
        return (lat, key), None

    is_last_arr = jnp.arange(len(ts_used)) == len(ts_used) - 1
    (latents, _), _ = jax.lax.scan(
        body, (latents.astype(jnp.float32), scalars["eta_key"]),
        (ts_arr, ts_next, is_last_arr),
    )

    # ---- 8. decode -----------------------------------------------------------
    images = vae_lib.decode(
        params["vae"], vae_cfg, (latents / sf).astype(compute_dtype)
    )
    return jnp.clip(images.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
