"""Jitted training step for the IMAGDressing objective.

Reference semantics (/root/reference/train.py):
  * trainable: garment ("reference") UNet + 16 RefS adapters
    (to_k_ref/to_v_ref) + cloth Resampler (train.py:371-378).
  * frozen, forward-only: main UNet, VAE, CLIP text + vision (:371-375).
  * loss: MSE(eps_pred, eps) with optional min-SNR-gamma weighting
    (:575-598), noise-offset 0.05 per-channel (:530-535), uniform timestep
    sampling, DDIM train schedule with zero-SNR rescale + trailing spacing
    (:403-407).
  * distributed: 10-way DP + DeepSpeed ZeRO-2 (optimizer state sharding,
    gradient reduce-scatter, grad-clip 1.0) — here expressed as sharding
    annotations on a (data,) mesh; XLA inserts and overlaps the collectives.

TPU-first deltas from the reference:
  * the whole step (VAE encode -> encoders -> garment capture -> UNet ->
    loss -> update) is ONE jitted function; no Python between device ops.
  * bf16 compute without loss scaling (reference needs fp16 dynamic scaling).
  * gradient accumulation folds into the step via optax.MultiSteps if
    requested.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from imagdressing_tpu.core.config import SchedulerConfig, TrainConfig
from imagdressing_tpu.models import clip, resampler as resampler_lib
from imagdressing_tpu.models import unet as unet_lib
from imagdressing_tpu.models import vae as vae_lib
from imagdressing_tpu.models.conditioning import Conditioning
from imagdressing_tpu.pipelines.dressing import DressingModels
from imagdressing_tpu.samplers import ddim


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any  # trainable: {ref_unet, ref_adapters, resampler}
    opt_state: Any


TRAINABLE_KEYS = ("ref_unet", "ref_adapters", "resampler")


def split_params(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """-> (trainable, frozen) — the reference's requires_grad split
    (train.py:371-378)."""
    trainable = {k: params[k] for k in TRAINABLE_KEYS}
    frozen = {k: v for k, v in params.items() if k not in TRAINABLE_KEYS}
    return trainable, frozen


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip + constant-with-warmup LR
    (run.sh lr 5e-5, warmup 2000; zero_stage2_config grad_clip 1.0)."""
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
            optax.constant_schedule(cfg.learning_rate),
        ],
        [cfg.warmup_steps],
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            # bf16 first moment: halves optimizer HBM (the reference leans on
            # ZeRO-2 sharding for this; on one chip the dtype does the work)
            mu_dtype=jnp.bfloat16,
        ),
    )
    # Non-finite-gradient guard: skip the update instead of poisoning the
    # params (the reference relies on DeepSpeed fp16 loss-scale skips; bf16
    # needs no loss scaling but still deserves a NaN fuse).
    tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def init_train_state(
    models: DressingModels, cfg: TrainConfig
) -> Tuple[TrainState, Dict[str, Any], optax.GradientTransformation]:
    trainable, frozen = split_params(models.params)
    tx = make_optimizer(cfg)
    opt_state = tx.init(trainable)
    return (
        TrainState(step=jnp.zeros((), jnp.int32), params=trainable,
                   opt_state=opt_state),
        frozen,
        tx,
    )


def make_train_step(
    models: DressingModels,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    sched_cfg: Optional[SchedulerConfig] = None,
) -> Callable:
    """Build the jitted step fn(state, frozen_params, batch, rng).

    batch dict (all leading dim = per-host batch):
      person_image   (B,H,W,3) in [-1,1]
      cloth_image    (B,H,W,3) in [-1,1]
      cloth_clip     (B,224,224,3) CLIP-normalized (zeroed when image dropped,
                     IGPair CFG dropout, train.py:546-552)
      text_ids       (B,77) int32 (empty-prompt ids when text dropped)
    """
    sched_cfg = sched_cfg or SchedulerConfig(
        rescale_betas_zero_snr=True, timestep_spacing="trailing"
    )
    schedule = ddim.make_schedule(sched_cfg)
    unet_cfg, vae_cfg = models.unet_cfg, models.vae_cfg
    text_cfg, vision_cfg = models.text_cfg, models.vision_cfg
    resampler_cfg = models.resampler_cfg
    sf = vae_cfg.scaling_factor

    def loss_fn(trainable, frozen, batch, rng):
        b = batch["person_image"].shape[0]
        compute_dtype = frozen["unet"]["conv_in"]["kernel"].dtype
        # mixed precision: fp32 master params, compute-dtype working copy
        # (the cast's VJP accumulates grads back in fp32)
        if trainable["ref_unet"]["conv_in"]["kernel"].dtype != compute_dtype:
            trainable = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                trainable,
            )
        r_lat, r_clat, r_noise, r_offset, r_t = jax.random.split(rng, 5)

        # frozen encoders (no_grad in the reference; lax.stop_gradient makes
        # it explicit here)
        latents = vae_lib.encode_sample(
            frozen["vae"], vae_cfg, batch["person_image"].astype(compute_dtype),
            r_lat,
        ) * sf
        cloth_latents = vae_lib.encode_sample(
            frozen["vae"], vae_cfg, batch["cloth_image"].astype(compute_dtype),
            r_clat,
        ) * sf
        text_embeds = clip.apply_text(frozen["text"], text_cfg, batch["text_ids"])
        clip_hidden = clip.apply_vision(
            frozen["vision"], vision_cfg,
            batch["cloth_clip"].astype(compute_dtype), penultimate=True,
        )
        latents, cloth_latents, text_embeds, clip_hidden = jax.tree.map(
            jax.lax.stop_gradient,
            (latents, cloth_latents, text_embeds, clip_hidden),
        )

        # noise + offset (train.py:529-535)
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        if cfg.noise_offset > 0:
            noise = noise + cfg.noise_offset * jax.random.normal(
                r_offset, (b, 1, 1, latents.shape[-1]), jnp.float32
            )
        t = jax.random.randint(r_t, (b,), 0, sched_cfg.num_train_timesteps)
        noisy = ddim.add_noise(schedule, latents.astype(jnp.float32), noise, t)

        # trainable graph
        cloth_tokens = resampler_lib.apply(
            trainable["resampler"], resampler_cfg, clip_hidden
        )
        _, captured = unet_lib.apply(
            trainable["ref_unet"], unet_cfg, cloth_latents,
            jnp.zeros((b,), jnp.int32), cloth_tokens, capture=True,
        )
        ref_kv = unet_lib.precompute_ref_kv(trainable["ref_adapters"], captured)
        cond = Conditioning(ref_kv=ref_kv, ref_scale=1.0)

        eps_pred = unet_lib.apply(
            frozen["unet"], unet_cfg, noisy.astype(compute_dtype), t,
            text_embeds.astype(compute_dtype), cond,
            remat=True,  # block-level recompute: fits 512x640 batches on-chip
        ).astype(jnp.float32)

        se = jnp.mean((eps_pred - noise) ** 2, axis=(1, 2, 3))
        if cfg.snr_gamma is not None:
            snr = ddim.compute_snr(schedule, t)
            weights = jnp.minimum(snr, cfg.snr_gamma) / jnp.maximum(snr, 1e-8)
            se = se * weights
        return jnp.mean(se)

    def train_step(state: TrainState, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, frozen, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return train_step


def shard_train_step(
    train_step: Callable,
    mesh,
    state: TrainState,
    frozen,
):
    """jit the step over a (data,) mesh: batch sharded on `data`, params
    replicated, optimizer state ZeRO-2-sharded along `data`.

    Returns (jitted_step, sharded_state, sharded_frozen).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    param_shardings = jax.tree.map(lambda _: replicated, state.params)
    opt_shardings = mesh_lib.zero2_param_sharding(mesh, state.opt_state)
    state_shardings = TrainState(
        step=replicated, params=param_shardings, opt_state=opt_shardings
    )
    frozen_shardings = jax.tree.map(lambda _: replicated, frozen)

    sharded_state = jax.device_put(state, state_shardings)
    sharded_frozen = jax.device_put(frozen, frozen_shardings)

    jitted = jax.jit(
        train_step,
        in_shardings=(
            state_shardings,
            frozen_shardings,
            jax.tree.map(lambda _: batch_sharded, {
                "person_image": 0, "cloth_image": 0, "cloth_clip": 0,
                "text_ids": 0,
            }),
            replicated,
        ),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )
    return jitted, sharded_state, sharded_frozen
