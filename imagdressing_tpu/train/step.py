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


def make_loss_fn(
    models: DressingModels,
    cfg: TrainConfig,
    sched_cfg: Optional[SchedulerConfig] = None,
) -> Callable:
    """loss_fn(trainable, frozen, batch, keys) with PER-EXAMPLE PRNG keys.

    Randomness is keyed per global example index (not per batch), so the same
    global batch produces bitwise-identical draws no matter how it is sharded
    across devices — replicated and ZeRO-2 steps stay comparable.

    batch dict (all leading dim = local batch):
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

    def sample_latents(vae_params, images, keys):
        """VAE latent_dist.sample() with a per-example eps draw
        (reference train.py:521-527)."""
        moments = vae_lib.encode_moments(vae_params, vae_cfg, images)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        eps = jax.vmap(
            lambda k: jax.random.normal(k, mean.shape[1:], mean.dtype)
        )(keys)
        return mean + std * eps

    def loss_fn(trainable, frozen, batch, keys):
        compute_dtype = frozen["unet"]["conv_in"]["kernel"].dtype
        # mixed precision: fp32 master params, compute-dtype working copy
        # (the cast's VJP accumulates grads back in fp32)
        if trainable["ref_unet"]["conv_in"]["kernel"].dtype != compute_dtype:
            trainable = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                trainable,
            )
        ks = jax.vmap(lambda k: jax.random.split(k, 5))(keys)  # (B, 5)
        r_lat, r_clat, r_noise, r_offset, r_t = (ks[:, i] for i in range(5))

        # frozen encoders (no_grad in the reference; lax.stop_gradient makes
        # it explicit here)
        latents = sample_latents(
            frozen["vae"], batch["person_image"].astype(compute_dtype), r_lat
        ) * sf
        cloth_latents = sample_latents(
            frozen["vae"], batch["cloth_image"].astype(compute_dtype), r_clat
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

        # noise + offset (train.py:529-535), per-example draws
        noise = jax.vmap(
            lambda k: jax.random.normal(k, latents.shape[1:], jnp.float32)
        )(r_noise)
        if cfg.noise_offset > 0:
            noise = noise + cfg.noise_offset * jax.vmap(
                lambda k: jax.random.normal(
                    k, (1, 1, latents.shape[-1]), jnp.float32
                )
            )(r_offset)
        t = jax.vmap(
            lambda k: jax.random.randint(
                k, (), 0, sched_cfg.num_train_timesteps
            )
        )(r_t)
        noisy = ddim.add_noise(schedule, latents.astype(jnp.float32), noise, t)
        b = noisy.shape[0]

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
            # block-level recompute fits 512x640 batches on-chip; the
            # cfg knob selects selective remat (resolve_remat_policy)
            remat=cfg.remat_policy != "none",
            remat_policy=cfg.remat_policy,
        ).astype(jnp.float32)

        se = jnp.mean((eps_pred - noise) ** 2, axis=(1, 2, 3))
        if cfg.snr_gamma is not None:
            snr = ddim.compute_snr(schedule, t)
            weights = jnp.minimum(snr, cfg.snr_gamma) / jnp.maximum(snr, 1e-8)
            se = se * weights
        return jnp.mean(se)

    return loss_fn


def _example_keys(rng, step, ids):
    """Per-example PRNG keys: fold the step, then the global example index."""
    rng = jax.random.fold_in(rng, step)
    return jax.vmap(jax.random.fold_in, (None, 0))(rng, ids)


def make_train_step(
    models: DressingModels,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    sched_cfg: Optional[SchedulerConfig] = None,
) -> Callable:
    """Build the single-device/replicated step fn(state, frozen, batch, rng).
    For the multi-chip ZeRO-2 step use `shard_train_step`."""
    loss_fn = make_loss_fn(models, cfg, sched_cfg)

    def train_step(state: TrainState, frozen, batch, rng):
        b = batch["person_image"].shape[0]
        keys = _example_keys(rng, state.step, jnp.arange(b))
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, frozen, batch, keys
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
    models: DressingModels,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh,
    state: TrainState,
    frozen,
    sched_cfg: Optional[SchedulerConfig] = None,
):
    """ZeRO-2 step over a (data,) mesh, with the DeepSpeed communication
    pattern made explicit via shard_map (zero_stage2_config.json:12-20):

      1. each device computes local grads on its batch shard (params
         replicated, batch sharded);
      2. grads are REDUCE-SCATTERED: each device averages only its 1/n
         optimizer shard (`lax.psum_scatter` — not all-reduce + slice);
      3. global-norm clip across the scattered partition (one scalar psum;
         exactly optax.clip_by_global_norm's select semantics, so the inner
         clip stage of `tx` is a provable no-op);
      4. the optimizer updates its local shard (moments live sharded);
      5. updated param deltas are ALL-GATHERED back to replicated params.

    The optimizer chain and its state structure are identical to the
    replicated path, so checkpoints are interchangeable.

    Returns (jitted_step, sharded_state, sharded_frozen).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib

    axis = mesh_lib.DATA_AXIS
    n = mesh.shape[axis]
    loss_fn = make_loss_fn(models, cfg, sched_cfg)

    # per-leaf ZeRO shard axis, by shape only — grads/moments/params agree
    grad_axes = jax.tree.map(
        lambda p: mesh_lib.zero2_axis(p.shape, n), state.params
    )

    def scatter_grad(g, ax):
        if ax is None:
            return jax.lax.pmean(g, axis)
        # sum of per-device local means / n == global mean
        return jax.lax.psum_scatter(
            g, axis, scatter_dimension=ax, tiled=True
        ) / n

    def shard_leaf(x, ax):
        if ax is None:
            return x
        size = x.shape[ax] // n
        start = jax.lax.axis_index(axis) * size
        return jax.lax.dynamic_slice_in_dim(x, start, size, axis=ax)

    def gather_leaf(u, ax):
        if ax is None:
            return u
        return jax.lax.all_gather(u, axis, axis=ax, tiled=True)

    def step_fn(state: TrainState, frozen, batch, rng):
        local_b = batch["person_image"].shape[0]
        ids = jax.lax.axis_index(axis) * local_b + jnp.arange(local_b)
        keys = _example_keys(rng, state.step, ids)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, frozen, batch, keys
        )
        loss = jax.lax.pmean(loss, axis)

        grads = jax.tree.map(scatter_grad, grads, grad_axes)

        # global grad norm over the scattered partition: sharded leaves are a
        # disjoint partition (sum their squares across devices once);
        # pmean'd leaves are replicated (count them once, no psum)
        sq_scat = sum(
            jnp.sum(jnp.square(g))
            for g, ax in zip(
                jax.tree.leaves(grads), jax.tree.leaves(grad_axes)
            )
            if ax is not None
        )
        sq_rep = sum(
            jnp.sum(jnp.square(g))
            for g, ax in zip(
                jax.tree.leaves(grads), jax.tree.leaves(grad_axes)
            )
            if ax is None
        )
        gnorm = jnp.sqrt(jax.lax.psum(sq_scat, axis) + sq_rep)
        # non-finite skip must be a GLOBAL decision: the inner
        # apply_if_finite only sees this device's gradient shard, and a
        # localized overflow would skip the update on one device while the
        # others apply theirs (DeepSpeed skips globally). gnorm aggregates
        # every gradient element, so isfinite(gnorm) is that global signal.
        finite = jnp.isfinite(gnorm)
        gnorm_safe = jnp.where(finite, gnorm, 1.0)
        trigger = gnorm_safe < cfg.max_grad_norm
        grads = jax.tree.map(
            lambda t: jax.lax.select(
                trigger, t,
                (t / gnorm_safe.astype(t.dtype)) * cfg.max_grad_norm,
            ),
            grads,
        )

        param_shards = jax.tree.map(shard_leaf, state.params, grad_axes)
        updates, new_opt = tx.update(grads, state.opt_state, param_shards)
        # global no-op on non-finite: zero the deltas AND keep the old
        # optimizer state, identically on every device
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates
        )
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if n.shape == o.shape
            else n,
            new_opt, state.opt_state,
        )
        updates = jax.tree.map(gather_leaf, updates, grad_axes)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, {"loss": loss, "grad_norm": gnorm}

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    param_shardings = jax.tree.map(lambda _: replicated, state.params)
    opt_shardings = mesh_lib.zero2_param_sharding(mesh, state.opt_state)
    state_shardings = TrainState(
        step=replicated, params=param_shardings, opt_state=opt_shardings
    )
    frozen_shardings = jax.tree.map(lambda _: replicated, frozen)

    def _spec(s):
        return s.spec

    state_specs = jax.tree.map(
        _spec, state_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    frozen_specs = jax.tree.map(
        _spec, frozen_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )

    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(state_specs, frozen_specs, P(axis), P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

    # Copy before sharding: device_put reuses the caller's buffers as the
    # local shard (even with may_alias=False on the CPU backend), and the
    # jitted step donates the state — without the copy, one step would delete
    # the caller's arrays out from under them.
    sharded_state = jax.device_put(
        jax.tree.map(jnp.copy, state), state_shardings
    )
    sharded_frozen = jax.device_put(frozen, frozen_shardings)

    jitted = jax.jit(
        sharded,
        in_shardings=(state_shardings, frozen_shardings, batch_sharded,
                      replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,),
    )
    return jitted, sharded_state, sharded_frozen


def tp_train_step(
    models: DressingModels,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh,
    state: TrainState,
    frozen,
    sched_cfg: Optional[SchedulerConfig] = None,
):
    """Tensor-parallel (+ data-parallel) train step over a (data, model) mesh.

    The reference has no tensor parallelism at all (SURVEY §2.3 — SD1.5's
    two 860M UNets fit per GPU); this is the TPU-native extension for
    larger bases. Entirely declarative: the step function is the plain
    `make_train_step` one — both UNets' attention/FF projection kernels are
    column/row-split over the `model` axis (core/tp.py rules, same specs
    serving uses), the batch is sharded over `data`, and XLA inserts the
    activation all-gathers over `model` plus the gradient psum over `data`,
    all riding ICI. Optimizer moments are sharded exactly like their
    params (column/row-split leaves keep 1/m per device), so TP already
    shards the dominant optimizer state; the ZeRO-2 variant
    (`shard_train_step`) covers the data-axis-only layout.

    Returns (jitted_step, sharded_state, sharded_frozen); checkpoints are
    interchangeable with the replicated/ZeRO-2 paths (same pytrees).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib
    from imagdressing_tpu.core import tp

    repl = NamedSharding(mesh, P())

    def tree_shardings(tree, tp_keys):
        return {
            k: (tp.unet_param_specs(v, mesh) if k in tp_keys
                else jax.tree.map(lambda _: repl, v))
            for k, v in tree.items()
        }

    param_sh = tree_shardings(state.params, ("ref_unet",))
    frozen_sh = tree_shardings(frozen, ("unet",))

    # Copy before sharding: device_put may alias the caller's buffers as a
    # local shard and the jitted step donates the state (same reasoning as
    # shard_train_step).
    params = jax.device_put(jax.tree.map(jnp.copy, state.params), param_sh)
    sharded_frozen = jax.device_put(frozen, frozen_sh)

    # Optimizer-state shardings follow the params structurally: every
    # params-shaped subtree in the optax state (adam mu/nu, MultiSteps
    # accumulators, ...) gets the params' shardings; scalars replicate.
    param_treedef = jax.tree.structure(state.params)

    def _is_params_shaped(node):
        try:
            return jax.tree.structure(node) == param_treedef
        except Exception:
            return False

    opt_sh = jax.tree.map(
        lambda node: param_sh if _is_params_shaped(node)
        else jax.tree.map(lambda _: repl, node),
        state.opt_state,
        is_leaf=_is_params_shaped,
    )
    opt_state = jax.device_put(jax.tree.map(jnp.copy, state.opt_state),
                               opt_sh)

    state_shardings = TrainState(step=repl, params=param_sh,
                                 opt_state=opt_sh)
    sharded_state = TrainState(
        # copy like params/opt_state: device_put can alias the caller's
        # buffer as a local shard, and the donated step would delete it
        step=jax.device_put(jnp.copy(state.step), repl), params=params,
        opt_state=opt_state,
    )
    batch_sharded = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))

    jitted = jax.jit(
        make_train_step(models, cfg, tx, sched_cfg),
        in_shardings=(state_shardings, frozen_sh, batch_sharded, repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )

    def wrapped(*args):
        # TP training keeps the PALLAS FORWARDS: flash attention and fused
        # GroupNorm route through their custom_partitioning ops (batch/head
        # sharding rules), so GSPMD runs the per-shard compiled kernels.
        # Only the flash BACKWARD switches to the blockwise XLA
        # implementation (plain einsum/scan math GSPMD shards natively) —
        # the fused Pallas backward custom calls have no SPMD rule. The
        # shard_map-based ZeRO-2 step keeps every kernel, fwd and bwd.
        import imagdressing_tpu.kernels as kernels_lib

        with kernels_lib.flash_bwd_xla():
            return jitted(*args)

    wrapped.lower = jitted.lower
    return wrapped, sharded_state, sharded_frozen
