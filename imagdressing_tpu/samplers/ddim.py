"""DDIM schedule + fully-jitted sampling scan.

Reproduces diffusers DDIMScheduler semantics as configured by the reference:

  inference (inference_IMAGdressing.py:119-127):
      num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
      beta_schedule="scaled_linear", clip_sample=False,
      set_alpha_to_one=False, steps_offset=1 (default "leading" spacing)

  training (train.py:403-407): adds rescale_betas_zero_snr=True,
      timestep_spacing="trailing".

The whole denoising loop is a `lax.scan` over the timestep array, so 50
steps compile to one XLA program: no per-step dispatch, constants (text
embeddings, garment K/V) stay pinned in HBM, and the CFG pair is one batched
UNet call (the reference does 2x sequential calls per step,
IMAGDressing_v1_pipeline.py:499-518).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Static schedule tables (host numpy; closed over by the jitted scan)."""

    cfg: SchedulerConfig
    alphas_cumprod: np.ndarray  # (T,)
    final_alpha_cumprod: float

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def _betas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    raise ValueError(cfg.beta_schedule)


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """diffusers `rescale_zero_terminal_snr` (operates on sqrt alpha-bar)."""
    sqrt = np.sqrt(alphas_cumprod)
    t0, tT = sqrt[0].copy(), sqrt[-1].copy()
    sqrt -= tT
    sqrt *= t0 / (t0 - tT)
    return sqrt**2


def make_schedule(cfg: SchedulerConfig = SchedulerConfig()) -> DDIMSchedule:
    betas = _betas(cfg)
    alphas_cumprod = np.cumprod(1.0 - betas)
    if cfg.rescale_betas_zero_snr:
        alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
    final = 1.0 if cfg.set_alpha_to_one else float(alphas_cumprod[0])
    return DDIMSchedule(
        cfg=cfg,
        alphas_cumprod=alphas_cumprod.astype(np.float32),
        final_alpha_cumprod=final,
    )


def timesteps(sched: DDIMSchedule, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps (int32), diffusers set_timesteps."""
    cfg = sched.cfg
    T = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        ratio = T // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
        ts += cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -ratio)).astype(np.int64) - 1
    else:
        raise ValueError(cfg.timestep_spacing)
    return ts.astype(np.int32)


def step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
    eta: float = 0.0,
    noise: jnp.ndarray = None,
) -> jnp.ndarray:
    """One DDIM update, epsilon prediction.

    eta=0 (every shipped reference script) is the deterministic update
        x_{t_prev} = sqrt(a_prev) * x0_pred + sqrt(1 - a_prev) * eps.
    eta>0 injects the diffusers DDIMScheduler variance (`_get_variance` +
    `eta * sqrt(var) * noise`; surfaced by the reference through
    `prepare_extra_step_kwargs`, IMAGDressing_v1_pipeline.py:102-113):
        sigma  = eta * sqrt((1-a_prev)/(1-a_t) * (1 - a_t/a_prev))
        x_prev = sqrt(a_prev) * x0 + sqrt(1 - a_prev - sigma^2) * eps
                 + sigma * noise.
    `eta` is a Python float (trace-static): the eta=0 program is identical
    to the historical deterministic one.
    """
    ac = jnp.asarray(sched.alphas_cumprod)
    prev_t = t - sched.cfg.num_train_timesteps // num_inference_steps
    alpha_t = ac[t]
    alpha_prev = jnp.where(
        prev_t >= 0, ac[jnp.maximum(prev_t, 0)],
        jnp.float32(sched.final_alpha_cumprod),
    )
    sample32 = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    x0 = (sample32 - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)
    if eta:
        assert noise is not None, "eta > 0 needs per-step noise"
        var = (1.0 - alpha_prev) / (1.0 - alpha_t) * (1.0 - alpha_t / alpha_prev)
        sigma = eta * jnp.sqrt(var)
        prev = (
            jnp.sqrt(alpha_prev) * x0
            + jnp.sqrt(1.0 - alpha_prev - sigma**2) * eps
            + sigma * noise.astype(jnp.float32)
        )
    else:
        prev = jnp.sqrt(alpha_prev) * x0 + jnp.sqrt(1.0 - alpha_prev) * eps
    return prev.astype(sample.dtype)


def add_noise(
    sched: DDIMSchedule,
    original: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-process noising (training + inpaint recomposition)."""
    ac = jnp.asarray(sched.alphas_cumprod)
    a = ac[t].astype(jnp.float32)
    while a.ndim < original.ndim:
        a = a[..., None]
    return (
        jnp.sqrt(a) * original.astype(jnp.float32)
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    ).astype(original.dtype)


def sample_loop(
    sched: DDIMSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    latents: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """Scan the full denoising loop. eps_fn(latents, t) -> CFG-combined eps."""
    ts = jnp.asarray(timesteps(sched, num_inference_steps))

    def body(lat, t):
        eps = eps_fn(lat, t)
        return step(sched, eps, t, lat, num_inference_steps), None

    final, _ = jax.lax.scan(body, latents, ts)
    return final


def compute_snr(sched: DDIMSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """SNR(t) = alpha_bar / (1 - alpha_bar) — min-SNR loss weighting
    (reference train.py:214-241)."""
    ac = jnp.asarray(sched.alphas_cumprod)
    a = ac[t]
    return a / (1.0 - a)
