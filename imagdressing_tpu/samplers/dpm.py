"""DPM-Solver++(2M): second-order multistep ODE sampler, data-prediction
formulation (Lu et al. 2022, public algorithm).

The reference ships DDIM (50 steps); its paper reports UniPC. A second-order
multistep solver reaches comparable sample quality in 15-25 steps — on TPU
that halves the wall-clock of the denoising scan outright, since each step is
one batched UNet call either way. The update is closed-form:

    λ_t = log(α_t / σ_t),    h_i = λ_{i+1} - λ_i
    x0_i = (x_i - σ_i ε_θ(x_i, t_i)) / α_i
    first step:  x_{i+1} = (σ_{i+1}/σ_i) x_i - α_{i+1} expm1(-h_i) x0_i
    later steps: D_i = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},
                 r_i = h_{i-1}/h_i
                 x_{i+1} = (σ_{i+1}/σ_i) x_i - α_{i+1} expm1(-h_i) D_i

Runs as one `lax.scan` with (x, x0_prev, λ_prev, is_first) carry — no
Python-side history.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.samplers import ddim

# A post-step hook applied to the updated sample: (x_next, t_next, is_last)
# -> x_next. Used by the inpaint pipeline to recompose masked latents after
# every solver update (reference ..._controlnet_inpainting.py:487-500 does
# this inline in its DDIM loop; here it composes with any sampler).
PostStepFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _lambda_tables(sched: ddim.DDIMSchedule, num_steps: int, t_start: int = 0):
    """Per-step (alpha, sigma, lambda) for ts plus the terminal point.

    `t_start` drops the first steps (inpaint strength truncation, diffusers
    get_timesteps semantics).
    """
    ts = ddim.timesteps(sched, num_steps)[t_start:]
    ac = sched.alphas_cumprod
    abar = ac[ts]
    # next solver point = the NEXT ACTUAL timestep in ts (under 'trailing'
    # spacing the gaps alternate, so `t - T//num_steps` would tabulate
    # lambdas for points the sampler never visits); terminal point uses
    # final_alpha_cumprod (DDIM semantics)
    prev = np.concatenate([ts[1:], np.full((1,), -1, ts.dtype)])
    abar_next = np.where(
        prev >= 0, ac[np.maximum(prev, 0)], sched.final_alpha_cumprod
    )
    alpha = np.sqrt(abar)
    sigma = np.sqrt(1.0 - abar)
    alpha_n = np.sqrt(abar_next)
    sigma_n = np.sqrt(np.maximum(1.0 - abar_next, 1e-12))
    lam = np.log(alpha / np.maximum(sigma, 1e-12))
    lam_n = np.log(alpha_n / sigma_n)
    return ts, alpha, sigma, lam, alpha_n, sigma_n, lam_n


def sample_loop(
    sched: ddim.DDIMSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    latents: jnp.ndarray,
    num_inference_steps: int,
    *,
    t_start: int = 0,
    post_fn: Optional[PostStepFn] = None,
) -> jnp.ndarray:
    ts, alpha, sigma, lam, alpha_n, sigma_n, lam_n = _lambda_tables(
        sched, num_inference_steps, t_start
    )
    ts_next = np.concatenate([ts[1:], np.zeros((1,), ts.dtype)])
    is_last = np.arange(len(ts)) == len(ts) - 1
    tables = jax.tree.map(
        jnp.asarray,
        (ts, alpha, sigma, lam, alpha_n, sigma_n, lam_n, ts_next, is_last),
    )

    def body(carry, per_step):
        x, x0_prev, lam_prev, is_first = carry
        t, a_i, s_i, l_i, a_next, s_next, l_next, t_next, last = per_step
        eps = eps_fn(x, t).astype(jnp.float32)
        x0 = (x - s_i * eps) / a_i

        h = l_next - l_i
        h_prev = l_i - lam_prev
        r = h_prev / h
        coeff = 1.0 / (2.0 * r)
        d_multi = (1.0 + coeff) * x0 - coeff * x0_prev
        d = jnp.where(is_first, x0, d_multi)
        x_next = (s_next / s_i) * x - a_next * jnp.expm1(-h) * d
        if post_fn is not None:
            x_next = post_fn(x_next, t_next, last)
        return (x_next, x0, l_i, jnp.zeros_like(is_first)), None

    init = (
        latents.astype(jnp.float32),
        jnp.zeros_like(latents, jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.ones((), jnp.bool_),
    )
    (final, _, _, _), _ = jax.lax.scan(body, init, tables)
    return final
