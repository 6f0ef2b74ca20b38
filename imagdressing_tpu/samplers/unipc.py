"""UniPC: unified predictor-corrector sampler (Zhao et al. 2023, public
algorithm), order-2, data-prediction formulation.

The IMAGDressing paper samples with UniPC at 50 steps (supplementary
"Implement Details"; the repo code ships DDIM instead —
/root/reference/inference_IMAGdressing.py:119-127). This implementation uses
exact exponential-integrator coefficients:

Exact relation (λ = log(α/σ), h = λ_{i+1} - λ_i):
    x_{i+1} = (σ_{i+1}/σ_i) x_i + α_{i+1}[φ1(h) x̂0(λ_i) + φ2(h) d1 + ...]
    φ1(h) = 1 - e^{-h},   φ2(h) = h - 1 + e^{-h}

UniP (predictor): d1 from the backward difference (x0_i - x0_{i-1})/h_prev.
UniC (corrector): when the NEXT model evaluation arrives, the previous
transition is re-taken with the forward difference — the corrector costs no
extra model evaluations (the fresh eval is reused for the next prediction).

Runs as one `lax.scan`; all step tables are static numpy closed over by the
jitted body.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.samplers import ddim
from imagdressing_tpu.samplers.dpm import PostStepFn, _lambda_tables


def _phi1(h):
    return -jnp.expm1(-h)


def _phi2(h):
    return h - 1.0 + jnp.exp(-h)


def sample_loop(
    sched: ddim.DDIMSchedule,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    latents: jnp.ndarray,
    num_inference_steps: int,
    *,
    use_corrector: bool = True,
    t_start: int = 0,
    post_fn: Optional[PostStepFn] = None,
) -> jnp.ndarray:
    ts, alpha, sigma, lam, alpha_n, sigma_n, lam_n = _lambda_tables(
        sched, num_inference_steps, t_start
    )
    n = len(ts)
    ts_next = np.concatenate([ts[1:], np.zeros((1,), ts.dtype)])
    tabs = jax.tree.map(
        jnp.asarray,
        (ts.astype(np.int32), alpha, sigma, lam, alpha_n, sigma_n, lam_n,
         ts_next.astype(np.int32)),
    )

    def body(carry, idx):
        x, x_prev, x0_prev, is_first = carry
        t = tabs[0][idx]
        a_i, s_i, l_i = tabs[1][idx], tabs[2][idx], tabs[3][idx]
        a_n, s_n, l_n = tabs[4][idx], tabs[5][idx], tabs[6][idx]
        pidx = jnp.maximum(idx - 1, 0)
        s_p, l_p = tabs[2][pidx], tabs[3][pidx]

        eps = eps_fn(x, t).astype(jnp.float32)
        x0 = (x - s_i * eps) / a_i

        # ---- UniC: re-take the (prev -> current) transition with the
        # forward difference now that x̂0 at the current point is known.
        if use_corrector:
            h_prev = l_i - l_p
            safe_h = jnp.where(h_prev == 0, 1.0, h_prev)
            d1 = (x0 - x0_prev) / safe_h
            x_corr = (s_i / s_p) * x_prev + a_i * (
                _phi1(h_prev) * x0_prev + _phi2(h_prev) * d1
            )
            x = jnp.where(is_first, x, x_corr)
            # keep x̂0 consistent with the corrected sample (same eps eval —
            # the standard UniPC approximation)
            x0 = (x - s_i * eps) / a_i

        # ---- UniP: predict the next sample (order 2 after the first step)
        h = l_n - l_i
        h_prev = l_i - l_p
        safe_hp = jnp.where(h_prev == 0, 1.0, h_prev)
        d1_ms = (x0 - x0_prev) / safe_hp
        first_order = (s_n / s_i) * x + a_n * _phi1(h) * x0
        second = first_order + a_n * _phi2(h) * d1_ms
        x_next = jnp.where(is_first, first_order, second)
        if post_fn is not None:
            x_next = post_fn(x_next, tabs[7][idx], idx == n - 1)

        return (x_next, x, x0, jnp.zeros((), jnp.bool_)), None

    init = (
        latents.astype(jnp.float32),
        latents.astype(jnp.float32),
        jnp.zeros_like(latents, jnp.float32),
        jnp.ones((), jnp.bool_),
    )
    (final, _, _, _), _ = jax.lax.scan(body, init, jnp.arange(n))
    return final
