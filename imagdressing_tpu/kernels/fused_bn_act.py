"""Fused (sync) batch-norm + activation — the TPU equivalent of InPlaceABN.

The reference JIT-compiles a CUDA extension for in-place activated batch norm
(/root/reference/preprocess/humanparsing/modules/src/inplace_abn_cuda.cu,
wrapped at modules/bn.py: `InPlaceABN`/`InPlaceABNSync` with
torch.distributed.all_reduce for cross-GPU statistics). Its two tricks:

  1. fuse normalize + affine + leaky-relu/elu into one memory pass;
  2. free the pre-activation tensor: the backward reconstructs it by
     INVERTING the activation (leaky-relu/elu are invertible), so only the
     activated output is saved.

Here both tricks map to TPU idioms:
  * the fused forward is a Pallas kernel (one HBM read + one write);
  * the inverse-recompute backward is a jax.custom_vjp whose residual is the
    OUTPUT y (+ per-channel stats), not the input — same memory footprint as
    InPlaceABN; the reconstruction and gradient math run fused in XLA.
  * "Sync" (cross-device statistics) falls out of jax.lax.pmean over the data
    axis when run inside shard_map/pjit — the reference needs an explicit
    all_reduce (modules/bn.py InPlaceABNSync).

Used by the SCHP human-parsing network (preprocess/parsing) in training
mode; inference uses the folded scale/shift path (`abn_inference`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(x, activation: str, slope: float):
    if activation == "leaky_relu":
        return jnp.where(x >= 0, x, slope * x)
    if activation == "elu":
        return jnp.where(x >= 0, x, jnp.expm1(x))
    return x


def _act_inverse(y, activation: str, slope: float):
    """Recover pre-activation from output (the InPlaceABN trick)."""
    if activation == "leaky_relu":
        return jnp.where(y >= 0, y, y / slope)
    if activation == "elu":
        # deeply-saturated outputs round to exactly -1 in bf16 (pre-act
        # below ~-7): log1p(-1) = -inf would turn the 0-gradient term into
        # 0 * inf = NaN downstream — clamp just inside the asymptote (the
        # matching activation gradient there is ~1e-7, so the recovered z
        # only multiplies a negligible dz)
        return jnp.where(
            y >= 0, y, jnp.log1p(jnp.maximum(y, -1.0 + 1e-7))
        )
    return y


def _act_grad_from_output(y, activation: str, slope: float):
    """d act / d pre-act, expressed in terms of the OUTPUT y."""
    if activation == "leaky_relu":
        return jnp.where(y >= 0, 1.0, slope)
    if activation == "elu":
        return jnp.where(y >= 0, 1.0, y + 1.0)
    return jnp.ones_like(y)


# ---------------------------------------------------------------------------
# Fused normalize+affine+act Pallas kernel (given precomputed mean/var).
# ---------------------------------------------------------------------------


def _fused_kernel(x_ref, scale_ref, shift_ref, o_ref, *, activation, slope):
    x = x_ref[...].astype(jnp.float32)
    y = x * scale_ref[...].astype(jnp.float32) + shift_ref[...].astype(jnp.float32)
    o_ref[...] = _act(y, activation, slope).astype(o_ref.dtype)


def _fused_scale_shift_act(x2d, scale, shift, activation, slope, interpret):
    """x2d: (M, C); scale/shift: (C,)."""
    m, c = x2d.shape
    block_m = min(1024, m)
    grid = (pl.cdiv(m, block_m),)
    return pl.pallas_call(
        functools.partial(_fused_kernel, activation=activation, slope=slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(x2d, scale, shift)


def _use_pallas() -> bool:
    import os

    if os.environ.get("IMAGDRESSING_DISABLE_PALLAS", "0") == "1":
        return False
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


def abn_inference(
    x: jnp.ndarray,  # (B, H, W, C)
    weight: jnp.ndarray,  # (C,) gamma
    bias: jnp.ndarray,  # (C,) beta
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    *,
    eps: float = 1e-5,
    activation: str = "leaky_relu",
    slope: float = 0.01,
) -> jnp.ndarray:
    """Folded inference path: one fused scale/shift + activation pass."""
    inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    scale = (weight.astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        bias.astype(jnp.float32)
        - running_mean.astype(jnp.float32) * weight.astype(jnp.float32) * inv
    ).astype(x.dtype)
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if _use_pallas() and x2d.shape[0] % 8 == 0 and shape[-1] % 128 == 0:
        out = _fused_scale_shift_act(x2d, scale, shift, activation, slope, False)
    else:
        out = _act(
            x2d.astype(jnp.float32) * scale.astype(jnp.float32)
            + shift.astype(jnp.float32),
            activation, slope,
        ).astype(x.dtype)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Training-mode ABN with inverse-recompute custom VJP.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def abn_train(
    x: jnp.ndarray,  # (B, H, W, C)
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    activation: str = "leaky_relu",
    slope: float = 0.01,
    axis_name: Optional[str] = None,  # pmean axis for the "Sync" variant
) -> jnp.ndarray:
    y, _ = _abn_train_fwd_impl(x, weight, bias, eps, activation, slope, axis_name)
    return y


def _abn_train_fwd_impl(x, weight, bias, eps, activation, slope, axis_name):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean_sq = jnp.mean(xf * xf, axis=(0, 1, 2))
    if axis_name is not None:
        # cross-device moments, NOT per-shard variances (shards have
        # different means) — the InPlaceABNSync all_reduce semantics.
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    z = xhat * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    y = _act(z, activation, slope).astype(x.dtype)
    return y, (mean, inv)


def _abn_fwd(x, weight, bias, eps, activation, slope, axis_name):
    y, (mean, inv) = _abn_train_fwd_impl(
        x, weight, bias, eps, activation, slope, axis_name
    )
    # Residual = activated OUTPUT + stats — the input is NOT kept alive
    # (InPlaceABN's memory saving, inplace_abn.cpp backward contract).
    return y, (y, weight, bias, mean, inv)


def _abn_bwd(eps, activation, slope, axis_name, res, gy):
    y, weight, bias, mean, inv = res
    yf = y.astype(jnp.float32)
    gyf = gy.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    b = bias.astype(jnp.float32)

    z = _act_inverse(yf, activation, slope)
    dz = gyf * _act_grad_from_output(yf, activation, slope)
    xhat = (z - b) / jnp.where(w == 0, 1.0, w)

    n = y.shape[0] * y.shape[1] * y.shape[2]
    sum_dz = jnp.sum(dz, axis=(0, 1, 2))
    sum_dz_xhat = jnp.sum(dz * xhat, axis=(0, 1, 2))
    if axis_name is not None:
        sum_dz = jax.lax.psum(sum_dz, axis_name)
        sum_dz_xhat = jax.lax.psum(sum_dz_xhat, axis_name)
        n = n * jax.lax.psum(1, axis_name)

    dweight = sum_dz_xhat
    dbias = sum_dz
    dx = (w * inv) * (dz - (xhat * sum_dz_xhat + sum_dz) / n)
    return dx.astype(y.dtype), dweight.astype(weight.dtype), dbias.astype(bias.dtype)


abn_train.defvjp(_abn_fwd, _abn_bwd)


def abn_train_stats(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    activation: str = "leaky_relu",
    slope: float = 0.01,
    axis_name: Optional[str] = None,
):
    """abn_train + the (stop-gradient) batch moments, for running-stat EMA
    updates in training loops (the reference BN's momentum tracking,
    modules/bn.py). XLA CSEs the moment reductions with abn_train's own."""
    y = abn_train(x, weight, bias, eps, activation, slope, axis_name)
    xf = jax.lax.stop_gradient(x).astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    mean_sq = jnp.mean(xf * xf, axis=(0, 1, 2))
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - mean * mean
    return y, mean, var
