"""Functional NN primitives on explicit parameter pytrees.

Layouts are TPU-native: activations NHWC, conv kernels HWIO, linear kernels
(in, out) — so every matmul/conv lands on the MXU without transposes. Torch
checkpoints are permuted once at conversion time (convert/torch_sd.py), never
at run time.

Norm statistics accumulate in fp32 regardless of the compute dtype (the
reference relies on fp16 GroupNorm inside diffusers; bf16 on TPU has fewer
mantissa bits, so fp32 stats are required for parity).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Params = dict


def param_init_linear(rng, in_dim: int, out_dim: int, *, bias: bool = True,
                      dtype=jnp.float32, scale: Optional[float] = None) -> Params:
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    k1, k2 = jax.random.split(rng)
    bound = scale if scale is not None else 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_dim,), dtype, -bound, bound)
    return p


def param_init_conv(rng, kh: int, kw: int, in_ch: int, out_ch: int, *,
                    bias: bool = True, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    fan_in = kh * kw * in_ch
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), dtype, -bound, bound)
    return p


def param_init_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def param_init_zeros_linear(in_dim: int, out_dim: int, *, bias: bool = True,
                            dtype=jnp.float32) -> Params:
    p = {"kernel": jnp.zeros((in_dim, out_dim), dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p: Params, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    """x @ kernel + bias. kernel: (in, out)."""
    kernel = p["kernel"]
    if compute_dtype is not None:
        kernel = kernel.astype(compute_dtype)
        x = x.astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def conv2d(
    p: Params,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    padding="SAME",
    compute_dtype=None,
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel. padding: 'SAME', 'VALID', int, or explicit
    ((top,bottom),(left,right)) — the VAE downsample uses asymmetric (0,1)."""
    kernel = p["kernel"]
    if compute_dtype is not None:
        kernel = kernel.astype(compute_dtype)
        x = x.astype(compute_dtype)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def group_norm(p: Params, x: jnp.ndarray, *, num_groups: int = 32,
               eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over the channel-last axis of (B, ..., C). Stats in fp32.

    TPU note: the big tensor is only ever reduced over the SPATIAL axes
    (channel stays in the 128-lane dimension); the group aggregation happens
    on the tiny (B, C) moment vectors. Reshaping the activation itself to
    (B, -1, G, C/G) would put C/G=10 lanes on the VPU and force relayouts.
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32)
    spatial = tuple(range(1, x.ndim - 1))
    n_per_ch = 1
    for d in spatial:
        n_per_ch *= x.shape[d]
    s1 = jnp.sum(xf, axis=spatial)  # (B, C)
    s2 = jnp.sum(xf * xf, axis=spatial)  # (B, C)
    gs1 = jnp.sum(s1.reshape(b, g, c // g), axis=-1)  # (B, G)
    gs2 = jnp.sum(s2.reshape(b, g, c // g), axis=-1)
    n = n_per_ch * (c // g)
    mean = gs1 / n
    var = gs2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    # per-channel scale/shift folded with the affine params
    mean_c = jnp.repeat(mean, c // g, axis=-1)  # (B, C)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    w = p["scale"].astype(jnp.float32)
    bch = p["bias"].astype(jnp.float32)
    scale = inv_c * w  # (B, C)
    shift = bch - mean_c * scale
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = xf * scale.reshape(shape) + shift.reshape(shape)
    return out.astype(orig_dtype)


def layer_norm(p: Optional[Params], x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """GEGLU feed-forward gate: proj to 2*inner, h * gelu(gate)."""
    hg = linear(p, x)
    h, gate = jnp.split(hg, 2, axis=-1)
    return h * gelu(gate)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention: cos-first, freq_shift 0).

    Matches diffusers `get_timestep_embedding` semantics used by the
    reference's UNets; computed in fp32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling for NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] (the reference's Normalize([0.5],[0.5]))."""
    return x * 2.0 - 1.0


def denormalize_images(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
