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


def upsample2x_conv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Fused nearest-2x upsample + 3x3/pad-1 conv as ONE subpixel conv.

    `conv3x3(upsample_nearest_2x(x))` evaluates 9 taps per pixel at the
    DOUBLED resolution, but each output phase (y%2, x%2) only ever sees a
    2x2 window of the original input — the 9 taps collapse into fixed sums
    of the 3x3 kernel per phase. Folding those sums into a single
    (2, 2, Cin, 4*Cout) kernel runs the conv at the LOW resolution:
    2.25x fewer MXU FLOPs and the (2H, 2W, C) nearest-upsampled
    intermediate never exists in HBM. The UNet/VAE up paths use this
    (diffusers Upsample2D semantics, reference UNet up blocks).

    Numerics: identical taps, different summation order (weight sums are
    folded before the MXU pass) — fp32 parity vs the unfused pair is ~1e-6.
    """
    w = p["kernel"]  # (3, 3, Ci, Co) HWIO
    # phase a=0 output rows read input rows (i-1, i) with taps (w0, w1+w2);
    # a=1 reads (i, i+1) with taps (w0+w1, w2); same per column phase b
    r0 = jnp.stack([w[0], w[1] + w[2]])            # (2, 3, Ci, Co)
    r1 = jnp.stack([w[0] + w[1], w[2]])

    def _cols(wr):
        c0 = jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1)
        c1 = jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1)
        return c0, c1  # each (2, 2, Ci, Co)

    k00, k01 = _cols(r0)
    k10, k11 = _cols(r1)
    kk = jnp.concatenate([k00, k01, k10, k11], axis=-1)  # (2, 2, Ci, 4*Co)

    b, h, wdt, _ = x.shape
    co = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x,
        kk.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (B, H+1, W+1, 4*Co): window r covers padded rows (r-1, r)
    y = y.reshape(b, h + 1, wdt + 1, 2, 2, co)
    p00 = y[:, 0 : h, 0 : wdt, 0, 0]
    p01 = y[:, 0 : h, 1 : wdt + 1, 0, 1]
    p10 = y[:, 1 : h + 1, 0 : wdt, 1, 0]
    p11 = y[:, 1 : h + 1, 1 : wdt + 1, 1, 1]
    # out[2i+a, 2j+b] = phase_ab[i, j]
    out = jnp.stack(
        [jnp.stack([p00, p01], axis=3), jnp.stack([p10, p11], axis=3)],
        axis=2,
    )  # (B, H, 2, W, 2, Co)
    out = out.reshape(b, 2 * h, 2 * wdt, co)
    if "bias" in p and p["bias"] is not None:
        out = out + p["bias"].astype(out.dtype)
    return out


def normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1] (the reference's Normalize([0.5],[0.5]))."""
    return x * 2.0 - 1.0


def denormalize_images(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)
