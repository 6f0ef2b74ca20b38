"""Deformable convolution (DCN v1/v2) on XLA gathers.

Parity for detectron2's deform_conv CUDA kernels (vendored by the
reference's offline toolchain at .../detectron2/layers/csrc/deformable/,
~2,500 LoC of CUDA). On TPU the op is: per kernel tap, bilinear-gather the
input at (base grid + learned offset), optionally modulate (v2), then one
big matmul over (taps x channels) — XLA fuses the gathers and the MXU takes
the contraction. Differentiable for free.

Layout: NHWC; weights (kh, kw, C_in, C_out); offsets (B, H_out, W_out,
2*kh*kw) ordered (dy, dx) per tap row-major — torchvision/detectron2
convention; mask (B, H_out, W_out, kh*kw) for the modulated variant.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def deform_conv2d(
    x: jnp.ndarray,  # (B, H, W, C)
    offsets: jnp.ndarray,  # (B, Ho, Wo, 2*kh*kw)
    weight: jnp.ndarray,  # (kh, kw, C, O)
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,  # (B, Ho, Wo, kh*kw) — DCNv2
    *,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    b, h, w, c = x.shape
    kh, kw, _, out_ch = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    k = kh * kw

    # base sampling grid per tap: (Ho, Wo, K)
    ys = (jnp.arange(ho) * stride - padding)[:, None, None]
    xs = (jnp.arange(wo) * stride - padding)[None, :, None]
    tap_dy = (jnp.arange(kh) * dilation)[:, None].repeat(kw, 1).reshape(-1)
    tap_dx = (jnp.arange(kw) * dilation)[None, :].repeat(kh, 0).reshape(-1)
    base_y = ys + tap_dy[None, None, :]
    base_x = xs + tap_dx[None, None, :]

    off = offsets.reshape(b, ho, wo, k, 2)
    py = base_y[None] + off[..., 0]  # (B, Ho, Wo, K)
    px = base_x[None] + off[..., 1]

    # bilinear gather with zeros outside
    valid = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
    py_c = jnp.clip(py, 0.0, h - 1)
    px_c = jnp.clip(px, 0.0, w - 1)
    y0 = jnp.floor(py_c).astype(jnp.int32)
    x0 = jnp.floor(px_c).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (py_c - y0).astype(x.dtype)[..., None]
    wx = (px_c - x0).astype(x.dtype)[..., None]

    def gather(yi, xi):
        # vmap the (H*W) gather over the batch
        def one(img, yy, xx):
            return img[yy, xx]  # (Ho, Wo, K, C)

        return jax.vmap(one)(x, yi, xi)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    samples = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    samples = samples * valid[..., None].astype(samples.dtype)
    if mask is not None:
        samples = samples * mask[..., None].astype(samples.dtype)

    out = jnp.einsum(
        "bhwkc,kco->bhwo",
        samples,
        weight.reshape(k, c, out_ch),
        preferred_element_type=samples.dtype,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
