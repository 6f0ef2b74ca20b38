"""ROIAlign on XLA gathers — the TPU equivalent of detectron2's CUDA op.

The reference vendors detectron2's ROIAlign CUDA kernels for its offline
human-parsing dataset toolchain (/root/reference/preprocess/humanparsing/
mhp_extension/detectron2/detectron2/layers/csrc/ROIAlign/). On TPU the same
op is a batched bilinear gather: XLA fuses the index arithmetic and the
4-point interpolation into one kernel, and it differentiates for free (no
hand-written backward).

Semantics match torchvision/detectron2 `roi_align`:
  * boxes (N, 5): [batch_idx, x0, y0, x1, y1] in input coordinates,
    scaled by `spatial_scale`;
  * `aligned=True` shifts by -0.5 (the detectron2 "aligned" variant — see
    their test_roi_align.py golden values, reproduced in our tests);
  * `sampling_ratio` grid points per bin (static), average-pooled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear(img: jnp.ndarray, h: int, w: int, yy, xx):
    """Sample img (H,W,C) at float coords (any shape), zero outside.

    Matches detectron2's `bilinear_interpolate` boundary handling: points in
    [-1, 0) and (size-1, size] clamp to the border, farther points are zero.
    """
    valid = (yy >= -1.0) & (yy <= h) & (xx >= -1.0) & (xx <= w)
    yy = jnp.clip(yy, 0.0, h - 1)
    xx = jnp.clip(xx, 0.0, w - 1)
    yl = jnp.floor(yy).astype(jnp.int32)
    xl = jnp.floor(xx).astype(jnp.int32)
    yh = jnp.minimum(yl + 1, h - 1)
    xh = jnp.minimum(xl + 1, w - 1)
    wy = yy - yl
    wx = xx - xl
    val = (
        img[yl, xl] * ((1 - wy) * (1 - wx))[..., None]
        + img[yl, xh] * ((1 - wy) * wx)[..., None]
        + img[yh, xl] * (wy * (1 - wx))[..., None]
        + img[yh, xh] * (wy * wx)[..., None]
    )
    return val * valid[..., None]


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned")
)
def roi_align(
    features: jnp.ndarray,  # (B, H, W, C) NHWC
    boxes: jnp.ndarray,  # (N, 5) [batch_idx, x0, y0, x1, y1]
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """-> (N, output_size, output_size, C)."""
    b, h, w, c = features.shape
    n = boxes.shape[0]
    offset = 0.5 if aligned else 0.0

    batch_idx = boxes[:, 0].astype(jnp.int32)
    x0 = boxes[:, 1] * spatial_scale - offset
    y0 = boxes[:, 2] * spatial_scale - offset
    x1 = boxes[:, 3] * spatial_scale - offset
    y1 = boxes[:, 4] * spatial_scale - offset

    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    sr = sampling_ratio

    # sample coordinates: (N, P, S) for P = output bins, S = samples per bin
    grid = (jnp.arange(output_size, dtype=jnp.float32))[None, :, None]
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5)[None, None, :] / sr
    ys = y0[:, None, None] + (grid + sub) * bin_h[:, None, None]  # (N,P,S)
    xs = x0[:, None, None] + (grid + sub) * bin_w[:, None, None]

    def bilinear(bi, yy, xx):
        return _bilinear(features[bi], h, w, yy, xx)

    # (N, Py, Sy, Px, Sx) coordinate lattice
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (n, output_size, sr, output_size, sr))
    xx = jnp.broadcast_to(xx, (n, output_size, sr, output_size, sr))

    samples = jax.vmap(bilinear)(batch_idx, yy, xx)  # (N,Py,Sy,Px,Sx,C)
    return jnp.mean(samples, axis=(2, 4))  # average over the sample grid


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated(
    features: jnp.ndarray,  # (B, H, W, C) NHWC
    rois: jnp.ndarray,  # (N, 6) [batch_idx, cx, cy, w, h, angle_deg]
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Rotated ROIAlign — the rotation composed into the sample grid.

    TPU equivalent of detectron2's ROIAlignRotated CUDA op
    (/root/reference/preprocess/humanparsing/mhp_extension/detectron2/
    detectron2/layers/csrc/ROIAlignRotated/): rois give box center, size and a
    CCW-positive angle in degrees; sample points are laid out on the box's
    local grid, rotated about the center, then bilinearly gathered. Always
    "aligned" (the continuous -0.5 offset — the only variant detectron2
    ships for the rotated op). Differentiates for free under XLA.

    -> (N, output_size, output_size, C)
    """
    b, h, w, c = features.shape
    n = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale - 0.5
    cy = rois[:, 2] * spatial_scale - 0.5
    roi_w = jnp.maximum(rois[:, 3] * spatial_scale, 1e-6)
    roi_h = jnp.maximum(rois[:, 4] * spatial_scale, 1e-6)
    theta = rois[:, 5] * (jnp.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    sr = sampling_ratio

    # local box-frame coordinates relative to the center: (N, P, S)
    grid = (jnp.arange(output_size, dtype=jnp.float32))[None, :, None]
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5)[None, None, :] / sr
    yy_loc = -roi_h[:, None, None] / 2.0 + (grid + sub) * bin_h[:, None, None]
    xx_loc = -roi_w[:, None, None] / 2.0 + (grid + sub) * bin_w[:, None, None]

    # (N, Py, Sy, Px, Sx) lattice, rotated about the center
    yy = jnp.broadcast_to(
        yy_loc[:, :, :, None, None], (n, output_size, sr, output_size, sr)
    )
    xx = jnp.broadcast_to(
        xx_loc[:, None, None, :, :], (n, output_size, sr, output_size, sr)
    )
    r = (slice(None),) + (None,) * 4
    ys = yy * cos_t[r] - xx * sin_t[r] + cy[r]
    xs = yy * sin_t[r] + xx * cos_t[r] + cx[r]

    def bilinear(bi, y_, x_):
        return _bilinear(features[bi], h, w, y_, x_)

    samples = jax.vmap(bilinear)(batch_idx, ys, xs)  # (N,Py,Sy,Px,Sx,C)
    return jnp.mean(samples, axis=(2, 4))
