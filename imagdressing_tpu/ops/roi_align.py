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
        """Sample features[bi] at float coords with zero outside."""
        valid = (yy >= -1.0) & (yy <= h) & (xx >= -1.0) & (xx <= w)
        yy = jnp.clip(yy, 0.0, h - 1)
        xx = jnp.clip(xx, 0.0, w - 1)
        yl = jnp.floor(yy).astype(jnp.int32)
        xl = jnp.floor(xx).astype(jnp.int32)
        yh = jnp.minimum(yl + 1, h - 1)
        xh = jnp.minimum(xl + 1, w - 1)
        wy = yy - yl
        wx = xx - xl
        img = features[bi]  # traced gather over batch

        def g(yi, xi):
            return img[yi, xi]  # (..., C) gather

        val = (
            g(yl, xl) * ((1 - wy) * (1 - wx))[..., None]
            + g(yl, xh) * ((1 - wy) * wx)[..., None]
            + g(yh, xl) * (wy * (1 - wx))[..., None]
            + g(yh, xh) * (wy * wx)[..., None]
        )
        return val * valid[..., None]

    # (N, Py, Sy, Px, Sx) coordinate lattice
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (n, output_size, sr, output_size, sr))
    xx = jnp.broadcast_to(xx, (n, output_size, sr, output_size, sr))

    samples = jax.vmap(bilinear)(batch_idx, yy, xx)  # (N,Py,Sy,Px,Sx,C)
    return jnp.mean(samples, axis=(2, 4))  # average over the sample grid
