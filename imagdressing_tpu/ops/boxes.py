"""Axis-aligned box ops for the detection stack — static shapes throughout.

TPU-native equivalents of the box utilities the reference's vendored
detectron2 uses for the mhp_extension person detector
(/root/reference/preprocess/humanparsing/mhp_extension/detectron2/detectron2/
structures/boxes.py pairwise_iou, modeling/box_regression.py Box2BoxTransform,
layers/nms.py batched_nms). Everything here is jit-safe: fixed-size inputs,
`nms_fixed` returns a padded index vector + validity mask instead of a
data-dependent-length list.

Boxes are (..., 4) [x0, y0, x1, y1] float.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,4), (M,4) -> (N,M) IoU (detectron2 structures.pairwise_iou)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


# Faster-R-CNN delta parameterization (Box2BoxTransform, weights (1,1,1,1);
# detectron2 uses (10,10,5,5) for ROI heads — pass `weights`).
_CLAMP = math.log(1000.0 / 16)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """gt boxes + anchors -> regression deltas (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + 0.5 * bw
    by = boxes[..., 1] + 0.5 * bh
    wx, wy, ww, wh = weights
    return jnp.stack(
        [
            wx * (bx - ax) / jnp.maximum(aw, 1e-6),
            wy * (by - ay) / jnp.maximum(ah, 1e-6),
            ww * jnp.log(jnp.maximum(bw, 1e-6) / jnp.maximum(aw, 1e-6)),
            wh * jnp.log(jnp.maximum(bh, 1e-6) / jnp.maximum(ah, 1e-6)),
        ],
        axis=-1,
    )


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """regression deltas + anchors -> boxes (inverse of encode_boxes)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=_CLAMP)
    dh = jnp.clip(deltas[..., 3] / wh, max=_CLAMP)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x0 = jnp.clip(boxes[..., 0], 0.0, width)
    y0 = jnp.clip(boxes[..., 1], 0.0, height)
    x1 = jnp.clip(boxes[..., 2], 0.0, width)
    y1 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def nms_fixed(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    *,
    iou_threshold: float = 0.7,
    max_out: int = 100,
    score_threshold: float = -jnp.inf,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a STATIC output size.

    Returns (indices (max_out,) int32 padded with 0, valid (max_out,) bool).
    Semantics match torchvision/detectron2 greedy NMS over the kept prefix.
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)
    live = scores > score_threshold

    def body(i, carry):
        live, idxs, valid = carry
        masked = jnp.where(live, scores, -jnp.inf)
        j = jnp.argmax(masked)
        ok = masked[j] > -jnp.inf
        idxs = idxs.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        valid = valid.at[i].set(ok)
        # suppress j itself and everything overlapping it
        suppress = (iou[j] > iou_threshold) | (jnp.arange(n) == j)
        live = live & ~suppress & ok  # once exhausted, stay exhausted
        return live, idxs, valid

    idxs = jnp.zeros((max_out,), jnp.int32)
    valid = jnp.zeros((max_out,), bool)
    _, idxs, valid = jax.lax.fori_loop(0, max_out, body, (live, idxs, valid))
    return idxs, valid
