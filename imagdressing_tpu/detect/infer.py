"""Mask R-CNN inference -> the mhp_extension crop-tool contract.

Mirrors the reference flow: detectron2 inference writes
`instances_predictions.pth` — per image a list of {score, bbox [x,y,w,h],
segmentation} sorted by score — consumed by
make_crop_and_mask_w_mask_nms.py:38-74. `detect_instances` is the jitted
device program (static max_detections); `to_instances` converts one image's
padded outputs to that contract on host (full-size binary masks instead of
RLE — pycocotools is not in this image and the crop tool only ever decodes).

Test-time thresholds default to parsing_inference.yaml
(ROI_HEADS.NMS_THRESH_TEST 0.95, SCORE_THRESH_TEST 0.5).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.detect import maskrcnn
from imagdressing_tpu.ops import boxes as box_ops

Params = Dict[str, Any]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_detections", "score_threshold",
                     "nms_threshold"),
)
def detect_instances(
    params: Params,
    cfg: maskrcnn.MaskRCNNConfig,
    images: jnp.ndarray,  # (B, H, W, 3) float [0,1]
    *,
    max_detections: int = 20,
    score_threshold: float = 0.5,
    nms_threshold: float = 0.95,
):
    """-> dict: boxes (B,D,4) xyxy, scores (B,D), valid (B,D),
    masks (B,D,2m,2m) sigmoid probabilities in roi coordinates."""
    b, h, w = images.shape[:3]
    feats = maskrcnn.apply_backbone_fpn(params, cfg, images)
    anchors = jnp.asarray(
        np.concatenate(maskrcnn.generate_anchors(cfg, (h, w))))
    objectness, rpn_deltas = maskrcnn.apply_rpn_head(params, feats, cfg)
    proposals, pvalid = maskrcnn.rpn_proposals(
        cfg, anchors, objectness, rpn_deltas, (h, w))
    n_roi = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), n_roi)

    scores = None
    for stage in range(len(cfg.cascade_ious)):
        rois5 = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(-1, 4)], axis=1)
        cls_logits, box_deltas = maskrcnn.roi_forward(
            params, cfg, feats, rois5, stage=stage)
        probs = jax.nn.softmax(cls_logits.reshape(b, n_roi, -1), axis=-1)
        # cascade: average stage scores (detectron2 CascadeROIHeads)
        scores = probs if scores is None else scores + probs
        boxes = box_ops.clip_boxes(
            box_ops.decode_boxes(
                box_deltas.reshape(b, n_roi, 4), proposals,
                cfg.roi_delta_weights),
            float(h), float(w))
        if stage + 1 < len(cfg.cascade_ious):
            proposals = boxes
    scores = scores / len(cfg.cascade_ious)
    person = jnp.where(pvalid, scores[..., 1], 0.0)  # class 1 = person

    def per_image(bx, sc):
        keep, valid = box_ops.nms_fixed(
            bx, sc, iou_threshold=nms_threshold, max_out=max_detections,
            score_threshold=score_threshold)
        return bx[keep], sc[keep], valid

    dboxes, dscores, dvalid = jax.vmap(per_image)(boxes, person)

    # mask head on the detections
    d = max_detections
    det_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), d)
    rois5 = jnp.concatenate(
        [det_idx[:, None], dboxes.reshape(-1, 4)], axis=1)
    mask_logits = maskrcnn.mask_forward(params, cfg, feats, rois5)
    masks = jax.nn.sigmoid(mask_logits[..., 0]).reshape(
        b, d, cfg.mask_size, cfg.mask_size)
    return {"boxes": dboxes, "scores": dscores, "valid": dvalid,
            "masks": masks}


def paste_mask(mask: np.ndarray, box: np.ndarray, height: int, width: int,
               threshold: float = 0.5) -> np.ndarray:
    """Paste one roi-space mask into a (height, width) canvas (host-side
    equivalent of detectron2 paste_masks_in_image)."""
    import cv2

    x0, y0, x1, y1 = [int(round(float(v))) for v in box]
    canvas = np.zeros((height, width), np.uint8)
    # clamp INTO the frame on both ends: un-letterboxed boxes can land
    # entirely in the padding (x0 >= width), where the old max/min gave a
    # negative crop extent and cv2.resize raised
    x0 = max(min(x0, width - 1), 0)
    y0 = max(min(y0, height - 1), 0)
    x1 = min(max(x1, x0 + 1), width)
    y1 = min(max(y1, y0 + 1), height)
    if x1 <= x0 or y1 <= y0:
        return canvas
    resized = cv2.resize(mask.astype(np.float32), (x1 - x0, y1 - y0),
                         interpolation=cv2.INTER_LINEAR)
    canvas[y0:y1, x0:x1] = (resized >= threshold).astype(np.uint8)
    return canvas


def to_instances(det: Dict[str, np.ndarray], image_index: int, height: int,
                 width: int) -> List[Dict[str, Any]]:
    """One image's padded detections -> the make_crop instances contract:
    [{score, bbox [x,y,w,h], segmentation (H,W) uint8}], score-descending."""
    boxes = np.asarray(det["boxes"][image_index])
    scores = np.asarray(det["scores"][image_index])
    valid = np.asarray(det["valid"][image_index])
    masks = np.asarray(det["masks"][image_index])
    out = []
    for i in np.argsort(-scores):
        if not valid[i]:
            continue
        x0, y0, x1, y1 = boxes[i]
        out.append({
            "score": float(scores[i]),
            "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
            "segmentation": paste_mask(masks[i], boxes[i], height, width),
        })
    return out
