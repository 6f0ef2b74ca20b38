"""Mask R-CNN training: losses + jitted train step.

Capability parity target: the mhp_extension person-detector fine-tune
(/root/reference/preprocess/humanparsing/mhp_extension/detectron2/tools/
finetune_net.py, configs/Misc/parsing_finetune_cihp.yaml — SGD, 1-class
Mask R-CNN on COCO-style CIHP annotations). Loss structure follows
detectron2's GeneralizedRCNN: RPN objectness BCE + box smooth-L1 on sampled
anchors, ROI-head softmax CE + class-agnostic box smooth-L1 on sampled
proposals (gt boxes appended so positives always exist), mask BCE on the
matched-gt crops of positive proposals.

Static-shape discipline: proposals/samples are fixed-size with 0/1 loss
weights; the mask head runs on every sampled proposal and the loss is
weighted by positivity (no dynamic gathers).

Batch format (see tests/test_maskrcnn.py):
  image     (B, H, W, 3) float [0,1], H,W % 64 == 0
  gt_boxes  (B, G, 4) xyxy, zero-padded
  gt_valid  (B, G) bool
  gt_masks  (B, G, H, W) {0,1}
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagdressing_tpu.detect import maskrcnn, targets
from imagdressing_tpu.ops import boxes as box_ops

Params = Dict[str, Any]


def _smooth_l1(pred, target, beta: float = 0.0):
    """beta=0 -> pure L1 (detectron2 default rpn smooth_l1_beta=0)."""
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def detection_loss(
    params: Params,
    cfg: maskrcnn.MaskRCNNConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    images = batch["image"]
    gt_boxes = batch["gt_boxes"].astype(jnp.float32)
    gt_valid = batch["gt_valid"].astype(bool)
    gt_masks = batch["gt_masks"]
    # padding/invalid gt slots are (0,0,0,0): encode_boxes would take
    # log(0/..) = -inf there, and inf * 0 loss-weight = NaN. Substitute a
    # finite unit box — matching masks invalid gts out via `gt_valid`, and
    # the per-anchor loss weights already zero their contribution.
    gt_boxes = jnp.where(
        gt_valid[..., None], gt_boxes,
        jnp.asarray([0.0, 0.0, 1.0, 1.0], gt_boxes.dtype),
    )
    b, h, w = images.shape[:3]
    g = gt_boxes.shape[1]

    feats = maskrcnn.apply_backbone_fpn(params, cfg, images)
    anchors = jnp.asarray(
        np.concatenate(maskrcnn.generate_anchors(cfg, (h, w))))
    objectness, rpn_deltas = maskrcnn.apply_rpn_head(params, feats, cfg)

    rngs = jax.random.split(rng, b * (2 + len(cfg.cascade_ious))).reshape(
        b, -1, 2)

    # ---- RPN targets (per image, vmapped) --------------------------------
    def rpn_targets(gt, valid, key):
        matched, labels = targets.match_boxes(
            anchors, gt, valid, pos_iou=cfg.rpn_pos_iou,
            neg_iou=cfg.rpn_neg_iou, allow_low_quality=True)
        wsel, wpos = targets.sample_balanced(
            labels, key, num_samples=cfg.rpn_samples,
            positive_fraction=cfg.rpn_pos_fraction)
        reg_target = box_ops.encode_boxes(gt[matched], anchors,
                                          cfg.rpn_delta_weights)
        return labels, wsel, wpos, reg_target

    labels, wsel, wpos, reg_t = jax.vmap(rpn_targets)(
        gt_boxes, gt_valid, rngs[:, 0])
    denom = jnp.maximum(wsel.sum(), 1.0)
    rpn_obj_loss = (
        optax.sigmoid_binary_cross_entropy(
            objectness, (labels == 1).astype(objectness.dtype)
        ) * wsel
    ).sum() / denom
    rpn_box_loss = (
        _smooth_l1(rpn_deltas, reg_t).sum(-1) * wpos
    ).sum() / denom

    # ---- proposals (no grad through the RPN outputs) ----------------------
    proposals, pvalid = maskrcnn.rpn_proposals(
        cfg, anchors, jax.lax.stop_gradient(objectness),
        jax.lax.stop_gradient(rpn_deltas), (h, w))
    proposals = jnp.concatenate([proposals, gt_boxes], axis=1)  # (B,P+G,4)
    pvalid = jnp.concatenate([pvalid, gt_valid], axis=1)
    n_roi = proposals.shape[1]

    losses = {"rpn_obj": rpn_obj_loss, "rpn_box": rpn_box_loss}
    total = rpn_obj_loss + rpn_box_loss
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), n_roi)

    last_wpos = None
    last_matched = None
    last_rois = None
    for stage, stage_iou in enumerate(cfg.cascade_ious):
        def roi_targets(props, valid, gt, gvalid, key):
            matched, lab = targets.match_boxes(
                props, gt, gvalid, pos_iou=stage_iou, neg_iou=stage_iou)
            lab = jnp.where(valid, lab, -1)
            wsel, wpos = targets.sample_balanced(
                lab, key, num_samples=cfg.roi_samples,
                positive_fraction=cfg.roi_pos_fraction)
            return matched, lab, wsel, wpos

        matched, lab, rsel, rpos = jax.vmap(roi_targets)(
            proposals, pvalid, gt_boxes, gt_valid, rngs[:, 2 + stage])

        rois5 = jnp.concatenate(
            [batch_idx[:, None], proposals.reshape(-1, 4)], axis=1)
        cls_logits, box_deltas = maskrcnn.roi_forward(
            params, cfg, feats, rois5, stage=stage)
        cls_logits = cls_logits.reshape(b, n_roi, -1)
        box_deltas = box_deltas.reshape(b, n_roi, 4)

        # class target: 1-class person -> 1 for positives, 0 background
        cls_t = jnp.where(lab == 1, 1, 0)
        rdenom = jnp.maximum(rsel.sum(), 1.0)
        cls_loss = (
            optax.softmax_cross_entropy_with_integer_labels(
                cls_logits, cls_t) * rsel
        ).sum() / rdenom
        matched_gt = jnp.take_along_axis(
            gt_boxes, matched[..., None], axis=1)
        reg_target = box_ops.encode_boxes(
            matched_gt, proposals, cfg.roi_delta_weights)
        box_loss = (
            _smooth_l1(box_deltas, reg_target).sum(-1) * rpos
        ).sum() / rdenom
        losses[f"roi{stage}_cls"] = cls_loss
        losses[f"roi{stage}_box"] = box_loss
        total = total + cls_loss + box_loss
        last_wpos, last_matched, last_rois = rpos, matched, proposals

        if stage + 1 < len(cfg.cascade_ious):
            # cascade: refined (detached) boxes feed the next stage
            proposals = jax.lax.stop_gradient(
                box_ops.clip_boxes(
                    box_ops.decode_boxes(box_deltas, proposals,
                                         cfg.roi_delta_weights),
                    float(h), float(w)))

    # ---- mask head on the final stage's sampled proposals -----------------
    rois5 = jnp.concatenate(
        [batch_idx[:, None], last_rois.reshape(-1, 4)], axis=1)
    mask_logits = maskrcnn.mask_forward(params, cfg, feats, rois5)
    mask_logits = mask_logits[..., 0].reshape(
        b, n_roi, cfg.mask_size, cfg.mask_size)

    def mask_t(gmasks, matched, props):
        return targets.crop_gt_masks(gmasks, matched, props, cfg.mask_size)

    mtargets = jax.vmap(mask_t)(gt_masks, last_matched, last_rois)
    mdenom = jnp.maximum(last_wpos.sum() * cfg.mask_size ** 2, 1.0)
    mask_loss = (
        optax.sigmoid_binary_cross_entropy(mask_logits, mtargets).sum((2, 3))
        * last_wpos
    ).sum() / mdenom
    losses["mask"] = mask_loss
    total = total + mask_loss
    losses["total"] = total
    return total, losses


def make_train_step(cfg: maskrcnn.MaskRCNNConfig,
                    tx: optax.GradientTransformation):
    """-> jittable fn(params, opt_state, batch, rng) ->
    (params, opt_state, metrics)."""

    def step(params, opt_state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(
            functools.partial(detection_loss, cfg=cfg), has_aux=True
        )(params, batch=batch, rng=rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
