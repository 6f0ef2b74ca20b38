"""Target assignment + balanced sampling for RPN/ROI training — all static
shapes (detectron2 Matcher + subsample_labels semantics,
/root/reference/preprocess/humanparsing/mhp_extension/detectron2/detectron2/
modeling/matcher.py and sampling.py, rebuilt without dynamic-length index
lists: every anchor/proposal keeps a slot, selection is expressed as 0/1
loss weights)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from imagdressing_tpu.ops import boxes as box_ops


def match_boxes(
    candidates: jnp.ndarray,  # (R, 4) anchors or proposals
    gt_boxes: jnp.ndarray,  # (G, 4) padded
    gt_valid: jnp.ndarray,  # (G,) bool
    *,
    pos_iou: float,
    neg_iou: float,
    allow_low_quality: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (matched_gt_idx (R,) int32, labels (R,) int32 in {1, 0, -1}).

    labels: 1 = positive, 0 = negative/background, -1 = ignore (IoU in the
    [neg_iou, pos_iou) band). With allow_low_quality, the highest-IoU
    candidate of every gt box is forced positive (detectron2
    Matcher(allow_low_quality_matches=True), used by the RPN).
    """
    iou = box_ops.pairwise_iou(candidates, gt_boxes)  # (R, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)
    best = jnp.max(iou, axis=1)
    labels = jnp.where(best >= pos_iou, 1, jnp.where(best < neg_iou, 0, -1))
    if allow_low_quality:
        # candidate index with the best IoU for each gt; force-positive it.
        # Invalid/padding gts all argmax to candidate 0 — route their
        # scatter index out of bounds (dropped by jax's default scatter
        # mode) so they can never collide with a valid gt's write.
        r = candidates.shape[0]
        best_per_gt = jnp.argmax(iou, axis=0)  # (G,)
        has_overlap = gt_valid & (jnp.max(iou, axis=0) > 0)
        safe_idx = jnp.where(has_overlap, best_per_gt, r)
        force = jnp.zeros(r, bool).at[safe_idx].set(True, mode="drop")
        labels = jnp.where(force, 1, labels)
        # the forced candidate must also point at the gt that claimed it
        claimed_gt = jnp.zeros(r, jnp.int32).at[safe_idx].set(
            jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop"
        )
        matched = jnp.where(force, claimed_gt, matched)
    return matched, labels.astype(jnp.int32)


def sample_balanced(
    labels: jnp.ndarray,  # (R,) {1, 0, -1}
    rng: jax.Array,
    *,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (selected (R,), positive (R,)) float {0,1} weight vectors:
    ≤ num_samples slots on, positives capped
    at num_samples*positive_fraction (detectron2 subsample_labels). Static:
    fixed top-k draws from randomized priorities; short categories simply
    light fewer slots (the loss normalizes by the on count)."""
    n_pos = int(round(num_samples * positive_fraction))
    n_neg = num_samples - n_pos
    key_pos, key_neg = jax.random.split(rng)

    def draw(mask, key, k):
        pri = jax.random.uniform(key, labels.shape)
        pri = jnp.where(mask, pri, -1.0)
        _, idx = jax.lax.top_k(pri, k)
        chosen = jnp.zeros(labels.shape, bool).at[idx].set(True)
        return chosen & mask  # drop slots that were just -1 padding

    w_pos = draw(labels == 1, key_pos, min(n_pos, labels.shape[0]))
    w_neg = draw(labels == 0, key_neg, min(n_neg, labels.shape[0]))
    return (w_pos | w_neg).astype(jnp.float32), w_pos.astype(jnp.float32)


def crop_gt_masks(
    gt_masks: jnp.ndarray,  # (G, H, W) {0,1}
    matched_idx: jnp.ndarray,  # (P,) int32 into G
    rois: jnp.ndarray,  # (P, 4) xyxy image coords
    mask_size: int,
) -> jnp.ndarray:
    """-> (P, mask_size, mask_size) gt mask crops, bilinearly resampled in
    each roi (detectron2 crop_and_resize on polygon rasters)."""
    from imagdressing_tpu.ops.roi_align import roi_align

    sel = gt_masks[matched_idx].astype(jnp.float32)[..., None]  # (P,H,W,1)
    p = rois.shape[0]
    rois5 = jnp.concatenate(
        [jnp.arange(p, dtype=rois.dtype)[:, None], rois], axis=1
    )
    crops = roi_align(sel, rois5, output_size=mask_size, sampling_ratio=2)
    return (crops[..., 0] >= 0.5).astype(jnp.float32)
