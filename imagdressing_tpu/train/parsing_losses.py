"""Losses + metrics for training the SCHP human-parsing network.

Parity surface for the reference's utils/ criterion stack
(/root/reference/preprocess/humanparsing/utils/: lovasz softmax, soft-dice,
KL consistency criterion, mIoU — ~1,100 LoC of torch), reimplemented as
jit-friendly JAX:

  * cross_entropy_2d — per-pixel CE with ignore index (CriterionAll)
  * lovasz_softmax — convex Lovász extension of the IoU loss
    (Berman et al. 2018, public algorithm); sorting via jax.lax.sort
  * soft_dice / soft_iou losses
  * kl_consistency — SCHP's self-correction KL between two predictions
  * mean_iou — evaluation metric (confusion-matrix based)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_2d(
    logits: jnp.ndarray,  # (B, H, W, C)
    labels: jnp.ndarray,  # (B, H, W) int
    ignore_index: int = 255,
    class_weights: Optional[jnp.ndarray] = None,  # (C,)
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Per-pixel CE with ignore index; `class_weights` reproduces torch
    CrossEntropyLoss(weight=...) semantics (weighted mean: sum of weighted
    NLL / sum of per-pixel weights).

    Under shard_map pass `axis_name`: numerator/denominator aggregate over
    the data axis so the per-device value — after the caller's pmean over
    the total loss — equals the full-batch CE exactly (per-shard weighted
    means don't average to the global weighted mean)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        wpix = class_weights.astype(jnp.float32)[safe]
        nll = nll * wpix
        denom = jnp.sum(jnp.where(valid, wpix, 0.0))
    else:
        denom = jnp.sum(valid).astype(jnp.float32)
    nll = jnp.where(valid, nll, 0.0)
    num = jnp.sum(nll)
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
        # pre-scale by the axis size: the caller pmeans the total loss,
        # which divides back — net effect sum(num_i) / global_denom
        num = num * jax.lax.psum(1.0, axis_name)
    return num / jnp.maximum(denom, 1e-8)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-8)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    logits: jnp.ndarray,  # (B, H, W, C)
    labels: jnp.ndarray,  # (B, H, W)
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Mean over classes of the Lovász hinge on softmax errors. Ignored
    pixels get zero error weight (they sort to the tail)."""
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(-1, c)
    labels = labels.reshape(-1)
    valid = (labels != ignore_index).astype(jnp.float32)

    def class_loss(ci):
        fg = jnp.where(labels == ci, 1.0, 0.0) * valid
        errors = jnp.abs(fg - probs[:, ci]) * valid
        # descending sort of errors, carrying fg along
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        grad = _lovasz_grad(fg_sorted)
        present = jnp.sum(fg) > 0
        return jnp.where(present, jnp.sum(errors_sorted * grad), 0.0), present

    losses, present = jax.vmap(class_loss)(jnp.arange(c))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1)


def soft_dice_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = 255,
    eps: float = 1.0,
) -> jnp.ndarray:
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, c)
    labels = labels.reshape(-1)
    valid = (labels != ignore_index)[:, None].astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.where(labels == ignore_index, 0, labels), c)
    onehot = onehot * valid
    probs = probs * valid
    inter = jnp.sum(probs * onehot, axis=0)
    denom = jnp.sum(probs, axis=0) + jnp.sum(onehot, axis=0)
    dice = (2 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def kl_consistency(
    input_logits: jnp.ndarray,   # current model (B, H, W, C)
    target_logits: jnp.ndarray,  # schp-averaged soft target
    labels: Optional[jnp.ndarray] = None,  # (B, H, W) for ignore filtering
    temperature: float = 1.0,
    ignore_index: int = 255,
) -> jnp.ndarray:
    """Reference KLDivergenceLoss (utils/kl_loss.py:34-44):
    T^2 * F.kl_div(log_softmax(input/T), softmax(target/T)) over the
    non-ignored pixels — KL(TARGET || input), element-mean reduction
    (divides by valid_pixels * C, torch's kl_div default)."""
    t = temperature
    li = jax.nn.log_softmax(input_logits.astype(jnp.float32) / t, -1)
    lt = jax.nn.log_softmax(target_logits.astype(jnp.float32) / t, -1)
    pt = jnp.exp(lt)
    elem = pt * (lt - li)  # target-direction KL, per element
    if labels is not None:
        valid = (labels != ignore_index)[..., None].astype(jnp.float32)
        elem = elem * valid
        denom = jnp.maximum(jnp.sum(valid) * elem.shape[-1], 1.0)
    else:
        denom = elem.size
    return t * t * jnp.sum(elem) / denom


def schp_criterion(
    fusion_logits: jnp.ndarray,
    edge_logits: jnp.ndarray,
    labels: jnp.ndarray,
    edge_labels: jnp.ndarray,
    *,
    lovasz_weight: float = 1.0,
    edge_weight: float = 1.0,
    prev_fusion_logits: Optional[jnp.ndarray] = None,
    cycle_weight: float = 0.0,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Combined SCHP objective (reference CriterionAll.parsing_loss,
    utils/criterion.py:40-103): CE + Lovász on parsing, pos/neg-weighted CE
    on edges, and the optional self-correction KL against the previous
    cycle's soft predictions.

    Deviation note: the reference also adds lambda_3 * ConsistencyLoss, but
    that term is identically ZERO by construction — it smooth-l1-compares
    generated vs predicted edges restricted to pixels where BOTH are 1
    (consistency_loss.py:32-33), so both operands are the constant 1.
    Omitted here; documented rather than reproduced as dead compute."""
    loss = cross_entropy_2d(fusion_logits, labels, axis_name=axis_name)
    loss += lovasz_weight * lovasz_softmax(fusion_logits, labels)
    # edge CE weighting (criterion.py:53-58): the minority edge class is
    # upweighted by the complementary class frequency (GLOBAL counts under
    # shard_map — per-shard ratios would disagree with the full batch)
    ev = (edge_labels != 255)
    pos = jnp.sum((edge_labels == 1) & ev).astype(jnp.float32)
    neg = jnp.sum((edge_labels == 0) & ev).astype(jnp.float32)
    if axis_name is not None:
        pos = jax.lax.psum(pos, axis_name)
        neg = jax.lax.psum(neg, axis_name)
    tot = jnp.maximum(pos + neg, 1.0)
    edge_w = jnp.stack([pos / tot, neg / tot])  # [w_class0, w_class1]
    loss += edge_weight * cross_entropy_2d(
        edge_logits, edge_labels, class_weights=edge_w, axis_name=axis_name
    )
    if prev_fusion_logits is not None and cycle_weight > 0:
        loss += cycle_weight * kl_consistency(
            fusion_logits, prev_fusion_logits, labels
        )
    return loss


def mean_iou(
    pred: jnp.ndarray,  # (..., ) int predictions
    labels: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
) -> jnp.ndarray:
    valid = labels != ignore_index
    p = jnp.where(valid, pred, num_classes)  # dump ignored into extra bin
    l = jnp.where(valid, labels, num_classes)
    conf = jnp.zeros((num_classes + 1, num_classes + 1), jnp.float32)
    idx = l.reshape(-1) * (num_classes + 1) + p.reshape(-1)
    conf = conf.reshape(-1).at[idx].add(1.0).reshape(
        num_classes + 1, num_classes + 1
    )[: num_classes, : num_classes]
    inter = jnp.diag(conf)
    union = conf.sum(0) + conf.sum(1) - inter
    iou = inter / jnp.maximum(union, 1.0)
    present = (conf.sum(1) > 0).astype(jnp.float32)
    return jnp.sum(iou * present) / jnp.maximum(jnp.sum(present), 1.0)
