"""Mask R-CNN (FPN) in functional JAX — person detector for the
mhp_extension dataset toolchain.

Reference capability being rebuilt: the vendored detectron2 trains a 1-class
(person) cascade Mask R-CNN on COCO-style CIHP annotations
(/root/reference/preprocess/humanparsing/mhp_extension/detectron2/tools/
finetune_net.py:45-52, configs/Misc/parsing_finetune_cihp.yaml — MASK_ON,
ROI_HEADS.NUM_CLASSES=1) whose instance predictions feed
make_crop_and_mask_w_mask_nms.py. This module is the TPU-native detector:

  * ResNet-FPN backbone (NHWC, GroupNorm — the reference config is a GN
    model too: cascade_mask_rcnn_..._gn_dconv), P2..P6;
  * RPN head shared across levels; proposals via static top-k + fixed-size
    greedy NMS (ops/boxes.nms_fixed) — no dynamic shapes anywhere;
  * class-agnostic box regression head (detectron2
    CLS_AGNOSTIC_BBOX_REG=True in the cascade config), optional cascade
    stages with rising IoU thresholds;
  * mask head on ROI-aligned features (ops/roi_align — the same op that
    replaces detectron2's ROIAlign CUDA kernel).

Everything is `jit`-compatible: anchors are trace-time constants, every
sample/proposal count is fixed by the config, invalid slots ride along with
zero loss weights.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.ops import boxes as box_ops
from imagdressing_tpu.ops import nn
from imagdressing_tpu.ops.roi_align import roi_align

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 1  # person (parsing_finetune_cihp.yaml ROI_HEADS)
    # backbone (resnet-18-shaped by default; shrink for tests)
    stem_channels: int = 64
    stage_channels: Tuple[int, ...] = (64, 128, 256, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    norm_groups: int = 16
    # FPN
    fpn_dim: int = 256
    # anchors: one size per level P2..P6 (strides 4..64), 3 aspect ratios
    anchor_sizes: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 256
    rpn_nms_threshold: float = 0.7
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_samples: int = 256
    rpn_pos_fraction: float = 0.5
    # ROI heads
    roi_samples: int = 128
    roi_pos_fraction: float = 0.25
    cascade_ious: Tuple[float, ...] = (0.5,)  # one entry per cascade stage
    box_fc_dim: int = 1024
    roi_size: int = 7
    # mask head
    mask_roi_size: int = 14
    mask_convs: int = 4
    max_gt: int = 16
    # box-delta weights (detectron2 Box2BoxTransform defaults)
    rpn_delta_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    roi_delta_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)

    @property
    def strides(self) -> Tuple[int, ...]:
        return (4, 8, 16, 32, 64)

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_ratios)

    @property
    def mask_size(self) -> int:
        return self.mask_roi_size * 2


def tiny_config() -> MaskRCNNConfig:
    """Small config for tests / CPU smoke runs."""
    return MaskRCNNConfig(
        stem_channels=8, stage_channels=(8, 16, 16, 16),
        stage_blocks=(1, 1, 1, 1), norm_groups=4, fpn_dim=16,
        rpn_pre_nms_topk=64, rpn_post_nms_topk=32, rpn_samples=32,
        roi_samples=16, box_fc_dim=32, mask_roi_size=7, mask_convs=1,
        max_gt=4,
    )


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _init_block(rng, cin: int, cout: int, stride: int) -> Params:
    k = jax.random.split(rng, 3)
    p = {
        "conv1": nn.param_init_conv(k[0], 3, 3, cin, cout),
        "norm1": nn.param_init_norm(cout),
        "conv2": nn.param_init_conv(k[1], 3, 3, cout, cout),
        "norm2": nn.param_init_norm(cout),
    }
    if stride != 1 or cin != cout:
        p["shortcut"] = nn.param_init_conv(k[2], 1, 1, cin, cout)
    return p


def init(rng, cfg: MaskRCNNConfig) -> Params:
    keys = iter(jax.random.split(rng, 64))
    bb: Params = {
        "stem": nn.param_init_conv(next(keys), 7, 7, 3, cfg.stem_channels),
        "stem_norm": nn.param_init_norm(cfg.stem_channels),
        "stages": [],
    }
    cin = cfg.stem_channels
    for ch, nblocks in zip(cfg.stage_channels, cfg.stage_blocks):
        blocks = []
        for j in range(nblocks):
            blocks.append(_init_block(next(keys), cin if j == 0 else ch, ch,
                                      stride=2 if j == 0 else 1))
        bb["stages"].append(blocks)
        cin = ch

    fpn: Params = {"lateral": [], "output": []}
    for ch in cfg.stage_channels:
        fpn["lateral"].append(
            nn.param_init_conv(next(keys), 1, 1, ch, cfg.fpn_dim))
        fpn["output"].append(
            nn.param_init_conv(next(keys), 3, 3, cfg.fpn_dim, cfg.fpn_dim))

    a = cfg.num_anchors
    rpn: Params = {
        "conv": nn.param_init_conv(next(keys), 3, 3, cfg.fpn_dim, cfg.fpn_dim),
        "obj": nn.param_init_conv(next(keys), 1, 1, cfg.fpn_dim, a),
        "deltas": nn.param_init_conv(next(keys), 1, 1, cfg.fpn_dim, 4 * a),
    }

    in_dim = cfg.fpn_dim * cfg.roi_size * cfg.roi_size
    box_heads: List[Params] = []
    for _ in cfg.cascade_ious:
        box_heads.append({
            "fc1": nn.param_init_linear(next(keys), in_dim, cfg.box_fc_dim),
            "fc2": nn.param_init_linear(next(keys), cfg.box_fc_dim,
                                        cfg.box_fc_dim),
            "cls": nn.param_init_linear(next(keys), cfg.box_fc_dim,
                                        cfg.num_classes + 1),
            # class-agnostic regression (cascade config default)
            "box": nn.param_init_linear(next(keys), cfg.box_fc_dim, 4),
        })

    mask: Params = {"convs": []}
    for _ in range(cfg.mask_convs):
        mask["convs"].append({
            "conv": nn.param_init_conv(next(keys), 3, 3, cfg.fpn_dim,
                                       cfg.fpn_dim),
            "norm": nn.param_init_norm(cfg.fpn_dim),
        })
    mask["up"] = nn.param_init_conv(next(keys), 3, 3, cfg.fpn_dim,
                                    cfg.fpn_dim)
    mask["logits"] = nn.param_init_conv(next(keys), 1, 1, cfg.fpn_dim,
                                        cfg.num_classes)

    return {"backbone": bb, "fpn": fpn, "rpn": rpn, "box_heads": box_heads,
            "mask": mask}


# --------------------------------------------------------------------------
# backbone + FPN
# --------------------------------------------------------------------------

def _relu(x):
    return jnp.maximum(x, 0.0)


def _block(p: Params, x, cfg: MaskRCNNConfig, stride: int):
    h = nn.conv2d(p["conv1"], x, stride=stride, padding=1)
    h = _relu(nn.group_norm(p["norm1"], h, num_groups=cfg.norm_groups))
    h = nn.conv2d(p["conv2"], h, padding=1)
    h = nn.group_norm(p["norm2"], h, num_groups=cfg.norm_groups)
    if "shortcut" in p:
        x = nn.conv2d(p["shortcut"], x, stride=stride, padding=0)
    return _relu(x + h)


def apply_backbone_fpn(params: Params, cfg: MaskRCNNConfig,
                       images: jnp.ndarray) -> List[jnp.ndarray]:
    """images (B,H,W,3) float in [0,1]; H,W divisible by 64.

    -> [P2, P3, P4, P5, P6] NHWC feature maps at strides 4..64.
    """
    bb = params["backbone"]
    x = nn.conv2d(bb["stem"], images, stride=2, padding=3)
    x = _relu(nn.group_norm(bb["stem_norm"], x, num_groups=cfg.norm_groups))

    feats = []
    for blocks in bb["stages"]:
        for j, bp in enumerate(blocks):
            x = _block(bp, x, cfg, stride=2 if j == 0 else 1)
        feats.append(x)  # strides 4, 8, 16, 32

    fpn = params["fpn"]
    laterals = [nn.conv2d(l, f, padding=0)
                for l, f in zip(fpn["lateral"], feats)]
    outs = [None] * len(laterals)
    prev = laterals[-1]
    outs[-1] = nn.conv2d(fpn["output"][-1], prev, padding=1)
    for i in range(len(laterals) - 2, -1, -1):
        prev = laterals[i] + nn.upsample_nearest_2x(prev)
        outs[i] = nn.conv2d(fpn["output"][i], prev, padding=1)
    # P6: stride-2 subsample of P5 (detectron2 LastLevelMaxPool)
    p6 = jax.lax.reduce_window(
        outs[-1], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1), "VALID"
    )
    return outs + [p6]


# --------------------------------------------------------------------------
# anchors (trace-time constants)
# --------------------------------------------------------------------------

def generate_anchors(cfg: MaskRCNNConfig, image_hw: Tuple[int, int]
                     ) -> List[np.ndarray]:
    """-> per-level (h*w*A, 4) xyxy anchor arrays (numpy, static)."""
    h, w = image_hw
    out = []
    for size, stride in zip(cfg.anchor_sizes, cfg.strides):
        fh, fw = h // stride, w // stride
        base = []
        area = size * size
        for r in cfg.anchor_ratios:
            bw = math.sqrt(area / r)
            bh = bw * r
            base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = np.asarray(base, np.float32)  # (A,4)
        sx = (np.arange(fw, dtype=np.float32) + 0.5) * stride
        sy = (np.arange(fh, dtype=np.float32) + 0.5) * stride
        cx, cy = np.meshgrid(sx, sy)
        centers = np.stack([cx, cy, cx, cy], axis=-1)  # (fh,fw,4)
        anchors = centers[:, :, None, :] + base[None, None, :, :]
        out.append(anchors.reshape(-1, 4))
    return out


# --------------------------------------------------------------------------
# RPN
# --------------------------------------------------------------------------

def apply_rpn_head(params: Params, feats: Sequence[jnp.ndarray],
                   cfg: MaskRCNNConfig):
    """-> (objectness (B, R), deltas (B, R, 4)) concatenated over levels,
    R = sum_level h*w*A — matches generate_anchors order."""
    rpn = params["rpn"]
    objs, deltas = [], []
    for f in feats:
        h = _relu(nn.conv2d(rpn["conv"], f, padding=1))
        o = nn.conv2d(rpn["obj"], h, padding=0)  # (B,fh,fw,A)
        d = nn.conv2d(rpn["deltas"], h, padding=0)  # (B,fh,fw,4A)
        b, fh, fw, a = o.shape
        objs.append(o.reshape(b, fh * fw * a))
        deltas.append(d.reshape(b, fh * fw * a, 4))
    return jnp.concatenate(objs, axis=1), jnp.concatenate(deltas, axis=1)


def rpn_proposals(
    cfg: MaskRCNNConfig,
    anchors: jnp.ndarray,  # (R, 4)
    objectness: jnp.ndarray,  # (B, R)
    deltas: jnp.ndarray,  # (B, R, 4)
    image_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (proposals (B, P, 4), valid (B, P)), P = rpn_post_nms_topk."""
    h, w = image_hw

    def per_image(obj, dts):
        k = min(cfg.rpn_pre_nms_topk, obj.shape[0])
        top, idx = jax.lax.top_k(obj, k)
        cand = box_ops.decode_boxes(dts[idx], anchors[idx],
                                    cfg.rpn_delta_weights)
        cand = box_ops.clip_boxes(cand, float(h), float(w))
        keep, valid = box_ops.nms_fixed(
            cand, top, iou_threshold=cfg.rpn_nms_threshold,
            max_out=cfg.rpn_post_nms_topk,
        )
        return cand[keep], valid

    return jax.vmap(per_image)(objectness, deltas)


# --------------------------------------------------------------------------
# ROI heads
# --------------------------------------------------------------------------

def _multilevel_roi_align(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                          cfg: MaskRCNNConfig, out_size: int) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq.1) done statically: align on each
    of P2..P5 and select per-ROI with a one-hot — dynamic gather-free.

    rois: (N, 5) [batch, x0, y0, x1, y1] in image coordinates.
    """
    areas = jnp.maximum(rois[:, 3] - rois[:, 1], 0.0) * jnp.maximum(
        rois[:, 4] - rois[:, 2], 0.0
    )
    lvl = jnp.floor(4.0 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-8))
    lvl = jnp.clip(lvl, 2.0, 5.0).astype(jnp.int32) - 2  # 0..3
    pooled = []
    for i in range(4):
        pooled.append(
            roi_align(feats[i], rois, output_size=out_size,
                      spatial_scale=1.0 / cfg.strides[i])
        )
    stacked = jnp.stack(pooled, axis=0)  # (4, N, s, s, C)
    onehot = jax.nn.one_hot(lvl, 4, axis=0, dtype=stacked.dtype)
    return jnp.einsum("ln,lnhwc->nhwc", onehot, stacked)


def apply_box_head(head: Params, roi_feats: jnp.ndarray):
    """(N, s, s, C) -> (cls_logits (N, K+1), deltas (N, 4))."""
    x = roi_feats.reshape(roi_feats.shape[0], -1)
    x = _relu(nn.linear(head["fc1"], x))
    x = _relu(nn.linear(head["fc2"], x))
    return nn.linear(head["cls"], x), nn.linear(head["box"], x)


def apply_mask_head(params: Params, roi_feats: jnp.ndarray) -> jnp.ndarray:
    """(N, m, m, C) -> mask logits (N, 2m, 2m, num_classes)."""
    m = params["mask"]
    x = roi_feats
    for cp in m["convs"]:
        x = nn.conv2d(cp["conv"], x, padding=1)
        x = _relu(nn.group_norm(cp["norm"], x, num_groups=1))
    x = nn.upsample_nearest_2x(x)
    x = _relu(nn.conv2d(m["up"], x, padding=1))
    return nn.conv2d(m["logits"], x, padding=0)


def roi_forward(params: Params, cfg: MaskRCNNConfig,
                feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                stage: int = 0):
    """rois (N,5) -> (cls_logits, box_deltas) for the given cascade stage."""
    pooled = _multilevel_roi_align(feats, rois, cfg, cfg.roi_size)
    return apply_box_head(params["box_heads"][stage], pooled)


def mask_forward(params: Params, cfg: MaskRCNNConfig,
                 feats: Sequence[jnp.ndarray],
                 rois: jnp.ndarray) -> jnp.ndarray:
    pooled = _multilevel_roi_align(feats, rois, cfg, cfg.mask_roi_size)
    return apply_mask_head(params, pooled)
