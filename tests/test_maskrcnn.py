"""Mask R-CNN detector (TPU-native equivalent of the mhp_extension
detectron2 person fine-tune: finetune_net.py + parsing_finetune_cihp.yaml)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from imagdressing_tpu.detect import infer as det_infer
from imagdressing_tpu.detect import maskrcnn, targets
from imagdressing_tpu.detect.train import detection_loss, make_train_step
from imagdressing_tpu.ops import boxes as box_ops


# ---------------------------------------------------------------- box ops --

def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0],
                   [20.0, 20.0, 30.0, 30.0]])
    iou = box_ops.pairwise_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(np.tile(rng.uniform(0, 50, (20, 2)), 2)
                          + np.array([0, 0, 10, 14]))
    boxes = anchors + jnp.asarray(rng.uniform(-3, 3, (20, 4)))
    for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
        deltas = box_ops.encode_boxes(boxes, anchors, w)
        back = box_ops.decode_boxes(deltas, anchors, w)
        np.testing.assert_allclose(back, boxes, atol=1e-3)


def _nms_numpy(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        iou = np.asarray(box_ops.pairwise_iou(
            jnp.asarray(boxes[i][None]), jnp.asarray(boxes[rest])))[0]
        order = rest[iou <= thr]
    return keep


def test_nms_fixed_matches_greedy_reference():
    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 40, (30, 2))
    wh = rng.uniform(5, 20, (30, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(size=30).astype(np.float32)
    idx, valid = box_ops.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), iou_threshold=0.5,
        max_out=30)
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == _nms_numpy(boxes, scores, 0.5)


def test_nms_fixed_score_threshold_and_padding():
    boxes = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.1])
    idx, valid = box_ops.nms_fixed(boxes, scores, iou_threshold=0.5,
                                   max_out=4, score_threshold=0.5)
    assert valid.sum() == 1 and idx[0] == 0


# ---------------------------------------------------------------- anchors --

def test_generate_anchors_layout():
    cfg = maskrcnn.tiny_config()
    per_level = maskrcnn.generate_anchors(cfg, (64, 64))
    assert len(per_level) == 5
    a = per_level[0]
    assert a.shape == (16 * 16 * 3, 4)
    # first anchor centered on (2, 2) at stride 4
    cx = (a[0, 0] + a[0, 2]) / 2
    cy = (a[0, 1] + a[0, 3]) / 2
    np.testing.assert_allclose([cx, cy], [2.0, 2.0], atol=1e-5)
    # aspect ratios preserve area
    areas = (a[:3, 2] - a[:3, 0]) * (a[:3, 3] - a[:3, 1])
    np.testing.assert_allclose(areas, cfg.anchor_sizes[0] ** 2, rtol=1e-5)


# ---------------------------------------------------------------- targets --

def test_match_boxes_bands_and_low_quality():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 10], [40, 40, 50, 50], [0, 0, 4, 10]],
        jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [100, 100, 120, 120]], jnp.float32)
    valid = jnp.asarray([True, False])
    matched, labels = targets.match_boxes(
        anchors, gt, valid, pos_iou=0.7, neg_iou=0.3)
    assert labels.tolist() == [1, 1, 0, -1]  # exact, 0.9, 0.0, 0.4 band
    assert matched[0] == 0 and matched[1] == 0
    # low-quality: a lone 0.4-IoU anchor becomes positive for its gt
    matched2, labels2 = targets.match_boxes(
        anchors[2:], gt, valid, pos_iou=0.7, neg_iou=0.3,
        allow_low_quality=True)
    assert labels2.tolist() == [0, 1]
    assert matched2[1] == 0


def test_sample_balanced_caps_and_masks():
    labels = jnp.asarray([1] * 3 + [0] * 20 + [-1] * 5)
    wsel, wpos = targets.sample_balanced(
        labels, jax.random.PRNGKey(0), num_samples=8,
        positive_fraction=0.5)
    assert wpos.sum() == 3  # only 3 positives exist (cap is 4)
    assert wsel.sum() <= 8
    assert (wsel[labels == -1] == 0).all()


def test_crop_gt_masks_identity_box():
    g = np.zeros((2, 32, 32), np.float32)
    g[0, 8:24, 8:24] = 1.0
    crops = targets.crop_gt_masks(
        jnp.asarray(g), jnp.asarray([0], jnp.int32),
        jnp.asarray([[8.0, 8.0, 24.0, 24.0]]), mask_size=8)
    assert crops.shape == (1, 8, 8)
    assert crops.mean() > 0.9  # the roi is exactly the solid square


# ------------------------------------------------------------------ model --

@pytest.fixture(scope="module")
def tiny():
    cfg = maskrcnn.tiny_config()
    params = maskrcnn.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_backbone_fpn_shapes(tiny):
    cfg, params = tiny
    feats = maskrcnn.apply_backbone_fpn(
        params, cfg, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [
        (1, 16, 16, cfg.fpn_dim), (1, 8, 8, cfg.fpn_dim),
        (1, 4, 4, cfg.fpn_dim), (1, 2, 2, cfg.fpn_dim),
        (1, 1, 1, cfg.fpn_dim)]


def _synthetic_batch(cfg, b=1, size=64):
    """One bright rectangle per image on a dark background."""
    rng = np.random.default_rng(3)
    images = np.full((b, size, size, 3), 0.1, np.float32)
    gt_boxes = np.zeros((b, cfg.max_gt, 4), np.float32)
    gt_valid = np.zeros((b, cfg.max_gt), bool)
    gt_masks = np.zeros((b, cfg.max_gt, size, size), np.float32)
    for i in range(b):
        x0, y0 = rng.integers(4, 20, 2)
        bw, bh = rng.integers(24, 36, 2)
        x1, y1 = min(x0 + bw, size - 2), min(y0 + bh, size - 2)
        images[i, y0:y1, x0:x1] = 0.9
        gt_boxes[i, 0] = [x0, y0, x1, y1]
        gt_valid[i, 0] = True
        gt_masks[i, 0, y0:y1, x0:x1] = 1.0
    return {
        "image": jnp.asarray(images), "gt_boxes": jnp.asarray(gt_boxes),
        "gt_valid": jnp.asarray(gt_valid), "gt_masks": jnp.asarray(gt_masks),
    }


def test_detection_loss_finite_components(tiny):
    cfg, params = tiny
    batch = _synthetic_batch(cfg)
    total, parts = jax.jit(
        lambda p, b, r: detection_loss(p, cfg, b, r)
    )(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    for k in ["rpn_obj", "rpn_box", "roi0_cls", "roi0_box", "mask"]:
        assert k in parts and np.isfinite(float(parts[k])), k


def test_train_step_decreases_loss(tiny):
    cfg, _ = tiny
    params = maskrcnn.init(jax.random.PRNGKey(1), cfg)
    tx = optax.adam(1e-3)
    step = jax.jit(make_train_step(cfg, tx))
    opt_state = tx.init(params)
    batch = _synthetic_batch(cfg)
    first = last = None
    for i in range(25):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["total"])
        last = float(metrics["total"])
    assert np.isfinite(last)
    assert last < first


def test_cascade_stages_compile():
    cfg = maskrcnn.tiny_config()
    cfg = type(cfg)(**{**cfg.__dict__, "cascade_ious": (0.5, 0.6)})
    params = maskrcnn.init(jax.random.PRNGKey(0), cfg)
    batch = _synthetic_batch(cfg)
    total, parts = detection_loss(params, cfg, batch, jax.random.PRNGKey(0))
    assert "roi1_cls" in parts and np.isfinite(float(total))


def test_detect_instances_contract(tiny):
    cfg, params = tiny
    images = _synthetic_batch(cfg, b=2)["image"]
    det = det_infer.detect_instances(
        params, cfg, images, max_detections=5, score_threshold=0.0,
        nms_threshold=0.95)
    assert det["boxes"].shape == (2, 5, 4)
    assert det["masks"].shape == (2, 5, cfg.mask_size, cfg.mask_size)
    inst = det_infer.to_instances(
        jax.tree.map(np.asarray, det), 0, 64, 64)
    for item in inst:
        assert set(item) == {"score", "bbox", "segmentation"}
        assert item["segmentation"].shape == (64, 64)
        x, y, w, h = item["bbox"]
        assert w >= 0 and h >= 0
    scores = [i["score"] for i in inst]
    assert scores == sorted(scores, reverse=True)
