"""Detector AP evaluator + mesh-sharded detector training step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagdressing_tpu.detect.eval import average_precision, coco_map


def _det(score, x, y, w, h):
    return {"score": score, "bbox": [x, y, w, h]}


def test_ap_perfect_detection():
    gt = {"a": np.array([[10, 10, 30, 30]], np.float32)}
    dets = {"a": [_det(0.9, 10, 10, 20, 20)]}
    assert average_precision(dets, gt) == 1.0


def test_ap_half_recall():
    gt = {"a": np.array([[10, 10, 30, 30], [50, 50, 70, 70]], np.float32)}
    dets = {"a": [_det(0.9, 10, 10, 20, 20)]}
    np.testing.assert_allclose(average_precision(dets, gt), 0.5)


def test_ap_duplicate_is_fp():
    gt = {"a": np.array([[10, 10, 30, 30]], np.float32)}
    dets = {"a": [_det(0.9, 10, 10, 20, 20), _det(0.8, 11, 11, 20, 20)]}
    # duplicate comes after full recall -> AP stays 1
    np.testing.assert_allclose(average_precision(dets, gt), 1.0)
    # but reversed scores: the duplicate (ranked first) is the TP, the
    # second becomes FP only if it can't match -> same AP by symmetry
    dets2 = {"a": [_det(0.9, 11, 11, 20, 20), _det(0.8, 10, 10, 20, 20)]}
    np.testing.assert_allclose(average_precision(dets2, gt), 1.0)


def test_ap_iou_threshold():
    gt = {"a": np.array([[0, 0, 100, 100]], np.float32)}
    # IoU = 60/100 wrt gt: counts at 0.5, not at 0.75
    dets = {"a": [_det(0.9, 0, 0, 100, 60)]}
    assert average_precision(dets, gt, iou_threshold=0.5) == 1.0
    assert average_precision(dets, gt, iou_threshold=0.75) == 0.0
    m = coco_map(dets, gt)
    assert m["AP50"] == 1.0 and m["AP75"] == 0.0 and 0 < m["mAP"] < 1


def test_ap_missing_image_and_empty():
    gt = {"a": np.array([[0, 0, 10, 10]], np.float32)}
    assert average_precision({}, gt) == 0.0
    assert coco_map({}, {})["mAP"] == 0.0


def test_sharded_detector_step_matches_replicated():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib
    from imagdressing_tpu.detect import maskrcnn
    from imagdressing_tpu.detect.train import make_train_step

    cfg = maskrcnn.tiny_config()
    params = maskrcnn.init(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    step = jax.jit(make_train_step(cfg, tx))

    rng = np.random.default_rng(0)
    size = 64
    b = 2
    images = np.full((b, size, size, 3), 0.1, np.float32)
    gt_boxes = np.zeros((b, cfg.max_gt, 4), np.float32)
    gt_valid = np.zeros((b, cfg.max_gt), bool)
    gt_masks = np.zeros((b, cfg.max_gt, size, size), np.float32)
    for i in range(b):
        x0, y0 = rng.integers(4, 20, 2)
        images[i, y0:y0 + 30, x0:x0 + 30] = 0.9
        gt_boxes[i, 0] = [x0, y0, x0 + 30, y0 + 30]
        gt_valid[i, 0] = True
        gt_masks[i, 0, y0:y0 + 30, x0:x0 + 30] = 1.0
    batch = {"image": jnp.asarray(images), "gt_boxes": jnp.asarray(gt_boxes),
             "gt_valid": jnp.asarray(gt_valid),
             "gt_masks": jnp.asarray(gt_masks)}
    key = jax.random.PRNGKey(7)

    p_rep, _, m_rep = step(params, tx.init(params), batch, key)

    mesh = mesh_lib.make_mesh(data=2, model=1,
                              devices=jax.devices("cpu")[:2])
    sbatch = jax.device_put(batch, NamedSharding(mesh, P(mesh_lib.DATA_AXIS)))
    p_sh, _, m_sh = step(params, tx.init(params), sbatch, key)

    np.testing.assert_allclose(float(m_rep["total"]), float(m_sh["total"]),
                               rtol=2e-4)
    a = jax.tree.leaves(p_rep)[0]
    b_ = jax.tree.leaves(p_sh)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
