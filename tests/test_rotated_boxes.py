"""Rotated IoU/NMS golden tests (hand-computed expectations, the detectron2
test pattern)."""

import numpy as np

from imagdressing_tpu.ops.rotated_boxes import (
    box_to_corners,
    nms_rotated,
    pairwise_iou_rotated,
)


def test_axis_aligned_iou():
    # two unit squares half-overlapping -> IoU = 1/3
    b1 = np.array([[0.5, 0.5, 1.0, 1.0, 0.0]])
    b2 = np.array([[1.0, 0.5, 1.0, 1.0, 0.0]])
    iou = pairwise_iou_rotated(b1, b2)
    np.testing.assert_allclose(iou, [[1.0 / 3.0]], atol=1e-6)


def test_identical_boxes():
    b = np.array([[3.0, 4.0, 2.0, 5.0, 30.0]])
    np.testing.assert_allclose(pairwise_iou_rotated(b, b), [[1.0]], atol=1e-6)


def test_rotated_45_squares():
    # unit square vs same square rotated 45°: intersection is a regular
    # octagon with area 2*(sqrt(2)-1) ≈ 0.8284; union = 2 - inter
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = np.array([[0.0, 0.0, 1.0, 1.0, 45.0]])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    np.testing.assert_allclose(pairwise_iou_rotated(b1, b2), [[want]], atol=1e-6)


def test_rotation_invariance():
    rng = np.random.default_rng(0)
    base = np.array([[0.0, 0.0, 2.0, 1.0, 0.0], [0.5, 0.2, 1.5, 1.2, 20.0]])
    iou0 = pairwise_iou_rotated(base[:1], base[1:])
    # rotate both boxes by the same global angle -> IoU unchanged
    for extra in (15.0, 90.0, 180.0):
        rot = base.copy()
        rot[:, 4] += extra
        theta = np.deg2rad(extra)
        c, s = np.cos(theta), np.sin(theta)
        xy = rot[:, :2].copy()
        rot[:, 0] = xy[:, 0] * c - xy[:, 1] * s
        rot[:, 1] = xy[:, 0] * s + xy[:, 1] * c
        iou = pairwise_iou_rotated(rot[:1], rot[1:])
        np.testing.assert_allclose(iou, iou0, atol=1e-6)


def test_disjoint():
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 10.0]])
    b2 = np.array([[5.0, 5.0, 1.0, 1.0, 75.0]])
    np.testing.assert_allclose(pairwise_iou_rotated(b1, b2), [[0.0]])


def test_corners():
    c = box_to_corners(np.array([[0.0, 0.0, 2.0, 4.0, 90.0]]))[0]
    # 90° rotation swaps extents: corners at (±2, ±1)
    assert np.allclose(sorted(np.abs(c[:, 0])), [2, 2, 2, 2], atol=1e-6)
    assert np.allclose(sorted(np.abs(c[:, 1])), [1, 1, 1, 1], atol=1e-6)


def test_nms_rotated():
    boxes = np.array(
        [
            [0.0, 0.0, 2.0, 2.0, 0.0],
            [0.1, 0.1, 2.0, 2.0, 5.0],  # heavy overlap with 0
            [5.0, 5.0, 2.0, 2.0, 30.0],  # separate
        ]
    )
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_rotated(boxes, scores, iou_threshold=0.5)
    np.testing.assert_array_equal(keep, [0, 2])
    # with threshold above their IoU, all survive
    keep_all = nms_rotated(boxes, scores, iou_threshold=0.95)
    np.testing.assert_array_equal(sorted(keep_all), [0, 1, 2])
