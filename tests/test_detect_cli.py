"""End-to-end detector toolchain: COCO-json data loading, train/infer CLI,
and the make_crop stage (mhp_extension finetune_net.py +
make_crop_and_mask_w_mask_nms.py equivalents)."""

import json
import os

import numpy as np
import pytest

from imagdressing_tpu.detect.data import (
    CocoDetectionData,
    polygons_to_mask,
    rle_decode,
)
from imagdressing_tpu.tools.coco_annotations import (
    binary_mask_to_rle,
    create_annotation_info,
    create_image_info,
)
from imagdressing_tpu.tools.make_crop import bbox_expand, crop_image_instances


def test_rle_decode_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.uniform(size=(13, 9)) > 0.6).astype(np.uint8)
    rle = binary_mask_to_rle(mask)
    np.testing.assert_array_equal(rle_decode(rle), mask)


def test_polygons_to_mask_square():
    mask = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert mask[5, 5] == 1 and mask[0, 0] == 0
    assert mask.sum() >= 64


def _write_dataset(tmp_path, n=3, size=64):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    coco = {"images": [], "annotations": [], "categories": [
        {"id": 1, "name": "person"}]}
    aid = 1
    for i in range(n):
        name = f"img_{i}.png"
        img = np.full((size, size, 3), 30, np.uint8)
        x0, y0 = rng.integers(4, 20, 2)
        bw, bh = rng.integers(24, 32, 2)
        x1, y1 = min(x0 + bw, size - 2), min(y0 + bh, size - 2)
        img[y0:y1, x0:x1] = 220
        cv2.imwrite(str(img_dir / name), img)
        coco["images"].append(
            create_image_info(i + 1, name, (size, size)))
        mask = np.zeros((size, size), np.uint8)
        mask[y0:y1, x0:x1] = 1
        ann = create_annotation_info(aid, i + 1, {"id": 1, "is_crowd": 0},
                                     mask)
        assert ann is not None
        coco["annotations"].append(ann)
        aid += 1
    ann_path = tmp_path / "train.json"
    ann_path.write_text(json.dumps(coco))
    return str(ann_path), str(img_dir)


def test_coco_detection_data_shapes(tmp_path):
    ann, img_dir = _write_dataset(tmp_path)
    data = CocoDetectionData(ann, img_dir, max_gt=4, image_size=64)
    assert len(data) == 3
    ex = data.load_example(data.ids[0])
    assert ex["image"].shape == (64, 64, 3)
    assert ex["gt_boxes"].shape == (4, 4) and ex["gt_valid"].sum() == 1
    # the gt mask matches the bright region of the image
    box = ex["gt_boxes"][0]
    cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
    assert ex["gt_masks"][0, cy, cx] == 1.0
    assert ex["image"][cy, cx].mean() > 0.5
    batch = next(data.batches(2, rng=np.random.default_rng(0)))
    assert batch["image"].shape == (2, 64, 64, 3)


def test_letterbox_preserves_aspect(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.zeros((32, 128, 3), np.uint8)  # wide image
    img[8:24, 40:80] = 200
    cv2.imwrite(str(img_dir / "wide.png"), img)
    mask = np.zeros((32, 128), np.uint8)
    mask[8:24, 40:80] = 1
    coco = {"images": [create_image_info(1, "wide.png", (128, 32))],
            "annotations": [create_annotation_info(
                1, 1, {"id": 1, "is_crowd": 0}, mask)],
            "categories": [{"id": 1, "name": "person"}]}
    ann = tmp_path / "a.json"
    ann.write_text(json.dumps(coco))
    data = CocoDetectionData(str(ann), str(img_dir), max_gt=2, image_size=64)
    ex = data.load_example(1)
    assert ex["scale"] == 0.5
    # content occupies the top 16 rows; below is padding
    assert ex["image"][:16].max() > 0.5 and ex["image"][16:].max() == 0.0
    # box scaled uniformly: 40..80 -> 20..40, 8..24 -> 4..12
    np.testing.assert_allclose(ex["gt_boxes"][0], [20, 4, 40, 12])
    assert ex["gt_masks"][0, 6, 30] == 1.0 and ex["gt_masks"][0, 20, 30] == 0


def test_detect_cli_train_infer_make_crop(tmp_path):
    from imagdressing_tpu.apps.detect_cli import main
    from imagdressing_tpu.tools import make_crop

    ann, img_dir = _write_dataset(tmp_path)
    params_path = str(tmp_path / "det.npz")
    main(["train", "--annotations", ann, "--img_dir", img_dir,
          "--out", params_path, "--steps", "2", "--batch_size", "2",
          "--image_size", "64", "--tiny"])
    assert os.path.exists(params_path)

    inst_path = str(tmp_path / "instances.npy")
    main(["infer", "--annotations", ann, "--img_dir", img_dir,
          "--params", params_path, "--out", inst_path,
          "--image_size", "64", "--score_threshold", "0.0", "--tiny"])
    preds = np.load(inst_path, allow_pickle=True).item()
    assert set(preds) == {f"img_{i}.png" for i in range(3)}
    for inst_list in preds.values():
        for inst in inst_list:
            assert set(inst) == {"score", "bbox", "segmentation"}
            assert inst["segmentation"].shape == (64, 64)

    out = make_crop.run(img_dir, str(tmp_path / "crops"), inst_path,
                        conf_thres=0.0)
    crop = json.load(open(out))
    assert len(crop["root"]) == 3
    item = crop["root"][0]
    assert set(item) >= {"im_name", "person_num", "person_bbox",
                         "real_person_bbox", "person_bbox_score",
                         "bbox_name", "mask_name"}


def test_bbox_expand_reference_semantics():
    # interior box: symmetric expansion, rounded
    assert bbox_expand(100, 100, [10, 10, 30, 30], 1.2) == (8, 8, 32, 32)
    # clamped at borders
    assert bbox_expand(100, 100, [0, 0, 30, 30], 2.0) == (0, 0, 45, 45)
    # np.round half-to-even on 10.5, as in the reference
    assert bbox_expand(40, 40, [20, 20, 39, 39], 2.0) == (10, 10, 39, 39)


def test_crop_image_instances_mask_nms_and_json():
    img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    m1 = np.zeros((64, 64), np.uint8); m1[8:40, 8:40] = 1
    m2 = np.zeros((64, 64), np.uint8); m2[10:42, 10:42] = 1  # mostly overlap
    m3 = np.zeros((64, 64), np.uint8); m3[48:60, 48:60] = 1
    insts = [
        {"score": 0.9, "bbox": [8, 8, 32, 32], "segmentation": m1},
        {"score": 0.8, "bbox": [10, 10, 32, 32], "segmentation": m2},
        {"score": 0.7, "bbox": [48, 48, 12, 12], "segmentation": m3},
    ]
    item, crops, panoptic = crop_image_instances(
        img, insts, "a.png", overlap_threshold=0.5, conf_thres=0.5)
    # the 0.8 instance is >50% covered by the 0.9 one -> suppressed
    assert item["person_num"] == 2
    assert item["person_bbox_score"] == [0.9, 0.7]
    assert item["bbox_name"] == ["a_1_msrcnn.jpg", "a_2_msrcnn.jpg"]
    assert panoptic.max() == 2 and panoptic[20, 20] == 1
    assert panoptic[50, 50] == 2
    # expanded crop bounds recorded and crop matches them
    (name, crop0) = crops[0]
    ex0 = item["person_bbox"][0]
    assert crop0.shape[:2] == (ex0[3] - ex0[1] + 1, ex0[2] - ex0[0] + 1)
