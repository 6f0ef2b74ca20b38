"""COCO annotation creator tests: RLE/bbox golden values, polygon
rasterization round-trip, end-to-end CLI over a tiny synthetic dataset
(reference: mhp_extension/coco_style_annotation_creator/*)."""

import json

import numpy as np

from imagdressing_tpu.tools.coco_annotations import (
    binary_mask_to_polygon,
    binary_mask_to_rle,
    create_annotation_info,
    images_only_coco,
    main as coco_main,
    make_id_list,
    mask_area,
    mask_bbox,
)


def test_rle_golden():
    m = np.array([[0, 1, 1], [0, 1, 0]], np.uint8)
    # column-major (F) raveled: [0,0, 1,1, 1,0] -> runs 2x0, 3x1, 1x0
    rle = binary_mask_to_rle(m)
    assert rle == {"counts": [2, 3, 1], "size": [2, 3]}
    # leading 1 run gets a 0 prefix (pycocotools convention)
    rle2 = binary_mask_to_rle(np.array([[1, 0]], np.uint8))
    assert rle2["counts"] == [0, 1, 1]


def test_area_bbox():
    m = np.zeros((10, 12), np.uint8)
    m[2:5, 3:9] = 1
    assert mask_area(m) == 18
    assert mask_bbox(m) == [3.0, 2.0, 6.0, 3.0]


def test_polygon_roundtrip_iou():
    import cv2

    rng = np.random.default_rng(0)
    m = np.zeros((64, 64), np.uint8)
    cv2.circle(m, (30, 24), 14, 1, -1)
    cv2.rectangle(m, (4, 46), (24, 60), 1, -1)
    polys = binary_mask_to_polygon(m, tolerance=2)
    assert len(polys) >= 2
    recon = np.zeros_like(m)
    for p in polys:
        pts = np.asarray(p, np.int32).reshape(-1, 2)
        cv2.fillPoly(recon, [pts], 1)
    inter = np.logical_and(m, recon).sum()
    union = np.logical_or(m, recon).sum()
    assert inter / union > 0.9


def test_annotation_info_schema_and_crowd_rle():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = 1
    info = create_annotation_info(7, 3, {"id": 1, "is_crowd": 0}, m)
    assert info["id"] == 7 and info["image_id"] == 3
    assert info["iscrowd"] == 0 and info["area"] == 16
    assert isinstance(info["segmentation"], list)
    crowd = create_annotation_info(8, 3, {"id": 1, "is_crowd": 1}, m)
    assert crowd["iscrowd"] == 1 and "counts" in crowd["segmentation"]
    empty = create_annotation_info(9, 3, {"id": 1, "is_crowd": 0},
                                   np.zeros((8, 8), np.uint8))
    assert empty is None


def _make_dataset(root, n_imgs=2):
    from PIL import Image

    img_dir = root / "Images"
    ann_dir = root / "Human_ids"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n_imgs):
        Image.fromarray(
            rng.integers(0, 255, (40, 32, 3), dtype=np.uint8)
        ).save(img_dir / f"im_{i}.jpg")
        mask = np.zeros((40, 32), np.uint8)
        mask[4:18, 4:14] = 1  # person 1
        mask[22:38, 10:28] = 3  # person with a SPARSE id (ref would mislabel)
        Image.fromarray(mask).save(ann_dir / f"im_{i}.png")
    return img_dir, ann_dir


def test_cli_train_and_val_jsons(tmp_path):
    img_dir, ann_dir = _make_dataset(tmp_path)
    out = tmp_path / "out"
    coco_main([
        "train", "--dataset", "TINY",
        "--json_save_dir", str(out),
        "--train_img_dir", str(img_dir), "--train_anno_dir", str(ann_dir),
        "--val_img_dir", str(img_dir), "--val_anno_dir", str(ann_dir),
    ])
    train = json.loads((out / "TINY_train.json").read_text())
    val = json.loads((out / "TINY_val.json").read_text())
    for coco in (train, val):
        assert len(coco["images"]) == 2
        # 2 instances per image despite the sparse id 3
        assert len(coco["annotations"]) == 4
        assert coco["categories"][0]["name"] == "person"
        for ann in coco["annotations"]:
            assert ann["area"] > 0 and len(ann["segmentation"]) >= 1
    # trainval mode
    coco_main([
        "train", "--dataset", "TINY", "--use_val",
        "--json_save_dir", str(out),
        "--train_img_dir", str(img_dir), "--train_anno_dir", str(ann_dir),
        "--val_img_dir", str(img_dir), "--val_anno_dir", str(ann_dir),
    ])
    tv = json.loads((out / "TINY_trainval.json").read_text())
    assert len(tv["images"]) == 4 and len(tv["annotations"]) == 8
    # ids unique across the concatenated splits
    assert len({im["id"] for im in tv["images"]}) == 4
    assert len({a["id"] for a in tv["annotations"]}) == 8


def test_images_only_and_idlist(tmp_path):
    img_dir, _ = _make_dataset(tmp_path)
    coco = images_only_coco("TINY", str(img_dir))
    assert len(coco["images"]) == 2 and coco["annotations"] == []
    assert coco["images"][0]["width"] == 32
    ids = make_id_list(str(img_dir), str(tmp_path / "id.txt"))
    assert ids == ["im_0", "im_1"]
    assert (tmp_path / "id.txt").read_text() == "im_0\nim_1\n"
