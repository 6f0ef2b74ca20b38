"""CAMI-S grid driver: synthetic 1-prompt x 1-pose x 2-face x 2-cloth grid
with injected scorers; the aggregate must equal the hand-computed mean
(reference grid semantics, metric/eval_s.py:145-181)."""

import numpy as np
import pytest

from imagdressing_tpu.eval.cami import cami_u, pose_overlap
from imagdressing_tpu.eval.grid import cami_s_grid


@pytest.fixture
def grid_dirs(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    d = {}
    for name in ("pose", "face", "cloth", "generated", "cloth_mask"):
        (tmp_path / name).mkdir()
        d[name] = str(tmp_path / name)

    # one reference pose render: vertical bar
    pose1 = np.zeros((64, 48, 3), np.uint8)
    pose1[8:56, 20:28] = 255
    cv2.imwrite(f"{d['pose']}/p0.png", pose1)

    for k in range(2):
        cv2.imwrite(
            f"{d['face']}/face_{k}.png",
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
        )
    for cloth in ("a.jpg", "b.jpg"):
        cv2.imwrite(
            f"{d['cloth']}/{cloth}",
            rng.integers(0, 255, (64, 48, 3), dtype=np.uint8),
        )
        for k in range(2):
            name = f"pt_0_pose_0_face_{k}_{cloth}"
            cv2.imwrite(
                f"{d['generated']}/{name}",
                rng.integers(0, 255, (64, 48, 3), dtype=np.uint8),
            )
            cv2.imwrite(
                f"{d['cloth_mask']}/{name}",
                rng.integers(0, 255, (64, 48, 3), dtype=np.uint8),
            )
    return d, pose1


def test_grid_matches_hand_computed(grid_dirs):
    import cv2

    d, pose1 = grid_dirs

    # injected scorers: deterministic, verifiable
    def clip_fn(text, img01):
        return 0.25

    def face_embed_fn(path):
        # unit vector keyed by the file's basename (dir-join agnostic)
        import os

        rng = np.random.default_rng(sum(os.path.basename(path).encode()))
        v = rng.standard_normal(16)
        return v / np.linalg.norm(v)

    half_pose = np.zeros((64, 48, 3), np.uint8)
    half_pose[8:32, 20:28] = 255  # overlaps the top half of pose1

    def pose_render_fn(img_rgb, h, w):
        assert (h, w) == (64, 48)
        return half_pose

    out = cami_s_grid(
        ["a prompt"], d["pose"], d["face"], d["cloth"],
        d["generated"], d["cloth_mask"],
        clip_fn=clip_fn, face_embed_fn=face_embed_fn,
        pose_render_fn=pose_render_fn,
    )
    assert out["num_cells"] == 4 and out["num_missing"] == 0

    expect_pose = pose_overlap(pose1, half_pose)
    np.testing.assert_allclose(expect_pose, 0.5, atol=1e-6)

    expected = []
    for cell in out["cells"]:
        ref = cv2.imread(f"{d['cloth']}/{cell['cloth']}")
        gen = cv2.imread(f"{d['cloth_mask']}/{cell['generated']}")
        us = cami_u(ref, gen)
        f1 = face_embed_fn(f"{d['face']}/face_{cell['face']}.png")
        f2 = face_embed_fn(f"{d['generated']}/{cell['generated']}")
        expected.append(us + expect_pose + float(f1 @ f2) + 0.25)
    np.testing.assert_allclose(
        out["cami_s_score"], np.mean(expected), atol=1e-6
    )


def test_grid_missing_cells_score_zero(grid_dirs):
    import os

    d, _ = grid_dirs
    os.remove(f"{d['generated']}/pt_0_pose_0_face_1_b.jpg")
    out = cami_s_grid(
        ["a prompt"], d["pose"], d["face"], d["cloth"],
        d["generated"], d["cloth_mask"],
        clip_fn=lambda t, i: 0.0,
        face_embed_fn=lambda p: np.ones(4) / 2.0,
        pose_render_fn=lambda img, h, w: np.zeros((h, w, 3), np.uint8),
    )
    assert out["num_missing"] == 1
    missing = [c for c in out["cells"] if c.get("missing")]
    assert missing[0]["generated"] == "pt_0_pose_0_face_1_b.jpg"
    assert missing[0]["score"] == 0.0
