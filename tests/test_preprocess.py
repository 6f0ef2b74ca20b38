"""Preprocessing: mask algebra, pose drawing/assembly, SCHP + CPM structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.preprocess.mask import (
    get_mask_location,
    make_inpaint_condition,
)
from imagdressing_tpu.preprocess.openpose import draw, infer
from imagdressing_tpu.preprocess.openpose import model as cpm
from imagdressing_tpu.preprocess.parsing import model as schp


def _synthetic_parse(h=512, w=384):
    parse = np.zeros((h, w), np.uint8)
    parse[40:120, 150:240] = 11  # head
    parse[120:300, 120:260] = 4  # upper clothes
    parse[300:480, 140:240] = 6  # pants
    parse[120:300, 90:120] = 14  # left arm
    parse[120:300, 260:290] = 15  # right arm
    parse[110:125, 160:230] = 18  # neck
    return parse


def _synthetic_keypoints():
    kps = np.zeros((18, 2))
    kps[1] = [190, 120]  # neck
    kps[2] = [250, 130]  # r shoulder
    kps[3] = [270, 210]  # r elbow
    kps[4] = [280, 290]  # r wrist
    kps[5] = [130, 130]  # l shoulder
    kps[6] = [110, 210]
    kps[7] = [100, 290]
    return {"pose_keypoints_2d": kps.tolist()}


def test_get_mask_location_upper_body():
    mask, mask_gray = get_mask_location(
        "hd", "upper_body", _synthetic_parse(), _synthetic_keypoints()
    )
    assert mask.shape == (512, 384) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    assert set(np.unique(mask_gray)) <= {0, 127}
    # garment area must be masked for inpainting
    assert mask[200, 190] == 255
    # head must be preserved
    assert mask[60, 190] == 0
    # legs/pants (fixed lower cloth for upper_body) preserved
    assert mask[400, 190] == 0


def test_get_mask_location_categories():
    parse, kps = _synthetic_parse(), _synthetic_keypoints()
    for cat in ("dresses", "lower_body"):
        mask, _ = get_mask_location("hd", cat, parse, kps)
        assert mask.shape == (512, 384)
    with pytest.raises(ValueError):
        get_mask_location("bad", "upper_body", parse, kps)


def test_make_inpaint_condition():
    person = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[10:20, 10:20] = 1.0
    cond = make_inpaint_condition(person, mask)
    assert cond.shape == (1, 64, 64, 3)
    assert (cond[0, 10:20, 10:20] == -1.0).all()
    assert (cond[0, 0, 0] == person[0, 0]).all()


def test_draw_bodypose():
    kps = np.asarray(_synthetic_keypoints()["pose_keypoints_2d"])
    img = draw.draw_bodypose(kps, 512, 384, src_size=(384, 512))
    assert img.shape == (512, 384, 3) and img.dtype == np.uint8
    assert img.sum() > 0  # something was drawn
    # missing joints ([0,0]) draw nothing in their area
    assert img[500, 10].sum() == 0


def test_cpm_forward_shapes():
    params = cpm.init(jax.random.PRNGKey(0))
    paf, heat = cpm.apply(params, jnp.zeros((1, 64, 48, 3)))
    assert paf.shape == (1, 8, 6, 38)
    assert heat.shape == (1, 8, 6, 19)


def test_openpose_assembly_synthetic():
    """Synthetic heatmap/PAF: two joints connected by a clean PAF limb must
    assemble... (smoke-level: peaks found, pipeline runs)."""
    h, w = 64, 48
    heat = np.zeros((h, w, 19), np.float64)
    paf = np.zeros((h, w, 38), np.float64)
    # gaussian blobs (a delta would be flattened below thre1 by the sigma-3
    # NMS smoothing): neck (part 2 -> idx 1) and r-shoulder (part 3 -> idx 2)
    yy, xx = np.mgrid[0:h, 0:w]
    heat[:, :, 1] = np.exp(-((yy - 16) ** 2 + (xx - 24) ** 2) / (2 * 4.0**2))
    heat[:, :, 2] = np.exp(-((yy - 40) ** 2 + (xx - 24) ** 2) / (2 * 4.0**2))
    paf[16:41, 20:29, 31 - 19] = 0.0  # x-component
    paf[16:41, 20:29, 32 - 19] = 1.0  # y-component (downward)
    peaks = infer._find_peaks(heat, 0.1)
    assert len(peaks[1]) == 1 and len(peaks[2]) == 1
    candidate, persons = infer._assemble(peaks, paf, h, 0.05)
    # only one limb -> not enough parts for a person (needs >= 4), but the
    # connection machinery must have run without error
    assert candidate.shape[1] == 4


def test_parsing_host_pipeline_with_stub_cnn(monkeypatch):
    """Exercise the full Parsing host path (affine warp, inverse transform,
    hole filling, neck merge) with a stubbed CNN — the real SCHP forward is
    covered by test_schp_forward_shapes without the 512^2 compile cost."""
    import imagdressing_tpu.preprocess.parsing.infer as pinf

    def fake_forward(params, image, num_classes, size):
        rng = np.random.default_rng(num_classes)
        logits = rng.standard_normal((1, size, size, num_classes)) * 0.1
        # strong upper-cloth region + head region + arm stripe (ATR ids)
        if num_classes == 18:
            logits[:, size // 4 : size // 2, size // 4 : 3 * size // 4, 4] = 5.0
            logits[:, : size // 8, size // 3 : 2 * size // 3, 11] = 5.0
            logits[:, size // 4 : size // 2, size // 5 : size // 4, 14] = 5.0
        else:  # LIP: no face label anywhere -> ATR 11 becomes neck 18
            logits[:, :, :, 0] = 1.0
        return jnp.asarray(logits)

    monkeypatch.setattr(pinf, "_forward", fake_forward)
    p = pinf.Parsing(atr_params=None, lip_params=None)
    img = np.random.default_rng(0).integers(0, 255, (200, 150, 3),
                                            dtype=np.uint8)
    parse, face = p(img)
    assert parse.shape == (200, 150) and parse.dtype == np.uint8
    labels = set(np.unique(parse))
    assert 4 in labels  # upper cloth survived the warp round-trip
    assert 18 in labels  # neck synthesized from ATR-head & no-LIP-face
    assert 11 not in labels  # all head pixels became neck (no LIP face)
    assert face.shape == (200, 150)


def test_schp_forward_shapes():
    params = schp.init(jax.random.PRNGKey(0), num_classes=18)
    fusion, edge = schp.apply(params, jnp.zeros((1, 64, 64, 3)), 18)
    # stride 4 outputs
    assert fusion.shape == (1, 16, 16, 18)
    assert edge.shape == (1, 16, 16, 2)


def test_hand_model_and_boxes():
    from imagdressing_tpu.preprocess.openpose import hand

    params = hand.init(jax.random.PRNGKey(0))
    heat = hand.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert heat.shape == (1, 8, 8, 22)

    kps = np.asarray(_synthetic_keypoints()["pose_keypoints_2d"])
    boxes = hand.detect_hand_boxes(kps, 512, 384)
    assert len(boxes) == 2  # both arms present in the fixture
    for x, y, w, is_left in boxes:
        assert w >= 20 and 0 <= x < 384 and 0 <= y < 512
    # wrist-extrapolated box centers sit past the wrists
    assert {b[3] for b in boxes} == {True, False}

    # missing wrist -> that hand is skipped
    kps2 = kps.copy()
    kps2[4] = 0.0
    assert len(hand.detect_hand_boxes(kps2, 512, 384)) == 1


def test_hand_inference_contract():
    from imagdressing_tpu.preprocess.openpose import hand

    h = hand.Hand(hand.init(jax.random.PRNGKey(1)))
    crop = np.random.default_rng(0).integers(0, 255, (60, 60, 3),
                                             dtype=np.uint8)
    peaks = h(crop, scales=(0.5,))
    assert peaks.shape == (21, 2)
    assert (peaks[:, 0] < 60).all() and (peaks[:, 1] < 60).all()


def test_face_model_and_inference():
    from imagdressing_tpu.preprocess.openpose import face

    params = face.init(jax.random.PRNGKey(2))
    heat = face.apply(params, jnp.zeros((1, 64, 64, 3)))
    assert heat.shape == (1, 8, 8, 71)

    f = face.Face(params, inference_size=64)
    crop = np.random.default_rng(1).integers(0, 255, (50, 40, 3),
                                             dtype=np.uint8)
    peaks = f(crop)
    assert peaks.shape == (70, 2)
    assert (peaks[:, 0] < 40).all() and (peaks[:, 1] < 50).all()
