"""Dataset-fusion tool tests (mhp_extension logits_fusion parity)."""

import numpy as np

from imagdressing_tpu.tools.dataset_fusion import (
    fuse_global_local,
    mask_nms,
    stitch_patch_logits,
)


def test_mask_nms_claims_and_suppresses():
    h = w = 10
    masks = np.zeros((h, w, 3), np.uint8)
    masks[0:6, 0:6, 0] = 1  # big, high score
    masks[0:5, 0:5, 1] = 1  # mostly inside mask 0 -> suppressed
    masks[6:9, 6:9, 2] = 1  # disjoint -> kept
    panoptic, kept = mask_nms(masks, [0.9, 0.8, 0.7])
    assert kept == [0, 2]
    assert panoptic[2, 2] == 1
    assert panoptic[7, 7] == 2
    # low-confidence tail cut
    _, kept2 = mask_nms(masks, [0.9, 0.3, 0.2])
    assert kept2 == [0]


def test_mask_nms_partial_overlap_carved():
    masks = np.zeros((6, 6, 2), np.uint8)
    masks[:, :4, 0] = 1
    masks[:, 2:, 1] = 1  # 50% overlap < 0.7 threshold -> kept, carved
    panoptic, kept = mask_nms(masks, [0.9, 0.8])
    assert kept == [0, 1]
    assert panoptic[0, 1] == 1
    assert panoptic[0, 5] == 2
    assert panoptic[0, 3] == 1  # overlap pixels belong to the earlier mask


def test_stitch_and_fuse():
    C = 3
    g = np.zeros((8, 8, C), np.float32)
    g[..., 0] = 1.0  # global says background everywhere
    patch = np.zeros((4, 4, C), np.float32)
    patch[..., 2] = 5.0  # local crop strongly says class 2
    local = stitch_patch_logits([patch], [(2, 2, 4, 4)], 8, 8, C)
    panoptic = np.zeros((8, 8), np.int32)
    panoptic[2:6, 2:6] = 1
    category, instance = fuse_global_local(g, local, panoptic)
    assert category[4, 4] == 2  # local evidence wins inside the crop
    assert category[0, 0] == 0  # background outside
    assert instance[4, 4] == 1 and instance[0, 0] == 0


def test_stitch_resizes_mismatched_patch():
    patch = np.ones((2, 2, 1), np.float32)
    out = stitch_patch_logits([patch], [(0, 0, 4, 4)], 4, 4, 1)
    assert out.shape == (4, 4, 1)
    np.testing.assert_allclose(out[..., 0], 1.0, atol=1e-5)
