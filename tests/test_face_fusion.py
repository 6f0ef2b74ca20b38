"""Face-fusion post-process (native replacement for the reference's
modelscope image_face_fusion call, /root/reference/app.py:244-252)."""

import numpy as np
import pytest

from imagdressing_tpu.postprocess.face_fusion import (
    FaceFusion,
    color_transfer,
    fuse_face,
    hull_mask,
    make_post_process,
    pyramid_blend,
    umeyama,
)


def _square_landmarks(cx, cy, r):
    return np.array(
        [[cx - r, cy - r], [cx + r, cy - r], [cx + r, cy + r],
         [cx - r, cy + r], [cx, cy - r // 2]], np.float32
    )


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((12, 2)) * 10
    theta, scale, t = 0.3, 1.7, np.array([5.0, -2.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + t
    m = umeyama(src, dst)
    mapped = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(mapped, dst, atol=1e-4)


def test_umeyama_degenerate_points():
    pts = np.zeros((4, 2), np.float32)
    m = umeyama(pts, pts + 3.0)
    assert np.isfinite(m).all()


def test_hull_mask_feathered():
    lm = _square_landmarks(64, 64, 24)
    mask = hull_mask((128, 128, 3), lm)
    assert mask.shape == (128, 128)
    assert mask[64, 64] > 0.9          # solid inside
    assert mask[4, 4] == 0.0           # zero far outside
    assert 0.0 <= mask.min() and mask.max() <= 1.0
    # feather: values strictly between 0 and 1 exist near the boundary
    assert ((mask > 0.05) & (mask < 0.95)).sum() > 50


def test_color_transfer_matches_stats():
    rng = np.random.default_rng(1)
    src = rng.uniform(0.0, 0.3, (64, 64, 3)).astype(np.float32)
    ref = rng.uniform(0.5, 1.0, (64, 64, 3)).astype(np.float32)
    mask = np.ones((64, 64), np.float32)
    out = color_transfer(src, ref, mask)
    np.testing.assert_allclose(out.mean((0, 1)), ref.mean((0, 1)), atol=1e-3)
    np.testing.assert_allclose(out.std((0, 1)), ref.std((0, 1)), atol=1e-3)


def test_pyramid_blend_extremes():
    rng = np.random.default_rng(2)
    fg = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    bg = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        pyramid_blend(fg, bg, np.ones((64, 64), np.float32)), fg, atol=1e-5)
    np.testing.assert_allclose(
        pyramid_blend(fg, bg, np.zeros((64, 64), np.float32)), bg, atol=1e-5)


def test_fuse_face_identity():
    rng = np.random.default_rng(3)
    tpl = rng.uniform(size=(128, 128, 3)).astype(np.float32)
    lm = _square_landmarks(64, 64, 24)
    out = fuse_face(tpl, tpl, lm, lm, color_match=False)
    np.testing.assert_allclose(out, tpl, atol=1e-4)


def test_fuse_face_center_from_user_edges_from_template():
    tpl = np.full((128, 128, 3), 0.2, np.float32)
    usr = np.full((96, 96, 3), 0.9, np.float32)
    lm_t = _square_landmarks(64, 64, 24)
    lm_u = _square_landmarks(48, 48, 18)  # different scale/position
    out = fuse_face(tpl, usr, lm_t, lm_u, color_match=False)
    assert abs(out[64, 64].mean() - 0.9) < 0.05   # user face at the center
    assert abs(out[4, 4].mean() - 0.2) < 0.01     # template at the border
    # seam is smooth: no value outside [0.2, 0.9]+eps
    assert out.min() >= 0.2 - 1e-3 and out.max() <= 0.9 + 1e-3


def test_fuse_face_color_match_pulls_toward_template():
    tpl = np.full((128, 128, 3), 0.2, np.float32)
    tpl += np.random.default_rng(4).normal(0, 0.01, tpl.shape).astype(
        np.float32)
    usr = np.full((96, 96, 3), 0.9, np.float32)
    usr += np.random.default_rng(5).normal(0, 0.01, usr.shape).astype(
        np.float32)
    lm_t = _square_landmarks(64, 64, 24)
    lm_u = _square_landmarks(48, 48, 18)
    out = fuse_face(tpl, usr, lm_t, lm_u, color_match=True)
    assert abs(out[64, 64].mean() - 0.2) < 0.1  # re-lit to template stats


def test_fuse_face_uint8_roundtrip():
    tpl = np.full((64, 64, 3), 50, np.uint8)
    usr = np.full((64, 64, 3), 220, np.uint8)
    lm = _square_landmarks(32, 32, 12)
    out = fuse_face(tpl, usr, lm, lm, color_match=False)
    assert out.dtype == np.uint8
    assert abs(int(out[32, 32].mean()) - 220) <= 8
    assert (out[2, 2] == 50).all()


def test_face_fusion_graceful_without_landmarks():
    fusion = FaceFusion(lambda img: None)
    tpl = np.random.default_rng(6).uniform(size=(32, 32, 3)).astype(
        np.float32)
    out = fusion(tpl, tpl.copy())
    np.testing.assert_array_equal(out, tpl)


def test_face_fusion_drops_missing_sentinel_rows():
    lm = np.concatenate(
        [_square_landmarks(16, 16, 6), np.zeros((2, 2), np.float32)])
    calls = []

    def landmark_fn(img):
        calls.append(img.dtype)
        return lm

    fusion = FaceFusion(landmark_fn, color_match=False)
    tpl = np.full((32, 32, 3), 0.3, np.float32)
    out = fusion(tpl, np.full((32, 32, 3), 0.8, np.float32))
    assert all(d == np.uint8 for d in calls)  # landmark nets get uint8
    assert abs(out[16, 16].mean() - 0.8) < 0.1


def test_make_post_process_passthrough_and_fuse():
    lm = _square_landmarks(16, 16, 6)
    post = make_post_process(lambda img: lm, color_match=False)
    img = np.full((32, 32, 3), 0.3, np.float32)
    np.testing.assert_array_equal(post(img, {}), img)  # no face key
    face = np.full((32, 32, 3), 0.8, np.float32)
    fused = post(img, {"fusion_face": face})
    assert abs(fused[16, 16].mean() - 0.8) < 0.1
    assert abs(fused[2, 2].mean() - 0.3) < 0.01


def test_make_post_process_base64_face():
    import base64
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    lm = _square_landmarks(16, 16, 6)
    post = make_post_process(lambda img: lm, color_match=False)
    buf = io.BytesIO()
    Image.fromarray(np.full((32, 32, 3), 200, np.uint8)).save(
        buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    img = np.full((32, 32, 3), 0.3, np.float32)
    fused = post(img, {"fusion_face": b64})
    assert abs(fused[16, 16].mean() - 200 / 255) < 0.1
