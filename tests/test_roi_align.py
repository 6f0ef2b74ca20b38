"""ROIAlign golden tests — the detectron2 pattern of exact small-tensor
expectations (their tests/layers/test_roi_align.py:12-46) plus a torchvision
cross-check when available."""

import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.ops.roi_align import roi_align


def test_identity_box_aligned():
    """A box covering exactly one cell grid with output_size == box size and
    sampling at cell centers must reproduce the input (aligned variant)."""
    x = jnp.arange(25.0).reshape(1, 5, 5, 1)
    # box [0,0,5,5] at scale 1, output 5x5, 1 sample per bin, aligned:
    # sample points land at pixel centers 0.0..4.0 after the -0.5 shift
    boxes = jnp.asarray([[0, 0.0, 0.0, 5.0, 5.0]], jnp.float32)
    out = roi_align(x, boxes, output_size=5, sampling_ratio=1, aligned=True)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]), np.arange(25.0).reshape(1, 5, 5), atol=1e-5
    )


def test_half_scale_average():
    """2x2 average pooling via roi_align with sampling_ratio=2."""
    x = jnp.asarray(
        np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    )
    boxes = jnp.asarray([[0, 0.0, 0.0, 4.0, 4.0]], jnp.float32)
    out = roi_align(x, boxes, output_size=2, sampling_ratio=2, aligned=True)
    want = np.asarray([[[2.5, 4.5], [10.5, 12.5]]])
    np.testing.assert_allclose(np.asarray(out[..., 0]), want, atol=1e-4)


def test_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    import torch

    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    boxes = np.asarray(
        [
            [0, 1.0, 1.5, 7.0, 6.0],
            [1, 0.0, 0.0, 9.5, 7.5],
            [0, 2.3, 3.1, 5.9, 7.2],
        ],
        np.float32,
    )
    for aligned in (True, False):
        want = torchvision.ops.roi_align(
            torch.from_numpy(feat.transpose(0, 3, 1, 2)),
            torch.from_numpy(boxes),
            output_size=4,
            spatial_scale=0.5,
            sampling_ratio=2,
            aligned=aligned,
        ).numpy().transpose(0, 2, 3, 1)
        got = roi_align(
            jnp.asarray(feat), jnp.asarray(boxes), output_size=4,
            spatial_scale=0.5, sampling_ratio=2, aligned=aligned,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_gradients_flow():
    import jax

    x = jnp.ones((1, 6, 6, 2))
    boxes = jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]], jnp.float32)

    def f(feat):
        return jnp.sum(roi_align(feat, boxes, output_size=2))

    g = jax.grad(f)(x)
    assert np.asarray(g).sum() > 0  # gradient reaches the sampled region


# ---------------------------------------------------------------------------
# ROIAlignRotated (detectron2 csrc/ROIAlignRotated equivalent)
# ---------------------------------------------------------------------------

from imagdressing_tpu.ops.roi_align import roi_align_rotated  # noqa: E402


def test_rotated_zero_angle_matches_axis_aligned():
    """angle=0 must reproduce roi_align exactly on the equivalent box."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 14, 3)).astype(np.float32))
    # centers well inside, arbitrary sizes
    rois = jnp.asarray(
        [[0, 6.0, 5.0, 8.0, 6.0, 0.0], [1, 7.5, 6.5, 5.0, 9.0, 0.0]],
        jnp.float32,
    )
    boxes = jnp.asarray(
        [
            [0, 6.0 - 4.0, 5.0 - 3.0, 6.0 + 4.0, 5.0 + 3.0],
            [1, 7.5 - 2.5, 6.5 - 4.5, 7.5 + 2.5, 6.5 + 4.5],
        ],
        jnp.float32,
    )
    out_r = roi_align_rotated(x, rois, output_size=4, sampling_ratio=2)
    out_a = roi_align(x, boxes, output_size=4, sampling_ratio=2, aligned=True)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_a), atol=1e-5)


def test_rotated_90deg_index_mapping():
    """A 90° CCW box samples what the axis-aligned box with swapped w/h
    covers, with out_rot[ph, pw] == out_axis[P-1-pw, ph]."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    cx, cy, w, h = 8.0, 8.0, 6.0, 4.0
    p = 4
    rois = jnp.asarray([[0, cx, cy, w, h, 90.0]], jnp.float32)
    boxes = jnp.asarray(
        [[0, cx - h / 2, cy - w / 2, cx + h / 2, cy + w / 2]], jnp.float32
    )
    out_r = np.asarray(roi_align_rotated(x, rois, output_size=p,
                                         sampling_ratio=2))[0]
    out_a = np.asarray(roi_align(x, boxes, output_size=p, sampling_ratio=2,
                                 aligned=True))[0]
    for ph in range(p):
        for pw in range(p):
            np.testing.assert_allclose(
                out_r[ph, pw], out_a[p - 1 - pw, ph], atol=1e-5
            )


def test_rotated_arbitrary_angle_vs_numpy_reference():
    """Independent numpy re-derivation of the sample lattice at 30°."""
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((20, 20, 1)).astype(np.float32)
    cx, cy, w, h, ang = 10.0, 9.0, 7.0, 5.0, 30.0
    p, sr = 3, 2
    out = np.asarray(
        roi_align_rotated(
            jnp.asarray(feat[None]),
            jnp.asarray([[0, cx, cy, w, h, ang]], jnp.float32),
            output_size=p, sampling_ratio=sr,
        )
    )[0, ..., 0]

    theta = np.deg2rad(ang)
    ct, st = np.cos(theta), np.sin(theta)
    ccx, ccy = cx - 0.5, cy - 0.5
    want = np.zeros((p, p))
    for ph in range(p):
        for pw in range(p):
            acc = 0.0
            for iy in range(sr):
                for ix in range(sr):
                    yy = -h / 2 + (ph + (iy + 0.5) / sr) * h / p
                    xx = -w / 2 + (pw + (ix + 0.5) / sr) * w / p
                    y = yy * ct - xx * st + ccy
                    x = yy * st + xx * ct + ccx
                    y0, x0 = int(np.floor(y)), int(np.floor(x))
                    wy, wx = y - y0, x - x0
                    acc += (
                        feat[y0, x0, 0] * (1 - wy) * (1 - wx)
                        + feat[y0, x0 + 1, 0] * (1 - wy) * wx
                        + feat[y0 + 1, x0, 0] * wy * (1 - wx)
                        + feat[y0 + 1, x0 + 1, 0] * wy * wx
                    )
            want[ph, pw] = acc / (sr * sr)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_rotated_gradients_flow():
    import jax

    x = jnp.ones((1, 8, 8, 1))
    rois = jnp.asarray([[0, 4.0, 4.0, 4.0, 3.0, 20.0]], jnp.float32)

    def f(feat):
        return roi_align_rotated(feat, rois, output_size=2).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
