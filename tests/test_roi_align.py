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
