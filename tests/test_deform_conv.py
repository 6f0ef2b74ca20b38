"""Deformable conv: zero offsets must reduce to a standard convolution;
offsets shift sampling; modulation masks scale contributions."""

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.ops.deform_conv import deform_conv2d
from imagdressing_tpu.ops import nn


def test_zero_offset_equals_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    offsets = jnp.zeros((2, 8, 8, 18))
    got = deform_conv2d(x, offsets, w, bias, stride=1, padding=1)
    want = nn.conv2d({"kernel": w, "bias": bias}, x, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_integer_offset_shifts_sampling():
    # 1x1 kernel with offset (0, +1): output(p) = x(p_x + 1)
    x = jnp.asarray(
        np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    )
    w = jnp.ones((1, 1, 1, 1))
    offsets = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(1.0)  # dx = +1
    got = deform_conv2d(x, offsets, w, padding=0)
    want = np.zeros((1, 4, 4, 1), np.float32)
    want[0, :, :3, 0] = np.asarray(x)[0, :, 1:, 0]
    want[0, :, 3, 0] = 0.0  # out of bounds -> zero
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_fractional_offset_bilinear():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    w = jnp.ones((1, 1, 1, 1))
    offsets = jnp.zeros((1, 4, 4, 2)).at[..., 1].set(0.5)
    got = np.asarray(deform_conv2d(x, offsets, w, padding=0))
    # interior: average of x[p] and x[p+1]
    np.testing.assert_allclose(got[0, 0, 0, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(got[0, 1, 1, 0], 5.5, atol=1e-5)


def test_modulation_mask():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 4)).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    full = deform_conv2d(x, offsets, w, padding=1)
    scaled = deform_conv2d(x, offsets, w, mask=half, padding=1)
    np.testing.assert_allclose(np.asarray(scaled), np.asarray(full) * 0.5,
                               atol=1e-4)


def test_gradients_flow():
    x = jnp.ones((1, 4, 4, 2))
    w = jnp.ones((3, 3, 2, 2)) * 0.1
    offsets = jnp.full((1, 4, 4, 18), 0.3)

    def f(o):
        return jnp.sum(deform_conv2d(x, o, w, padding=1) ** 2)

    g = jax.grad(f)(offsets)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # offsets receive gradient
