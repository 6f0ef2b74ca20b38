"""Unit tests for NN primitives (golden values vs independent numpy math)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.ops import nn


def test_timestep_embedding_structure():
    # SD convention: flip_sin_to_cos=True -> [cos | sin]; freq_shift=0.
    t = jnp.array([0.0, 999.0])
    emb = nn.timestep_embedding(t, 320)
    assert emb.shape == (2, 320)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(emb[0, :160], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 160:], 0.0, atol=1e-6)
    # frequency ladder: emb[t, i] = cos(t * exp(-ln(1e4) * i / half))
    half = 160
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    np.testing.assert_allclose(emb[1, :half], np.cos(999.0 * freqs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(emb[1, half:], np.sin(999.0 * freqs), rtol=2e-4, atol=2e-5)


def test_group_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    got = nn.group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                        jnp.asarray(x), num_groups=2, eps=1e-5)
    # numpy: groups of 4 channels, stats over (H, W, C_group)
    xr = x.reshape(2, 16, 2, 4)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = xr.var(axis=(1, 3), keepdims=True)
    want = ((xr - mean) / np.sqrt(var + 1e-5)).reshape(x.shape) * scale + bias
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    got = nn.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                        jnp.asarray(x))
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_geglu():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    kernel = rng.standard_normal((4, 16)).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    got = nn.geglu({"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
                   jnp.asarray(x))
    hg = x @ kernel + bias
    h, gate = hg[..., :8], hg[..., 8:]
    from scipy.stats import norm

    want = h * (gate * norm.cdf(gate))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_conv2d_same_as_numpy_1x1():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    k = rng.standard_normal((1, 1, 3, 7)).astype(np.float32)
    got = nn.conv2d({"kernel": jnp.asarray(k)}, jnp.asarray(x), padding=0)
    want = np.einsum("bhwc,co->bhwo", x, k[0, 0])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = nn.upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(up[0, :, :, 0]),
                                  np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                                            [2, 2, 3, 3], [2, 2, 3, 3]]))


def test_upsample2x_conv_matches_unfused():
    """The fused subpixel conv == upsample_nearest_2x then 3x3/pad-1 conv
    (same taps, folded weight sums), including odd sizes and bias."""
    rng = np.random.default_rng(0)
    for (h, w, ci, co) in [(5, 7, 3, 4), (8, 10, 6, 6), (1, 1, 2, 3)]:
        p = {
            "kernel": jnp.asarray(
                rng.standard_normal((3, 3, ci, co)).astype(np.float32)
            ),
            "bias": jnp.asarray(rng.standard_normal(co).astype(np.float32)),
        }
        x = jnp.asarray(
            rng.standard_normal((2, h, w, ci)).astype(np.float32)
        )
        want = nn.conv2d(p, nn.upsample_nearest_2x(x), padding=1)
        got = nn.upsample2x_conv(p, x)
        assert got.shape == want.shape == (2, 2 * h, 2 * w, co)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )


def test_quick_gelu():
    x = jnp.asarray(np.linspace(-3, 3, 13, dtype=np.float32))
    got = nn.quick_gelu(x)
    want = np.asarray(x) * (1.0 / (1.0 + np.exp(-1.702 * np.asarray(x))))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
