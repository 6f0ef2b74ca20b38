"""Fused GroupNorm(+bias)+SiLU kernel: interpret-mode parity vs the unfused
XLA composition, VJP exactness, fallback dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import imagdressing_tpu.kernels.fused_groupnorm as fg
from imagdressing_tpu.ops import nn


def _ref(x, w, b, t, g, eps, act):
    if t is not None:
        x = x + t[:, None, None, :].astype(x.dtype)
    o = nn.group_norm({"scale": w, "bias": b}, x, num_groups=g, eps=eps)
    if act == "silu":
        of = o.astype(jnp.float32)
        o = (of * jax.nn.sigmoid(of)).astype(o.dtype)
    return o


@pytest.fixture
def interp():
    fg.INTERPRET = True
    yield
    fg.INTERPRET = False


@pytest.mark.parametrize("act", ["silu", "none"])
@pytest.mark.parametrize("with_add", [False, True])
def test_kernel_parity_fp32(interp, act, with_add):
    rng = np.random.default_rng(0)
    b, h, w, c, g = 2, 8, 16, 320, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bs = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    t = (
        jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
        if with_add else None
    )
    out = fg.fused_group_norm_act(x, wt, bs, t, g, 1e-5, act)
    ref = _ref(x, wt, bs, t, g, 1e-5, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_kernel_parity_bf16(interp):
    rng = np.random.default_rng(1)
    b, h, w, c, g = 2, 8, 8, 640, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c))).astype(jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal(c)).astype(jnp.bfloat16)
    bs = jnp.asarray(rng.standard_normal(c)).astype(jnp.bfloat16)
    out = fg.fused_group_norm_act(x, wt, bs, None, g, 1e-5, "silu")
    ref = _ref(x, wt, bs, None, g, 1e-5, "silu")
    err = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
    assert float(err) < 0.05  # bf16 output quantum


def test_vjp_matches_xla(interp):
    rng = np.random.default_rng(2)
    b, h, w, c, g = 2, 8, 8, 320, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bs = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))

    _, vjp_f = jax.vjp(
        lambda *a: fg.fused_group_norm_act(*a, g, 1e-5, "silu"), x, wt, bs, t
    )
    _, vjp_r = jax.vjp(lambda *a: _ref(*a, g, 1e-5, "silu"), x, wt, bs, t)
    for got, want in zip(vjp_f(ct), vjp_r(ct)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_fallback_on_large_or_ragged_shapes(interp):
    """VAE-sized activations and odd row counts must take the XLA path and
    still be correct."""
    rng = np.random.default_rng(3)
    # m % 8 != 0 -> unsupported
    x = jnp.asarray(rng.standard_normal((1, 3, 3, 32)).astype(np.float32))
    wt = jnp.ones((32,), jnp.float32)
    bs = jnp.zeros((32,), jnp.float32)
    out = fg.fused_group_norm_act(x, wt, bs, None, 8, 1e-5, "silu")
    ref = _ref(x, wt, bs, None, 8, 1e-5, "silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
    assert not fg._pallas_supported(3 * 3, 32, 4)
    # VAE decode scale: 640*512 rows x 128ch fp32 > VMEM budget
    assert not fg._pallas_supported(640 * 512, 128, 2)
    # UNet scales fit
    assert fg._pallas_supported(80 * 64, 320, 2)
    assert fg._pallas_supported(10 * 8, 1280, 2)
