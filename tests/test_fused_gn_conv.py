"""Fused GroupNorm(+temb)+SiLU+conv3x3 implicit-GEMM kernel: interpret-mode
parity vs the unfused XLA composition, VJP exactness, dispatch gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import imagdressing_tpu.kernels.fused_gn_conv as fgc
from imagdressing_tpu.ops import nn


def _ref(x, gw, gb, t, w, cb, g, eps):
    if t is not None:
        x = x + t[:, None, None, :].astype(x.dtype)
    h = nn.group_norm({"scale": gw, "bias": gb}, x, num_groups=g, eps=eps)
    hf = h.astype(jnp.float32)
    h = (hf * jax.nn.sigmoid(hf)).astype(h.dtype)
    y = jax.lax.conv_general_dilated(
        h, w.astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=h.dtype,
    )
    return y + cb.astype(y.dtype)


@pytest.fixture
def interp():
    fgc.INTERPRET = True
    yield
    fgc.INTERPRET = False


@pytest.mark.parametrize("with_add", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 32, 256, 256),   # square channels
        (1, 20, 16, 384, 128),  # channel reduction, H not 8-multiple
        (2, 8, 32, 256, 512),   # channel expansion (up-block concat style)
    ],
)
def test_kernel_parity_fp32(interp, with_add, shape):
    b, h, w, cin, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    gw = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    gb = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    wt = jnp.asarray(
        (rng.standard_normal((3, 3, cin, co)) * 0.05).astype(np.float32)
    )
    cb = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    t = (
        jnp.asarray(rng.standard_normal((b, cin)).astype(np.float32))
        if with_add else None
    )
    assert fgc._supported(x, wt, 32)
    out = fgc.fused_gn_silu_conv(x, gw, gb, t, wt, cb, 32, 1e-5, "silu")
    ref = _ref(x, gw, gb, t, wt, cb, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_vjp_matches_xla(interp):
    rng = np.random.default_rng(2)
    b, h, w, cin, co = 2, 8, 32, 256, 256
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    gw = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    gb = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    wt = jnp.asarray(
        (rng.standard_normal((3, 3, cin, co)) * 0.05).astype(np.float32)
    )
    cb = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((b, cin)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((b, h, w, co)).astype(np.float32))

    _, vjp_f = jax.vjp(
        lambda *a: fgc.fused_gn_silu_conv(*a, 32, 1e-5, "silu"),
        x, gw, gb, t, wt, cb,
    )
    _, vjp_r = jax.vjp(lambda *a: _ref(*a, 32, 1e-5), x, gw, gb, t, wt, cb)
    # the bwd recomputes the XLA chain: cotangent-for-cotangent exactness
    for got, want in zip(vjp_f(ct), vjp_r(ct)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_dispatch_gating():
    """Geometry gates: the mid-block 10x8 level, tiny channel counts, and
    VAE-scale activations must take the unfused path."""
    w = jnp.zeros((3, 3, 1280, 1280))
    assert not fgc._supported(jnp.zeros((2, 10, 8, 1280)), w, 32)
    assert not fgc._supported(
        jnp.zeros((2, 80, 64, 320)), jnp.zeros((3, 3, 320, 4)), 32
    )
    # image-resolution VAE level: VMEM budget exceeded
    assert not fgc._supported(
        jnp.zeros((1, 640, 512, 128)), jnp.zeros((3, 3, 128, 128)), 32
    )
    # 1x1 conv is not this kernel's job
    assert not fgc._supported(
        jnp.zeros((2, 80, 64, 320)), jnp.zeros((1, 1, 320, 320)), 32
    )
    # every fused UNet level at 512x640
    for shp, co in [((2, 80, 64, 320), 320), ((2, 40, 32, 640), 640),
                    ((2, 20, 16, 1280), 1280), ((2, 20, 16, 2560), 1280),
                    ((2, 80, 64, 960), 320)]:
        assert fgc._supported(
            jnp.zeros(shp, jnp.bfloat16),
            jnp.zeros((3, 3, shp[-1], co), jnp.bfloat16), 32,
        ), (shp, co)


def test_pick_cot_awkward_cout_falls_back():
    """A Cout too big for a full-weight block and with no 128-multiple
    divisor must route to the unfused path, never request an over-budget
    weight block (VERDICT r4 weak #4)."""
    cin, co = 1280, 1216  # 9*cin*co*2 > 24 MB; 1216 % 128 == 64
    assert 9 * cin * co * 2 > 24 * 1024 * 1024
    assert fgc._pick_cot(cin, co) is None
    x = jax.ShapeDtypeStruct((2, 20, 16, cin), jnp.bfloat16)
    w = jax.ShapeDtypeStruct((3, 3, cin, co), jnp.bfloat16)
    assert not fgc._supported(x, w, 32)
    # the SD1.5 shapes the gate was sized for still pick a fitting block
    assert fgc._pick_cot(1280, 1280) == 256
    assert fgc._pick_cot(2560, 1280) == 256
    assert fgc._pick_cot(320, 320) == 320  # full block fits


@pytest.mark.parametrize("with_add", [False, True])
def test_windowed_kernel_parity(with_add):
    """Row-windowed DMA variant: interpret-mode parity vs the unfused XLA
    chain. Dispatched only on the measured _WINDOWED_SHAPES table (>=1.25x
    vs the pair on v5e scan-based timing — see the mixed-result note in
    fused_gn_conv.py)."""
    rng = np.random.default_rng(4)
    b, h, w, cin, co = (1, 64, 128, 128, 128) if not with_add else \
        (2, 64, 128, 128, 256)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    gw = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    gb = jnp.asarray(rng.standard_normal(cin).astype(np.float32))
    wt = jnp.asarray(
        (rng.standard_normal((3, 3, cin, co)) * 0.05).astype(np.float32)
    )
    cb = jnp.asarray(rng.standard_normal(co).astype(np.float32))
    t = (
        jnp.asarray(rng.standard_normal((b, cin)).astype(np.float32))
        if with_add else None
    )
    assert fgc._windowed_supported(x, wt, 32)
    out = fgc._windowed_call(x, gw, gb, t, wt, cb, num_groups=32, eps=1e-5,
                             act="silu", interpret=True)
    ref = _ref(x, gw, gb, t, wt, cb, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_windowed_gating():
    """VAE pixel-res shapes are windowed-eligible; non-128-multiple channel
    counts are not (Mosaic lane-slice DMA rule). Dispatch itself follows the
    measured _WINDOWED_SHAPES table."""
    for shp, co in [((1, 512, 640, 128), 128), ((1, 256, 320, 512), 512),
                    ((1, 512, 640, 256), 128)]:
        x = jax.ShapeDtypeStruct(shp, jnp.bfloat16)
        w = jax.ShapeDtypeStruct((3, 3, shp[-1], co), jnp.bfloat16)
        assert fgc._windowed_supported(x, w, 32), (shp, co)
        assert not fgc._supported(x, w, 32), (shp, co)
    # 960-channel up-concat: HBM lane slices must be 128-aligned
    x = jax.ShapeDtypeStruct((2, 96, 128, 960), jnp.bfloat16)
    w = jax.ShapeDtypeStruct((3, 3, 960, 320), jnp.bfloat16)
    assert not fgc._windowed_supported(x, w, 32)
    # the measured table: winners dispatch, a losing-but-eligible shape
    # stays on the pair
    for h, w_, cin, co in sorted(fgc._WINDOWED_SHAPES):
        x = jax.ShapeDtypeStruct((1, h, w_, cin), jnp.bfloat16)
        wt = jax.ShapeDtypeStruct((3, 3, cin, co), jnp.bfloat16)
        assert fgc._windowed_preferred(x, wt, 32), (h, w_, cin, co)
    x = jax.ShapeDtypeStruct((1, 512, 640, 128), jnp.bfloat16)
    wt = jax.ShapeDtypeStruct((3, 3, 128, 128), jnp.bfloat16)
    assert not fgc._windowed_preferred(x, wt, 32)


def test_windowed_dispatch_through_wrapper():
    """A _WINDOWED_SHAPES hit routes the model-facing wrapper through the
    windowed kernel in interpret mode and matches the XLA chain. Uses the
    (128,160,512)->512 VAE-decoder shape from the table."""
    rng = np.random.default_rng(9)
    b, h, w, cin, co = 1, 128, 160, 512, 512
    x = jnp.asarray(
        (rng.standard_normal((b, h, w, cin)) * 0.5).astype(np.float32)
    )
    gn_p = {
        "scale": jnp.asarray(rng.standard_normal(cin).astype(np.float32)),
        "bias": jnp.asarray(rng.standard_normal(cin).astype(np.float32)),
    }
    conv_p = {
        "kernel": jnp.asarray(
            (rng.standard_normal((3, 3, cin, co)) * 0.02).astype(np.float32)
        ),
        "bias": jnp.asarray(rng.standard_normal(co).astype(np.float32)),
    }
    assert fgc._windowed_preferred(x, conv_p["kernel"], 32)
    fgc.INTERPRET = True
    try:
        out = fgc.gn_silu_conv3x3(gn_p, conv_p, x, num_groups=32)
    finally:
        fgc.INTERPRET = False
    ref = _ref(x, gn_p["scale"], gn_p["bias"], None, conv_p["kernel"],
               conv_p["bias"], 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_wrapper_fallback_correct(interp):
    """Unsupported geometry through the model-facing wrapper still computes
    the exact chain (via the fused-GN kernel path)."""
    rng = np.random.default_rng(3)
    b, h, w, cin, co = 1, 10, 8, 256, 256  # h*w < 256 -> unfused
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    gn_p = {"scale": jnp.ones((cin,)), "bias": jnp.zeros((cin,))}
    conv_p = {
        "kernel": jnp.asarray(
            (rng.standard_normal((3, 3, cin, co)) * 0.05).astype(np.float32)
        ),
        "bias": jnp.zeros((co,)),
    }
    out = fgc.gn_silu_conv3x3(gn_p, conv_p, x, num_groups=32)
    ref = _ref(x, gn_p["scale"], gn_p["bias"], None, conv_p["kernel"],
               conv_p["bias"], 32, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)
