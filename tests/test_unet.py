"""UNet structure + conditioning semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.core.config import ControlNetConfig, UNetConfig
from imagdressing_tpu.models import controlnet as controlnet_lib
from imagdressing_tpu.models import unet
from imagdressing_tpu.models.conditioning import Conditioning


@pytest.fixture(scope="module")
def small():
    cfg = UNetConfig(
        block_out_channels=(16, 32, 64, 64),
        cross_attention_dim=32,
        attention_num_heads=4,
        norm_num_groups=8,
    )
    params = unet.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_layer_names_match_sd15_processor_keys():
    cfg = UNetConfig()
    names = unet.attn_layer_names(cfg, "attn1")
    assert len(names) == 16  # 6 down + 9 up + 1 mid
    assert names[0] == "down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor"
    assert names[-1] == "mid_block.attentions.0.transformer_blocks.0.attn1.processor"
    assert "up_blocks.1.attentions.0.transformer_blocks.0.attn1.processor" in names
    # hidden sizes follow the reference's block_id arithmetic
    dims = unet.attn_layer_dims(cfg)
    assert dims["down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor"] == 320
    assert dims["up_blocks.1.attentions.0.transformer_blocks.0.attn1.processor"] == 1280
    assert dims["up_blocks.3.attentions.2.transformer_blocks.0.attn1.processor"] == 320
    assert dims["mid_block.attentions.0.transformer_blocks.0.attn1.processor"] == 1280


def test_seq_lens():
    cfg = UNetConfig()
    seqs = unet.attn_layer_seq_lens(cfg, 80, 64)
    assert seqs["down_blocks.0.attentions.0.transformer_blocks.0.attn1.processor"] == 5120
    assert seqs["down_blocks.2.attentions.1.transformer_blocks.0.attn1.processor"] == 320
    assert seqs["mid_block.attentions.0.transformer_blocks.0.attn1.processor"] == 80
    assert seqs["up_blocks.3.attentions.0.transformer_blocks.0.attn1.processor"] == 5120


def test_forward_shapes_and_capture(small):
    cfg, params = small
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 77, 32))
    out, cap = unet.apply(params, cfg, x, jnp.array([0, 10]), ctx, capture=True)
    assert out.shape == (2, 16, 16, 4)
    assert set(cap.keys()) == set(unet.attn_layer_names(cfg, "attn1"))
    # captured tensors have per-level sequence lengths
    seqs = unet.attn_layer_seq_lens(cfg, 16, 16)
    for name, hidden in cap.items():
        assert hidden.shape[1] == seqs[name], name


def test_ref_scale_zero_equals_no_injection(small):
    """scale=0 must reproduce the no-conditioning output exactly — this is
    what makes the fused CFG batch equivalent to the reference's cond-only
    two-call scheme."""
    cfg, params = small
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)).astype(np.float32))
    garment = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))

    adapters = unet.init_ref_adapters(jax.random.PRNGKey(1), cfg)
    _, cap = unet.apply(params, cfg, garment, jnp.array([0]), ctx, capture=True)
    ref_kv = unet.precompute_ref_kv(adapters, cap)

    base = unet.apply(params, cfg, x, jnp.array([500]), ctx)
    zero = unet.apply(params, cfg, x, jnp.array([500]), ctx,
                      Conditioning(ref_kv=ref_kv, ref_scale=0.0))
    one = unet.apply(params, cfg, x, jnp.array([500]), ctx,
                     Conditioning(ref_kv=ref_kv, ref_scale=1.0))
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-5)
    assert np.abs(np.asarray(one) - np.asarray(base)).max() > 1e-4


def test_adapters_init_from_unet_reproduce_self_attention(small):
    """With to_k_ref/to_v_ref = to_k/to_v and the garment == the sample, the
    ref branch equals the self branch (the reference's training init,
    train.py:339-359, starts from exactly this equivalence)."""
    cfg, params = small
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)).astype(np.float32))
    adapters = unet.init_ref_adapters_from_unet(params, cfg)
    t = jnp.array([500])
    out, cap = unet.apply(params, cfg, x, t, ctx, capture=True)
    # NB: captured hiddens come from the same forward; using them as ref_kv
    # in a second forward makes each attn1 output = (1+scale) * self_attn
    # only at the FIRST layer; deeper layers diverge. Check the first-layer
    # effect indirectly: scale=-1 cancels the first self-attention.
    ref_kv = unet.precompute_ref_kv(adapters, cap)
    out_cancel = unet.apply(params, cfg, x, t, ctx,
                            Conditioning(ref_kv=ref_kv, ref_scale=-1.0))
    assert np.abs(np.asarray(out_cancel) - np.asarray(out)).max() > 1e-5


def test_ip_kv_injection(small):
    cfg, params = small
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)).astype(np.float32))
    ip_params = unet.init_ip_adapters(jax.random.PRNGKey(3), cfg)
    tokens = jnp.asarray(rng.standard_normal((1, 4, 32)).astype(np.float32))
    ip_kv = unet.precompute_ip_kv(ip_params, tokens, cfg)
    base = unet.apply(params, cfg, x, jnp.array([1]), ctx)
    zero = unet.apply(params, cfg, x, jnp.array([1]), ctx,
                      Conditioning(ip_kv=ip_kv, ip_scale=0.0))
    one = unet.apply(params, cfg, x, jnp.array([1]), ctx,
                     Conditioning(ip_kv=ip_kv, ip_scale=1.0))
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-5)
    assert np.abs(np.asarray(one) - np.asarray(base)).max() > 1e-5


def test_controlnet_residual_shapes_and_zero_init(small):
    cfg, params = small
    cn_cfg = ControlNetConfig(unet=cfg)
    cn = controlnet_lib.init(jax.random.PRNGKey(4), cn_cfg)
    lat = jnp.ones((2, 16, 16, 4))
    ctx = jnp.zeros((2, 77, 32))
    pose = jnp.ones((2, 128, 128, 3))
    down, mid = controlnet_lib.apply(cn, cn_cfg, lat, jnp.array([5, 5]), ctx, pose)
    assert len(down) == 12
    # zero-init output convs -> residuals are exactly zero at init
    for r in down:
        np.testing.assert_allclose(np.asarray(r), 0.0)
    np.testing.assert_allclose(np.asarray(mid), 0.0)
    # injecting zero residuals must not change the UNet output
    base = unet.apply(params, cfg, lat, jnp.array([5, 5]), ctx)
    with_res = unet.apply(
        params, cfg, lat, jnp.array([5, 5]), ctx,
        Conditioning(down_block_residuals=down, mid_block_residual=mid),
    )
    np.testing.assert_allclose(np.asarray(with_res), np.asarray(base), atol=1e-6)


@pytest.mark.parametrize("policy", ["full", "dots", "names", "heavy"])
def test_remat_policies_match_no_remat(small, policy):
    """Selective remat recomputes — never changes — the math: loss and
    param-grads under every policy must match the remat-free backward."""
    cfg, params = small
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)).astype(np.float32))
    t = jnp.array([500])

    def loss(p, remat, pol):
        out = unet.apply(p, cfg, x, t, ctx, remat=remat, remat_policy=pol)
        return jnp.mean(out * out)

    base_l, base_g = jax.jit(
        jax.value_and_grad(lambda p: loss(p, False, None)))(params)
    l, g = jax.jit(
        jax.value_and_grad(lambda p: loss(p, True, policy)))(params)
    np.testing.assert_allclose(float(l), float(base_l), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g, base_g,
    )
