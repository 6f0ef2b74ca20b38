"""Conditioning variants beyond the shipped RefS path: concat-KV self-attn
(SAttnProcessor2_0), ref cross-attn (RefCAttnProcessor2_0), plus smoke for
profiling utilities and the CLIP scorer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagdressing_tpu.core.config import UNetConfig
from imagdressing_tpu.models import unet
from imagdressing_tpu.models.conditioning import Conditioning

CFG = UNetConfig(
    block_out_channels=(16, 32, 64, 64),
    cross_attention_dim=32,
    attention_num_heads=4,
    norm_num_groups=8,
)


@pytest.fixture(scope="module")
def setup():
    params = unet.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((1, 77, 32)).astype(np.float32))
    garment = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    _, cap = unet.apply(params, CFG, garment, jnp.array([0]), ctx, capture=True)
    return params, x, ctx, cap


def test_concat_mode_changes_output_and_differs_from_parallel(setup):
    params, x, ctx, cap = setup
    # concat mode uses the BASE to_k/to_v over the cached hidden (the
    # reference's SAttnProcessor2_0 concatenates pre-projection tokens)
    base_kv = {}
    for name, hidden in cap.items():
        parts = name.split(".")
        if parts[0] == "mid_block":
            tp = params["mid_block"]["attentions"][0]
        else:
            tp = params[parts[0]][int(parts[1])]["attentions"][int(parts[3])]
        attn1 = tp["transformer_blocks"][0]["attn1"]
        base_kv[name] = (
            hidden @ attn1["to_k"]["kernel"],
            hidden @ attn1["to_v"]["kernel"],
        )
    t = jnp.array([100])
    plain = unet.apply(params, CFG, x, t, ctx)
    concat = unet.apply(
        params, CFG, x, t, ctx,
        Conditioning(ref_kv=base_kv, ref_mode="concat"),
    )
    adapters = unet.init_ref_adapters_from_unet(params, CFG)
    parallel = unet.apply(
        params, CFG, x, t, ctx,
        Conditioning(ref_kv=unet.precompute_ref_kv(adapters, cap),
                     ref_scale=1.0),
    )
    assert np.abs(np.asarray(concat) - np.asarray(plain)).max() > 1e-4
    # one joint softmax vs sum of two softmaxes — must differ
    assert np.abs(np.asarray(concat) - np.asarray(parallel)).max() > 1e-4


def test_ref_cross_attention(setup):
    params, x, ctx, cap = setup
    # ref K/V on attn2 layers (RefCAttnProcessor2_0): use 8 garment tokens
    rng = np.random.default_rng(1)
    dims = unet.attn_layer_dims(CFG)
    ref_cross = {
        name: (
            jnp.asarray(rng.standard_normal((1, 8, dims[name])).astype(np.float32)),
            jnp.asarray(rng.standard_normal((1, 8, dims[name])).astype(np.float32)),
        )
        for name in unet.attn_layer_names(CFG, "attn2")
    }
    t = jnp.array([100])
    base = unet.apply(params, CFG, x, t, ctx)
    zero = unet.apply(params, CFG, x, t, ctx,
                      Conditioning(ref_cross_kv=ref_cross, ref_scale=0.0))
    one = unet.apply(params, CFG, x, t, ctx,
                     Conditioning(ref_cross_kv=ref_cross, ref_scale=1.0))
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-5)
    assert np.abs(np.asarray(one) - np.asarray(base)).max() > 1e-5


def test_step_timer():
    from imagdressing_tpu.core.profiling import StepTimer

    t = StepTimer()
    t.data_done()
    x = jnp.ones((8, 8)) * 2
    t.step_done(x)
    m = t.metrics()
    assert m["data_time"] >= 0 and m["step_time"] >= 0


def test_clip_scorer_structural():
    import dataclasses

    from imagdressing_tpu.apps.tokenizer import HashTokenizer
    from imagdressing_tpu.core.config import CLIPTextConfig, CLIPVisionConfig
    from imagdressing_tpu.eval.clip_score import ClipScorer
    from imagdressing_tpu.models import clip as clip_lib

    tcfg = CLIPTextConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                          num_layers=2, num_heads=4)
    vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=4, image_size=28, patch_size=14,
                            projection_dim=16)
    rng = jax.random.PRNGKey(0)
    scorer = ClipScorer(
        clip_lib.init_text(rng, tcfg),
        clip_lib.init_vision(rng, vcfg),
        np.random.default_rng(0).standard_normal((32, 16)).astype(np.float32),
        text_cfg=tcfg, vision_cfg=vcfg,
        tokenizer=HashTokenizer(vocab_size=128),
    )
    img = np.random.default_rng(1).random((40, 40, 3)).astype(np.float32)
    s = scorer.similarity("a red dress", img)
    assert -1.0 <= s <= 1.0
    assert scorer.similarity("a red dress", img) == pytest.approx(s)
