"""Golden parity: our CLIP towers vs HuggingFace transformers (torch CPU).

This is the external ground truth for the encoder stacks — the reference
consumes `CLIPTextModel.last_hidden_state` and
`CLIPVisionModel...hidden_states[-2]` (inference_IMAGdressing.py:45-49,
IMAGDressing_v1_pipeline.py:409-415)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagdressing_tpu.core.config import CLIPTextConfig, CLIPVisionConfig  # noqa: E402
from imagdressing_tpu.convert import convert_clip_text, convert_clip_vision  # noqa: E402
from imagdressing_tpu.models import clip  # noqa: E402


@pytest.fixture(scope="module")
def text_pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    ours_cfg = CLIPTextConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_layers=3, num_heads=4,
    )
    params = convert_clip_text(model.state_dict(), ours_cfg)
    return model, ours_cfg, params


def test_text_parity(text_pair):
    model, cfg, params = text_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 512, (2, 77)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(clip.apply_text(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.fixture(scope="module")
def vision_pair():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        projection_dim=32, hidden_act="gelu",
    )
    torch.manual_seed(1)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    ours_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_layers=3, num_heads=4,
        image_size=56, patch_size=14, projection_dim=32,
    )
    params = convert_clip_vision(model.state_dict(), ours_cfg)
    return model, ours_cfg, params


def test_vision_penultimate_parity(vision_pair):
    """hidden_states[-2] — the exact tensor the Resampler consumes."""
    model, cfg, params = vision_pair
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(img), output_hidden_states=True
        ).hidden_states[-2].numpy()
    got = np.asarray(
        clip.apply_vision(
            params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), penultimate=True
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vision_final_parity(vision_pair):
    model, cfg, params = vision_pair
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(img))
        want = out.last_hidden_state.numpy()
        want_pooled = out.pooler_output.numpy()
    last = clip.apply_vision(
        params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), penultimate=False
    )
    np.testing.assert_allclose(np.asarray(last), want, atol=2e-4)
    # pooled path (post_layernorm on CLS only)
    import imagdressing_tpu.models.clip as clip_mod
    from imagdressing_tpu.ops import nn as nn_ops

    pooled = nn_ops.layer_norm(params["post_layernorm"], last[:, 0],
                               eps=cfg.layer_norm_eps)
    np.testing.assert_allclose(np.asarray(pooled), want_pooled, atol=2e-4)


def test_text_clip_skip_parity(text_pair):
    """clip_skip=k == diffusers encode_prompt's hidden_states[-(k+1)] +
    final_layer_norm (reference IMAGDressing_v1_pipeline.py:185-201)."""
    model, cfg, params = text_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 512, (2, 77)).astype(np.int64)
    for k in (1, 2):
        with torch.no_grad():
            hs = model(
                torch.from_numpy(ids), output_hidden_states=True
            ).hidden_states
            want = model.text_model.final_layer_norm(hs[-(k + 1)]).numpy()
        got = np.asarray(
            clip.apply_text(params, cfg, jnp.asarray(ids, jnp.int32),
                            clip_skip=k)
        )
        np.testing.assert_allclose(got, want, atol=2e-4)
