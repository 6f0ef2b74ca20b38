"""CLIP text-image similarity for CAMI-S.

The reference scores with OpenAI CLIP ViT-B/32 (`clip.load("ViT-B/32")`,
/root/reference/metric/eval_s.py:64-76): cosine of the projected, normalized
text and image embeddings. Here the same towers run through our generic
CLIP implementation (models/clip.py) with a transformers `CLIPModel`
(ViT-B/32) checkpoint converted on load.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.core.config import CLIPTextConfig, CLIPVisionConfig
from imagdressing_tpu.models import clip as clip_lib

VIT_B32_TEXT = CLIPTextConfig(
    hidden_size=512, intermediate_size=2048, num_layers=12, num_heads=8
)
VIT_B32_VISION = CLIPVisionConfig(
    hidden_size=768, intermediate_size=3072, num_layers=12, num_heads=12,
    image_size=224, patch_size=32, projection_dim=512,
)


class ClipScorer:
    def __init__(self, text_params, vision_params, text_projection,
                 text_cfg: CLIPTextConfig = VIT_B32_TEXT,
                 vision_cfg: CLIPVisionConfig = VIT_B32_VISION,
                 tokenizer=None):
        self.text_params = text_params
        self.vision_params = vision_params
        self.text_projection = text_projection  # (hidden, proj)
        self.text_cfg = text_cfg
        self.vision_cfg = vision_cfg
        self.tokenizer = tokenizer

    @classmethod
    def from_torch(cls, clip_model_path: str, tokenizer_path: str = ""):
        """Load a transformers CLIPModel (ViT-B/32) state dict."""
        from imagdressing_tpu.apps.tokenizer import load_tokenizer
        from imagdressing_tpu.convert.torch_sd import (
            convert_clip_text,
            convert_clip_vision,
            load_torch_file,
        )

        sd = load_torch_file(clip_model_path)
        return cls(
            convert_clip_text(sd, VIT_B32_TEXT),
            convert_clip_vision(sd, VIT_B32_VISION),
            np.asarray(
                sd["text_projection.weight"].detach().float().numpy().T
                if hasattr(sd["text_projection.weight"], "detach")
                else sd["text_projection.weight"]
            ),
            tokenizer=load_tokenizer(tokenizer_path),
        )

    def text_embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        """EOS-pooled, projected text features (B, proj)."""
        hidden = clip_lib.apply_text(self.text_params, self.text_cfg, ids)
        # CLIP pools at the EOS position == argmax of ids (EOS has the
        # highest id in the CLIP vocab)
        eos = jnp.argmax(ids, axis=-1)
        pooled = hidden[jnp.arange(ids.shape[0]), eos]
        return pooled @ jnp.asarray(self.text_projection, pooled.dtype)

    def image_embed(self, images01: jnp.ndarray) -> jnp.ndarray:
        """images (B,H,W,3) in [0,1] -> projected features (B, proj)."""
        pix = clip_lib.clip_preprocess(images01, self.vision_cfg.image_size)
        last = clip_lib.apply_vision(
            self.vision_params, self.vision_cfg, pix, penultimate=False
        )
        return clip_lib.vision_pooled_embed(
            self.vision_params, self.vision_cfg, last
        )

    def similarity(self, text: str, image01: np.ndarray) -> float:
        """Cosine similarity, reference calculate_clip_similarity
        (eval_s.py:64-76)."""
        ids = jnp.asarray(self.tokenizer(text))[None]
        t = self.text_embed(ids)
        i = self.image_embed(jnp.asarray(image01)[None])
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        i = i / jnp.linalg.norm(i, axis=-1, keepdims=True)
        return float(jnp.sum(t * i))
