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
    # every OpenAI CLIP checkpoint (incl. ViT-B/32) uses quick_gelu; the
    # config default 'gelu' is for the laion ViT-H garment encoder
    hidden_act="quick_gelu",
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
        proj = sd["text_projection.weight"]
        if hasattr(proj, "detach"):
            proj = proj.detach().float().numpy()
        # transformers stores (proj, hidden); we multiply pooled @ W so
        # transpose EITHER branch (the matrix is square for ViT-B/32 — a
        # missed transpose is silent, not a shape error)
        proj = np.asarray(proj).T
        if not tokenizer_path:
            print(
                "WARNING: no --clip_tokenizer given — falling back to the "
                "test HashTokenizer, whose ids are NOT the CLIP vocab; "
                "text similarities will be meaningless",
                flush=True,
            )
        return cls(
            convert_clip_text(sd, VIT_B32_TEXT),
            convert_clip_vision(sd, VIT_B32_VISION),
            proj,
            tokenizer=load_tokenizer(tokenizer_path),
        )

    def text_embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        """EOS-pooled, projected text features (B, proj). Jitted per shape
        (eager ops over the remote-TPU tunnel are glacial — CLAUDE.md)."""
        if not hasattr(self, "_jit_text"):
            cfg = self.text_cfg

            def impl(params, proj, ids):
                hidden = clip_lib.apply_text(params, cfg, ids)
                # CLIP pools at the EOS position == argmax of ids (EOS has
                # the highest id in the CLIP vocab)
                eos = jnp.argmax(ids, axis=-1)
                pooled = hidden[jnp.arange(ids.shape[0]), eos]
                return pooled @ proj.astype(pooled.dtype)

            self._jit_text = jax.jit(impl)
        return self._jit_text(self.text_params,
                              jnp.asarray(self.text_projection), ids)

    def image_embed(self, images01: jnp.ndarray) -> jnp.ndarray:
        """images (B,H,W,3) in [0,1] -> projected features (B, proj).

        OpenAI CLIP preprocessing: shortest-edge bicubic resize to
        image_size, CENTER CROP (a direct square resize would squash the
        640x512 try-on outputs instead of cropping, making scores
        incomparable to the reference metric)."""
        if not hasattr(self, "_jit_image"):
            cfg = self.vision_cfg

            def impl(params, pix):
                last = clip_lib.apply_vision(params, cfg, pix,
                                             penultimate=False)
                return clip_lib.vision_pooled_embed(params, cfg, last)

            self._jit_image = jax.jit(impl)
        b, h, w = images01.shape[:3]
        size = self.vision_cfg.image_size
        if (h, w) != (size, size):
            scale = size / min(h, w)
            nh = max(size, round(h * scale))
            nw = max(size, round(w * scale))
            x = jax.image.resize(images01, (b, nh, nw, 3), "bicubic")
            top, left = (nh - size) // 2, (nw - size) // 2
            images01 = x[:, top:top + size, left:left + size]
        pix = clip_lib.clip_preprocess(images01, size)
        return self._jit_image(self.vision_params, pix)

    def similarity(self, text: str, image01: np.ndarray) -> float:
        """Cosine similarity, reference calculate_clip_similarity
        (eval_s.py:64-76)."""
        ids = jnp.asarray(self.tokenizer(text))[None]
        t = self.text_embed(ids)
        i = self.image_embed(jnp.asarray(image01)[None])
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        i = i / jnp.linalg.norm(i, axis=-1, keepdims=True)
        return float(jnp.sum(t * i))
