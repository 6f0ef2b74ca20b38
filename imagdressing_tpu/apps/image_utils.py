"""Host-side image helpers mirroring the reference entry scripts' prep.

resize_img: snap-to-64 dual-constraint resize (inference_IMAGdressing.py:17-28)
image_grid: save-side collage (:31-39)
prepare_garment: Resize(640,512) + Normalize(0.5) VAE view plus the CLIP view
  (:160-174) as numpy arrays ready for DressingPipeline.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from PIL import Image

from imagdressing_tpu.train.data import clip_preprocess_np

DEFAULT_PROMPT = "A beautiful woman, best quality, high quality"
DEFAULT_NEGATIVE = (
    "bare, naked, nude, undressed, monochrome, lowres, bad anatomy, "
    "worst quality, low quality"
)


def resize_img(
    img: Image.Image,
    max_side: int = 640,
    min_side: int = 512,
    mode=Image.BILINEAR,
    base_pixel_number: int = 64,
) -> Image.Image:
    w, h = img.size
    ratio = min_side / min(h, w)
    w, h = round(ratio * w), round(ratio * h)
    ratio = max_side / max(h, w)
    img = img.resize([round(ratio * w), round(ratio * h)], mode)
    w_new = (round(ratio * w) // base_pixel_number) * base_pixel_number
    h_new = (round(ratio * h) // base_pixel_number) * base_pixel_number
    return img.resize([w_new, h_new], mode)


def image_grid(imgs: List[Image.Image], rows: int, cols: int) -> Image.Image:
    assert len(imgs) == rows * cols
    w, h = imgs[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, im in enumerate(imgs):
        grid.paste(im, box=(i % cols * w, i // cols * h))
    return grid


def prepare_garment(
    path: str, height: int = 640, width: int = 512, clip_size: int = 224
) -> Tuple[np.ndarray, np.ndarray, Image.Image]:
    """-> (ref_image (1,H,W,3) in [-1,1], ref_clip_image
    (1,clip_size,clip_size,3), the resized PIL for collages)."""
    img = Image.open(path).convert("RGB")
    img = resize_img(img)
    vae_view = np.asarray(
        img.resize((width, height), Image.BILINEAR), np.float32
    ) / 127.5 - 1.0
    clip_view = clip_preprocess_np(np.asarray(img), size=clip_size)
    return vae_view[None], clip_view[None], img


def prepare_person(path: str, height: int, width: int) -> np.ndarray:
    img = Image.open(path).convert("RGB").resize((width, height), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 127.5 - 1.0)[None]


def to_pil(images: np.ndarray) -> List[Image.Image]:
    """float [0,1] or uint8 [0,255] batch -> PIL images."""
    if images.dtype == np.uint8:
        return [Image.fromarray(im) for im in images]
    return [
        Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8))
        for im in images
    ]
