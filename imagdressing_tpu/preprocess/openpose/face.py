"""CPM face-landmark network (OpenPose FaceNet — 70 landmarks; vendored by
the reference at preprocess/openpose/annotator/openpose/face.py but unused
by the shipped dressing flow).

Architecture: the hand-CPM trunk shape with 71-channel heatmaps; refinement
stages 2..6 consume concat(heatmap 71, features 128) = 199 channels.
Inference (Face.__call__ contract): resize crop to 384x384, single forward,
per-part gaussian blur + thresholded argmax, coords scaled back to the crop.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from imagdressing_tpu.ops import nn
from imagdressing_tpu.preprocess.openpose.hand import _TRUNK, _run

Params = Dict[str, Any]

_STAGE1 = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, 71, 1)]


def _stageN(i: int):
    return [
        (f"Mconv1_stage{i}", 199, 128, 7), (f"Mconv2_stage{i}", 128, 128, 7),
        (f"Mconv3_stage{i}", 128, 128, 7), (f"Mconv4_stage{i}", 128, 128, 7),
        (f"Mconv5_stage{i}", 128, 128, 7), (f"Mconv6_stage{i}", 128, 128, 1),
        (f"Mconv7_stage{i}", 128, 71, 1),
    ]


def init(rng) -> Params:
    params: Params = {}
    keys = iter(jax.random.split(rng, 96))
    for layers in [_TRUNK, _STAGE1] + [_stageN(i) for i in range(2, 7)]:
        for name, ci, co, k in layers:
            if name != "pool":
                params[name] = nn.param_init_conv(next(keys), k, k, ci, co)
    return params


def apply(params: Params, image: jnp.ndarray) -> jnp.ndarray:
    """image (B,H,W,3) normalized -> heatmaps (B,H/8,W/8,71)."""
    feat = _run(params, _TRUNK, image, final_relu_skip=False)
    heat = _run(params, _STAGE1, feat, final_relu_skip=True)
    for i in range(2, 7):
        x = jnp.concatenate([heat, feat], axis=-1)
        heat = _run(params, _stageN(i), x, final_relu_skip=True)
    return heat


def convert_torch(sd: Dict) -> Params:
    from imagdressing_tpu.preprocess.openpose.hand import convert_torch as ct

    return ct(sd)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _forward(params, image, out_h: int, out_w: int):
    heat = apply(params, image)
    return jax.image.resize(heat, (1, out_h, out_w, 71), "bicubic")


class Face:
    """70-landmark face estimator (reference Face.__call__ contract)."""

    def __init__(self, params, *, inference_size: int = 384,
                 sigma: float = 2.5, threshold: float = 0.1):
        self.params = params
        self.inference_size = inference_size
        self.sigma = sigma
        self.threshold = threshold

    @classmethod
    def from_torch(cls, path: str) -> "Face":
        import torch

        return cls(convert_torch(
            torch.load(path, map_location="cpu", weights_only=False)
        ))

    def __call__(self, face_bgr: np.ndarray) -> np.ndarray:
        """crop (H,W,3) uint8 BGR -> (70, 2) [x, y] peaks ([0,0] missing)."""
        hr, wr = face_bgr.shape[:2]
        s = self.inference_size
        resized = cv2.resize(face_bgr, (s, s), interpolation=cv2.INTER_CUBIC)
        norm = resized.astype(np.float32) / 256.0 - 0.5
        heat = np.asarray(_forward(self.params, jnp.asarray(norm[None]), s, s)[0])
        peaks = np.zeros((70, 2), np.int64)
        for part in range(70):
            smooth = gaussian_filter(heat[:, :, part], sigma=self.sigma)
            if smooth.max() <= self.threshold:
                continue
            yy, xx = np.unravel_index(np.argmax(smooth), smooth.shape)
            peaks[part] = [int(xx * wr / s), int(yy * hr / s)]
        return peaks
