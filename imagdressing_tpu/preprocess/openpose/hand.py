"""CPM hand-pose network + hand-box geometry (the reference vendors these at
/root/reference/preprocess/openpose/annotator/openpose/{hand.py, model.py:
143-196, util.py:155-215} — unused by the shipped dressing flow
(hand_and_face=False) but part of the OpenposeDetector surface).

Architecture (handpose_model): VGG trunk (conv1_1..conv5_3_CPM, 3 maxpools,
stride 8, 128-ch features F) -> stage 1 (1x1 512 -> 1x1 22 heatmaps) ->
stages 2..6 over concat(heatmap, F) (150 ch) with 7x7 convs.

Inference contract (Hand.__call__): multi-scale {0.5,1,1.5,2}x368, gaussian
pre-blur sigma 0.8, stride-8 pad, heatmaps averaged on a 128x128 grid,
largest-connected-component peak per 21 parts, coords scaled back to the
crop. `detect_hand_boxes` reproduces the wrist-extrapolation box geometry
(ratio 0.33, width = 1.5*max(d_we, 0.9*d_es), >=20 px).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter, label as cc_label

from imagdressing_tpu.ops import nn

Params = Dict[str, Any]

_TRUNK = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool", 0, 0, 0),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool", 0, 0, 0),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool", 0, 0, 0),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3", 512, 512, 3), ("conv4_4", 512, 512, 3),
    ("conv5_1", 512, 512, 3), ("conv5_2", 512, 512, 3),
    ("conv5_3_CPM", 512, 128, 3),
]
_STAGE1 = [("conv6_1_CPM", 128, 512, 1), ("conv6_2_CPM", 512, 22, 1)]


def _stageN(i: int):
    return [
        (f"Mconv1_stage{i}", 150, 128, 7), (f"Mconv2_stage{i}", 128, 128, 7),
        (f"Mconv3_stage{i}", 128, 128, 7), (f"Mconv4_stage{i}", 128, 128, 7),
        (f"Mconv5_stage{i}", 128, 128, 7), (f"Mconv6_stage{i}", 128, 128, 1),
        (f"Mconv7_stage{i}", 128, 22, 1),
    ]


def init(rng) -> Params:
    params: Params = {}
    keys = iter(jax.random.split(rng, 96))
    for layers in [_TRUNK, _STAGE1] + [_stageN(i) for i in range(2, 7)]:
        for name, ci, co, k in layers:
            if name != "pool":
                params[name] = nn.param_init_conv(next(keys), k, k, ci, co)
    return params


def _run(params, layers, x, *, final_relu_skip: bool):
    for idx, (name, _, _, k) in enumerate(layers):
        if name == "pool":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        x = nn.conv2d(params[name], x, padding=(k - 1) // 2)
        if not (final_relu_skip and idx == len(layers) - 1):
            x = jax.nn.relu(x)
    return x


def apply(params: Params, image: jnp.ndarray) -> jnp.ndarray:
    """image (B,H,W,3) normalized (x/256 - 0.5) BGR -> heatmaps
    (B,H/8,W/8,22)."""
    feat = _run(params, _TRUNK, image, final_relu_skip=False)
    heat = _run(params, _STAGE1, feat, final_relu_skip=True)
    for i in range(2, 7):
        x = jnp.concatenate([heat, feat], axis=-1)
        heat = _run(params, _stageN(i), x, final_relu_skip=True)
    return heat


def convert_torch(sd: Dict) -> Params:
    out: Params = {}
    for key, val in sd.items():
        if not key.endswith(".weight"):
            continue
        name = key.split(".")[-2]
        w = val.detach().float().numpy() if hasattr(val, "detach") else np.asarray(val)
        b = sd[key[: -len("weight")] + "bias"]
        out[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b.detach().float().numpy() if hasattr(b, "detach") else np.asarray(b),
        }
    return out


def detect_hand_boxes(
    keypoints: np.ndarray,  # (18, 2) pixel coords; [0,0] = missing
    image_height: int,
    image_width: int,
) -> List[Tuple[int, int, int, bool]]:
    """[(x, y, width, is_left)] square crops from body keypoints
    (util.handDetect geometry)."""
    out = []
    for (si, ei, wi), is_left in (((5, 6, 7), True), ((2, 3, 4), False)):
        pts = keypoints[[si, ei, wi]]
        if np.any(np.all(pts <= 1.0, axis=1)):
            continue
        (x1, y1), (x2, y2), (x3, y3) = pts
        x = x3 + 0.33 * (x3 - x2)
        y = y3 + 0.33 * (y3 - y2)
        d_we = float(np.hypot(x3 - x2, y3 - y2))
        d_es = float(np.hypot(x2 - x1, y2 - y1))
        width = 1.5 * max(d_we, 0.9 * d_es)
        x -= width / 2
        y -= width / 2
        x, y = max(x, 0.0), max(y, 0.0)
        width = min(width, image_width - x, image_height - y)
        if width >= 20:
            out.append((int(x), int(y), int(width), is_left))
    return out


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def _forward(params, image, out_h: int, out_w: int):
    heat = apply(params, image)
    return jax.image.resize(heat, (1, out_h, out_w, 22), "bicubic")


class Hand:
    """21-keypoint hand estimator with the reference's output contract."""

    def __init__(self, params, *, boxsize: int = 368, stride: int = 8,
                 pad_value: int = 128, thre: float = 0.05):
        self.params = params
        self.boxsize = boxsize
        self.stride = stride
        self.pad_value = pad_value
        self.thre = thre

    @classmethod
    def from_torch(cls, path: str) -> "Hand":
        import torch

        return cls(convert_torch(
            torch.load(path, map_location="cpu", weights_only=False)
        ))

    def __call__(self, crop_bgr: np.ndarray,
                 scales=(0.5, 1.0, 1.5, 2.0)) -> np.ndarray:
        """crop (H,W,3) uint8 BGR -> (21, 2) [x, y] peaks in crop pixels
        ([0,0] when a part is missing)."""
        hr, wr = crop_bgr.shape[:2]
        wsize = 128
        blur = cv2.GaussianBlur(crop_bgr, (0, 0), 0.8)
        heat_avg = np.zeros((wsize, wsize, 22), np.float64)
        for s in scales:
            side = max(8, int(round(s * self.boxsize)))
            resized = cv2.resize(blur, (side, side),
                                 interpolation=cv2.INTER_CUBIC)
            ph = (self.stride - side % self.stride) % self.stride
            padded = np.pad(resized, ((0, ph), (0, ph), (0, 0)),
                            constant_values=self.pad_value)
            norm = padded.astype(np.float32) / 256.0 - 0.5
            heat = np.asarray(
                _forward(self.params, jnp.asarray(norm[None]), wsize, wsize)[0]
            )
            heat_avg += heat / len(scales)

        peaks = np.zeros((21, 2), np.int64)
        for part in range(21):
            raw = heat_avg[:, :, part]
            smooth = gaussian_filter(raw, sigma=3)
            binary = smooth > self.thre
            if not binary.any():
                continue
            labels, n = cc_label(binary)
            sums = [raw[labels == i].sum() for i in range(1, n + 1)]
            best = int(np.argmax(sums)) + 1
            masked = np.where(labels == best, raw, 0.0)
            yy, xx = np.unravel_index(np.argmax(masked), masked.shape)
            peaks[part] = [int(xx * wr / wsize), int(yy * hr / wsize)]
        return peaks
