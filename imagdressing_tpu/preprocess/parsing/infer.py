"""Human-parsing inference: jitted SCHP forwards (ATR 512 + LIP 473) on
device, affine warps + mask refinement on host.

Reproduces /root/reference/preprocess/humanparsing/parsing_api.py
onnx_inference (:121-185) without onnxruntime:
  * BGR input, Normalize(mean=[.406,.456,.485], std=[.225,.224,.229])
  * aspect-preserving affine warp into the square model input
    (datasets/simple_extractor_dataset.py:24-89)
  * bilinear align-corners upsample of the fusion logits + inverse affine
    (utils/transforms.py:81-98)
  * upper-cloth hole filling, arm/hole refinement (>2000 px holes)
  * neck label 18 where ATR says head-adjacent skin (11) but LIP does not
    say face (13)
"""

from __future__ import annotations

from typing import Tuple

import cv2
import functools
import jax
import jax.numpy as jnp
import numpy as np

from imagdressing_tpu.preprocess.parsing import model as schp

_MEAN = np.asarray([0.406, 0.456, 0.485], np.float32)
_STD = np.asarray([0.225, 0.224, 0.229], np.float32)


def _affine(center, scale, size, inv=False):
    """Aspect-preserving box->square affine (SCHP get_affine_transform with
    rot=0), via source/destination point triplets."""
    src_w = scale[0]
    dst_h, dst_w = size
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + np.array([0, -src_w * 0.5], np.float32)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = [dst_w * 0.5, dst_h * 0.5 - dst_w * 0.5]

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src[2] = third(src[0], src[1])
    dst[2] = third(dst[0], dst[1])
    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


def _box_center_scale(w, h, aspect):
    center = np.array([(w - 1) * 0.5, (h - 1) * 0.5], np.float32)
    bw, bh = w - 1, h - 1
    if bw > aspect * bh:
        bh = bw / aspect
    elif bw < aspect * bh:
        bw = bh * aspect
    return center, np.array([bw, bh], np.float32)


def upsample_align_corners(x: jnp.ndarray, out_h: int,
                           out_w: int) -> jnp.ndarray:
    """torch Upsample(mode='bilinear', align_corners=True) grid (the
    reference's parsing upsample): in = o*(n-1)/(N-1). jax.image.resize's
    'bilinear' uses half-pixel centers, which shifts label boundaries
    ~1.5 px; scale_and_translate with s=(N-1)/(n-1), t=0.5-0.5s reproduces
    the align-corners grid exactly (verified vs torch to 1e-6)."""
    b, n_h, n_w, c = x.shape
    s = jnp.array(
        [(out_h - 1) / (n_h - 1), (out_w - 1) / (n_w - 1)], jnp.float32
    )
    return jax.image.scale_and_translate(
        x, (b, out_h, out_w, c), (1, 2), s, 0.5 - 0.5 * s,
        method="linear", antialias=False,
    )


@functools.partial(jax.jit, static_argnames=("num_classes", "size"))
def _forward(params, image, num_classes: int, size: int):
    fusion, _ = schp.apply(params, image, num_classes)
    return upsample_align_corners(fusion, size, size)


def _fill_holes(mask255: np.ndarray) -> np.ndarray:
    flood = mask255.copy()
    ff = np.zeros((mask255.shape[0] + 2, mask255.shape[1] + 2), np.uint8)
    cv2.floodFill(flood, ff, (0, 0), 255)
    return mask255 | cv2.bitwise_not(flood)


class Parsing:
    """ATR+LIP SCHP parser with the reference's output contract."""

    _default = None

    def __init__(self, atr_params, lip_params):
        self.atr = atr_params
        self.lip = lip_params

    @classmethod
    def from_torch(cls, atr_path: str, lip_path: str) -> "Parsing":
        import torch

        def load(path):
            sd = torch.load(path, map_location="cpu", weights_only=False)
            return sd.get("state_dict", sd)

        atr = schp.convert_torch(load(atr_path), schp.NUM_CLASSES_ATR)
        lip = schp.convert_torch(load(lip_path), schp.NUM_CLASSES_LIP)
        return cls(atr, lip)

    @classmethod
    def from_onnx(cls, atr_path: str, lip_path: str) -> "Parsing":
        """Load the reference's shipped ONNX graphs
        (ckpt/humanparsing/parsing_atr.onnx / parsing_lip.onnx) by extracting
        their initializers directly — no onnxruntime needed
        (convert/onnx_reader.py). torch.onnx keeps state-dict names for
        initializers, so the torch converter applies unchanged."""
        from imagdressing_tpu.convert.onnx_reader import read_onnx_initializers

        return cls(
            schp.convert_torch(read_onnx_initializers(atr_path),
                               schp.NUM_CLASSES_ATR),
            schp.convert_torch(read_onnx_initializers(lip_path),
                               schp.NUM_CLASSES_LIP),
        )

    @classmethod
    def get_default(cls) -> "Parsing":
        if cls._default is None:
            import os

            atr = os.environ.get(
                "IMAGDRESSING_ATR_CKPT", "ckpt/humanparsing/parsing_atr.onnx"
            )
            lip = os.environ.get(
                "IMAGDRESSING_LIP_CKPT", "ckpt/humanparsing/parsing_lip.onnx"
            )
            if atr.endswith(".onnx"):
                cls._default = cls.from_onnx(atr, lip)
            else:
                cls._default = cls.from_torch(atr, lip)
        return cls._default

    def _run(self, image_rgb: np.ndarray, params, num_classes: int,
             size: int) -> np.ndarray:
        """-> logits warped back to the original (H, W, num_classes)."""
        h, w = image_rgb.shape[:2]
        bgr = image_rgb[:, :, ::-1]
        center, scale = _box_center_scale(w, h, 1.0)
        trans = _affine(center, scale, (size, size))
        warped = cv2.warpAffine(
            bgr, trans, (size, size), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(0, 0, 0),
        )
        norm = (warped.astype(np.float32) / 255.0 - _MEAN) / _STD
        logits = np.asarray(
            _forward(params, jnp.asarray(norm[None]), num_classes, size)[0]
        )
        inv = _affine(center, scale, (size, size), inv=True)
        out = cv2.warpAffine(
            logits, inv, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
        return out

    def __call__(self, image_rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """-> (parse_map (H,W) uint8 with neck label 18, face_mask (H,W))."""
        atr_logits = self._run(image_rgb, self.atr, schp.NUM_CLASSES_ATR, 512)
        parse = np.argmax(atr_logits, axis=2)
        parse = np.pad(parse, 1, mode="constant")

        # upper-cloth hole filling (parsing_api.py:143-154)
        arm = ((parse == 14) | (parse == 15)).astype(np.float32)
        upper = (parse == 4).astype(np.float32) + arm
        filled = _fill_holes(np.where(upper > 0, 255, 0).astype(np.uint8))
        filled_cloth = filled.astype(np.float64) / 255 * 4
        parse_woarm = np.where(filled_cloth == 4, filled_cloth, parse)

        # holes between arm and cloth > 2000 px stay as-is. Arm pixels are
        # REMOVED from the hole mask; a uint8 `- arm*255` would wrap 0-255
        # to 1 and hand findContours spurious arm-shaped foreground
        hole = cv2.bitwise_and(
            np.where(filled_cloth == 4, 255, 0).astype(np.uint8),
            np.where(parse != 4, 255, 0).astype(np.uint8),
        )
        hole[arm > 0] = 0
        contours, _ = cv2.findContours(hole, cv2.RETR_CCOMP,
                                       cv2.CHAIN_APPROX_TC89_L1)
        keep_mask = np.zeros_like(parse, np.uint8)
        for c in contours:
            if abs(cv2.contourArea(c, True)) > 2000:
                cv2.drawContours(keep_mask, [c], -1, 255, -1)
        keep_mask = keep_mask + arm.astype(np.uint8)
        parse = np.where(keep_mask, parse, parse_woarm)
        parse = parse[1:-1, 1:-1]

        # neck from LIP (parsing_api.py:176-179)
        lip_logits = self._run(image_rgb, self.lip, schp.NUM_CLASSES_LIP, 473)
        lip_parse = np.argmax(lip_logits, axis=2)
        neck = (~(lip_parse == 13)) & (parse == 11)
        parse = np.where(neck, 18, parse).astype(np.uint8)
        face_mask = (parse == 11).astype(np.float32)
        return parse, face_mask
