"""Category-aware inpaint-mask construction from a human-parse map + pose
keypoints.

Behavioral reimplementation of `get_mask_location`
(/root/reference/preprocess/utils_mask.py:54-167): fixed/changeable label
algebra per category, arm polylines from shoulder/elbow/wrist with the wrist
extended 1.2x past the elbow, shoulder arcs, 5x-dilated garment mask, neck
(label 18) merge, flood-fill hole closing and largest-contour refinement.
Rasterization uses cv2 (round joints/caps) instead of PIL ImageDraw 'curve';
masks agree up to anti-aliasing at stroke borders.

ATR label ids (utils_mask.py:5-24): 0 bg, 1 hat, 2 hair, 3 sunglasses,
4 upper_clothes, 5 skirt, 6 pants, 7 dress, 8 belt, 9/10 shoes, 11 head,
12/13 legs, 14/15 arms, 16 bag, 17 scarf, 18 neck (added by parsing_api).
"""

from __future__ import annotations

from typing import Dict, Tuple

import cv2
import numpy as np

LABELS = {
    "background": 0, "hat": 1, "hair": 2, "sunglasses": 3,
    "upper_clothes": 4, "skirt": 5, "pants": 6, "dress": 7, "belt": 8,
    "left_shoe": 9, "right_shoe": 10, "head": 11, "left_leg": 12,
    "right_leg": 13, "left_arm": 14, "right_arm": 15, "bag": 16,
    "scarf": 17, "neck": 18,
}

_HEAD = (1, 3, 11)
_FIXED_BASE = (9, 10, 1, 3, 16)

_CATEGORY_GARMENT = {
    "dresses": (7, 4, 5, 6),
    "upper_body": (4, 7),
    "lower_body": (6, 12, 13, 5),
}
_CATEGORY_EXTRA_FIXED = {
    "dresses": (),
    "upper_body": (5, 6),
    "lower_body": (4, 14, 15),
}


def _isin(parse: np.ndarray, labels) -> np.ndarray:
    return np.isin(parse, np.asarray(labels, parse.dtype))


def _fill_holes(mask01: np.ndarray) -> np.ndarray:
    """Close interior holes: flood-fill the exterior from (0,0) on a
    zero-padded frame, anything not reached is inside."""
    img = np.pad(mask01[1:-1, 1:-1].astype(np.uint8) * 255, 1)
    flood = img.copy()
    ff_mask = np.zeros((img.shape[0] + 2, img.shape[1] + 2), np.uint8)
    cv2.floodFill(flood, ff_mask, (0, 0), 255)
    return (img | cv2.bitwise_not(flood)) > 0


def _largest_component(mask01: np.ndarray) -> np.ndarray:
    contours, _ = cv2.findContours(
        mask01.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_TC89_L1
    )
    if not contours:
        return np.zeros_like(mask01, np.uint8)
    areas = [abs(cv2.contourArea(c, True)) for c in contours]
    out = np.zeros_like(mask01, np.uint8)
    cv2.drawContours(out, contours, int(np.argmax(areas)), 255, thickness=-1)
    return out > 0


def get_mask_location(
    model_type: str,
    category: str,
    parse_map: np.ndarray,  # (H0,W0) int label map (ATR + neck=18)
    keypoints: Dict,  # {"pose_keypoints_2d": [(x,y) * 18]} in 384x512 space
    width: int = 384,
    height: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (mask uint8 {0,255}, mask_gray uint8 {0,127}) at (height, width)."""
    if model_type == "hd":
        arm_width = 60
    elif model_type == "dc":
        arm_width = 45
    else:
        raise ValueError("model_type must be 'hd' or 'dc'")
    if category not in _CATEGORY_GARMENT:
        raise NotImplementedError(category)

    parse = cv2.resize(
        parse_map.astype(np.uint8), (width, height),
        interpolation=cv2.INTER_NEAREST,
    )
    head = _isin(parse, _HEAD)
    fixed = _isin(parse, _FIXED_BASE + _CATEGORY_EXTRA_FIXED[category])
    garment = _isin(parse, _CATEGORY_GARMENT[category]).astype(np.float32)
    changeable = (parse == 0) | ((parse > 0) & ~fixed)

    arms_left = parse == 14
    arms_right = parse == 15

    if category in ("dresses", "upper_body"):
        pts = np.asarray(keypoints["pose_keypoints_2d"], np.float64).reshape(-1, 2)
        scale = height / 512.0
        sh_r, el_r, wr_r = pts[2] * scale, pts[3] * scale, pts[4] * scale
        sh_l, el_l, wr_l = pts[5] * scale, pts[6] * scale, pts[7] * scale
        lw = int(arm_width / 512 * height)

        def arm_band(shoulder, elbow, wrist, fallback):
            if wrist[0] <= 1.0 and wrist[1] <= 1.0:
                return fallback.copy()
            wrist_ext = elbow + 1.2 * (wrist - elbow)
            band = np.zeros((height, width), np.uint8)
            poly = np.asarray(
                [shoulder, elbow, wrist_ext], np.float64
            ).astype(np.uint16).astype(np.int32)
            cv2.polylines(band, [poly], False, 255, lw, cv2.LINE_8)
            # shoulder cap: the reference's PIL arc(bbox radius lw//2,
            # width lw//2) strokes INWARD from the outer radius — i.e. a
            # filled disc of radius lw//2. A cv2 outline of thickness t
            # would straddle the radius and reach lw//2 + t/2 outward.
            cv2.circle(band, tuple(np.round(shoulder).astype(int)),
                       lw // 2, 255, -1)
            return band > 0

        band_r = arm_band(sh_r, el_r, wr_r, arms_right)
        band_l = arm_band(sh_l, el_l, wr_l, arms_left)

        # hands (arm-labeled pixels outside the band) stay untouched
        fixed = fixed | (arms_left & ~band_l) | (arms_right & ~band_r)

    fixed = fixed | head
    garment = cv2.dilate(garment, np.ones((5, 5), np.uint16), iterations=5)

    if category in ("dresses", "upper_body"):
        neck = cv2.dilate(
            (parse == 18).astype(np.float32), np.ones((5, 5), np.uint16),
            iterations=1,
        )
        garment = np.logical_or(garment, neck.astype(bool) & ~head)
        arm_mask = cv2.dilate(
            np.logical_or(band_l, band_r).astype(np.float32),
            np.ones((5, 5), np.uint16), iterations=4,
        )
        garment = np.logical_or(garment, arm_mask.astype(bool))

    keep = changeable & ~garment.astype(bool)
    keep_total = keep | fixed
    inpaint = ~keep_total

    filled = _fill_holes(inpaint)
    final = _largest_component(filled)

    mask = final.astype(np.uint8) * 255
    mask_gray = final.astype(np.uint8) * 127
    return mask, mask_gray


def make_inpaint_condition(person_rgb01: np.ndarray, mask01: np.ndarray) -> np.ndarray:
    """ControlNet-inpaint conditioning: masked pixels set to -1
    (reference inference_IMAGdressing_controlnetinpainting.py:48-59).
    person (H,W,3) in [0,1], mask (H,W) {0,1} -> (1,H,W,3)."""
    cond = person_rgb01.astype(np.float32).copy()
    cond[mask01 > 0.5] = -1.0
    return cond[None]


def person_upper_body_mask(path: str, height: int, width: int) -> np.ndarray:
    """Automatic upper-body mask: OpenPose keypoints + SCHP parse ->
    get_mask_location('hd', 'upper_body', ...). Requires the preprocessing
    models (preprocess.openpose / preprocess.parsing) with converted
    weights."""
    from imagdressing_tpu.preprocess.openpose import OpenPose
    from imagdressing_tpu.preprocess.parsing import Parsing

    from PIL import Image

    img = Image.open(path).convert("RGB")
    keypoints = OpenPose.get_default()(np.asarray(img.resize((384, 512))))
    parse, _ = Parsing.get_default()(np.asarray(img))
    mask, _ = get_mask_location("hd", "upper_body", parse, keypoints)
    mask = cv2.resize(mask, (width, height), interpolation=cv2.INTER_NEAREST)
    return (mask[None, ..., None] > 127).astype(np.float32)
