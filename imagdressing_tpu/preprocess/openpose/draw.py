"""Pose rendering for ControlNet conditioning and CAMI-S pose overlap.

Same visual contract as the reference's util.draw_bodypose
(/root/reference/preprocess/openpose/annotator/openpose/util.py:68-115):
17 limbs as width-4 filled ellipses in the 18-color CMU palette on black,
canvas dimmed 0.6, then radius-4 joint circles.
"""

from __future__ import annotations

import math
from typing import Optional

import cv2
import numpy as np

from imagdressing_tpu.preprocess.openpose.infer import LIMB_SEQ

COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]


def draw_bodypose(
    keypoints: np.ndarray,  # (18, 2) pixel coords; [0,0] = missing
    height: int,
    width: int,
    *,
    src_size: Optional[tuple] = None,  # coord space of keypoints, default (w,h)
    stickwidth: int = 4,
) -> np.ndarray:
    """-> (height, width, 3) uint8 RGB pose render."""
    kps = np.asarray(keypoints, np.float64).copy()
    # missing joints are the EXACT [0, 0] sentinel — test before scaling
    # (a <=1.0 heuristic after scaling to a small canvas would drop real
    # joints that land near the top-left corner)
    present = ~np.all(kps == 0.0, axis=1)
    sw, sh = src_size if src_size else (width, height)
    kps[:, 0] *= width / sw
    kps[:, 1] *= height / sh

    canvas = np.zeros((height, width, 3), np.uint8)
    for li, (a, b) in enumerate(LIMB_SEQ[:17]):
        ia, ib = a - 1, b - 1
        if not (present[ia] and present[ib]):
            continue
        xa, ya = kps[ia]
        xb, yb = kps[ib]
        mx, my = (xa + xb) / 2, (ya + yb) / 2
        length = math.hypot(xa - xb, ya - yb)
        angle = math.degrees(math.atan2(ya - yb, xa - xb))
        poly = cv2.ellipse2Poly(
            (int(mx), int(my)), (int(length / 2), stickwidth), int(angle),
            0, 360, 1,
        )
        cv2.fillConvexPoly(canvas, poly, COLORS[li])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(18):
        if present[i]:
            cv2.circle(
                canvas, (int(kps[i, 0]), int(kps[i, 1])), 4, COLORS[i], -1
            )
    return canvas
