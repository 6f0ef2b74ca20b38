"""CAMI-U / CAMI-S evaluation metrics.

Faithful reimplementation of /root/reference/metric/eval.py + eval_s.py
(skimage is unavailable in this image, so SSIM and LBP are implemented here
in numpy/scipy with skimage-compatible semantics), including documented
reference quirks:

  * keypoint_matching returns 0.99 when the generated image has 0 or >5000
    Harris corners (eval.py:33-34) — kept.
  * the LBP histogram uses bins arange(0, 65) although 'default' LBP codes
    range 0..255, so only codes <= 63 are counted (eval.py:46-47) — kept.
  * NOT kept (documented deviations): eval.py:74 joins an absolute path and
    :85 passes an ndarray where a path is expected; our CLI takes arrays.

CAMI-U = SSIM + (1 - keypoint-distance) + LBP-histogram-correlation
CAMI-S = pose-overlap + face-cosine + CLIP text-image similarity
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def _to_gray(img: np.ndarray) -> np.ndarray:
    """BGR (cv2 convention, matching the reference's cv2.imread) -> gray.

    uint8 inputs reproduce cv2.cvtColor(BGR2GRAY)'s fixed-point rounding
    exactly — the reference thresholds (Harris 1%-of-max, LBP bit compares)
    act on the ROUNDED gray, and sub-0.5 float differences move corners and
    flip LBP bits."""
    if img.ndim == 2:
        return img.astype(np.float64)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    if img.dtype == np.uint8:
        y = (
            r.astype(np.int64) * 4899
            + g.astype(np.int64) * 9617
            + b.astype(np.int64) * 1868
            + (1 << 13)
        ) >> 14
        return y.astype(np.float64)
    return 0.114 * b + 0.587 * g + 0.299 * r


def ssim(img1: np.ndarray, img2: np.ndarray, *, data_range: float = 255.0,
         win_size: int = 7, K1: float = 0.01, K2: float = 0.03) -> float:
    """skimage.metrics.structural_similarity(multichannel=True) equivalent:
    uniform filter, per-channel mean."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]

    NP = win_size**2
    cov_norm = NP / (NP - 1)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    pad = (win_size - 1) // 2

    vals = []
    for c in range(img1.shape[-1]):
        x, y = img1[..., c], img2[..., c]
        ux = uniform_filter(x, win_size)
        uy = uniform_filter(y, win_size)
        uxx = uniform_filter(x * x, win_size)
        uyy = uniform_filter(y * y, win_size)
        uxy = uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1 = 2 * ux * uy + C1
        A2 = 2 * vxy + C2
        B1 = ux**2 + uy**2 + C1
        B2 = vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def local_binary_pattern(gray: np.ndarray, P: int = 8, R: float = 1.0) -> np.ndarray:
    """skimage 'default' LBP: P circular neighbors (bilinear), threshold vs
    center, little-endian bit packing."""
    gray = gray.astype(np.float64)
    h, w = gray.shape
    out = np.zeros((h, w), np.float64)
    # skimage's bilinear_interpolation reads out-of-image neighbors as
    # CONSTANT 0 (mode 'C', cval 0) — border pixels compare against 0, not
    # a replicated edge value. Zero-pad and shift instead of clipping.
    pad = int(np.ceil(R)) + 1
    gp = np.pad(gray, pad, constant_values=0.0)
    rows, cols = np.mgrid[0:h, 0:w]
    for p in range(P):
        # skimage angle convention: (r, c) = (-R sin, R cos) of 2*pi*p/P...
        # 'default' uses: rr = -R * sin(2*pi*p/P), cc = R * cos(2*pi*p/P)
        theta = 2.0 * np.pi * p / P
        rr = -R * np.sin(theta)
        cc = R * np.cos(theta)
        r = rows + rr + pad
        c = cols + cc + pad
        r0 = np.floor(r).astype(int)
        r1 = r0 + 1
        c0 = np.floor(c).astype(int)
        c1 = c0 + 1
        fr = r - r0
        fc = c - c0
        val = (
            gp[r0, c0] * (1 - fr) * (1 - fc)
            + gp[r1, c0] * fr * (1 - fc)
            + gp[r0, c1] * (1 - fr) * fc
            + gp[r1, c1] * fr * fc
        )
        # skimage thresholds with a small tolerance on interpolated values
        eps = 1e-6 * np.abs(val)
        out += ((val - gray) >= -eps) * (1 << p)
    return out


def harris_keypoints(img_bgr: np.ndarray) -> np.ndarray:
    """Harris corners matching extract_clothing_keypoints (eval.py:9-23):
    cornerHarris(block=2, ksize=3, k=0.04), dilate, > 1% of max."""
    import cv2

    gray = np.float32(_to_gray(img_bgr))
    dst = cv2.cornerHarris(gray, blockSize=2, ksize=3, k=0.04)
    dst = cv2.dilate(dst, None)
    return np.argwhere(dst > 0.01 * dst.max())


def keypoint_matching(kp1: np.ndarray, kp2: np.ndarray) -> float:
    """Mean nearest-neighbor distance of kp1 into kp2, normalized by the
    512*sqrt(2) diagonal; 0.99 sentinel for degenerate kp2 (eval.py:30-40)."""
    kp1 = np.asarray(kp1)
    kp2 = np.asarray(kp2)
    if len(kp2) == 0 or len(kp2) > 5000:
        return 0.99
    d = np.linalg.norm(kp1[:, None, :] - kp2[None, :, :], axis=2)
    return float(np.mean(d.min(axis=1)) / (512.0 * np.sqrt(2.0)))


def lbp_histogram_correlation(img1_bgr: np.ndarray, img2_bgr: np.ndarray,
                              P: int = 8, R: float = 1.0) -> float:
    lbp1 = local_binary_pattern(_to_gray(img1_bgr), P, R)
    lbp2 = local_binary_pattern(_to_gray(img2_bgr), P, R)
    bins = np.arange(0, P**2 + 1)  # reference quirk: only codes <= 63
    h1, _ = np.histogram(lbp1, bins=bins, density=True)
    h2, _ = np.histogram(lbp2, bins=bins, density=True)
    # cv2.HISTCMP_CORREL == Pearson correlation over bins
    h1 = h1 - h1.mean()
    h2 = h2 - h2.mean()
    denom = np.sqrt((h1**2).sum() * (h2**2).sum())
    return float((h1 * h2).sum() / denom) if denom > 0 else 1.0


def cami_u(reference_bgr: np.ndarray, generated_bgr: np.ndarray) -> float:
    """SSIM + (1 - keypoint distance) + texture correlation (eval.py:53-61)."""
    import cv2

    h, w = generated_bgr.shape[:2]
    reference_bgr = cv2.resize(reference_bgr, (w, h))
    kp1 = harris_keypoints(reference_bgr)
    kp2 = harris_keypoints(generated_bgr)
    return (
        ssim(reference_bgr, generated_bgr)
        + (1.0 - keypoint_matching(kp1, kp2))
        + lbp_histogram_correlation(reference_bgr, generated_bgr)
    )


def pose_overlap(pose1_rgb: np.ndarray, pose2_rgb: np.ndarray) -> float:
    """Nonzero-render overlap ratio (eval_s.py:79-87).

    Documented deviation: the reference sums/multiplies the raw uint8
    channels, so anti-aliased pixels can wrap mod 256 to exactly 0 and drop
    out of both the denominator and the overlap product (eval_s.py:81-85).
    We widen to int64 first — same intent, no wraparound (PARITY.md).
    """
    p1 = np.asarray(pose1_rgb, np.int64)
    p2 = np.asarray(pose2_rgb, np.int64)
    m1 = p1[..., 0] + p1[..., 1] + p1[..., 2]
    m2 = p2[..., 0] + p2[..., 1] + p2[..., 2]
    num = np.count_nonzero(m1) * 1.0
    overlap = np.count_nonzero(m1 * m2) * 1.0
    return overlap / num if num > 0 else 0.0


def face_cosine(embed1: np.ndarray, embed2: np.ndarray) -> float:
    """Cosine of insightface normed embeddings (eval_s.py:90-98)."""
    return float(np.dot(embed1, embed2.T))


def cami_s(
    pose1_rgb: np.ndarray,
    pose2_rgb: np.ndarray,
    face_embed1: np.ndarray,
    face_embed2: np.ndarray,
    clip_similarity: float,
) -> float:
    """pose overlap + face cosine + CLIP text-image sim (eval_s.py:112-120).
    `clip_similarity` comes from eval.clip_score (separate module) or any
    CLIP scorer."""
    return (
        pose_overlap(pose1_rgb, pose2_rgb)
        + face_cosine(face_embed1, face_embed2)
        + clip_similarity
    )
