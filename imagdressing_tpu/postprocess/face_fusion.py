"""Landmark-driven face fusion — native replacement for the reference's
modelscope post-process.

The reference serving app optionally runs modelscope's `image_face_fusion`
GAN on every generated image (/root/reference/app.py:172,244-252): the
user's face photo is fused onto the generated person (`template`). That GAN
is an external model-zoo artifact (not part of the reference repo either);
this module provides the capability natively with the classical
landmark-driven pipeline:

  1. facial landmarks on both images — any ``landmark_fn(rgb_uint8) ->
     (N,2) float [x,y] | None``; the in-repo jitted OpenPose FaceNet
     (imagdressing_tpu.preprocess.openpose.face.Face, 70 points) slots in
     directly via :func:`openpose_landmark_fn`;
  2. closed-form Umeyama similarity transform (user -> template landmark
     frame) — no iterative solver;
  3. feathered convex-hull mask from the template landmarks;
  4. Reinhard-style per-channel colour transfer inside the mask so the
     pasted face matches the generated scene's lighting;
  5. multi-band (Laplacian pyramid) blend to hide the seam.

Everything here is host-side numpy/cv2 (same placement rationale as
preprocess/mask.py: irregular geometry, tiny tensors); the only CNN in the
path — the landmark net — is the jitted JAX model.
"""

from __future__ import annotations

from typing import Callable, Optional

import cv2
import numpy as np

LandmarkFn = Callable[[np.ndarray], Optional[np.ndarray]]


def umeyama(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (scale·R | t) mapping src -> dst.

    src, dst: (N,2) point sets. Returns a 2x3 affine matrix usable with
    cv2.warpAffine. Closed form (Umeyama 1991), reflection-free.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(2)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[1, 1] = -1.0
    rot = u @ s @ vt
    var_s = (sc ** 2).sum(1).mean()
    scale = float(np.trace(np.diag(d) @ s) / var_s) if var_s > 0 else 1.0
    t = mu_d - scale * rot @ mu_s
    return np.concatenate([scale * rot, t[:, None]], axis=1).astype(np.float32)


def hull_mask(shape, landmarks: np.ndarray, *, feather: float = 0.12,
              shrink: float = 0.06) -> np.ndarray:
    """Feathered convex-hull mask (H,W) float in [0,1] around landmarks.

    `shrink` erodes the hull by that fraction of its diagonal before
    feathering so the blend never reaches past the face outline; `feather`
    is the Gaussian sigma as a fraction of the hull diagonal.
    """
    h, w = shape[:2]
    mask = np.zeros((h, w), np.float32)
    pts = np.round(np.asarray(landmarks, np.float64)).astype(np.int32)
    hull = cv2.convexHull(pts)
    cv2.fillConvexPoly(mask, hull, 1.0)
    span = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    if span <= 0:
        return mask
    k = max(1, int(round(span * shrink)))
    mask = cv2.erode(mask, np.ones((k, k), np.float32))
    sigma = max(1.0, span * feather)
    ksize = int(sigma * 3) * 2 + 1
    mask = cv2.GaussianBlur(mask, (ksize, ksize), sigma)
    return np.clip(mask, 0.0, 1.0)


def color_transfer(src: np.ndarray, ref: np.ndarray,
                   mask: np.ndarray) -> np.ndarray:
    """Match src's per-channel mean/std to ref's inside mask (Reinhard).

    src/ref: (H,W,3) float; mask: (H,W) in [0,1]. Returns adjusted src.
    """
    w = mask[..., None]
    tot = w.sum()
    if tot < 1.0:
        return src
    def stats(img):
        mu = (img * w).sum((0, 1)) / tot
        var = (w * (img - mu) ** 2).sum((0, 1)) / tot
        return mu, np.sqrt(np.maximum(var, 1e-8))
    mu_s, sd_s = stats(src)
    mu_r, sd_r = stats(ref)
    return (src - mu_s) * (sd_r / sd_s) + mu_r


def pyramid_blend(fg: np.ndarray, bg: np.ndarray, mask: np.ndarray,
                  levels: int = 4) -> np.ndarray:
    """Multi-band blend: fg where mask=1, bg where mask=0, seamless between.

    All float (H,W,3) / (H,W); output clipped to bg's numeric range upstream.

    Depth adapts to the mask: a level is only added while the downsampled
    mask stays saturated somewhere (max > 0.95) — otherwise the coarsest
    band would blend the face's DC with a washed-out mask and bleed the
    background colour into the face (visible on small faces).
    """
    levels = max(1, min(levels, int(np.log2(max(1, min(mask.shape[:2]))))))
    gf, gb, gm = [fg.astype(np.float32)], [bg.astype(np.float32)], [
        mask.astype(np.float32)]
    for _ in range(levels - 1):
        down = cv2.pyrDown(gm[-1])
        if down.max() <= 0.95 or min(down.shape[:2]) < 2:
            break
        gf.append(cv2.pyrDown(gf[-1]))
        gb.append(cv2.pyrDown(gb[-1]))
        gm.append(down)
    levels = len(gm)
    out = None
    for i in reversed(range(levels)):
        if i == levels - 1:
            lf, lb = gf[i], gb[i]
        else:
            up_f = cv2.pyrUp(gf[i + 1], dstsize=gf[i].shape[1::-1])
            up_b = cv2.pyrUp(gb[i + 1], dstsize=gb[i].shape[1::-1])
            lf, lb = gf[i] - up_f, gb[i] - up_b
        m = gm[i][..., None]
        band = m * lf + (1.0 - m) * lb
        out = band if out is None else (
            cv2.pyrUp(out, dstsize=band.shape[1::-1]) + band)
    return out


def fuse_face(template: np.ndarray, user: np.ndarray,
              template_landmarks: np.ndarray, user_landmarks: np.ndarray,
              *, color_match: bool = True, feather: float = 0.12,
              levels: int = 4) -> np.ndarray:
    """Fuse the user's face into the template at the template's landmarks.

    template/user: (H,W,3) float in [0,1] (uint8 also accepted). Returns the
    fused image in the template's dtype/range. Mirrors the contract of the
    reference's `image_face_fusion(template=..., user=...)` call
    (/root/reference/app.py:244-252).
    """
    as_uint8 = template.dtype == np.uint8
    tpl = template.astype(np.float32) / (255.0 if as_uint8 else 1.0)
    usr = np.asarray(user, np.float32)
    if user.dtype == np.uint8:
        usr = usr / 255.0
    h, w = tpl.shape[:2]
    m = umeyama(np.asarray(user_landmarks, np.float32),
                np.asarray(template_landmarks, np.float32))
    warped = cv2.warpAffine(usr, m, (w, h), flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_REFLECT)
    mask = hull_mask(tpl.shape, template_landmarks, feather=feather)
    if color_match:
        warped = color_transfer(warped, tpl, mask)
    fused = pyramid_blend(warped, tpl, mask, levels=levels)
    fused = np.clip(fused, 0.0, 1.0)
    if as_uint8:
        return (fused * 255.0 + 0.5).astype(np.uint8)
    return fused.astype(template.dtype)


def openpose_landmark_fn(face_params, **face_kwargs) -> LandmarkFn:
    """LandmarkFn backed by the in-repo OpenPose FaceNet (70 landmarks).

    The net consumes a BGR face crop and marks undetected parts [0,0]
    (preprocess/openpose/face.py Face.__call__); undetected rows are dropped
    here. Fusion needs the SAME landmark indices on both images, so rows
    missing on either side are intersected by FaceFusion via prefix
    truncation — this fn keeps the full 70-row array and replaces missing
    rows with None only when fewer than 3 survive.
    """
    from imagdressing_tpu.preprocess.openpose.face import Face

    face = Face(face_params, **face_kwargs)

    def fn(rgb: np.ndarray) -> Optional[np.ndarray]:
        pts = face(rgb[..., ::-1])  # RGB -> BGR
        if pts is None:
            return None
        pts = np.asarray(pts, np.float32)
        detected = ~(pts == 0).all(axis=-1)
        return pts if detected.sum() >= 3 else None

    return fn


class FaceFusion:
    """Callable face-fusion stage: detects landmarks on both images, fuses.

    Degrades gracefully: if landmarks are missing on either image the
    template is returned unchanged (the reference's modelscope call sits
    behind an `if` for the same reason — fusion is best-effort polish).
    """

    def __init__(self, landmark_fn: LandmarkFn, *, color_match: bool = True,
                 feather: float = 0.12, levels: int = 4):
        self.landmark_fn = landmark_fn
        self.color_match = color_match
        self.feather = feather
        self.levels = levels

    def __call__(self, template: np.ndarray,
                 user: np.ndarray) -> np.ndarray:
        to_u8 = (lambda x: x if x.dtype == np.uint8
                 else (np.clip(x, 0, 1) * 255).astype(np.uint8))
        lm_t = self.landmark_fn(to_u8(np.asarray(template)))
        lm_u = self.landmark_fn(to_u8(np.asarray(user)))
        if lm_t is None or lm_u is None:
            return template
        n = min(len(lm_t), len(lm_u))
        lm_t, lm_u = lm_t[:n], lm_u[:n]
        # indexed landmark sets (e.g. the 70-point FaceNet with [0,0]
        # missing-sentinels): keep rows detected on BOTH images
        good = ~((lm_t == 0).all(-1) | (lm_u == 0).all(-1))
        lm_t, lm_u = lm_t[good], lm_u[good]
        if len(lm_t) < 3:
            return template
        return fuse_face(template, user, lm_t, lm_u,
                         color_match=self.color_match, feather=self.feather,
                         levels=self.levels)


def make_post_process(landmark_fn: LandmarkFn, *,
                      face_key: str = "fusion_face",
                      **fusion_kwargs):
    """serve.py post-process hook: fuses `payload[face_key]` into each image.

    The payload value may be an (H,W,3) array or a base64-encoded PNG (the
    JSON API's image encoding). Requests without the key pass through.
    """
    fusion = FaceFusion(landmark_fn, **fusion_kwargs)

    def post_process(img, payload):
        face = payload.get(face_key)
        if face is None:
            return img
        if isinstance(face, (str, bytes)):
            import base64
            import io

            from PIL import Image

            raw = base64.b64decode(face)
            face = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        return fusion(img, np.asarray(face))

    return post_process
