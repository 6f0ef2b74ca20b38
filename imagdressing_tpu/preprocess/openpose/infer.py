"""OpenPose inference: jitted CNN on device, peak/limb assembly on host.

Reproduces the reference pipeline (/root/reference/preprocess/openpose/):
  * run_openpose.py:35-78 — resize to 384x512, body-only detection, re-index
    candidate/subset into a fixed 18-keypoint array scaled to (384, 512).
  * body.py:31-228 — scale 0.5 x boxsize/height, stride-8 pad, CNN forward,
    gaussian-filtered peak NMS (sigma 3, thre1 0.1), PAF line integrals
    (10 samples, thre2 0.05, distance prior), greedy bipartite assembly,
    person filtering (>=4 parts, mean score >= 0.4).

The irregular assembly stays on host numpy (SURVEY.md hard-part #4); only the
CNN runs on TPU, batched and jitted.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter

from imagdressing_tpu.preprocess.openpose import model as cpm

# limb connections (1-indexed keypoints) and their PAF channel pairs
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]


@functools.partial(
    jax.jit, static_argnames=("sh", "sw", "ph", "pw", "out_h", "out_w")
)
def _forward(params, image_bgr_norm, sh: int, sw: int, ph: int, pw: int,
             out_h: int, out_w: int):
    paf, heat = cpm.apply(params, image_bgr_norm)
    # Reference chain (body.py): upsample stride-8 maps to the PADDED scaled
    # size, CROP the stride pad, then resize to the original resolution.
    # Resizing the padded map straight to (out_h, out_w) would compress
    # every keypoint toward the top-left by sw/(sw+pw) (~16 px at the right
    # edge of a standard 384x512 input).
    b = image_bgr_norm.shape[0]

    def up(x):
        x = jax.image.resize(
            x, (b, sh + ph, sw + pw, x.shape[-1]), "bicubic"
        )[:, :sh, :sw]
        return jax.image.resize(x, (b, out_h, out_w, x.shape[-1]), "bicubic")

    return up(paf), up(heat)


def _find_peaks(heatmap: np.ndarray, thre1: float) -> List[List[Tuple]]:
    """Per-part peak lists [(x, y, score, global_id), ...]."""
    all_peaks = []
    counter = 0
    for part in range(18):
        raw = heatmap[:, :, part]
        smooth = gaussian_filter(raw, sigma=3)
        up = np.zeros_like(smooth); up[1:, :] = smooth[:-1, :]
        down = np.zeros_like(smooth); down[:-1, :] = smooth[1:, :]
        left = np.zeros_like(smooth); left[:, 1:] = smooth[:, :-1]
        right = np.zeros_like(smooth); right[:, :-1] = smooth[:, 1:]
        is_peak = (
            (smooth >= up) & (smooth >= down) & (smooth >= left)
            & (smooth >= right) & (smooth > thre1)
        )
        ys, xs = np.nonzero(is_peak)
        peaks = [
            (int(x), int(y), float(raw[y, x]), counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _score_limb(paf_xy: np.ndarray, a, b, img_h: int, thre2: float,
                mid_num: int = 10):
    """PAF line integral between candidate endpoints a, b -> (ok, score)."""
    vec = np.asarray(b[:2], np.float64) - np.asarray(a[:2], np.float64)
    norm = max(1e-3, float(np.hypot(*vec)))
    u = vec / norm
    xs = np.round(np.linspace(a[0], b[0], mid_num)).astype(int)
    ys = np.round(np.linspace(a[1], b[1], mid_num)).astype(int)
    samples = paf_xy[ys, xs]  # (mid_num, 2)
    proj = samples @ u
    score = float(proj.mean()) + min(0.5 * img_h / norm - 1.0, 0.0)
    ok = (np.count_nonzero(proj > thre2) > 0.8 * mid_num) and score > 0
    return ok, score


def _assemble(all_peaks, paf: np.ndarray, img_h: int, thre2: float):
    """Greedy bipartite limb matching + person assembly (body.py:116-215)."""
    connections: List[Optional[np.ndarray]] = []
    for k, (limb, chans) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        cand_a = all_peaks[limb[0] - 1]
        cand_b = all_peaks[limb[1] - 1]
        if not cand_a or not cand_b:
            connections.append(None)
            continue
        paf_xy = paf[:, :, [chans[0] - 19, chans[1] - 19]]
        scored = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                ok, s = _score_limb(paf_xy, a, b, img_h, thre2)
                if ok:
                    scored.append((i, j, s))
        scored.sort(key=lambda t: t[2], reverse=True)
        used_a, used_b, rows = set(), set(), []
        for i, j, s in scored:
            if i in used_a or j in used_b:
                continue
            rows.append([cand_a[i][3], cand_b[j][3], s, i, j])
            used_a.add(i)
            used_b.add(j)
            if len(rows) >= min(len(cand_a), len(cand_b)):
                break
        connections.append(np.asarray(rows) if rows else np.zeros((0, 5)))

    candidate = np.asarray(
        [p for part in all_peaks for p in part], np.float64
    ).reshape(-1, 4)

    persons = -np.ones((0, 20))
    for k, conn in enumerate(connections):
        if conn is None or len(conn) == 0:
            continue
        ia, ib = LIMB_SEQ[k][0] - 1, LIMB_SEQ[k][1] - 1
        for row in conn:
            pa, pb, score = row[0], row[1], row[2]
            hits = [
                j for j in range(len(persons))
                if persons[j][ia] == pa or persons[j][ib] == pb
            ]
            if len(hits) == 1:
                j = hits[0]
                if persons[j][ib] != pb:
                    persons[j][ib] = pb
                    persons[j][-1] += 1
                    persons[j][-2] += candidate[int(pb), 2] + score
            elif len(hits) >= 2:
                j1, j2 = hits[0], hits[1]
                overlap = (
                    (persons[j1][:-2] >= 0) & (persons[j2][:-2] >= 0)
                ).sum()
                if overlap == 0:
                    persons[j1][:-2] += persons[j2][:-2] + 1
                    persons[j1][-2:] += persons[j2][-2:]
                    persons[j1][-2] += score
                    persons = np.delete(persons, j2, 0)
                else:
                    persons[j1][ib] = pb
                    persons[j1][-1] += 1
                    persons[j1][-2] += candidate[int(pb), 2] + score
            elif k < 17:
                new = -np.ones(20)
                new[ia], new[ib] = pa, pb
                new[-1] = 2
                new[-2] = (
                    candidate[int(pa), 2] + candidate[int(pb), 2] + score
                )
                persons = np.vstack([persons, new])

    keep = [
        i for i in range(len(persons))
        if persons[i][-1] >= 4 and persons[i][-2] / persons[i][-1] >= 0.4
    ]
    return candidate, persons[keep]


class OpenPose:
    """Body-pose detector with the reference's 18-keypoint output contract."""

    _default = None

    def __init__(self, params, *, boxsize: int = 368, stride: int = 8,
                 pad_value: int = 128, thre1: float = 0.1, thre2: float = 0.05):
        self.params = params
        self.boxsize = boxsize
        self.stride = stride
        self.pad_value = pad_value
        self.thre1 = thre1
        self.thre2 = thre2

    @classmethod
    def from_torch(cls, path: str) -> "OpenPose":
        """Load `body_pose_model.pth`. Its keys are bare layer names
        ('conv1_1.weight', 'Mconv1_stage2_L1.weight', ...) — the reference
        maps them onto its module tree via util.transfer; our converter
        consumes them directly."""
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        return cls(cpm.convert_torch(sd))

    @classmethod
    def get_default(cls) -> "OpenPose":
        if cls._default is None:
            import os

            path = os.environ.get(
                "IMAGDRESSING_OPENPOSE_CKPT", "ckpt/body_pose_model.pth"
            )
            cls._default = cls.from_torch(path)
        return cls._default

    def detect(self, image_rgb: np.ndarray):
        """image (H,W,3) uint8 RGB -> (candidate (N,4) [x,y,score,id] in
        pixels, persons (P,20)). Single scale 0.5*boxsize/H (body.py:33)."""
        h, w = image_rgb.shape[:2]
        bgr = image_rgb[:, :, ::-1].astype(np.float32)
        scale = 0.5 * self.boxsize / h
        sh, sw = max(1, round(h * scale)), max(1, round(w * scale))
        import cv2

        small = cv2.resize(bgr, (sw, sh), interpolation=cv2.INTER_CUBIC)
        ph = (self.stride - sh % self.stride) % self.stride
        pw = (self.stride - sw % self.stride) % self.stride
        padded = np.pad(
            small, ((0, ph), (0, pw), (0, 0)), mode="constant",
            constant_values=self.pad_value,
        )
        norm = padded / 256.0 - 0.5
        paf, heat = _forward(
            self.params, jnp.asarray(norm[None]), sh, sw, ph, pw, h, w
        )
        paf = np.asarray(paf[0], np.float64)
        heat = np.asarray(heat[0], np.float64)
        all_peaks = _find_peaks(heat, self.thre1)
        return _assemble(all_peaks, paf, h, self.thre2)

    def __call__(self, image_rgb: np.ndarray, resolution: int = 384) -> Dict:
        """Reference OpenPose.__call__ contract (run_openpose.py:35-78):
        a dict {"pose_keypoints_2d": [[x,y] * 18]} in (384, 512) pixel space,
        with missing joints as [0, 0]."""
        assert image_rgb.shape[0] == 512 and image_rgb.shape[1] == 384, (
            "expected a 384x512 input (resize first)"
        )
        candidate, persons = self.detect(image_rgb)
        kps = np.zeros((18, 2), np.float64)
        if len(persons):
            # the reference consumes subset[0] — the FIRST assembled person,
            # not the highest-scoring one (run_openpose.py:51)
            person = persons[0]
            for i in range(18):
                idx = int(person[i])
                if idx >= 0:
                    kps[i] = candidate[idx, :2]
        return {"pose_keypoints_2d": kps.tolist()}
