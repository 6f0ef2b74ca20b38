"""CMU CPM body-pose network (the OpenPose body model), functional JAX/NHWC.

Architecture spec (matches the torch `bodypose_model` the reference loads at
/root/reference/preprocess/openpose/annotator/openpose/model.py:24-141, CMU
`body_pose_model.pth` weights):

  trunk (VGG-ish, stride 8): conv1_1..conv4_4_CPM -> 128ch features F
  stage 1: two branches over F -> PAF L1 (38ch) + heatmap L2 (19ch)
  stages 2..6: branches over concat(F, L1, L2) (185ch), 7x7 convs

The whole multi-stage network is one jitted forward; the caller upsamples by
the stride and runs host-side peak/limb assembly (infer.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from imagdressing_tpu.ops import nn

Params = Dict[str, Any]

# (name, in, out, ksize) per trunk layer; pools sit after the named layer.
_TRUNK = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool", 0, 0, 0),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool", 0, 0, 0),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
    ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3), ("pool", 0, 0, 0),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]

PAF_CH, HEAT_CH = 38, 19


def _stage1_names(branch: int):
    L = f"L{branch}"
    out = PAF_CH if branch == 1 else HEAT_CH
    return [
        (f"conv5_1_CPM_{L}", 128, 128, 3),
        (f"conv5_2_CPM_{L}", 128, 128, 3),
        (f"conv5_3_CPM_{L}", 128, 128, 3),
        (f"conv5_4_CPM_{L}", 128, 512, 1),
        (f"conv5_5_CPM_{L}", 512, out, 1),
    ]


def _stageN_names(stage: int, branch: int):
    L = f"L{branch}"
    out = PAF_CH if branch == 1 else HEAT_CH
    return [
        (f"Mconv1_stage{stage}_{L}", 185, 128, 7),
        (f"Mconv2_stage{stage}_{L}", 128, 128, 7),
        (f"Mconv3_stage{stage}_{L}", 128, 128, 7),
        (f"Mconv4_stage{stage}_{L}", 128, 128, 7),
        (f"Mconv5_stage{stage}_{L}", 128, 128, 7),
        (f"Mconv6_stage{stage}_{L}", 128, 128, 1),
        (f"Mconv7_stage{stage}_{L}", 128, out, 1),
    ]


def init(rng) -> Params:
    params: Params = {}
    keys = iter(jax.random.split(rng, 128))
    for name, i, o, k in _TRUNK:
        if name != "pool":
            params[name] = nn.param_init_conv(next(keys), k, k, i, o)
    for branch in (1, 2):
        for name, i, o, k in _stage1_names(branch):
            params[name] = nn.param_init_conv(next(keys), k, k, i, o)
        for stage in range(2, 7):
            for name, i, o, k in _stageN_names(stage, branch):
                params[name] = nn.param_init_conv(next(keys), k, k, i, o)
    return params


def _run(params, layers, x, *, final_relu_skip: bool) -> jnp.ndarray:
    for idx, (name, _, _, k) in enumerate(layers):
        if name == "pool":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        x = nn.conv2d(params[name], x, padding=(k - 1) // 2)
        is_last = idx == len(layers) - 1
        if not (final_relu_skip and is_last):
            x = jax.nn.relu(x)
    return x


def apply(params: Params, image: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image (B,H,W,3), already (pixel/256 - 0.5) BGR — the reference's
    normalization (body.py:46). Returns (paf (B,H/8,W/8,38),
    heatmap (B,H/8,W/8,19))."""
    feat = _run(params, _TRUNK, image, final_relu_skip=False)
    paf = _run(params, _stage1_names(1), feat, final_relu_skip=True)
    heat = _run(params, _stage1_names(2), feat, final_relu_skip=True)
    for stage in range(2, 7):
        x = jnp.concatenate([paf, heat, feat], axis=-1)
        paf = _run(params, _stageN_names(stage, 1), x, final_relu_skip=True)
        heat = _run(params, _stageN_names(stage, 2), x, final_relu_skip=True)
    return paf, heat


def convert_torch(sd: Dict) -> Params:
    """torch bodypose_model state dict -> our tree. torch keys look like
    `model0.conv1_1.weight`, `model2_1.Mconv1_stage2_L1.weight` (after
    util.transfer strips the caffe-style prefix duplication)."""
    import numpy as np

    out: Params = {}
    for key, val in sd.items():
        if not key.endswith(".weight"):
            continue
        name = key.split(".")[-2]
        w = val.detach().float().numpy() if hasattr(val, "detach") else np.asarray(val)
        b_key = key[: -len("weight")] + "bias"
        out[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": (
                sd[b_key].detach().float().numpy()
                if hasattr(sd[b_key], "detach")
                else np.asarray(sd[b_key])
            ),
        }
    return out
