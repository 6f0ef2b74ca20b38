"""SCHP human-parsing network (AugmentCE2P: ResNet-101 + PSP + edge branch +
decoder + fusion), functional JAX/NHWC.

Architecture spec from /root/reference/preprocess/humanparsing/networks/
AugmentCE2P.py:296-365 (the net behind parsing_atr.onnx / parsing_lip.onnx):

  stem: 3x conv3x3 (3->64 s2, 64->64, 64->128) each + ABN, maxpool3x3 s2
  layer1..4: bottlenecks [3, 4, 23, 3]; layer4 stride 1 dilation 2
  PSP(2048->512, sizes 1/2/3/6) -> decoder(512 + layer1) -> seg logits
  edge branch over layer1/2/3; fusion(cat(parsing_fea 256, edge_fea 768))

Norm layers are InPlaceABN (activation 'none' inside residual blocks,
leaky_relu 0.01 elsewhere — AugmentCE2P.py:22-25); here they run through the
fused inference path kernels/fused_bn_act.abn_inference with folded
statistics, or abn_train for fine-tuning.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from imagdressing_tpu.kernels.fused_bn_act import abn_inference, abn_train_stats
from imagdressing_tpu.ops import nn

Params = Dict[str, Any]

LAYERS = (3, 4, 23, 3)
NUM_CLASSES_ATR = 18
NUM_CLASSES_LIP = 20


@dataclasses.dataclass
class BNTrainCtx:
    """Train-mode batch-norm context: batch statistics (synced over
    `axis_name` under shard_map — InPlaceABNSync semantics) instead of the
    folded running stats; each layer's batch moments are collected into
    `stats` as (bn_param_dict, mean, var) for running-stat EMA updates."""

    axis_name: Optional[str] = None
    stats: List = dataclasses.field(default_factory=list)


def _abn(p: Params, x: jnp.ndarray, activation: str,
         ctx: Optional[BNTrainCtx] = None) -> jnp.ndarray:
    if ctx is None:
        return abn_inference(
            x, p["weight"], p["bias"], p["running_mean"], p["running_var"],
            activation=activation,
        )
    y, mean, var = abn_train_stats(
        x, p["weight"], p["bias"], activation=activation,
        axis_name=ctx.axis_name,
    )
    ctx.stats.append((p, mean, var))
    return y


def _conv_abn(pc, pb, x, *, stride=1, padding=1, dilation=1,
              activation="leaky_relu", ctx: Optional[BNTrainCtx] = None):
    kernel = pc["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride),
        ((padding, padding), (padding, padding)) if isinstance(padding, int)
        else padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "bias" in pc:
        y = y + pc["bias"].astype(y.dtype)
    return _abn(pb, y, activation, ctx)


def _bottleneck(p: Params, x: jnp.ndarray, *, stride: int, dilation: int,
                ctx: Optional[BNTrainCtx] = None) -> jnp.ndarray:
    out = _conv_abn(p["conv1"], p["bn1"], x, stride=1, padding=0,
                    activation="none", ctx=ctx)
    out = jax.nn.relu(out)
    out = _conv_abn(p["conv2"], p["bn2"], out, stride=stride,
                    padding=dilation, dilation=dilation, activation="none",
                    ctx=ctx)
    out = jax.nn.relu(out)
    out = _conv_abn(p["conv3"], p["bn3"], out, stride=1, padding=0,
                    activation="none", ctx=ctx)
    if "downsample" in p:
        x = _conv_abn(p["downsample"]["conv"], p["downsample"]["bn"], x,
                      stride=stride, padding=0, activation="none", ctx=ctx)
    return jax.nn.relu(out + x)


def _resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=True bilinear (torch F.interpolate in the reference)."""
    b, ih, iw, c = x.shape
    if ih == h and iw == w:
        return x
    # gather-based align-corners interpolation
    ys = jnp.linspace(0.0, ih - 1.0, h)
    xs = jnp.linspace(0.0, iw - 1.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, ih - 1)
    y1 = jnp.clip(y0 + 1, 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, iw - 1)
    x1 = jnp.clip(x0 + 1, 0, iw - 1)
    wy = (ys - y0).astype(x.dtype)[None, :, None, None]
    wx = (xs - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _adaptive_avg_pool(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics (floor/ceil bin edges)."""
    import numpy as np

    b, h, w, c = x.shape
    rows = []
    for i in range(size):
        hs, he = int(np.floor(i * h / size)), int(np.ceil((i + 1) * h / size))
        cols = []
        for j in range(size):
            ws, we = int(np.floor(j * w / size)), int(np.ceil((j + 1) * w / size))
            cols.append(jnp.mean(x[:, hs:he, ws:we], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, size, size, C)


def apply(params: Params, image: jnp.ndarray, num_classes: int,
          bn_ctx: Optional[BNTrainCtx] = None,
          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image (B,H,W,3) normalized -> (fusion_logits (B,H/4,W/4,C),
    edge_logits). The ONNX wrapper consumes output[0][1] == fusion
    (parsing_api.onnx_inference). Pass `bn_ctx` (BNTrainCtx) for train-mode
    batch-stat (sync) normalization — the fine-tune path
    (train/parsing_train.py)."""
    import functools

    # the logit width comes from the params; a mismatched num_classes must
    # fail loudly, not be silently ignored
    actual = params["fushion"]["conv2"]["kernel"].shape[-1]
    assert actual == num_classes, (
        f"params produce {actual} classes, caller expects {num_classes}"
    )

    _conv_abn_ = functools.partial(_conv_abn, ctx=bn_ctx)
    _bottleneck_ = functools.partial(_bottleneck, ctx=bn_ctx)
    x = _conv_abn_(params["conv1"], params["bn1"], image, stride=2,
                  activation="none")
    x = jax.nn.relu(x)
    x = _conv_abn_(params["conv2"], params["bn2"], x, activation="none")
    x = jax.nn.relu(x)
    x = _conv_abn_(params["conv3"], params["bn3"], x, activation="none")
    x = jax.nn.relu(x)
    # maxpool 3x3 s2 p1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    feats = []
    for li, (blocks, stride, dilation) in enumerate(
        zip(LAYERS, (1, 2, 2, 1), (1, 1, 1, 2))
    ):
        layer = params[f"layer{li + 1}"]
        for bi in range(blocks):
            x = _bottleneck_(
                layer[bi], x, stride=stride if bi == 0 else 1,
                dilation=dilation,
            )
        feats.append(x)
    x2, x3, x4, x5 = feats

    # PSP
    h, w = x5.shape[1:3]
    psp = params["context_encoding"]
    priors = []
    for si, size in enumerate((1, 2, 3, 6)):
        p = psp["stages"][si]
        pooled = _adaptive_avg_pool(x5, size)
        pooled = _conv_abn_(p["conv"], p["bn"], pooled, padding=0)
        priors.append(_resize_bilinear(pooled, h, w))
    priors.append(x5)
    ctx = _conv_abn_(
        psp["bottleneck"]["conv"], psp["bottleneck"]["bn"],
        jnp.concatenate(priors, axis=-1), padding=1,
    )

    # decoder
    dec = params["decoder"]
    lh, lw = x2.shape[1:3]
    xt = _resize_bilinear(
        _conv_abn_(dec["conv1"]["conv"], dec["conv1"]["bn"], ctx, padding=0),
        lh, lw,
    )
    xl = _conv_abn_(dec["conv2"]["conv"], dec["conv2"]["bn"], x2, padding=0)
    xd = jnp.concatenate([xt, xl], axis=-1)
    xd = _conv_abn_(dec["conv3a"]["conv"], dec["conv3a"]["bn"], xd, padding=0)
    xd = _conv_abn_(dec["conv3b"]["conv"], dec["conv3b"]["bn"], xd, padding=0)

    # edge branch
    edge = params["edge"]
    e1f = _conv_abn_(edge["conv1"]["conv"], edge["conv1"]["bn"], x2, padding=0)
    e2f = _conv_abn_(edge["conv2"]["conv"], edge["conv2"]["bn"], x3, padding=0)
    e3f = _conv_abn_(edge["conv3"]["conv"], edge["conv3"]["bn"], x4, padding=0)
    e1 = nn.conv2d(edge["conv4"], e1f, padding=1)
    e2 = nn.conv2d(edge["conv4"], e2f, padding=1)
    e3 = nn.conv2d(edge["conv4"], e3f, padding=1)
    e2f = _resize_bilinear(e2f, lh, lw)
    e3f = _resize_bilinear(e3f, lh, lw)
    e2 = _resize_bilinear(e2, lh, lw)
    e3 = _resize_bilinear(e3, lh, lw)
    edge_logits = nn.conv2d(
        edge["conv5"], jnp.concatenate([e1, e2, e3], axis=-1), padding=0
    )
    edge_fea = jnp.concatenate([e1f, e2f, e3f], axis=-1)

    # fusion
    fus = params["fushion"]
    xf = _conv_abn_(fus["conv1"]["conv"], fus["conv1"]["bn"],
                   jnp.concatenate([xd, edge_fea], axis=-1), padding=0)
    fusion_logits = nn.conv2d(fus["conv2"], xf, padding=0)
    return fusion_logits, edge_logits


# ---------------------------------------------------------------------------
# Conversion from the SCHP torch checkpoints (exp-schp-201908301523-atr.pth
# etc. — the source of the reference's ONNX exports).
# ---------------------------------------------------------------------------


def _cv(sd, prefix):
    import numpy as np

    w = sd[f"{prefix}.weight"]
    w = w.detach().float().numpy() if hasattr(w, "detach") else np.asarray(w)
    p = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    bk = f"{prefix}.bias"
    if bk in sd:
        b = sd[bk]
        p["bias"] = b.detach().float().numpy() if hasattr(b, "detach") else np.asarray(b)
    return p


def _bn(sd, prefix):
    import numpy as np

    def g(name):
        v = sd[f"{prefix}.{name}"]
        return v.detach().float().numpy() if hasattr(v, "detach") else np.asarray(v)

    return {
        "weight": g("weight"),
        "bias": g("bias"),
        "running_mean": g("running_mean"),
        "running_var": g("running_var"),
    }


def convert_torch(sd: Dict, num_classes: int = NUM_CLASSES_ATR) -> Params:
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: Params = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = _cv(sd, f"conv{i}")
        params[f"bn{i}"] = _bn(sd, f"bn{i}")
    for li, blocks in enumerate(LAYERS):
        layer = []
        for bi in range(blocks):
            pre = f"layer{li + 1}.{bi}"
            bp = {
                "conv1": _cv(sd, f"{pre}.conv1"), "bn1": _bn(sd, f"{pre}.bn1"),
                "conv2": _cv(sd, f"{pre}.conv2"), "bn2": _bn(sd, f"{pre}.bn2"),
                "conv3": _cv(sd, f"{pre}.conv3"), "bn3": _bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _cv(sd, f"{pre}.downsample.0"),
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            layer.append(bp)
        params[f"layer{li + 1}"] = layer

    params["context_encoding"] = {
        "stages": [
            {
                "conv": _cv(sd, f"context_encoding.stages.{i}.1"),
                "bn": _bn(sd, f"context_encoding.stages.{i}.2"),
            }
            for i in range(4)
        ],
        "bottleneck": {
            "conv": _cv(sd, "context_encoding.bottleneck.0"),
            "bn": _bn(sd, "context_encoding.bottleneck.1"),
        },
    }
    params["edge"] = {
        "conv1": {"conv": _cv(sd, "edge.conv1.0"), "bn": _bn(sd, "edge.conv1.1")},
        "conv2": {"conv": _cv(sd, "edge.conv2.0"), "bn": _bn(sd, "edge.conv2.1")},
        "conv3": {"conv": _cv(sd, "edge.conv3.0"), "bn": _bn(sd, "edge.conv3.1")},
        "conv4": _cv(sd, "edge.conv4"),
        "conv5": _cv(sd, "edge.conv5"),
    }
    params["decoder"] = {
        "conv1": {"conv": _cv(sd, "decoder.conv1.0"), "bn": _bn(sd, "decoder.conv1.1")},
        "conv2": {"conv": _cv(sd, "decoder.conv2.0"), "bn": _bn(sd, "decoder.conv2.1")},
        "conv3a": {"conv": _cv(sd, "decoder.conv3.0"), "bn": _bn(sd, "decoder.conv3.1")},
        "conv3b": {"conv": _cv(sd, "decoder.conv3.2"), "bn": _bn(sd, "decoder.conv3.3")},
    }
    params["fushion"] = {
        "conv1": {"conv": _cv(sd, "fushion.0"), "bn": _bn(sd, "fushion.1")},
        "conv2": _cv(sd, "fushion.3"),
    }
    return params


def init(rng, num_classes: int = NUM_CLASSES_ATR) -> Params:
    """Random init with correct shapes (tests / training from scratch)."""
    import numpy as np

    r = np.random.default_rng(
        int(jax.random.randint(rng, (), 0, 2**31 - 1))
    )

    def conv(kh, kw, i, o, bias=False):
        p = {"kernel": (r.standard_normal((kh, kw, i, o)) * 0.05).astype(np.float32)}
        if bias:
            p["bias"] = np.zeros(o, np.float32)
        return p

    def bn(c):
        return {
            "weight": np.ones(c, np.float32),
            "bias": np.zeros(c, np.float32),
            "running_mean": np.zeros(c, np.float32),
            "running_var": np.ones(c, np.float32),
        }

    params: Params = {
        "conv1": conv(3, 3, 3, 64), "bn1": bn(64),
        "conv2": conv(3, 3, 64, 64), "bn2": bn(64),
        "conv3": conv(3, 3, 64, 128), "bn3": bn(128),
    }
    inplanes = 128
    for li, (blocks, planes) in enumerate(zip(LAYERS, (64, 128, 256, 512))):
        layer = []
        for bi in range(blocks):
            bp = {
                "conv1": conv(1, 1, inplanes if bi == 0 else planes * 4, planes),
                "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes), "bn2": bn(planes),
                "conv3": conv(1, 1, planes, planes * 4), "bn3": bn(planes * 4),
            }
            if bi == 0:
                bp["downsample"] = {
                    "conv": conv(1, 1, inplanes, planes * 4),
                    "bn": bn(planes * 4),
                }
            layer.append(bp)
            if bi == 0:
                inplanes = planes * 4
        params[f"layer{li + 1}"] = layer

    params["context_encoding"] = {
        "stages": [
            {"conv": conv(1, 1, 2048, 512), "bn": bn(512)} for _ in range(4)
        ],
        "bottleneck": {"conv": conv(3, 3, 2048 + 4 * 512, 512), "bn": bn(512)},
    }
    params["edge"] = {
        "conv1": {"conv": conv(1, 1, 256, 256), "bn": bn(256)},
        "conv2": {"conv": conv(1, 1, 512, 256), "bn": bn(256)},
        "conv3": {"conv": conv(1, 1, 1024, 256), "bn": bn(256)},
        "conv4": conv(3, 3, 256, 2, bias=True),
        "conv5": conv(1, 1, 6, 2, bias=True),
    }
    params["decoder"] = {
        "conv1": {"conv": conv(1, 1, 512, 256), "bn": bn(256)},
        "conv2": {"conv": conv(1, 1, 256, 48), "bn": bn(48)},
        "conv3a": {"conv": conv(1, 1, 304, 256), "bn": bn(256)},
        "conv3b": {"conv": conv(1, 1, 256, 256), "bn": bn(256)},
    }
    params["fushion"] = {
        "conv1": {"conv": conv(1, 1, 256 + 768, 256), "bn": bn(256)},
        "conv2": conv(1, 1, 256, num_classes, bias=True),
    }
    return params
