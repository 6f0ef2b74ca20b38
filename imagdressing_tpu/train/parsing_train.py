"""SCHP human-parsing fine-tune loop (AugmentCE2P + sync ABN + SCHP losses).

Mirrors the reference's parsing training stack (/root/reference/preprocess/
humanparsing/: networks/AugmentCE2P.py + the CE/Lovász criteria and
InPlaceABNSync in modules/bn.py, trained with SGD + poly LR) as one jitted,
mesh-shardable step:

  * forward in train mode: batch statistics per BN, `lax.pmean`-synced over
    the data axis (InPlaceABNSync's all_reduce), inverse-recompute backward
    (kernels/fused_bn_act.abn_train);
  * loss: CE + Lovász on the fusion head, CE on the edge head
    (train.parsing_losses.schp_criterion), labels downsampled to the
    logits' 1/4 resolution;
  * SGD with momentum and polynomial decay (the SCHP recipe), running-stat
    EMA updates folded into the same step (momentum 0.1, BN default);
  * multi-chip: shard_map over the (data,) mesh — per-device grads are
    pmean'd; BN moments sync inside the forward.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from imagdressing_tpu.preprocess.parsing import model as schp
from imagdressing_tpu.train import parsing_losses


@dataclasses.dataclass(frozen=True)
class ParsingTrainConfig:
    num_classes: int = schp.NUM_CLASSES_ATR
    learning_rate: float = 7e-3  # SCHP recipe
    momentum: float = 0.9
    weight_decay: float = 5e-4
    total_steps: int = 10000
    poly_power: float = 0.9
    bn_momentum: float = 0.1  # running-stat EMA
    lovasz_weight: float = 1.0
    edge_weight: float = 1.0


def _is_bn_stat(path_elems) -> bool:
    last = path_elems[-1]
    key = getattr(last, "key", getattr(last, "name", None))
    return key in ("running_mean", "running_var")


def lr_schedule(cfg: ParsingTrainConfig):
    """SCHP poly decay; evaluated at the CALLER's step_idx inside the step
    (not an optimizer-internal count), so the decay position is explicit
    and restarting from a params-only checkpoint resumes correctly."""
    return optax.polynomial_schedule(
        cfg.learning_rate, 0.0, cfg.poly_power, cfg.total_steps
    )


def make_optimizer(cfg: ParsingTrainConfig) -> optax.GradientTransformation:
    # unit-LR SGD: momentum trace + descent direction; the step multiplies
    # in lr_schedule(cfg)(step_idx)
    sgd = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum),
        optax.scale(-1.0),
    )
    # running stats are data, not parameters: freeze them in the optimizer
    # (the step updates them with the BN EMA instead)
    return optax.multi_transform(
        {"train": sgd, "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "freeze" if _is_bn_stat(path) else "train", params
        ),
    )


def _downsample_labels(labels: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbor label downsampling to the logits' resolution."""
    b = labels.shape[0]
    return jax.image.resize(labels, (b, h, w), "nearest")


def _update_running_stats(params, collected, momentum: float):
    """EMA running stats from the (bn_param_dict, mean, var) tuples the
    forward collected — matched back into the tree by object identity
    (both live in the same trace)."""
    mapping = {id(pb): (m, v) for pb, m, v in collected}

    def walk(node):
        if isinstance(node, dict):
            if id(node) in mapping:
                m, v = mapping[id(node)]
                return {
                    **node,
                    "running_mean": (1 - momentum) * node["running_mean"]
                    + momentum * m,
                    "running_var": (1 - momentum) * node["running_var"]
                    + momentum * v,
                }
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, tuple):
            return tuple(walk(v) for v in node)
        return node

    return walk(params)


def make_parsing_train_step(
    cfg: ParsingTrainConfig,
    tx: optax.GradientTransformation,
    axis_name: Optional[str] = None,
):
    """step(params, opt_state, step_idx, batch) -> (params, opt_state,
    metrics). batch: {"image": (B,H,W,3) normalized, "label": (B,H,W) int32,
    "edge": (B,H,W) int32}."""

    def loss_fn(params, batch):
        ctx = schp.BNTrainCtx(axis_name=axis_name)
        fusion, edge = schp.apply(
            params, batch["image"], cfg.num_classes, bn_ctx=ctx
        )
        lh, lw = fusion.shape[1:3]
        labels = _downsample_labels(batch["label"], lh, lw)
        edges = _downsample_labels(batch["edge"], lh, lw)
        loss = parsing_losses.schp_criterion(
            fusion, edge, labels, edges,
            lovasz_weight=cfg.lovasz_weight, edge_weight=cfg.edge_weight,
            axis_name=axis_name,
        )
        new_params = _update_running_stats(params, ctx.stats, cfg.bn_momentum)
        return loss, new_params

    schedule = lr_schedule(cfg)

    def step(params, opt_state, step_idx, batch):
        (loss, stats_params), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch)
        if axis_name is not None:
            loss = jax.lax.pmean(loss, axis_name)
            grads = jax.tree.map(
                lambda g: jax.lax.pmean(g, axis_name), grads
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        lr = schedule(step_idx)
        updates = jax.tree.map(lambda u: u * lr.astype(u.dtype), updates)
        params = optax.apply_updates(stats_params, updates)
        return params, opt_state, {"loss": loss, "lr": lr}

    return step


def shard_parsing_train_step(cfg: ParsingTrainConfig, mesh, params):
    """DP over the (data,) mesh via shard_map: params replicated, batch
    sharded, BN stats pmean-synced inside the forward. Returns
    (jitted_step, params, opt_state, tx)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagdressing_tpu.core import mesh as mesh_lib

    axis = mesh_lib.DATA_AXIS
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_parsing_train_step(cfg, tx, axis_name=axis)

    repl, bsh = P(), P(axis)
    p_specs = jax.tree.map(lambda _: repl, params)
    o_specs = jax.tree.map(lambda _: repl, opt_state)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(p_specs, o_specs, repl, bsh),
        out_specs=(p_specs, o_specs, repl),
        check_vma=False,
    )
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))
    params = jax.device_put(jax.tree.map(jnp.copy, params), replicated)
    opt_state = jax.device_put(opt_state, replicated)
    jitted = jax.jit(
        sharded,
        in_shardings=(replicated, replicated, replicated, batch_sharded),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1),
    )
    return jitted, params, opt_state, tx


def edges_from_labels(labels: np.ndarray) -> np.ndarray:
    """Binary semantic-boundary map from a parsing label map (the reference
    generates edge supervision from labels in its dataset layer)."""
    lab = np.asarray(labels)
    edge = np.zeros_like(lab, dtype=np.int32)
    edge[..., 1:, :] |= lab[..., 1:, :] != lab[..., :-1, :]
    edge[..., :, 1:] |= lab[..., :, 1:] != lab[..., :, :-1]
    return edge


class ParsingDataset:
    """Minimal LIP/ATR-style folder adapter: images/<id>.jpg +
    labels/<id>.png (palette class ids). Resizes to (h, w), normalizes with
    the SCHP mean/std, derives edge maps from labels."""

    MEAN = np.array([0.406, 0.456, 0.485], np.float32)  # BGR order
    STD = np.array([0.225, 0.224, 0.229], np.float32)

    def __init__(self, image_dir: str, label_dir: str, *, h: int = 473,
                 w: int = 473):
        import os

        self.image_dir, self.label_dir = image_dir, label_dir
        self.h, self.w = h, w
        self.ids = sorted(
            os.path.splitext(f)[0] for f in os.listdir(image_dir)
        )

    def __len__(self):
        return len(self.ids)

    def get(self, idx: int) -> Dict[str, np.ndarray]:
        import os

        import cv2

        sid = self.ids[idx % len(self.ids)]
        img = None
        for ext in (".jpg", ".png", ".jpeg", ".JPG", ".PNG", ".JPEG"):
            path = os.path.join(self.image_dir, sid + ext)
            if os.path.exists(path):
                img = cv2.imread(path)  # BGR, the SCHP convention
                break
        if img is None:
            raise FileNotFoundError(
                f"no readable image for id {sid!r} under {self.image_dir}"
            )
        lab_path = os.path.join(self.label_dir, sid + ".png")
        lab = cv2.imread(lab_path, cv2.IMREAD_GRAYSCALE)
        if lab is None:
            raise FileNotFoundError(f"missing/unreadable label {lab_path}")
        img = cv2.resize(img, (self.w, self.h), interpolation=cv2.INTER_LINEAR)
        lab = cv2.resize(lab, (self.w, self.h),
                         interpolation=cv2.INTER_NEAREST)
        img01 = img.astype(np.float32) / 255.0
        img_norm = (img01 - self.MEAN) / self.STD
        return {
            "image": img_norm.astype(np.float32),
            "label": lab.astype(np.int32),
            "edge": edges_from_labels(lab),
        }

    def batch(self, idxs) -> Dict[str, np.ndarray]:
        samples = [self.get(i) for i in idxs]
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0]
        }
